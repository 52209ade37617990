"""As-of (point-in-time) join.

Joins each left row to the single most recent right row with the same
key and ``right_ts <= left_ts`` — the canonical time-series/dimension
lookup (trades→quotes, events→latest profile version). Spark has no
native ASOF JOIN; the naive encodings are a range join (quadratic blowup
per key) or a per-key ``applyInPandas`` merge (Python in the hot path).

This implementation is the union-window form: tag both inputs, union
them, and carry the latest right payload forward with
``last(..., ignorenulls=True)`` over a (key, ts, tag)-ordered running
window. Cost is ONE shuffle of left+right on the key and a linear pass
per partition — no pair explosion, no Python, arbitrary key skew handled
by AQE. Right rows sort before left rows at equal timestamps, giving
exact ``<=`` semantics (same as DuckDB's ASOF JOIN, which the battery
oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the latest
    right row at-or-before it (nulls when no such row exists).

    ``right_cols`` selects which right columns to carry (default: all
    non-key, non-ts columns), emitted with ``suffix`` appended. Right
    rows must be unique per (keys, right_ts); pre-aggregate if not.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_cols = {c: f"{c}{suffix}" for c in right_cols}
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    lt = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *left_payload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_cols[c]) for c in right_cols],
    )
    rt = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(out_cols[c]) for c in right_cols],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lt.unionByName(rt)
    for c in right_cols:
        u = u.withColumn(out_cols[c], F.last(out_cols[c], ignorenulls=True).over(w))
    return (
        u.filter(F.col("_tag") == 1)
        .drop("_tag")
        .withColumnRenamed("_ts", left_ts)
        .select(*keys, left_ts, *left_payload, *[out_cols[c] for c in right_cols])
    )
