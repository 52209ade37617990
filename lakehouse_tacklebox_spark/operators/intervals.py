"""Interval overlap join via time-bucket replication.

Spark has no native interval join; the naive formulation
``a.start <= b.end AND b.start <= a.end`` is a non-equi condition that
degenerates to a (banded) nested-loop. The scale-safe shape replicates
each interval onto the fixed-granularity grid cells it touches and
equi-joins on (key, cell): candidate pairs are exactly the pairs sharing
a cell, the true overlap predicate then filters, and a pair-level
distinct removes multi-cell duplicates. Cost is O(rows × cells-per-
interval) replication and one hash shuffle — no cross join at any size.
Pick ``granularity`` ≈ the typical interval length so replication stays
a small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    start_col: str,
    end_col: str,
    granularity_days: int = 7,
) -> DataFrame:
    """Self-join: pairs of intervals with the same key that overlap
    (half-open [start, end)), ``id_a < id_b``.

    start/end are DATE columns; the grid is ``granularity_days``-wide
    cells of the epoch-day axis.
    """
    cell_lo = F.floor(F.unix_date(F.col(start_col)) / granularity_days)
    # end is exclusive: the last touched cell belongs to end - 1 day.
    # Clamp to cell_lo: a dirty interval with end <= start would make
    # F.sequence DESCEND and replicate the row onto every cell between
    # end and start — unbounded explode blowup for grossly inverted
    # intervals. Clamped, empty/inverted intervals land on exactly one
    # cell and the strict overlap predicate below still rejects their
    # pairs, so correctness is unchanged and cost is bounded.
    cell_hi = F.greatest(
        F.floor(F.unix_date(F.date_sub(F.col(end_col), 1)) / granularity_days), cell_lo
    )
    cells = df.select(
        *key_cols,
        F.col(id_col),
        F.col(start_col),
        F.col(end_col),
        F.explode(F.sequence(cell_lo, cell_hi)).alias("__cell"),
    )
    a = cells.alias("a")
    b = cells.alias("b")
    key_eq = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    cond = (
        (F.col("a.__cell") == F.col("b.__cell"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col(f"a.{start_col}") < F.col(f"b.{end_col}"))
        & (F.col(f"b.{start_col}") < F.col(f"a.{end_col}"))
    )
    for k in key_eq:
        cond = cond & k
    return (
        a.join(b, cond)
        .select(
            *[F.col(f"a.{k}").alias(k) for k in key_cols],
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
