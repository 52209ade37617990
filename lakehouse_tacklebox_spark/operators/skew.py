"""Skew-mitigation joins: salting for heavy-hitter keys.

The reference hits skew once and reaches for a SKEW hint
(datavalidator.py:270) — a Databricks-only hint. The OSS-Spark answers
are (a) AQE skew-join splitting, on by default in our session
(session.py), and (b) explicit salting when one side's key distribution
is so hot that even split partitions overwhelm a task. This module is
(b), for the 100 TB case: a handful of keys holding a double-digit
percent of a fact table.

Mechanism: the skewed (big) side gets a random salt in [0, salt); the
small side is exploded ×salt so every (key, salt) bucket finds its
match. The join key becomes (key, salt) → hot keys spread over `salt`
tasks. Cost: small side replicated `salt`× — use for dimension-sized
right sides only, and prefer plain broadcast when the small side fits
(salting only beats broadcast when it doesn't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the big side salted and the small side exploded.

    Result equals ``big.join(small, on, how)`` for how in
    inner/left/left_outer (row-for-row; no dedup semantics change).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    big_s = big.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
    small_s = small.withColumn(_SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return big_s.join(small_s, [*on, _SALT], how).drop(_SALT)


def top_keys(df: DataFrame, keys: list[str], n: int = 20) -> DataFrame:
    """Heavy-hitter report: the keys worth salting, with their share of
    rows — run this before deciding (the reference's optimizer decides
    from stats, not guesses; same stance)."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("pct_of_table", F.round(F.col("n_rows") * 100.0 / F.lit(max(total, 1)), 4))
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(n)
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation for heavy-hitter GROUP BY keys.

    Stage 1 groups on ``(keys…, salt)`` — a hot key's rows spread over
    ``salt`` reducers, so no task owns a double-digit share of the
    table — and computes decomposable partials; stage 2 re-aggregates
    the ``salt``-bounded partials on the true keys. Algebraically
    identical to the plain GROUP BY for the supported measures
    (count/sum/min/max compose associatively); the second shuffle moves
    ``|keys| × salt`` rows, which is noise at any scale.

    Note Spark's own partial (map-side) aggregation already gives this
    for most skews; explicit salting is for the 100 TB case the skew
    advisor flags — high-cardinality COMBINED state per reducer (e.g.
    count-distinct-style measures) or a key so hot that even the merge
    side of one reducer is a straggler. The battery pairs this with
    ``plans/profiler.skew_advisor``: the advisor prices the fan-out,
    this operator executes it.

    ``measures``: out_name -> (fn, col) with fn in count/sum/min/max;
    col is ignored for count.
    """
    fns = {"count", "sum", "min", "max"}
    for name, (fn, _c) in measures.items():
        if fn not in fns:
            raise ValueError(f"salted_agg measure {name}: unsupported fn {fn}")
    salted = df.withColumn(_SALT, (F.rand(seed=7) * salt).cast("int"))
    partials = [
        (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(name)
        for name, (fn, col) in measures.items()
    ]
    stage1 = salted.groupBy(*keys, _SALT).agg(*partials)
    finals = [
        (F.sum(name) if fn in ("count", "sum") else getattr(F, fn)(name))
        .cast("bigint" if fn == "count" else dict(stage1.dtypes)[name])
        .alias(name)
        for name, (fn, _c) in measures.items()
    ]
    return stage1.groupBy(*keys).agg(*finals)
