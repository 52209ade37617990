"""Data profiler: one-pass per-column statistics.

Re-expresses the reference's data profiler
(40-observability/data-profiler/01-create-data-profile.py:86-172, which
loops DESCRIBE per table) as a single wide aggregate: ONE scan computes
count/nulls/distinct/min/max for every column, then a ``stack`` unpivot
turns the wide row into (column, metric...) rows — the same wide→long
shape the optimizer's cardinality sampler uses
(deltaoptimizer.py:1586-1590).

Scale notes: one job, one scan, no per-column loops. Exact
COUNT(DISTINCT) on every column of a 100 TB table is an expand-operator
blowup (one shuffle per distinct agg), so ``exact=False`` (the default)
uses approx_count_distinct (HLL++, single pass, mergeable partials);
keep ``exact=True`` for oracle-checkable small profiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, null_pct, n_distinct,
    min_value, max_value) — min/max stringified so heterogeneous column
    types stack into one result schema."""
    columns = columns or df.columns
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append((F.count_distinct(col) if exact else F.approx_count_distinct(col)).alias(f"__dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nulls_{c}`, `__dist_{c}`, `__min_{c}`, `__max_{c}`" for c in columns
    )
    stacked = wide.selectExpr(
        "__n",
        f"stack({len(columns)}, {stack_args}) as (column, n_nulls, n_distinct, min_value, max_value)",
    )
    return stacked.select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_nulls",
        F.round(F.col("n_nulls") * 100.0 / F.greatest(F.col("__n"), F.lit(1)), 4).alias("null_pct"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def cardinality_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    sample_size: int = 1_000_000,
    exact: bool = False,
) -> DataFrame:
    """Distinct-ratio per column on a LIMIT sample — the optimizer's
    cardinality sampler (deltaoptimizer.py:1325-1341,1521-1634:
    ``WITH sample AS (SELECT * FROM t LIMIT n) COUNT(DISTINCT c)...``).

    Returns (column, sample_rows, n_distinct, distinct_ratio). LIMIT
    sampling (not random) matches the reference and costs one partial
    scan; the ratio feeds ZORDER scoring where only the order of
    magnitude matters, so the default is the one-pass HLL estimate.
    ``exact=True`` switches to COUNT(DISTINCT) — used where the ratio
    must be engine-reproducible (the oracled optimizer battery entry);
    costs one extra shuffle per column at full scale.
    """
    columns = columns or df.columns
    sample = df.limit(sample_size)
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        distinct_fn(c).alias(f"__dist_{c}") for c in columns
    ]
    wide = sample.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `__dist_{c}`" for c in columns)
    return (
        wide.selectExpr("__n", f"stack({len(columns)}, {stack_args}) as (column, n_distinct)")
        .select(
            "column",
            F.col("__n").alias("sample_rows"),
            "n_distinct",
            F.round(F.col("n_distinct") / F.greatest(F.col("__n"), F.lit(1)), 6).alias("distinct_ratio"),
        )
    )
