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

from lakehouse_tacklebox_spark.operators.sketch import heavy_hitters_exact


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


def skew_advisor(
    df: DataFrame,
    columns: list[str],
    capacity: int = 15,
    target_share_ppm: int = 31250,
) -> DataFrame:
    """Join/partition-key skew census + salting recommendation: for each
    candidate key column, find every value holding more than
    ``1/(capacity+1)`` of the column's non-null rows (via the
    Misra-Gries sketch + exact re-count,
    :func:`~lakehouse_tacklebox_spark.operators.sketch.heavy_hitters_exact`)
    and recommend the salt fan-out that would level it back to
    ``target_share_ppm`` per salted sub-key (default 31250 ppm = 1/32,
    one healthy shuffle partition's worth on a 32-slot stage).

    Output: (column, skew_key, n, share_ppm, salt_factor), heaviest
    first. A uniform key column contributes no rows — absence IS the
    "no salting needed" verdict. This is the measurement half of
    SCALING.md's skew playbook (AQE skew-join handles the read side;
    salting the write/agg side needs to know WHICH keys and HOW WIDE,
    which at 100 TB must come from a bounded-memory census, not a full
    GROUP BY over a high-cardinality key space).

    Extends the reference's table-layout advisor (deltaoptimizer.py's
    join-column mining :1207-1242 scores WHICH columns are hot; this
    profiles WHICH VALUES inside a hot column break the shuffle).

    All arithmetic is exact integer (ppm floor-division), so the
    recommendation is engine-reproducible and battery-oracled.
    """
    if not columns:
        return df.sparkSession.createDataFrame(
            [], "column string, skew_key string, n bigint, share_ppm bigint, salt_factor int"
        )
    # one narrow scan for the per-column non-null totals (control-plane
    # scalars; at scale this is a columnar count, not a shuffle)
    totals = df.agg(
        *[F.count(F.col(c)).alias(c) for c in columns]
    ).collect()[0]
    parts = []
    for c in columns:
        n_tot = int(totals[c] or 0)
        if n_tot == 0:
            continue
        hh = heavy_hitters_exact(df.select(c), c, capacity)
        share = F.expr(f"CAST((n * CAST(1000000 AS BIGINT)) div {n_tot} AS BIGINT)")
        parts.append(
            hh.select(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("skew_key"),
                F.col("n"),
                share.alias("share_ppm"),
            )
        )
    if not parts:
        return df.sparkSession.createDataFrame(
            [], "column string, skew_key string, n bigint, share_ppm bigint, salt_factor int"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    t = int(target_share_ppm)
    return (
        out.withColumn(
            "salt_factor",
            F.expr(f"CAST((share_ppm + {t} - 1) div {t} AS INT)"),
        )
        .orderBy(F.desc("share_ppm"), "column", "skew_key")
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    top_n: int = 10,
) -> DataFrame:
    """Exact equi-join output-size forecast from per-side key
    histograms: |A ⋈ B| = Σ_k nA(k)·nB(k), computed WITHOUT running the
    join. Two grouped counts (map-side partial agg → one shuffle each
    over the key, i.e. sub-linear output) and a join of the histograms
    — at 100 TB this prices a fact-fact join in minutes that would take
    hours to materialize, and the per-key products name the rows that
    would explode it (the companion to :func:`skew_advisor`: that one
    flags input skew, this one flags OUTPUT blowup, which is what
    actually OOMs a shuffle — a key holding 1% of each side of two
    10⁹-row tables contributes 10¹⁴ output rows).

    Output: the ``top_n`` heaviest keys (est_rows desc, key asc) plus a
    ``*TOTAL*`` row with the exact join cardinality. All arithmetic is
    bigint-exact.

    Extends the reference's join-column mining (deltaoptimizer.py
    :1207-1242 scores which columns join often; this prices what one
    specific join would PRODUCE).
    """
    right_key = right_key or left_key
    lk = (
        left.filter(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).cast("string").alias("join_key"))
        .agg(F.count(F.lit(1)).alias("left_rows"))
    )
    rk = (
        right.filter(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).cast("string").alias("join_key"))
        .agg(F.count(F.lit(1)).alias("right_rows"))
    )
    j = lk.join(rk, "join_key").withColumn(
        "est_rows", F.col("left_rows") * F.col("right_rows")
    )
    # the histogram join is tiny relative to the inputs; persist so the
    # top-n pass and the total pass share one computation
    j = j.localCheckpoint(eager=False)
    top = j.orderBy(F.desc("est_rows"), "join_key").limit(top_n)
    total = j.agg(
        # coalesce: a join with NO matching keys still yields a 0-total
        # row, not a null one
        F.coalesce(F.sum("left_rows"), F.lit(0)).cast("bigint").alias("left_rows"),
        F.coalesce(F.sum("right_rows"), F.lit(0)).cast("bigint").alias("right_rows"),
        F.coalesce(F.sum("est_rows"), F.lit(0)).cast("bigint").alias("est_rows"),
    ).select(F.lit("*TOTAL*").alias("join_key"), "left_rows", "right_rows", "est_rows")
    return top.unionByName(total).orderBy(F.desc("est_rows"), "join_key")


def functional_deps(
    candidates: list[tuple[str, DataFrame, str, str]],
) -> DataFrame:
    """Functional-dependency check over candidate (determinant →
    dependent) column pairs: A → B holds iff |distinct A| equals
    |distinct (A, B)| over the rows where both are non-null; the gap is
    the exact violation count (extra (A,B) combinations beyond one-per-A).
    This is the profiling step behind key discovery, normalization
    advice, and choosing clustering columns (a held FD means the
    dependent is free to co-locate with the determinant) — the
    column-metadata mining the reference's optimizer does from query
    logs (deltaoptimizer.py:1207-1242), done from the DATA instead.

    ``candidates``: (table_label, df, determinant, dependent) tuples.
    Each pair costs one filtered two-distinct aggregate — map-side
    partial agg, one shuffle keyed on nothing wider than the pair
    itself; at 100 TB you run it on a sampled or recent partition
    first, then confirm survivors exactly.
    """
    if not candidates:
        # mirror skew_advisor's empty-input branch: a typed empty frame,
        # not an IndexError at parts[0]
        from pyspark.sql import SparkSession

        return SparkSession.getActiveSession().createDataFrame(
            [],
            "table_name string, determinant string, dependent string, "
            "n_det bigint, n_pair bigint, holds int, violations bigint",
        )
    parts = []
    for label, df, det, dep in candidates:
        parts.append(
            df.filter(F.col(det).isNotNull() & F.col(dep).isNotNull())
            .agg(
                F.countDistinct(det).cast("bigint").alias("n_det"),
                F.countDistinct(det, dep).cast("bigint").alias("n_pair"),
            )
            .select(
                F.lit(label).alias("table_name"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_det",
                "n_pair",
                (F.col("n_pair") == F.col("n_det")).cast("int").alias("holds"),
                (F.col("n_pair") - F.col("n_det")).alias("violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name", "determinant", "dependent")
