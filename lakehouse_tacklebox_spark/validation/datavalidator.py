"""Data validation: row-hash table diff and cross-system count
reconciliation.

Re-expresses the reference's DataValidator (datavalidator.py:44-283 —
coalesce-null → concat → sha2 → join → agg) and the count reconciler
(redshiftchecker.py:137-188 — date_trunc groupBy + full outer join) as
pure DataFrame operators.

Scale design: the compare payload is reduced to a 32-byte SHA-256 digest
*before* the join, so the shuffle carries (keys, hash) only — never the
wide row. One shuffle on the key columns; no broadcast assumptions (both
sides may be 100 TB fact tables). The reference disables broadcast for
exactly this reason (datavalidator.py:13); we instead let AQE decide,
since the hash projection makes even a "small" side cheap to exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unit separator / null sentinel: unlikely in real data, keeps
# concat_ws from conflating ("a", "bc") with ("ab", "c") or null with "".
_SEP = "\x1f"
_NULL = "\x00<null>"


def row_hash(df: DataFrame, cols: list[str] | None = None, out_col: str = "__row_hash") -> DataFrame:
    """Append a null-safe SHA-256 digest of the given columns.

    Column order is normalized (sorted by name) so two tables with the
    same logical content but different column order hash identically.
    """
    cols = sorted(cols or df.columns)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    return df.withColumn(out_col, F.sha2(F.concat_ws(_SEP, *parts), 256))


def _hashed_sides(left: DataFrame, right: DataFrame, keys: list[str], compare_cols: list[str] | None):
    compare_cols = compare_cols or [c for c in left.columns if c not in keys]
    lh = row_hash(left, compare_cols).select(*keys, F.col("__row_hash").alias("__lh"))
    rh = row_hash(right, compare_cols).select(*keys, F.col("__row_hash").alias("__rh"))
    return lh, rh


def diff_rows(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff: (keys..., category) for every key that is not an
    exact match — the validator's anti-join drill-down
    (datavalidator.py:162-171), generalized to one full-outer pass.

    category ∈ {mismatched, left_only, right_only}.
    """
    lh, rh = _hashed_sides(left, right, keys, compare_cols)
    joined = lh.join(rh, keys, "full_outer")
    category = (
        F.when(F.col("__lh").isNull(), F.lit("right_only"))
        .when(F.col("__rh").isNull(), F.lit("left_only"))
        .when(F.col("__lh") != F.col("__rh"), F.lit("mismatched"))
    )
    return joined.withColumn("category", category).filter(F.col("category").isNotNull()).drop("__lh", "__rh")


def hash_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Table-level diff summary: one row per category with count and
    percent-of-left (datavalidator.py:121-160 pct metrics).

    Returns columns (category, n, pct_of_left); categories are
    matched / mismatched / left_only / right_only, always all four rows
    (0 when empty) so downstream assertions are schema-stable.
    """
    lh, rh = _hashed_sides(left, right, keys, compare_cols)
    joined = lh.join(rh, keys, "full_outer")
    category = (
        F.when(F.col("__lh").isNull(), F.lit("right_only"))
        .when(F.col("__rh").isNull(), F.lit("left_only"))
        .when(F.col("__lh") == F.col("__rh"), F.lit("matched"))
        .otherwise(F.lit("mismatched"))
    )
    counts = joined.select(category.alias("category")).groupBy("category").agg(F.count(F.lit(1)).alias("n"))
    spark = left.sparkSession
    all_cats = spark.createDataFrame([(c,) for c in ("matched", "mismatched", "left_only", "right_only")], "category string")
    total_left = left.count()
    return (
        all_cats.join(counts, "category", "left")
        .select(
            "category",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(F.coalesce(F.col("n"), F.lit(0)) * 100.0 / F.lit(max(total_left, 1)), 4).alias("pct_of_left"),
        )
    )


def count_reconcile(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    grain: str = "month",
    left_name: str = "left_n",
    right_name: str = "right_n",
) -> DataFrame:
    """Row-count reconciliation by time bucket
    (redshiftchecker.py:166-184 semantics).

    Buckets both sides with date_trunc(grain), full-outer joins the
    per-bucket counts, and reports the delta. Each side aggregates
    *before* the join, so the join is over |buckets| rows — trivially
    broadcastable no matter how big the inputs are.
    """

    def bucket(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(F.date_trunc(grain, F.col(ts_col)).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    lb, rb = bucket(left, left_name), bucket(right, right_name)
    return (
        lb.join(rb, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col(left_name), F.lit(0)).alias(left_name),
            F.coalesce(F.col(right_name), F.lit(0)).alias(right_name),
        )
        .withColumn("delta", F.col(left_name) - F.col(right_name))
        .withColumn("is_match", F.col("delta") == 0)
    )


def schema_diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """Schema drift report between two DataFrames — the pre-migration
    check the reference's helper layer runs before a MERGE/CLONE (does
    the target still accept the source?). One row per column name seen
    on either side with status in {'match', 'type_changed',
    'only_left', 'only_right'} plus nullability drift.

    Driver-side metadata only (schemas, not data) — no job is launched;
    the result is a small createDataFrame, safe at any table size.
    """
    spark = left.sparkSession
    lf = {f.name: f for f in left.schema.fields}
    rf = {f.name: f for f in right.schema.fields}
    rows = []
    for name in sorted(set(lf) | set(rf)):
        l, r = lf.get(name), rf.get(name)
        if l is None:
            status = "only_right"
        elif r is None:
            status = "only_left"
        elif l.dataType.simpleString() != r.dataType.simpleString():
            status = "type_changed"
        else:
            status = "match"
        rows.append(
            (
                name,
                l.dataType.simpleString() if l else None,
                r.dataType.simpleString() if r else None,
                status,
                bool(l.nullable) if l else None,
                bool(r.nullable) if r else None,
                l is not None and r is not None and l.nullable != r.nullable,
            )
        )
    return spark.createDataFrame(
        rows,
        "col_name string, left_type string, right_type string, "
        "status string, left_nullable boolean, right_nullable boolean, "
        "nullability_drift boolean",
    )
