"""Validation battery: SURVEY.md §2.12 V1/V2 as graded queries.

The engine side runs the validation operators (hash-diff over SHA-256
row digests, count reconciliation); the oracle expresses the same
*semantics* with direct null-safe value comparison — if the hash path
miscategorizes anything, the category counts diverge.

Drift fixture (deterministic, derived from the shared tables): left =
customer minus custkeys divisible by 89; right = customer minus custkeys
divisible by 97, with mktsegment overwritten where divisible by 53. That
yields all four diff categories non-empty at every SF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.validation import count_reconcile, diff_rows, hash_diff

_ORACLE_SIDES = """
    left_t AS (SELECT * FROM customer WHERE c_custkey % 89 <> 0),
    right_t AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal,
               CASE WHEN c_custkey % 53 = 0 THEN 'DRIFTED' ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 97 <> 0
    )
"""


def _drift_sides(spark, sf_dir):
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    left = cust.filter(F.col("c_custkey") % 89 != 0)
    right = cust.filter(F.col("c_custkey") % 97 != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 53 == 0, F.lit("DRIFTED")).otherwise(F.col("c_mktsegment")),
    )
    return left, right


@register(
    "validate_hashdiff_summary",
    tags=("validation",),
    oracle=f"""
    WITH {_ORACLE_SIDES},
    j AS (
        SELECT CASE WHEN l.c_custkey IS NULL THEN 'right_only'
                    WHEN r.c_custkey IS NULL THEN 'left_only'
                    WHEN l.c_name IS NOT DISTINCT FROM r.c_name
                     AND l.c_nationkey IS NOT DISTINCT FROM r.c_nationkey
                     AND l.c_acctbal IS NOT DISTINCT FROM r.c_acctbal
                     AND l.c_mktsegment IS NOT DISTINCT FROM r.c_mktsegment THEN 'matched'
                    ELSE 'mismatched' END AS category
        FROM left_t l FULL OUTER JOIN right_t r ON l.c_custkey = r.c_custkey
    )
    SELECT category, count(*) AS n FROM j GROUP BY category
    """,
)
def validate_hashdiff_summary(spark, sf_dir):
    """Row-hash table diff summary (datavalidator.py:121-160): counts
    per match category between two drifted copies of customer."""
    left, right = _drift_sides(spark, sf_dir)
    return hash_diff(left, right, keys=["c_custkey"]).select("category", "n")


@register(
    "validate_diff_drilldown",
    tags=("validation",),
    oracle=f"""
    WITH {_ORACLE_SIDES}
    SELECT coalesce(l.c_custkey, r.c_custkey) AS c_custkey,
           CASE WHEN l.c_custkey IS NULL THEN 'right_only'
                WHEN r.c_custkey IS NULL THEN 'left_only'
                ELSE 'mismatched' END AS category
    FROM left_t l FULL OUTER JOIN right_t r ON l.c_custkey = r.c_custkey
    WHERE l.c_custkey IS NULL OR r.c_custkey IS NULL
       OR NOT (l.c_name IS NOT DISTINCT FROM r.c_name
           AND l.c_nationkey IS NOT DISTINCT FROM r.c_nationkey
           AND l.c_acctbal IS NOT DISTINCT FROM r.c_acctbal
           AND l.c_mktsegment IS NOT DISTINCT FROM r.c_mktsegment)
    """,
)
def validate_diff_drilldown(spark, sf_dir):
    """Anti-join drill-down (datavalidator.py:162-171): every key that
    is not an exact match, with its diff category."""
    left, right = _drift_sides(spark, sf_dir)
    return diff_rows(left, right, keys=["c_custkey"])


@register(
    "reconcile_counts_by_grain",
    tags=("validation",),
    oracle="""
    WITH lb AS (
        SELECT date_trunc('month', o_orderdate) AS bucket, count(*) AS left_n
        FROM orders GROUP BY 1
    ),
    rb AS (
        SELECT date_trunc('month', o_orderdate) AS bucket, count(*) AS right_n
        FROM orders WHERE o_orderkey % 101 <> 0 GROUP BY 1
    )
    SELECT coalesce(lb.bucket, rb.bucket) AS bucket,
           coalesce(left_n, 0) AS left_n,
           coalesce(right_n, 0) AS right_n,
           coalesce(left_n, 0) - coalesce(right_n, 0) AS delta,
           coalesce(left_n, 0) = coalesce(right_n, 0) AS is_match
    FROM lb FULL OUTER JOIN rb ON lb.bucket = rb.bucket
    """,
)
def reconcile_counts_by_grain(spark, sf_dir):
    """Cross-system count reconciliation by month
    (redshiftchecker.py:137-188): orders vs. a copy missing every
    101st order."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    right = orders.filter(F.col("o_orderkey") % 101 != 0)
    out = count_reconcile(orders, right, ts_col="o_orderdate", grain="month")
    # Spark date_trunc yields timestamp; o_orderdate is a date, so report date.
    return out.withColumn("bucket", F.col("bucket").cast("date"))
