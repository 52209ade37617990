"""Profiler + optimizer battery entries (SURVEY.md §2.12 V3–V7).

The one-pass profiler is fully SQL-expressible so it carries a DuckDB
oracle (per-column UNION ALL mirrors the stack unpivot). The optimizer
scoring pipeline hinges on the query-text parser UDFs, which DuckDB
can't run — it's registered rows-only here and value-checked in
tests/test_plans.py against hand-computed expectations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.plans import optimizer as OPT
from lakehouse_tacklebox_spark.plans import profiler as PR
from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables

_CUSTOMER_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

_ORACLE_PROFILE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS "column",
           count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           round((count(*) - count({c})) * 100.0 / greatest(count(*), 1), 4) AS null_pct,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM customer
    """
    for c in _CUSTOMER_COLS
)


@register(
    "profile_customer",
    bench=True,
    tags=("profiler",),
    oracle=_ORACLE_PROFILE,
)
def profile_customer(spark, sf_dir):
    """One-pass per-column profile of customer: a single wide aggregate
    + stack unpivot replaces the reference's per-table DESCRIBE loops
    (01-create-data-profile.py:86-172)."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    return PR.profile(cust, exact=True)


# Deterministic query-log fixture for the optimizer pipeline: the shape
# of a benchmark-harness result table (query_text, duration_s).
QUERY_LOG_FIXTURE = [
    ("SELECT c_mktsegment, count(*) FROM customer WHERE c_acctbal > 100 GROUP BY c_mktsegment", 4.0),
    ("SELECT * FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey WHERE c.c_nationkey = 7", 9.0),
    ("SELECT o_orderpriority, sum(o_totalprice) FROM orders WHERE o_orderdate >= DATE '1995-01-01' GROUP BY o_orderpriority", 6.0),
    ("SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)", 3.0),
    ("SELECT c_nationkey, avg(c_acctbal) FROM customer GROUP BY c_nationkey", 2.0),
    ("SELECT * FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_nationkey = 3", 5.0),
]


@register(
    "optimizer_column_scores",
    tags=("optimizer",),
    # No oracle: the scoring pipeline runs query-parsing UDFs that DuckDB
    # can't evaluate; value-checked in tests/test_plans.py.
)
def optimizer_column_scores(spark, sf_dir):
    """Query-log → per-(table, column) usage stats, min-max scaled and
    blended into a ZORDER score (deltaoptimizer.py profile→score path)."""
    log = spark.createDataFrame(QUERY_LOG_FIXTURE, "query_text string, duration_s double")
    stats = OPT.parse_query_log(log)
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    card = PR.cardinality_stats(cust, sample_size=10_000)
    return (
        OPT.scale_and_score(stats, card)
        .select("TableName", "ColumnName", "QueryReferenceCount", "FilterCount", "JoinCount", "GroupCount", "score")
        .orderBy("TableName", "ColumnName")
    )
