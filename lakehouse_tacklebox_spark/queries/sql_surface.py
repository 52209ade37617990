"""SQL-surface battery: Spark 4 SQL features exercised as spark.sql
plans — recursive CTEs (SPARK-24497, new in Spark 4.0) and correlated
LATERAL subqueries — each oracled against DuckDB's implementation of
the same standard SQL. These queries are deliberately written in SQL
rather than the DataFrame API: the capability under test is the SQL
front-end itself (a reference user's ad-hoc SQL must keep working after
the switch), while Catalyst still owns the physical plan.
"""

from __future__ import annotations

from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables


def _views(spark, sf_dir, tables):
    t = load_tables(spark, sf_dir, tables)
    for name, df in t.items():
        df.createOrReplaceTempView(name)


@register(
    "sql_recursive_hierarchy",
    tags=("sql", "recursive-cte", "hierarchy"),
    # DuckDB runs the IDENTICAL recursive CTE; both engines must agree
    # on every (depth, n, nations) row. DIV (// in DuckDB) keeps the
    # parent derivation in exact integer arithmetic.
    oracle="""
    WITH RECURSIVE chain(c_custkey, c_nationkey, depth) AS (
        SELECT c_custkey, c_nationkey, 0 FROM customer WHERE c_custkey = 0
        UNION ALL
        SELECT c.c_custkey, c.c_nationkey, ch.depth + 1
        FROM customer c JOIN chain ch ON c.c_custkey // 10 = ch.c_custkey
        WHERE c.c_custkey > 0
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS nations
    FROM chain GROUP BY depth ORDER BY depth
    """,
)
def sql_recursive_hierarchy(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE) walking a 10-ary
    org-chart hierarchy derived from customer ids (parent = key DIV 10,
    root = key 0): per-depth census of customers and their nation
    spread. The recursion is a real iterative plan — each step joins
    the frontier to the fact on the derived parent key — and the
    traversal covers the full table (1 + 9 + 90 + 900 + ... = all
    customers), so a lost or duplicated frontier row moves a count.
    Scale: each iteration shuffles only the frontier ⋈ fact join on the
    parent key; depth is O(log₁₀ keys), so 100 TB of customers is
    ~10 iterations, not a driver loop."""
    _views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        WITH RECURSIVE chain(c_custkey, c_nationkey, depth) AS (
            SELECT c_custkey, c_nationkey, 0 FROM customer WHERE c_custkey = 0
            UNION ALL
            SELECT c.c_custkey, c.c_nationkey, ch.depth + 1
            FROM customer c JOIN chain ch ON c.c_custkey DIV 10 = ch.c_custkey
            WHERE c.c_custkey > 0
        )
        SELECT depth,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count(DISTINCT c_nationkey) AS BIGINT) AS nations
        FROM chain GROUP BY depth ORDER BY depth
        """
    )


@register(
    "sql_lateral_topk",
    tags=("sql", "lateral", "topk"),
    # Same correlated LATERAL in DuckDB; money compared as exact cents,
    # ties fully broken by custkey inside the LIMIT.
    oracle="""
    SELECT r.r_name, x.c_custkey,
           CAST(round(CAST(x.c_acctbal AS DECIMAL(14,2)) * 100) AS BIGINT) AS acctbal_cents
    FROM region r, LATERAL (
        SELECT c.c_custkey, c.c_acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3
    ) x
    ORDER BY r.r_name, acctbal_cents DESC, x.c_custkey
    """,
)
def sql_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery: top-3 customers by balance per
    region, the per-row-subquery formulation a reference user writes
    ad hoc (the window-function rewrite exists elsewhere in the battery
    — win_topn_per_group — so this entry pins the LATERAL front-end
    specifically). Ties fully broken inside the LIMIT; money compared
    as exact cents."""
    _views(spark, sf_dir, ["region", "nation", "customer"])
    return spark.sql(
        """
        SELECT r.r_name, x.c_custkey,
               CAST(round(CAST(x.c_acctbal AS DECIMAL(14,2)) * 100) AS BIGINT) AS acctbal_cents
        FROM region r, LATERAL (
            SELECT c.c_custkey, c.c_acctbal
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3
        ) x
        ORDER BY r.r_name, acctbal_cents DESC, x.c_custkey
        """
    )
