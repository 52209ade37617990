"""Set-operation battery: SURVEY.md §2.7 U1–U6.

Reference parity: UNION dedup (dlt-loans/01:161-165), UNION ALL
(Step 12:197-207), DISTINCT (deltaoptimizer.py:1044), anti-compare
(datavalidator.py:162-171).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables


@register(
    "set_union_distinct",
    tags=("setop",),
    oracle="""
    SELECT nationkey, count(*) AS side_count FROM (
        SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION
        SELECT DISTINCT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    ) GROUP BY nationkey
    """,
)
def set_union_distinct(spark, sf_dir):
    """UNION (dedup) of nation keys present on each side."""
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")).distinct()
    return c.union(s).distinct().groupBy("nationkey").agg(F.count(F.lit(1)).alias("side_count"))


@register(
    "set_union_all",
    tags=("setop",),
    oracle="""
    SELECT party_nation, count(*) AS n_parties FROM (
        SELECT c_nationkey AS party_nation FROM customer
        UNION ALL
        SELECT s_nationkey AS party_nation FROM supplier
    ) GROUP BY party_nation
    """,
)
def set_union_all(spark, sf_dir):
    """UNION ALL keeping duplicates, then grouped count."""
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    u = t["customer"].select(F.col("c_nationkey").alias("party_nation")).unionAll(
        t["supplier"].select(F.col("s_nationkey").alias("party_nation"))
    )
    return u.groupBy("party_nation").agg(F.count(F.lit(1)).alias("n_parties"))


@register(
    "set_intersect",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    """Nation keys with both customers and suppliers (INTERSECT)."""
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    return t["customer"].select(F.col("c_nationkey").alias("nationkey")).intersect(
        t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "set_except",
    tags=("setop",),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark, sf_dir):
    """Nation keys with customers but no suppliers (EXCEPT)."""
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    # subtract = set EXCEPT (exceptAll would keep surplus duplicates)
    return t["customer"].select(F.col("c_nationkey").alias("nationkey")).subtract(
        t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    )
