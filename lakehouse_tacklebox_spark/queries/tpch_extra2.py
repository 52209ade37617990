"""Remaining TPC-H-shaped battery queries (q12/q13/q16/q17/q21/q22),
adapted to the testdata schema.

The testdata has no partsupp table and no shipmode/commitdate/receiptdate/
phone/comment columns, so each query keeps the canonical *shape* (the join
topology, subquery structure, and aggregation pattern that makes the query
interesting) while swapping predicates onto columns that exist:

- q12: shipmode -> l_linestatus as the grouping class
- q13: o_comment filter -> o_orderpriority filter (same left-join+filter)
- q16: partsupp -> lineitem as the part-supplier relation; comment
  blacklist -> negative-balance supplier blacklist
- q17: container -> type; the correlated 0.2*avg(qty) subquery is kept
- q21: commit/receipt lateness -> l_returnflag = 'R' as the "failed the
  order" marker; the EXISTS / NOT EXISTS pair is kept
- q22: phone country code -> c_nationkey band; NOT EXISTS(orders) kept

All money math is exact-decimal (functions.money) and every output is
rounded + fully tie-broken so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.functions import dmoney, dsum_dbl
from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables, maybe_broadcast


@register(
    "q12_priority_line_classes",
    tags=("join", "agg", "conditional"),
    oracle="""
    SELECT l_linestatus AS line_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY line_class
    """,
)
def q12_priority_line_classes(spark, sf_dir):
    """q12 shape: fact-fact equi-join + conditional counts per class.

    Scale: the shipdate window pushes to the lineitem scan; the join
    shuffles both sides on orderkey once, and the two CASE counts are
    map-side partial aggregates over a 2-value grouping key.
    """
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_linestatus").alias("line_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("line_class")
    )


@register(
    "q13_customer_distribution",
    bench=True,
    tags=("join", "agg", "outer"),
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """q13: order-count histogram over a filtered LEFT OUTER join.

    The filter lives in the join condition (not WHERE) so no-order
    customers survive with count 0 — the classic outer-join-pruning
    trap. Scale: both aggs are partial-friendly; the second groupBy is
    over a tiny key domain (distinct order counts), so the only real
    shuffle is customer↔orders on custkey.
    """
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q16_supplier_part_counts",
    tags=("join", "agg", "anti", "distinct"),
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """q16 shape: supplier diversity per part attribute, with a
    blacklist NOT IN rewritten as a broadcast anti join.

    Scale: part predicates prune before the fact join; the blacklist is
    a tiny broadcast anti join (no shuffle); COUNT(DISTINCT) is the one
    unavoidable expand-shuffle and groups on low-cardinality keys.
    """
    t = load_tables(spark, sf_dir, ["part", "lineitem", "supplier"])
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(bad_supp), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(maybe_broadcast(part, "part"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    tags=("join", "agg", "subquery"),
    oracle="""
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND p_type = 'SMALL'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """q17: correlated 0.2*avg(qty) threshold, decorrelated into a
    per-part aggregate joined back to the fact.

    Scale: lineitem is semi-joined to the (broadcast-pruned) brand/type
    slice FIRST, so only the relevant sliver flows on; the per-part avg
    is then a window over that sliver — one narrow shuffle on partkey,
    the fact scanned exactly once (the agg-and-join-back form reads it
    twice).
    """
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    part = t["part"].filter((F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL")).select("p_partkey")
    li = t["lineitem"].join(maybe_broadcast(part, "part"), F.col("p_partkey") == F.col("l_partkey"))
    return (
        li.withColumn(
            "qty_threshold",
            F.lit(0.2) * F.avg("l_quantity").over(W.partitionBy("l_partkey")),
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(dmoney("l_extendedprice")).cast("double") / F.lit(7.0), 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q21_waiting_suppliers",
    bench=True,
    tags=("join", "agg", "exists", "topk"),
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name = 'NATION_1'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """q21: the sole-offender EXISTS / NOT EXISTS pair, rewritten as one
    per-order supplier-cardinality aggregate.

    EXISTS(other supplier in order)            <=> countDistinct(supp) > 1
    NOT EXISTS(other supplier with 'R' flag)   <=> countDistinct(supp
    WHERE flag='R') = 1  (l1 itself carries 'R', so "exactly one" means
    "only me").

    Scale: instead of two extra self-join passes over lineitem (the
    literal EXISTS plan), a cascaded aggregate — (orderkey, suppkey)
    first, then orderkey — computes both cardinalities plus, for the
    nrsupp=1 case, the sole R-supplier's key and its R-row count.
    Lineitem is scanned once and shuffled once at full width (no
    two-distinct-aggs expand doubling the shuffle); the second shuffle
    only moves the per-(order, supplier) pairs. Orders joins on the
    orderkey partitioning the aggregate already produced, dims
    broadcast, and the final top-k is tie-broken.
    """
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    is_r = F.col("l_returnflag") == "R"
    per_pair = t["lineitem"].groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(is_r, 1).otherwise(0)).alias("has_r"),
        F.sum(F.when(is_r, 1).otherwise(0)).alias("pair_r_rows"),
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"),
        F.sum("has_r").alias("nrsupp"),
        F.min(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("r_suppkey"),
        F.sum("pair_r_rows").alias("r_rows"),
    )
    nation1 = t["nation"].filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    supp = t["supplier"].join(
        F.broadcast(nation1), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("nsupp") > 1) & (F.col("nrsupp") == 1))
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("r_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("r_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@register(
    "q22_dormant_customer_balance",
    tags=("join", "agg", "anti", "subquery"),
    oracle="""
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
      AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.00)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    ORDER BY cntry
    """,
)
def q22_dormant_customer_balance(spark, sf_dir):
    """q22: above-average-balance customers with no orders, by country
    band. The scalar avg subquery becomes a 1-row broadcast cross join;
    NOT EXISTS(orders) becomes a left anti join on custkey.

    Scale: the anti join is the only shuffle (orders projected to the
    single join column first); the scalar threshold never touches the
    driver.
    """
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    avg_bal = (
        t["customer"].filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        t["customer"]
        .filter(F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(t["orders"].select("o_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum_dbl(dmoney("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntry")
    )
