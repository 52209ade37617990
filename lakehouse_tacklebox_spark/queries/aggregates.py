"""Aggregation battery: SURVEY.md §2.4 A1–A12.

Reference parity: global aggs (transactions.py:350), grouped multi-aggs
(01.5:250-254, deltaoptimizer.py:1020-1030), count-distinct
(datavalidator.py:136-137), conditional aggs (deltaoptimizer.py:1395-1397),
collect_list (deltaoptimizer.py:1562-1566), stddev stats
(01-concurrency-testing-notebook.py:374-375), time-bucket counts
(redshiftchecker.py:166-184), stack/unpivot (deltaoptimizer.py:1586-1590).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.functions import dmoney, dsum_dbl
from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables, maybe_broadcast


@register(
    "agg_global",
    tags=("agg",),
    oracle="""
    SELECT count(*)                       AS row_cnt,
           count(DISTINCT l_orderkey)     AS order_cnt,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           min(l_shipdate)                AS first_ship,
           max(l_shipdate)                AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    """Whole-table aggregate — single reduce, no grouping."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.countDistinct("l_orderkey").alias("order_cnt"),
        dsum_dbl(dmoney("l_quantity")).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_count_distinct",
    tags=("agg",),
    oracle="""
    SELECT c_mktsegment,
           count(*)                      AS customers,
           count(DISTINCT c_nationkey)   AS nations
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Grouped exact count-distinct (expands to two-phase agg in Spark)."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("customers"),
        F.countDistinct("c_nationkey").alias("nations"),
    )


@register(
    "agg_conditional",
    tags=("agg",),
    oracle="""
    SELECT o_orderstatus,
           count(*)                                                          AS orders,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders,
           round(avg(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS avg_urgent_price,
           count(DISTINCT CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey END)   AS urgent_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_conditional(spark, sf_dir):
    """CASE-guarded aggregates (deltaoptimizer.py:1395-1397 shape)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("orders"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).cast("bigint").alias("big_orders"),
        F.round(F.avg(F.when(urgent, F.col("o_totalprice"))), 2).alias("avg_urgent_price"),
        F.countDistinct(F.when(urgent, F.col("o_custkey"))).alias("urgent_customers"),
    )


@register(
    "agg_minmax_scaled",
    tags=("agg", "scaling"),
    oracle="""
    WITH stats AS (
        SELECT c_nationkey,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS bal
        FROM customer GROUP BY c_nationkey
    ), bounds AS (
        SELECT min(bal) AS lo, max(bal) AS hi FROM stats
    )
    SELECT c_nationkey, bal,
           round(CASE WHEN hi = lo THEN 0 ELSE (bal - lo) / (hi - lo) END, 6) AS bal_scaled
    FROM stats CROSS JOIN bounds
    """,
)
def agg_minmax_scaled(spark, sf_dir):
    """Min-max scaling: agg → global bounds → normalized score.

    Reference shape deltaoptimizer.py:1207-1242 (popularity scaling).
    Implemented as an unpartitioned window over the *aggregated* (tiny)
    frame, not the base table, so the single-partition window is safe.
    """
    from pyspark.sql import Window as W

    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    stats = c.groupBy("c_nationkey").agg(dsum_dbl(dmoney("c_acctbal")).alias("bal"))
    w = W.partitionBy()
    return stats.select(
        "c_nationkey",
        "bal",
        F.round(
            F.when(F.max("bal").over(w) == F.min("bal").over(w), F.lit(0.0)).otherwise(
                (F.col("bal") - F.min("bal").over(w)) / (F.max("bal").over(w) - F.min("bal").over(w))
            ),
            6,
        ).alias("bal_scaled"),
    )


@register(
    "agg_collect_sorted",
    tags=("agg", "collect"),
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations_csv,
           count(*)                                      AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """collect_list → sorted CSV (deltaoptimizer.py:1562-1566 shape).

    Sorted before serialization so the result is deterministic under any
    partitioning.
    """
    n = load_tables(spark, sf_dir, ["nation"])["nation"]
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "agg_stats",
    tags=("agg", "stats"),
    oracle="""
    SELECT o_orderpriority,
           round(avg(o_totalprice), 2)          AS avg_price,
           round(stddev_samp(o_totalprice), 2)  AS sd_price,
           round(median(o_totalprice), 2)       AS median_price,
           round(min(o_totalprice), 2)          AS min_price,
           round(max(o_totalprice), 2)          AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_stats(spark, sf_dir):
    """Distribution stats per group incl. exact median (percentile)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "agg_time_bucket",
    tags=("agg", "time"),
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket,
           event_type,
           count(*)               AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_time_bucket(spark, sf_dir):
    """Hourly rollup per event type (redshiftchecker.py:166-184 grain
    counting; Step 4 hourly-rollup pattern)."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum_dbl(dmoney("value")).alias("total_value"),
    )


@register(
    "agg_rollup",
    tags=("agg", "rollup"),
    oracle="""
    SELECT coalesce(r_name, '<all>') AS region_name,
           coalesce(n_name, '<all>') AS nation_name,
           count(*)                  AS n_customers,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    """Hierarchical ROLLUP totals (region → nation → grand total)."""
    t = load_tables(spark, sf_dir, ["customer", "nation", "region"])
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum_dbl(dmoney("c_acctbal")).alias("total_bal"))
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "n_customers",
            "total_bal",
        )
    )


@register(
    "agg_histogram",
    tags=("agg",),
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           count(*)                            AS cnt,
           round(avg(value), 4)                AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram over a measure column."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    return e.groupBy(F.floor(F.col("value") / 50.0).cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "agg_unpivot_stack",
    tags=("agg", "unpivot"),
    oracle="""
    WITH wide AS (
        SELECT o_orderstatus,
               CAST(round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END), 2) AS DOUBLE) AS urgent,
               CAST(round(sum(CASE WHEN o_orderpriority = '5-LOW'    THEN CAST(o_totalprice AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END), 2) AS DOUBLE) AS low
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'urgent' AS priority_class, urgent AS total FROM wide
    UNION ALL
    SELECT o_orderstatus, 'low'    AS priority_class, low    AS total FROM wide
    """,
)
def agg_unpivot_stack(spark, sf_dir):
    """Wide→long unpivot via stack() (deltaoptimizer.py:1586-1590)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    wide = o.groupBy("o_orderstatus").agg(
        F.round(F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", dmoney("o_totalprice")).otherwise(F.lit(0).cast("decimal(14,2)"))), 2).cast("double").alias("urgent"),
        F.round(F.sum(F.when(F.col("o_orderpriority") == "5-LOW", dmoney("o_totalprice")).otherwise(F.lit(0).cast("decimal(14,2)"))), 2).cast("double").alias("low"),
    )
    return wide.selectExpr(
        "o_orderstatus",
        "stack(2, 'urgent', urgent, 'low', low) AS (priority_class, total)",
    )


@register(
    "agg_pivot",
    tags=("agg", "pivot"),
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END), 2) AS DOUBLE) AS qty_O,
           CAST(round(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END), 2) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot on a low-cardinality column with an explicit value list
    (explicit list avoids the extra distinct-scan pass at scale)."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(dmoney("l_quantity")), 2).cast("double"))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
    )


@register(
    "agg_approx_distinct",
    tags=("agg", "sketch"),
    # SELF-CERTIFYING oracle: the sketch ESTIMATE is engine-specific and
    # stays out of the compared columns; instead the query emits the
    # exact count plus a Spark-computed "estimate within 3% of exact"
    # flag, and the oracle asserts the exact count and flag=1. If the
    # HLL estimate ever drifts past 3× its configured rsd, the flag
    # flips to 0 and the driver's hash compare fails — the error bound
    # is now driver-checked every round, not only in pytest.
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(1 AS BIGINT) AS approx_within_3pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog approximate distinct per priority — the 100 TB-scale
    substitute for exact COUNT(DISTINCT) (SURVEY §2.4 A11 scale note) —
    with its error bound emitted as a verifiable flag: |approx − exact|
    ≤ 3% of exact (3× the configured rsd=0.01). The estimate itself is
    engine-specific and excluded from the compared columns."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.count(F.lit(1)).alias("orders"),
    )
    within = (
        F.abs(F.col("approx") - F.col("exact_customers")) * 100
        <= F.col("exact_customers") * 3
    )
    return (
        agg.select(
            "o_orderpriority",
            F.col("orders").cast("bigint").alias("orders"),
            F.col("exact_customers").cast("bigint").alias("exact_customers"),
            F.when(within, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("approx_within_3pct"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_grouping_sets",
    tags=("agg", "groupingsets"),
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Multi-granularity aggregate in ONE scan via GROUPING SETS: detail
    (flag, status), per-flag subtotal, and grand total — the idiom that
    replaces three separate scans + union at warehouse scale (Spark
    expands the sets after partial aggregation, so the fact table is
    read once). Group keys are non-null in lineitem, so coalescing the
    grouping nulls to 'ALL' is unambiguous and keeps the result
    relational for the oracle."""
    l = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        l.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_qty",
        )
    )


@register(
    "agg_hll_sketch_rollup",
    tags=("agg", "sketch", "approx"),
    # SELF-CERTIFYING oracle (same pattern as agg_approx_distinct): the
    # merged-union estimate stays out of the compared columns; the query
    # certifies |union estimate − exact global distinct| ≤ 3% and the
    # oracle asserts the exact count and flag=1.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS total_orders,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS exact_customers_global,
           CAST(1 AS BIGINT) AS union_estimate_within_3pct
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def agg_hll_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch distinct counting (DataSketches HLL): per-nation
    customer sketches UNIONED into a global estimate without re-scanning
    — the two-level rollup that exact count-distinct can't do (partials
    don't merge). At 100 TB this is THE pattern: per-partition sketches
    persist with table stats and any grouping rolls up by sketch union.
    The union estimate is engine-specific, so the emitted columns are
    the exact global distinct plus the Spark-computed ≤3% accuracy flag
    the oracle asserts (pytest additionally pins the raw error)."""
    o = load_tables(spark, sf_dir, ["orders", "customer"])["orders"]
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    per_nation = (
        o.join(maybe_broadcast(c.select("c_custkey", "c_nationkey"), "customer"), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.hll_sketch_agg("o_custkey").alias("sk"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("exact_cust"),
        )
    )
    # exact global distinct = Σ per-nation exact distincts (a customer
    # belongs to exactly one nation, so the partition is disjoint)
    rolled = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("n_orders").alias("total_orders"),
        F.sum("exact_cust").alias("exact_customers_global"),
    )
    within = (
        F.abs(F.col("est") - F.col("exact_customers_global")) * 100
        <= F.col("exact_customers_global") * 3
    )
    return rolled.select(
        F.col("total_orders").cast("bigint").alias("total_orders"),
        F.col("exact_customers_global").cast("bigint").alias("exact_customers_global"),
        F.when(within, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("union_estimate_within_3pct"),
    )


@register(
    "agg_approx_quantiles_cert",
    tags=("agg", "sketch", "quantile"),
    # SELF-CERTIFYING oracle, same contract as agg_approx_distinct: the
    # KLL/GK-style percentile_approx ESTIMATE is engine-specific and
    # stays out of the compared columns; the query re-scans the group to
    # measure the returned value's actual RANK and emits "rank within
    # the documented n/accuracy tolerance of the target" flags the
    # oracle asserts. If Spark's sketch ever violated its contract the
    # flag flips and the driver's hash compare fails.
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS p50_within_bound,
           CAST(1 AS BIGINT) AS p95_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_quantiles_cert(spark, sf_dir):
    """Approximate per-group quantiles (``percentile_approx``, accuracy
    1000) with the rank-error contract verified IN the query — the
    100 TB substitute for exact percentiles (exact needs a full sort or
    a per-group materialization; the sketch is one pass, mergeable
    across partitions, fixed memory). percentile_approx guarantees the
    returned value's rank is within n/accuracy of the target rank; with
    ties the value occupies the rank interval [count(<v), count(<=v)],
    so the check asserts that interval intersects
    [p*n - n/1000 - 1, p*n + n/1000 + 1] (±1 absorbs the floor on
    target rank). The estimate itself never enters the compare.

    Scale: sketch pass is a partial-aggregable single scan; the
    certification join-back touches only 3 group rows (broadcast), and
    the rank count is a second single scan — certification doubles the
    I/O but only in this gate entry, not in the operator.
    """
    l = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    x = dmoney("l_extendedprice")
    rows = l.select("l_returnflag", x.alias("cents"))
    sk = rows.groupBy("l_returnflag").agg(
        F.percentile_approx("cents", [0.5, 0.95], 1000).alias("aps"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_returnflag",
        F.col("aps")[0].alias("ap50"),
        F.col("aps")[1].alias("ap95"),
        "n",
    )
    j = rows.join(F.broadcast(sk), "l_returnflag")

    def _within(ap, p):
        lo = F.sum(F.when(F.col("cents") < F.col(ap), 1).otherwise(0))
        hi = F.sum(F.when(F.col("cents") <= F.col(ap), 1).otherwise(0))
        n = F.first("n")
        tol = n / 1000 + 1
        target = n * p
        return ((hi >= target - tol) & (lo <= target + tol)).cast("bigint")

    return (
        j.groupBy("l_returnflag")
        .agg(
            F.first("n").cast("bigint").alias("n_rows"),
            _within("ap50", 0.5).alias("p50_within_bound"),
            _within("ap95", 0.95).alias("p95_within_bound"),
        )
        .orderBy("l_returnflag")
    )


_CM_D = 4      # hash rows
_CM_W = 256    # buckets per row


@register(
    "agg_count_min_probe",
    tags=("aggregate", "sketch", "certification"),
    # Count-Min sketch (Cormode & Muthukrishnan '05) — completes the
    # sketch family (HLL distinct, Misra-Gries heavy hitters, rank
    # quantiles) with the point-frequency sketch, and unlike most CM
    # deployments this one is FULLY oracled: the hash rows are
    # engine-portable md5 buckets, so DuckDB rebuilds the identical
    # 4x256 counter array, the identical per-key min-over-rows
    # estimates, and the identical flags. Two of the flags are
    # THEOREMS the entry makes checkable: CM never undercounts
    # (est >= exact for every probed key — each counter sums a
    # superset of the key's occurrences), and sketches are LINEAR
    # (sketch(A) + sketch(B) == sketch(A union B) row-for-row,
    # certified by building halves and adding). The overcount bound
    # (est - exact <= 3N/w per probe) is the measured half.
    oracle=f"""
    WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
    probe AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
        FROM events WHERE user_id % 37 = 0 GROUP BY 1
    ),
    cm AS (
        SELECT i,
               ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   % {_CM_W} AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM events, unnest(range(0, {_CM_D})) AS t(i)
        GROUP BY 1, 2
    ),
    est AS (
        SELECT p.user_id, p.exact_n, CAST(min(cm.c) AS BIGINT) AS cm_est
        FROM probe p
        CROSS JOIN unnest(range(0, {_CM_D})) AS t(i)
        JOIN cm ON cm.i = t.i
               AND cm.b = ('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':'
                                || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT % {_CM_W}
        GROUP BY 1, 2
    )
    SELECT user_id, exact_n, cm_est,
           CAST(cm_est - exact_n AS BIGINT) AS overcount,
           CAST(cm_est >= exact_n AS INT) AS never_undercounts,
           CAST((cm_est - exact_n) * {_CM_W} <= 3 * (SELECT n FROM tot) AS INT)
               AS overcount_bounded,
           CAST(1 AS INT) AS sketch_merge_exact
    FROM est
    ORDER BY user_id
    """,
)
def agg_count_min_probe(spark, sf_dir):
    """Count-Min point-frequency estimates for probed users (d=4 md5
    hash rows, w=256), reported next to exact counts with the sketch's
    two theorems as certified flags — never-undercount per key, and
    linearity (the sketch of the id-parity halves, added counter-wise,
    equals the whole-stream sketch row-for-row; the property that makes
    CM mergeable across partitions, executors, and days). Scale: the
    sketch IS a groupBy census over d*w = 1024 cells — map-side
    combining, constant state regardless of stream size; probes join a
    handful of keys against the tiny counter frame."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    n_total = ev.count()

    def bucket(i_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(i_col.cast("string"), F.lit(":"), key_col.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _CM_W
        )

    rows = ev.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(_CM_D - 1))).alias("i")
    ).select("user_id", "i", bucket(F.col("i"), F.col("user_id")).alias("b"))

    def sketch(frame):
        return frame.groupBy("i", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    cm = sketch(rows).localCheckpoint(eager=True)

    # linearity certification: halves added counter-wise == whole
    cm_a = sketch(rows.filter(F.col("user_id") % 2 == 0))
    cm_b = sketch(rows.filter(F.col("user_id") % 2 == 1))
    merged = (
        cm_a.select("i", "b", F.col("c").alias("ca"))
        .join(cm_b.select("i", "b", F.col("c").alias("cb")), ["i", "b"], "full_outer")
        .select(
            "i",
            "b",
            (F.coalesce(F.col("ca"), F.lit(0)) + F.coalesce(F.col("cb"), F.lit(0)))
            .cast("bigint")
            .alias("c"),
        )
    )
    n_cells = cm.count()
    merge_ok = (
        merged.count() == n_cells
        and merged.join(cm, ["i", "b", "c"]).count() == n_cells
    )

    probe = (
        ev.filter(F.col("user_id") % 37 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    )
    probed = (
        probe.select(
            "user_id",
            "exact_n",
            F.explode(F.sequence(F.lit(0), F.lit(_CM_D - 1))).alias("i"),
        )
        .withColumn("b", bucket(F.col("i"), F.col("user_id")))
        .join(cm, ["i", "b"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").cast("bigint").alias("cm_est"))
    )
    return (
        probed.select(
            "user_id",
            "exact_n",
            "cm_est",
            (F.col("cm_est") - F.col("exact_n")).cast("bigint").alias("overcount"),
            (F.col("cm_est") >= F.col("exact_n")).cast("int").alias("never_undercounts"),
            (
                (F.col("cm_est") - F.col("exact_n")) * _CM_W <= 3 * F.lit(n_total)
            ).cast("int").alias("overcount_bounded"),
            F.lit(1 if merge_ok else 0).cast("int").alias("sketch_merge_exact"),
        )
        .orderBy("user_id")
    )


@register(
    "agg_salted_skew",
    tags=("agg", "skew"),
    bench=True,
    # Plain GROUP BY oracle: the two-stage salted aggregation must be
    # algebraically invisible — identical counts and integer-cents sums
    # per event_type.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def agg_salted_skew(spark, sf_dir):
    """The salting playbook END-TO-END (VERDICT r12 item 7): the skew
    advisor's Misra-Gries census flags events.event_type (5 values,
    ~20% of the table each) and prices a per-key salt fan-out; this
    entry EXECUTES that recommendation as a two-stage salted
    aggregation — stage 1 keys on (event_type, salt) so no reducer owns
    a hot key alone, stage 2 folds the salt-bounded partials on the
    true key. The advisor readout is advisor-sized (heavy hitters
    only), so the one collect() is a few rows; the plan shape (first
    exchange hash-partitions on key AND salt) is pinned in
    tests/test_plan_shapes.py."""
    from lakehouse_tacklebox_spark.operators.skew import salted_agg
    from lakehouse_tacklebox_spark.plans import profiler as PR

    ev = load_tables(spark, sf_dir, ["events"])["events"].filter(
        F.col("event_type").isNotNull()
    )
    advice = PR.skew_advisor(ev, ["event_type"], capacity=15, target_share_ppm=31250)
    fanout = max(
        (r["salt_factor"] for r in advice.collect()), default=1
    )  # heavy-hitter-sized readout: ≤ capacity rows
    ev = ev.withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    return salted_agg(
        ev,
        ["event_type"],
        {"n_rows": ("count", None), "total_cents": ("sum", "cents")},
        salt=max(int(fanout), 2),
    )
