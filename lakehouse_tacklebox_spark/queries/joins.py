"""Join-type battery: every join flavor from SURVEY.md §2.3.

Reference parity: left outer (datavalidator.py:142-143), left anti
(datavalidator.py:162-169), semi (datavalidator.py:186-194), full outer
(redshiftchecker.py:163-183), self-join (02-Data-preparation.py:142-143),
cross/theta (deltaoptimizer.py:1384-1392), range/inequality band lookup
(deltaoptimizer.py:1490-1492).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.functions import dmoney, dsum_dbl
from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables


@register(
    "join_left_outer",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                         AS order_cnt,
           CAST(round(coalesce(sum(CAST(o_totalprice AS DECIMAL(14,2))), 0), 2) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer(spark, sf_dir):
    """Per-customer order stats keeping customers with zero orders."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum(dmoney("o_totalprice")), F.lit(0).cast("decimal(14,2)")), 2).cast("double").alias("total_spend"),
        )
    )


@register(
    "join_anti",
    tags=("join",),
    oracle="""
    SELECT c_mktsegment, count(*) AS customers_without_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark, sf_dir):
    """Customers with no orders, by segment — left-anti join."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
    )


@register(
    "join_semi",
    tags=("join",),
    oracle="""
    SELECT c_mktsegment, count(*) AS customers_with_f_orders
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark, sf_dir):
    """Customers having at least one finished order — left-semi join."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_with_f_orders"))
    )


@register(
    "join_full_outer",
    tags=("join", "reconcile"),
    oracle="""
    WITH o AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d, count(*) AS order_cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1999-03-01 00:00:00'
        GROUP BY 1
    ), l AS (
        SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d, count(*) AS ship_cnt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-03-01 00:00:00'
        GROUP BY 1
    )
    SELECT coalesce(o.d, l.d)        AS day,
           coalesce(order_cnt, 0)    AS order_cnt,
           coalesce(ship_cnt, 0)     AS ship_cnt
    FROM o FULL OUTER JOIN l ON o.d = l.d
    """,
)
def join_full_outer(spark, sf_dir):
    """Daily order-vs-shipment count reconciliation — full outer join.

    This is the reference's cross-system reconciliation shape
    (redshiftchecker.py:137-188): aggregate each side by a time grain
    first (so the join inputs are tiny), then full-outer on the grain.
    """
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    lo, hi = F.lit("1999-01-01").cast("timestamp"), F.lit("1999-03-01").cast("timestamp")
    o = (
        t["orders"]
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    l = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.date_trunc("day", "l_shipdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("ship_cnt"))
    )
    return o.join(l, o["d"] == l["d"], "full_outer").select(
        F.coalesce(o["d"], l["d"]).alias("day"),
        F.coalesce(F.col("order_cnt"), F.lit(0)).alias("order_cnt"),
        F.coalesce(F.col("ship_cnt"), F.lit(0)).alias("ship_cnt"),
    )


@register(
    "join_self_pairs",
    tags=("join", "self"),
    oracle="""
    SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b, count(*) AS pair_cnt
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    GROUP BY a.l_returnflag, b.l_returnflag
    """,
)
def join_self_pairs(spark, sf_dir):
    """Within-order line pairs — self-join on the order key.

    Scale: the self-join shuffles both aliases on l_orderkey; per-key
    fan-out is bounded by lines-per-order (≤7), so no quadratic blowup.
    """
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select("l_orderkey", "l_linenumber", "l_returnflag")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .groupBy(F.col("a.l_returnflag").alias("flag_a"), F.col("b.l_returnflag").alias("flag_b"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )


@register(
    "join_cross",
    tags=("join", "cross"),
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark, sf_dir):
    """Cartesian product of two bounded dims (theta-join shape,
    deltaoptimizer.py:1384-1392). Only ever done on dimension tables."""
    t = load_tables(spark, sf_dir, ["region", "nation"])
    return t["region"].select("r_name").crossJoin(t["nation"].select("n_name"))


@register(
    "join_range_band",
    tags=("join", "range"),
    oracle="""
    SELECT band, count(*) AS order_cnt, CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS band_total
    FROM orders
    JOIN (VALUES ('small', 0.0, 50000.0),
                 ('medium', 50000.0, 150000.0),
                 ('large', 150000.0, 1e18)) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def join_range_band(spark, sf_dir):
    """Band (range) join: order price → named bucket via inequality join.

    Reference shape: 'nearest file-size band' lookup
    (deltaoptimizer.py:1490-1505). The band table is tiny → broadcast
    nested-loop join, which is the right plan at any fact size.
    """
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 150000.0), ("large", 150000.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        orders.join(F.broadcast(bands), (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dsum_dbl(dmoney("o_totalprice")).alias("band_total"),
        )
    )


@register(
    "join_multiway_using",
    tags=("join",),
    oracle="""
    SELECT c.c_custkey,
           coalesce(o.n_orders_agg, 0) AS n_orders,
           coalesce(e.n_events_agg, 0) AS n_events
    FROM (SELECT c_custkey FROM customer WHERE c_custkey < 100) c
    LEFT JOIN (SELECT o_custkey, count(DISTINCT o_orderkey) AS n_orders_agg
               FROM orders GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey
    LEFT JOIN (SELECT user_id, count(*) AS n_events_agg
               FROM events GROUP BY user_id) e ON e.user_id = c.c_custkey
    """,
)
def join_multiway_using(spark, sf_dir):
    """Three-source feature join (C360 feature-table shape, 01.5:248-261).

    Scale note: aggregating each fact to the key grain BEFORE joining
    avoids the classic fan-out×fan-out double-count and keeps the join
    inputs at key cardinality.
    """
    t = load_tables(spark, sf_dir, ["customer", "orders", "events"])
    cust = t["customer"].filter(F.col("c_custkey") < 100).select("c_custkey")
    o = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.countDistinct("o_orderkey").alias("n_orders_agg"))
    )
    e = t["events"].groupBy(F.col("user_id").alias("c_custkey")).agg(F.count(F.lit(1)).alias("n_events_agg"))
    return (
        cust.join(o, "c_custkey", "left")
        .join(e, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders_agg", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events_agg", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "join_asof",
    tags=("join", "asof", "timeseries"),
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS purchase_event_id,
           r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join (operators/asof.py): each click matched to the user's
    most recent purchase at-or-before it, checked against DuckDB's
    native ASOF LEFT JOIN.

    Scale: union-window form — one shuffle of both sides on user_id,
    then a linear running-window pass; no range-join pair explosion and
    no Python. The canonical custom operator Spark lacks, expressed as
    a composition of built-ins.
    """
    from lakehouse_tacklebox_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        right_cols=["purchase_event_id", "purchase_value"],
        suffix="",
    ).select("event_id", "user_id", "ts", "purchase_event_id", "purchase_value")


@register(
    "join_salted_skew",
    tags=("join", "skew"),
    oracle="""
    SELECT n_name, count(*) AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_salted_skew(spark, sf_dir):
    """Skew-mitigation join (operators/skew.py): the fact side is salted
    and the dimension exploded ×salt, spreading any hot supplier key
    over `salt` tasks. The oracle is the PLAIN join — parity proves
    salting changes the schedule, never the result. (With a
    dimension this small broadcast wins; the battery entry exists to
    oracle-check the rewrite used when it doesn't.)"""
    from lakehouse_tacklebox_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    joined = salted_join(
        t["lineitem"].select("l_suppkey", "l_quantity"),
        t["supplier"].select("s_suppkey", "s_nationkey").withColumnRenamed("s_suppkey", "l_suppkey"),
        on=["l_suppkey"],
        salt=8,
    )
    return (
        joined.join(F.broadcast(t["nation"]), joined.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
        .orderBy("n_name")
    )


@register(
    "join_interval_overlap",
    bench=True,
    tags=("join", "interval"),
    oracle="""
    WITH iv AS (
        SELECT o_custkey, o_orderkey, o_orderdate AS start_d,
               o_orderdate + INTERVAL 7 DAY AS end_d
        FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS id_a,
           b.o_orderkey AS id_b
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.start_d < b.end_d AND b.start_d < a.end_d
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval overlap self-join (orders fulfilled in overlapping 7-day
    service windows per customer) via time-bucket replication: intervals
    replicate onto the weekly grid cells they touch and equi-join on
    (customer, cell) — no banded nested-loop, no cross join, one hash
    shuffle. The oracle states the textbook non-equi overlap predicate;
    the bucketed plan must produce the identical pair set."""
    from lakehouse_tacklebox_spark.operators.intervals import interval_overlap_pairs

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("start_d"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("end_d"),
    )
    pairs = interval_overlap_pairs(
        iv, ["o_custkey"], "o_orderkey", "start_d", "end_d", granularity_days=7
    )
    return pairs.select(
        F.col("o_custkey").alias("custkey"),
        "id_a",
        "id_b",
    )


@register(
    "join_asof_nearest",
    tags=("join", "asof", "timeseries"),
    # direction='nearest' as-of (the pandas merge_asof semantics DuckDB
    # has no native operator for): each click matched to the user's
    # temporally NEAREST purchase within a 3600 s tolerance, ties
    # broken earlier-then-smaller-id. Composed as TWO union-window
    # passes — the backward as-of operator as-is, plus the same
    # operator run on NEGATED epoch seconds (most-recent-<= in the
    # negated domain IS earliest->= in the real one), then a 1:1
    # winner pick per click. Soundness of the pick: within a side,
    # |diff| is monotone in timestamp distance, so each side's as-of
    # row is that side's global-rule winner, and the cross-side
    # comparison (diff, then earlier ts) equals the global
    # (diff, ts, id) order because same-diff different-ts can only be
    # one-before-one-after. The oracle brute-forces all candidate
    # pairs and ranks them by the same rule.
    oracle="""
    WITH c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ),
    cand AS (
        SELECT c.event_id, p.event_id AS p_id, p.value AS p_val, p.ts AS p_ts,
               CAST(abs(date_diff('second', p.ts, c.ts)) AS BIGINT) AS diff_s
        FROM c JOIN p USING (user_id)
        WHERE abs(date_diff('second', p.ts, c.ts)) <= 3600
    ),
    best AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY event_id
                       ORDER BY diff_s, p_ts, p_id) AS rn
            FROM cand
        ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, c.ts,
           b.p_id AS nearest_event_id,
           round(b.p_val, 2) AS nearest_value,
           b.diff_s,
           CASE WHEN b.p_id IS NULL THEN NULL
                WHEN b.diff_s = 0 THEN 'exact'
                WHEN b.p_ts < c.ts THEN 'before'
                ELSE 'after' END AS direction
    FROM c LEFT JOIN best b ON b.event_id = c.event_id
    ORDER BY c.event_id
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join with tolerance: every click plus
    its user's closest purchase within an hour, whichever side of the
    click it falls on (pandas merge_asof direction='nearest' semantics,
    which neither Spark nor DuckDB has natively). Scale shape: exactly
    two runs of the union-window as-of operator (one shuffle on
    user_id each, linear pass, no pair explosion — the forward pass
    reuses the SAME operator on negated epoch seconds) and a 1:1
    self-join of the two k-bounded match frames on the click id. The
    oracle brute-forces candidate pairs; parity proves the two-pass
    composition implements the global nearest rule."""
    from lakehouse_tacklebox_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        "ts",
        F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
    )
    # unique right rows per (user, ts): keep the smallest event id (the
    # oracle's id tie-break), with its value
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min(F.struct("event_id", "value")).alias("m"))
        .select(
            "user_id",
            F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
            F.col("m.event_id").alias("p_id"),
            F.col("m.value").alias("p_val"),
            F.unix_timestamp("ts").cast("bigint").alias("p_ts_s"),
        )
    )

    bwd = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        left_ts="ts_s",
        right_ts="ts_s",
        right_cols=["p_id", "p_val", "p_ts_s"],
        suffix="_b",
    ).select("event_id", "user_id", "ts", "ts_s", "p_id_b", "p_val_b", "p_ts_s_b")

    neg = lambda df, col: df.withColumn(col, (-F.col(col)).cast("bigint"))
    fwd = asof_join(
        neg(clicks, "ts_s"),
        neg(purchases, "ts_s"),
        keys=["user_id"],
        left_ts="ts_s",
        right_ts="ts_s",
        right_cols=["p_id", "p_val", "p_ts_s"],
        suffix="_f",
    ).select("event_id", "p_id_f", "p_val_f", "p_ts_s_f")

    tol = 3600
    j = bwd.join(fwd, "event_id")
    diff_b = F.col("ts_s") - F.col("p_ts_s_b")
    diff_f = F.col("p_ts_s_f") - F.col("ts_s")
    b_ok = F.col("p_id_b").isNotNull() & (diff_b <= tol)
    f_ok = F.col("p_id_f").isNotNull() & (diff_f <= tol)
    use_b = b_ok & (~f_ok | (diff_b <= diff_f))
    use_f = f_ok & ~use_b
    return (
        j.select(
            "event_id",
            "user_id",
            "ts",
            F.when(use_b, F.col("p_id_b"))
            .when(use_f, F.col("p_id_f"))
            .alias("nearest_event_id"),
            F.round(
                F.when(use_b, F.col("p_val_b")).when(use_f, F.col("p_val_f")), 2
            ).alias("nearest_value"),
            F.when(use_b, diff_b).when(use_f, diff_f).cast("bigint").alias("diff_s"),
            F.when(use_b & (diff_b == 0), F.lit("exact"))
            .when(use_b, F.lit("before"))
            .when(use_f & (diff_f == 0), F.lit("exact"))
            .when(use_f, F.lit("after"))
            .alias("direction"),
        )
        .orderBy("event_id")
    )
