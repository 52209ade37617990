"""Window-function battery: SURVEY.md §2.5 W1–W6.

Reference parity: ROW_NUMBER keep-latest dedup (Step 1:184-190,
Step 5:259-261), top-N per group (deltaoptimizer.py:1785-1799), moving
average frames (Step 4:20-67), MIN-over-partition baseline offset
(00-Functions.py:413-426), point-in-time snapshot (Step 12:288-316).

All windows partition by a real key (user/customer/brand) so state stays
bounded per partition at scale; the only unpartitioned windows in the
engine run over pre-aggregated frames.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.functions import dmoney, dsum_dbl
from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.operators.dedup import keep_latest
from lakehouse_tacklebox_spark.sources import load_tables


@register(
    "win_dedup_latest",
    tags=("window", "dedup"),
    bench=True,
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def win_dedup_latest(spark, sf_dir):
    """Keep-latest dedup: one row per (user, event_type), latest by ts.

    The reference's core merge-dedup idiom (Step 1:184-190). event_id
    breaks ts ties so the survivor is deterministic.
    """
    e = load_tables(spark, sf_dir, ["events"])["events"]
    return keep_latest(e, keys=["user_id", "event_type"], order_by=["ts", "event_id"]).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )


@register(
    "win_topn_per_group",
    tags=("window", "topk"),
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) WHERE rn <= 2
    """,
)
def win_topn_per_group(spark, sf_dir):
    """Top-2 parts by price per brand (deltaoptimizer.py:1785-1799)."""
    p = load_tables(spark, sf_dir, ["part"])["part"]
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "win_moving_avg",
    tags=("window", "time"),
    bench=True,
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT d, revenue,
           round(avg(revenue) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
    FROM daily
    """,
)
def win_moving_avg(spark, sf_dir):
    """Daily revenue with 7-row moving average (Step 4:20-67 frames).

    The window runs over the aggregated daily frame (≤ a few thousand
    rows regardless of fact size), so the single-partition ordering is
    not a scale hazard.
    """
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("d")).agg(
        dsum_dbl(dmoney("o_totalprice")).alias("revenue")
    )
    w = W.orderBy("d").rowsBetween(-6, 0)
    return daily.select("d", "revenue", F.round(F.avg("revenue").over(w), 2).alias("ma7"))


@register(
    "win_running_sum",
    tags=("window",),
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def win_running_sum(spark, sf_dir):
    """Per-customer running spend + order sequence number."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(dmoney("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, 0)), 2).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "win_baseline_offset",
    tags=("window", "time"),
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(date_diff('second', min(ts) OVER (PARTITION BY user_id), ts) AS BIGINT) AS secs_since_first
    FROM events
    """,
)
def win_baseline_offset(spark, sf_dir):
    """Seconds since each user's first event (00-Functions.py:413-426
    min-over-partition offset baseline)."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    w = W.partitionBy("user_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.min("ts").over(w))).alias("secs_since_first"),
    )


@register(
    "win_lag_gap",
    tags=("window", "time"),
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(date_diff('second',
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
               ts) AS BIGINT) AS gap_secs
    FROM events
    """,
)
def win_lag_gap(spark, sf_dir):
    """Gap to the previous event per user (lag) — sessionization input."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_secs"),
    )


@register(
    "win_sessionize",
    tags=("window", "time", "session"),
    bench=True,
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM gaps
    )
    SELECT user_id, session_no,
           count(*)                                                   AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)      AS duration_secs
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def win_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min timeout): lag → cumulative sum →
    per-session stats. The batch analogue of a session window."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sessions = e.select(
        "user_id",
        "ts",
        F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("session_no"),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("duration_secs"),
    )


@register(
    "win_snapshot_asof",
    tags=("window", "scd"),
    oracle="""
    SELECT o_custkey, o_orderkey AS last_order, o_orderdate AS last_date,
           CAST(round(CAST(o_totalprice AS DECIMAL(14,2)), 2) AS DOUBLE) AS last_price
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
        WHERE o_orderdate <= TIMESTAMP '1999-06-30 00:00:00'
    ) WHERE rn = 1
    """,
)
def win_snapshot_asof(spark, sf_dir):
    """Point-in-time snapshot: each customer's latest order as of a date
    (Step 12:288-316 snapshot pattern)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.filter(F.col("o_orderdate") <= F.lit("1999-06-30").cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_order"),
            F.col("o_orderdate").alias("last_date"),
            dmoney("o_totalprice").cast("double").alias("last_price"),
        )
    )


@register(
    "win_scd2_intervals",
    tags=("window", "scd"),
    oracle="""
    SELECT user_id, value AS state_value, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE event_type = 'signup'
    """,
)
def win_scd2_intervals(spark, sf_dir):
    """Change events → SCD2 validity intervals via lead() — the batch
    form of the reference's SCD2 apply (Step 12:189-236)."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "win_session_dynamic_gap",
    tags=("windows", "session", "dynamic-gap"),
    # The oracle replays Spark's dynamic-gap merge rule relationally:
    # an event joins the open session iff ts < the running MAX of
    # (member ts + member gap) — a plain max-over-preceding-rows
    # islands computation — and session_end is the island's max end.
    # Same-timestamp ties are order-safe: a tied event always lands in
    # the earlier event's session (gap > 0), and max-end/island
    # boundaries don't depend on tie order.
    oracle="""
    WITH e AS (
        SELECT user_id, ts,
               CASE WHEN event_type = 'purchase' THEN INTERVAL 30 MINUTE
                    WHEN event_type = 'click' THEN INTERVAL 10 MINUTE
                    ELSE INTERVAL 5 MINUTE END AS gap
        FROM events
    ),
    m AS (
        SELECT user_id, ts, ts + gap AS e_end,
               max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM e
    ),
    i AS (
        SELECT user_id, ts, e_end,
               sum(CASE WHEN prev_max IS NULL OR ts >= prev_max THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m
    )
    SELECT user_id, min(ts) AS session_start, max(e_end) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM i GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def win_session_dynamic_gap(spark, sf_dir):
    """Sessionization with a PER-EVENT gap via Spark's native
    ``session_window(ts, gap_expr)`` — the idle timeout depends on what
    the user just did (a purchase holds the session open 30 min, a
    click 10, anything else 5), the formulation engagement analytics
    actually needs and the one the fixed-gap rewrite can't express.
    Spark merges overlapping per-event windows, so session_end is the
    running max of member ends; the oracle derives the identical
    islands relationally. Complements the fixed-gap trio
    (win_sessionize batch rewrite, stream_session_window streaming,
    stateful sessionizer) as the native dynamic-gap API surface.
    Scale: one shuffle on user_id, state bounded per key — identical
    physique to fixed-gap session windows."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("30 minutes"))
        .when(F.col("event_type") == "click", F.lit("10 minutes"))
        .otherwise(F.lit("5 minutes"))
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
