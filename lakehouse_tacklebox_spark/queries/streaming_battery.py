"""Streaming battery entries: real Structured Streaming jobs whose final
result is oracle-comparable against the batch equivalent.

Each query starts a stream over the (read-only) testdata parquet via
``readStream`` + ``pathGlobFilter``, runs it to completion with
``trigger(availableNow=True)`` into a memory sink, and returns the sink
table — so the driver's correctness gate checks that the streaming
rollup equals DuckDB's batch answer exactly (the unified-batch-and-
streaming claim, Step 5 of the reference's EDW series, as a verifiable
statement).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables, normalize_event_ts
from lakehouse_tacklebox_spark.streaming.windows import windowed_agg


def _run_memory_sink(spark, df, mode, prefix, shuffle_partitions=16):
    """Run a streaming DF to completion into a memory sink.

    State-store partition count follows ``spark.sql.shuffle.partitions``
    at query start — a per-job sizing decision in any real deployment
    (match partitions to key cardinality/throughput, not the session
    default). The gate corpus has O(100) keys, so a vanilla 200-partition
    session would spend its time opening 200 state stores; size down for
    the stream, then restore the session conf.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
        q = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)


@register(
    "stream_hourly_rollup",
    tags=("streaming", "window"),
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_hourly_rollup(spark, sf_dir):
    """Event-time tumbling-window rollup executed AS A STREAM (availableNow
    → memory sink), returned for batch comparison: streaming and batch
    answers must be identical."""
    stream = _events_stream(spark, sf_dir)
    rolled = windowed_agg(
        stream,
        "ts",
        "1 hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
        keys=["event_type"],
        watermark="1 minute",
    )
    return _run_memory_sink(
        spark,
        rolled.select("window_start", "event_type", "n", "total"),
        "complete",
        "stream_rollup",
    )


def _events_stream(spark, sf_dir):
    """Streaming read of events.parquet with the same ts normalization as
    the batch path. The stream schema must match the RAW parquet layout
    (nanos→long under nanosAsLong, or micros→TIMESTAMP_NTZ), so take it
    from a batch scan of the same file, then normalize."""
    import os

    load_tables(spark, sf_dir, [])  # sets nanos/UTC confs only
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(stream)


@register(
    "stream_stateful_dedup",
    tags=("streaming", "stateful", "dedup"),
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (
        SELECT user_id, event_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def stream_stateful_dedup(spark, sf_dir):
    """First event per user via the applyInPandasWithState dedup operator,
    executed as a real stream: per-key state answers "seen before?"
    without rescanning the sink (the scale path for ingest dedup — state
    lives with the shuffle partition, not in a merge target). The batch
    oracle is the row_number()=1 window, so the stateful answer must
    equal the relational one exactly."""
    from lakehouse_tacklebox_spark.streaming.stateful import stateful_dedup

    stream = _events_stream(spark, sf_dir).select("user_id", "event_id", "ts", "event_type")
    out = stateful_dedup(stream, keys=["user_id"], order_by=["ts", "event_id"])
    return _run_memory_sink(spark, out, "append", "stateful_dedup")


@register(
    "stream_stateful_user_stats",
    tags=("streaming", "stateful", "agg"),
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark, sf_dir):
    """Cumulative per-user running totals via the stateful running-agg
    operator. Money is pre-scaled to integer cents JVM-side so the
    pandas-side accumulation is exact (int64 in float64 ≤ 2^53), then
    cast back — the streaming total must equal DuckDB's batch SUM."""
    from lakehouse_tacklebox_spark.streaming.stateful import stateful_running_agg

    stream = _events_stream(spark, sf_dir).select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    out = stateful_running_agg(stream, keys=["user_id"], value_col="cents")
    sink = _run_memory_sink(spark, out, "update", "stateful_stats")
    # The memory sink APPENDS update-mode emissions, so a key that appears
    # in k micro-batches has k rows (k-1 intermediate running totals + the
    # final one). Keep only the final emission per key — n_events is
    # strictly increasing within a key — so the result is identical no
    # matter how the source was split into batches.
    latest = sink.groupBy("user_id").agg(F.max(F.struct("n_events", "total")).alias("s"))
    return latest.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.total").cast("long").alias("total_cents"),
    )


@register(
    "stream_stream_join",
    tags=("streaming", "join"),
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_seconds
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream interval join (attribution: purchases within 30
    minutes of a click by the same user), executed as a REAL stream on
    both sides. Each side carries an event-time watermark and the join
    condition bounds purchase time to [click, click + 30 min], so Spark
    can expire join state — the only formulation that runs unbounded at
    scale (state size is O(events inside the watermark horizon), not
    O(stream)). The batch oracle is the plain interval self-join; the
    streamed answer must match it exactly."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "31 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias("lag_seconds"),
    )
    return _run_memory_sink(spark, joined, "append", "ss_join")


@register(
    "stream_session_window",
    tags=("streaming", "window", "session"),
    oracle="""
    WITH e AS (
        SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), marked AS (
        SELECT user_id, ts, cents,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts, cents,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM numbered GROUP BY user_id, sid
    """,
)
def stream_session_window(spark, sf_dir):
    """Gap-based session windows (30-minute inactivity gap) computed BY
    THE STREAMING ENGINE — ``session_window`` state merges adjacent
    events as micro-batches arrive — and compared exactly against the
    batch gaps-and-islands formulation (lag → cumulative session id).
    Session end is last-event + gap (half-open), so an event at exactly
    the gap boundary opens a new session on both sides."""
    from lakehouse_tacklebox_spark.streaming.windows import sessionized_agg

    stream = _events_stream(spark, sf_dir).select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    out = sessionized_agg(
        stream,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        ],
        watermark=None,  # complete mode keeps all session state; no eviction
    )
    sunk = _run_memory_sink(
        spark,
        out.select("session_start", "session_end", "user_id", "n_events", "total_cents"),
        "complete",
        "session_win",
    )
    return sunk
