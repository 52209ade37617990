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
from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.streaming.windows import windowed_agg


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
    ev = load_tables(spark, sf_dir, ["events"])["events"]  # sets nanos/UTC confs
    # raw parquet carries ts as TIMESTAMP(NANOS) → long under nanosAsLong;
    # the stream schema must match the raw layout, then convert like batch
    from pyspark.sql.types import LongType, StructField, StructType

    raw_schema = StructType(
        [StructField("ts", LongType()) if f.name == "ts" else f for f in ev.schema.fields]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    rolled = windowed_agg(
        stream,
        "ts",
        "1 hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
        keys=["event_type"],
        watermark="1 minute",
    )
    sink = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        rolled.select("window_start", "event_type", "n", "total")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)
