"""Event-time windows: streaming results must equal the batch rollup."""

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.streaming.windows import sessionized_agg, windowed_agg

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_tables(spark, SF_DIR, ["events"])["events"]


def test_windowed_agg_batch(spark):
    ev = _events(spark)
    out = windowed_agg(
        ev,
        "ts",
        "1 hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
        keys=["event_type"],
    )
    rows = out.collect()
    assert rows and set(out.columns) == {"window_start", "window_end", "event_type", "n", "total"}
    assert sum(r.n for r in rows) == ev.count()
    # hourly buckets: every window is exactly one hour
    assert all((r.window_end - r.window_start).total_seconds() == 3600 for r in rows)


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(src)
    assert stream.isStreaming

    out = windowed_agg(
        stream,
        "ts",
        "1 hour",
        aggs=[F.count(F.lit(1)).alias("n")],
        keys=["event_type"],
        watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.table("win_counts").collect()
    }
    expect = {
        (r.window_start, r.event_type): r.n
        for r in windowed_agg(ev, "ts", "1 hour", aggs=[F.count(F.lit(1)).alias("n")], keys=["event_type"]).collect()
    }
    assert got == expect


def test_stream_static_join(spark, tmp_path):
    """J10: streaming fact joined with a static (broadcast) dimension."""
    ev = _events(spark)
    src = str(tmp_path / "src_j10")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    dim = spark.createDataFrame(
        [(t, t.upper()) for t in ("click", "view", "purchase", "signup", "error")],
        "event_type string, label string",
    )
    joined = stream.join(F.broadcast(dim), "event_type").groupBy("label").count()
    q = joined.writeStream.format("memory").queryName("j10").outputMode("complete").trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {r.label: r["count"] for r in spark.table("j10").collect()}
    expect = {r.event_type.upper(): r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got == expect


def test_sessionized_agg_batch(spark):
    ev = _events(spark)
    out = sessionized_agg(ev, "ts", "30 minutes", keys=["user_id"], aggs=[F.count(F.lit(1)).alias("n")])
    rows = out.collect()
    assert rows
    # sessions are disjoint per user and cover all events
    assert sum(r.n for r in rows) == ev.count()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in per_user.values():
        spans.sort()
        assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))
