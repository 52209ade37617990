"""Benchmark runner + replay: concurrency, stats, offset fidelity."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.benchmark import BenchmarkRunner, replay_with_offsets
from lakehouse_tacklebox_spark.benchmark.replay import with_offsets
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _queries(spark):
    nation = load_tables(spark, SF_DIR, ["nation"])["nation"]
    nation.createOrReplaceTempView("bench_nation")
    return {
        "count": lambda s: s.table("bench_nation"),
        "agg": lambda s: s.table("bench_nation").groupBy("n_regionkey").count(),
        "boom": lambda s: s.table("no_such_table"),
    }


def test_runner_records_success_and_failure(spark):
    r = BenchmarkRunner(spark, _queries(spark), concurrency=3, repetitions=2, warmup=False).run()
    assert len(r.results) == 6
    summary = {row.name: row for row in r.summary_df().collect()}
    assert summary["count"].runs == 2 and summary["count"].failures == 0
    assert summary["boom"].failures == 2
    assert summary["agg"].avg_s > 0
    assert r.qpm() > 0
    # concurrent execution: at least two distinct worker threads used
    assert len({x.thread for x in r.results}) >= 2


def test_replay_respects_offsets(spark):
    ts = lambda s: datetime(2025, 1, 1, 12, 0, s, tzinfo=timezone.utc)  # noqa: E731
    hist = spark.createDataFrame(
        [("SELECT 1 AS x", ts(0), 0.5), ("SELECT 2 AS x", ts(2), 0.5), ("SELECT 3 AS x", ts(1), 0.5)],
        "query_text string, start_ts timestamp, duration_s double",
    )
    offs = with_offsets(hist)
    assert {r.offset_s for r in offs.collect()} == {0.0, 1.0, 2.0}
    out = replay_with_offsets(spark, offs, time_scale=0.2, max_workers=3)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.status == "SUCCESS" for r in rows)
    assert all(r.speedup is not None for r in rows)
