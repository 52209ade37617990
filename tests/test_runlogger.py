"""RunLogger lifecycle, watermarks, stale cleanup, incremental batches."""

import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.observability import RunLogger
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def logger(spark, tmp_path):
    return RunLogger(spark, str(tmp_path / "runlog"))


def test_run_lifecycle(spark, logger):
    r1 = logger.start_run("pipe_a", metadata={"k": "v"})
    assert r1 == 1
    logger.complete_run(r1)
    r2 = logger.start_run("pipe_a")
    assert r2 == 2
    logger.fail_run(r2, "boom")
    rows = {r.run_id: r for r in logger.runs("pipe_a").collect()}
    assert rows[1].status == "SUCCESS" and rows[1].duration_s >= 0
    assert rows[2].status == "FAILED" and "boom" in rows[2].metadata
    assert logger.most_recent_run("pipe_a").run_id == 2


def test_stale_cleanup(spark, logger):
    r = logger.start_run("pipe_b")
    logger.cleanup_stale_runs(max_age_s=3600)  # too recent: untouched
    assert logger.most_recent_run("pipe_b").status == "RUNNING"
    logger.cleanup_stale_runs(max_age_s=0.0)
    assert logger.most_recent_run("pipe_b").status == "STALE"
    assert r == 1


def test_incremental_watermark_batches(spark, logger, tmp_path):
    events = load_tables(spark, SF_DIR, ["events"])["events"]
    seen = []

    def process(df):
        seen.append(df.count())

    # first batch: no watermark -> everything
    logger.run_incremental(events, "ts", "ingest", process)
    assert seen[0] == events.count()
    wm = logger.last_successful_watermark("ingest")
    assert wm is not None
    # second batch: nothing new
    logger.run_incremental(events, "ts", "ingest", process)
    assert seen[1] == 0
    # watermark survives an empty batch
    assert logger.last_successful_watermark("ingest") == wm
    # failure logs FAILED and keeps watermark
    with pytest.raises(RuntimeError):
        logger.run_incremental(events, "ts", "ingest", lambda df: (_ for _ in ()).throw(RuntimeError("x")))
    assert logger.most_recent_run("ingest").status == "FAILED"
    assert logger.last_successful_watermark("ingest") == wm


def test_incremental_predicate_reaches_scan(spark, logger):
    events = load_tables(spark, SF_DIR, ["events"])["events"]
    logger.run_incremental(events, "ts", "probe", lambda df: None)
    plan = logger.incremental_frame(events, "ts", "probe")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "Filter" in plan
