"""REST-source materialization, SQL client facade, stream multiplexing."""

import io
import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.sources.rest import (
    LocalSQLClient,
    dataframe_from_arrow_chunks,
    dataframe_from_pages,
    dataframe_from_records,
)
from lakehouse_tacklebox_spark.streaming.multiplex import multiplex_to_paths

SF_DIR = "/root/testdata/sf0.001"


def test_records_and_pages(spark):
    recs = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    assert dataframe_from_records(spark, recs).count() == 2

    pages = {None: ([{"id": 1}], "t1"), "t1": ([{"id": 2}, {"id": 3}], "t2"), "t2": ([], None)}
    df = dataframe_from_pages(spark, lambda tok: pages[tok], schema="id bigint")
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]

    looping = lambda tok: ([{"id": 0}], "again")  # noqa: E731
    with pytest.raises(RuntimeError):
        dataframe_from_pages(spark, looping, schema="id bigint", max_pages=5)


def test_arrow_chunks(spark):
    def chunk(lo, hi):
        table = pa.table({"x": list(range(lo, hi)), "y": [f"v{i}" for i in range(lo, hi)]})
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
        return sink.getvalue()

    df = dataframe_from_arrow_chunks(spark, [chunk(0, 5), chunk(5, 9)])
    assert df.count() == 9
    assert df.agg(F.sum("x")).collect()[0][0] == sum(range(9))


def test_local_sql_client_facade(spark):
    c = LocalSQLClient(spark)
    assert c.sql("SELECT 1 AS v").collect()[0].v == 1
    c.sql_no_results("SELECT 2")
    statuses = c.submit_multiple_sql_commands(
        "CREATE OR REPLACE TEMP VIEW t_facade AS SELECT 5 AS v; SELECT * FROM t_facade; SELECT * FROM missing_xyz"
    )
    assert [s["status"] for s in statuses] == ["SUCCEEDED", "SUCCEEDED", "FAILED"]
    last = c.submit_multiple_sql_commands_last_results(
        "CREATE OR REPLACE TEMP VIEW t_facade2 AS SELECT 7 AS v; SELECT v * 2 AS w FROM t_facade2"
    )
    assert last.collect()[0].w == 14


def test_multiplex_fans_out_one_scan(spark, tmp_path):
    events = load_tables(spark, SF_DIR, ["events"])["events"]
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    targets = {v: str(tmp_path / f"out_{v}") for v in ("click", "view")}
    q = multiplex_to_paths(
        stream,
        "event_type",
        targets,
        checkpoint_dir=str(tmp_path / "ckpt"),
        default_path=str(tmp_path / "out_other"),
    )
    q.awaitTermination(120)

    n_click = spark.read.parquet(targets["click"]).count()
    n_view = spark.read.parquet(targets["view"]).count()
    n_other = spark.read.parquet(str(tmp_path / "out_other")).count()
    by_type = {r.event_type: r.n for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert n_click == by_type["click"] and n_view == by_type["view"]
    assert n_other == sum(v for k, v in by_type.items() if k not in ("click", "view"))
    # split column dropped from per-target outputs
    assert "event_type" not in spark.read.parquet(targets["click"]).columns
