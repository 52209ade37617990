"""End-to-end medallion pipeline (SURVEY.md §7 minimum slice).

raw JSON landing → bronze (COPY INTO, idempotent) → silver (keep-latest
dedup MERGE + expectations with quarantine) → gold (hourly rollup +
moving average) → hash-diff validation, with the whole run watermarked
through RunLogger. Every stage is the engine's own operator — this test
is the composition proof.
"""

import json
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.observability import RunLogger
from lakehouse_tacklebox_spark.operators.dedup import keep_latest
from lakehouse_tacklebox_spark.operators.expectations import Expectations
from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.streaming.windows import windowed_agg
from lakehouse_tacklebox_spark.tablestore.copy_into import copy_into
from lakehouse_tacklebox_spark.tablestore.table import TackleTable
from lakehouse_tacklebox_spark.validation import hash_diff

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def _land_raw(spark, tmp_path):
    """Write events as 3 JSON files, with duplicates (late re-sends that
    carry a higher value) and some bad rows (null event_type)."""
    ev = load_tables(spark, SF_DIR, ["events"])["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    rows = [r.asDict() for r in ev.collect()]
    dupes = [dict(r, value=r["value"] + 1000) for r in rows[:40]]  # newer resend wins
    bad = [dict(rows[i], event_id=10_000 + i, event_type=None) for i in range(5)]
    land = tmp_path / "landing"
    land.mkdir()
    for i, chunk in enumerate([rows[: len(rows) // 2], rows[len(rows) // 2 :] + bad, dupes]):
        with open(land / f"batch_{i}.json", "w") as f:
            for r in chunk:
                r = dict(r, ts=r["ts"].isoformat())
                f.write(json.dumps(r) + "\n")
    return str(land), ev


def test_medallion_pipeline(spark, tmp_path):
    land, ev = _land_raw(spark, tmp_path)
    logger = RunLogger(spark, str(tmp_path / "runlog"))
    run = logger.start_run("medallion")

    # ---- bronze: idempotent file ingest
    bronze = TackleTable.create(spark, str(tmp_path / "bronze"), schema=SCHEMA)
    r1 = copy_into(bronze, land, file_format="json", format_options={"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
                   transform=lambda df: df.select(*[F.col(c[0]).cast(c[1]).alias(c[0]) for c in
                                                    [("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
                                                     ("event_type", "string"), ("value", "double")]]))
    assert r1["numLoadedFiles"] == 3
    assert copy_into(bronze, land, file_format="json")["numLoadedFiles"] == 0  # idempotent

    # ---- silver: expectations + keep-latest dedup merge
    checked = Expectations("silver").expect_or_drop("has_type", "event_type IS NOT NULL").apply(bronze.read())
    latest = keep_latest(checked.df, keys=["event_id"], order_by=["value"])  # resend carries higher value
    silver = TackleTable.create(spark, str(tmp_path / "silver"), latest)
    assert checked.quarantine.count() == 5
    assert silver.read().count() == ev.count()  # dupes collapsed, bad rows gone
    # resends won: the first 40 event_ids carry the +1000 value
    bumped = silver.read().filter("event_id < 40 AND value >= 1000").count()
    assert bumped == 40

    # ---- gold: hourly rollup + 4-bucket moving average
    hourly = windowed_agg(
        silver.read(), "ts", "1 hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    w = Window.orderBy("window_start").rowsBetween(-3, 0)
    gold = hourly.withColumn("total_ma4", F.round(F.avg("total").over(w), 2))
    gold_rows = gold.orderBy("window_start").collect()
    assert sum(r.n for r in gold_rows) == ev.count()
    # moving average equals hand-rolled trailing mean
    totals = [r.total for r in gold_rows]
    for i, r in enumerate(gold_rows):
        lo = max(0, i - 3)
        # 0.011: Spark rounds half-up, Python banker's — off-by-a-cent at .005
        assert abs(r.total_ma4 - round(sum(totals[lo : i + 1]) / (i + 1 - lo), 2)) <= 0.011

    # ---- validate: silver content equals the direct dedup of the source
    expected = keep_latest(
        ev.unionByName(ev.limit(40).withColumn("value", F.col("value") + 1000)),
        keys=["event_id"], order_by=["value"],
    )
    diff = {r.category: r.n for r in hash_diff(silver.read(), expected, keys=["event_id"]).collect()}
    assert diff["mismatched"] == diff["left_only"] == diff["right_only"] == 0
    assert diff["matched"] == ev.count()

    # ---- watermark the run
    wm = silver.read().agg(F.max("ts")).collect()[0][0]
    logger.complete_run(run, watermark=wm)
    assert logger.last_successful_watermark("medallion") == wm
    # next incremental batch over the same source is empty
    assert logger.incremental_frame(silver.read(), "ts", "medallion").count() == 0


def test_schema_diff_reports_drift(spark):
    from lakehouse_tacklebox_spark.validation.datavalidator import schema_diff

    left = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, score double")
    right = spark.createDataFrame([(1, "a", 2)], "id long, name string, score int") \
        .withColumn("extra", F.lit("x"))
    rep = {r.col_name: r for r in schema_diff(left, right).collect()}
    assert rep["id"].status == "match"
    assert rep["name"].status == "match"
    assert rep["score"].status == "type_changed"
    assert rep["score"].left_type == "double" and rep["score"].right_type == "int"
    assert rep["extra"].status == "only_right"
    # symmetric: a column only on the left
    rep2 = {r.col_name: r for r in schema_diff(right, left).collect()}
    assert rep2["extra"].status == "only_left"
