"""Streaming layer tests: APPLY CHANGES (SCD1/SCD2), file-stream ingest
with rescue, stream→table sink, and the metrics listener.

The SCD2 incremental path is checked against the batch oracle
(operators.scd.scd2_from_changes over the full change set), per the
strategy in SURVEY §7 step 6.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators.scd import scd2_from_changes
from lakehouse_tacklebox_spark.streaming import (
    StreamMetricsCollector,
    apply_changes,
    apply_changes_batch,
    file_stream,
    stream_to_table,
)
from lakehouse_tacklebox_spark.tablestore import TackleTable

CHANGE_SCHEMA = "id int, name string, seq int, op string"


def _changes(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_apply_changes_scd1_upsert_and_sequence_guard(spark, tmp_path):
    path = str(tmp_path / "t1")
    apply_changes_batch(
        path,
        _changes(spark, [(1, "a", 10, "u"), (2, "b", 10, "u")]),
        keys=["id"],
        sequence_by="seq",
    )
    # batch 2: newer update for 1, OLDER (late) update for 2 → must not win
    apply_changes_batch(
        path,
        _changes(spark, [(1, "a2", 20, "u"), (2, "stale", 5, "u"), (3, "c", 1, "u")]),
        keys=["id"],
        sequence_by="seq",
    )
    got = {
        r["id"]: r["name"]
        for r in TackleTable(spark, path).read().collect()
    }
    assert got == {1: "a2", 2: "b", 3: "c"}


def test_apply_changes_scd1_delete_and_intrabatch_dedup(spark, tmp_path):
    path = str(tmp_path / "t2")
    apply_changes_batch(
        path,
        _changes(spark, [(1, "a", 1, "u"), (2, "b", 1, "u")]),
        keys=["id"],
        sequence_by="seq",
    )
    # one batch carrying two changes for id=1 (dedup → seq 3 wins) and a
    # delete for id=2; delete for unknown id=9 is a no-op
    apply_changes_batch(
        path,
        _changes(
            spark,
            [(1, "mid", 2, "u"), (1, "final", 3, "u"), (2, None, 2, "d"), (9, None, 2, "d")],
        ),
        keys=["id"],
        sequence_by="seq",
        apply_as_delete_when="op = 'd'",
    )
    rows = TackleTable(spark, path).read().collect()
    assert {(r["id"], r["name"]) for r in rows} == {(1, "final")}


def test_apply_changes_scd2_late_event_splits_interval(spark, tmp_path):
    path = str(tmp_path / "t3")
    b1 = [(1, "v1", 10, "u"), (1, "v3", 30, "u")]
    b2 = [(1, "v2", 20, "u")]  # late: lands inside [10, 30)
    apply_changes_batch(path, _changes(spark, b1), keys=["id"], sequence_by="seq", scd_type=2)
    apply_changes_batch(path, _changes(spark, b2), keys=["id"], sequence_by="seq", scd_type=2)

    got = (
        TackleTable(spark, path)
        .read()
        .select("id", "name", "__valid_from", "__valid_to", "__is_current")
        .sort("__valid_from")
        .collect()
    )
    assert [(r["name"], r["__valid_from"], r["__valid_to"], r["__is_current"]) for r in got] == [
        ("v1", 10, 20, False),
        ("v2", 20, 30, False),
        ("v3", 30, None, True),
    ]

    # full-history batch oracle agrees
    oracle = scd2_from_changes(
        _changes(spark, b1 + b2).withColumn("__deleted", F.lit(False)),
        keys=["id"],
        sequence_col="seq",
        tiebreaker="seq",
    )
    assert sorted(
        (r["name"], r["__valid_from"], r["__valid_to"]) for r in oracle.collect()
    ) == sorted((r["name"], r["__valid_from"], r["__valid_to"]) for r in got)


def test_apply_changes_scd2_tombstone_closes_history(spark, tmp_path):
    path = str(tmp_path / "t4")
    apply_changes_batch(
        path,
        _changes(spark, [(1, "v1", 10, "u"), (1, None, 20, "d")]),
        keys=["id"],
        sequence_by="seq",
        apply_as_delete_when="op = 'd'",
        scd_type=2,
    )
    rows = TackleTable(spark, path).read().sort("__valid_from").collect()
    # v1 closed at 20; the tombstone row exists but is not current
    assert [(r["name"], r["__valid_to"], r["__is_current"]) for r in rows] == [
        ("v1", 20, False),
        (None, None, False),
    ]
    assert [r for r in rows if r["__is_current"]] == []


def test_apply_changes_streaming_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for row in [
            {"id": 1, "name": "a", "seq": 1, "op": "u"},
            {"id": 2, "name": "b", "seq": 1, "op": "u"},
        ]:
            f.write(json.dumps(row) + "\n")

    table = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    stream = file_stream(spark, str(src), CHANGE_SCHEMA, fmt="json")
    q = apply_changes(stream, table, ckpt, keys=["id"], sequence_by="seq")
    q.awaitTermination(60)

    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"id": 1, "name": "a2", "seq": 2, "op": "u"}) + "\n")
    q2 = apply_changes(
        file_stream(spark, str(src), CHANGE_SCHEMA, fmt="json"),
        table,
        ckpt,
        keys=["id"],
        sequence_by="seq",
    )
    q2.awaitTermination(60)  # checkpoint: b1 not reprocessed

    got = {r["id"]: r["name"] for r in TackleTable(spark, table).read().collect()}
    assert got == {1: "a2", 2: "b"}


def test_file_stream_rescue_column(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "d.json", "w") as f:
        f.write(json.dumps({"id": 1, "name": "x"}) + "\n")
        f.write(json.dumps({"id": 2, "name": "y", "extra": "kept"}) + "\n")

    table = str(tmp_path / "tgt")
    df = file_stream(spark, str(src), "id int, name string", fmt="json", rescue=True)
    q = stream_to_table(df, table, str(tmp_path / "ck"))
    q.awaitTermination(60)
    rows = {r["id"]: r["_rescued_data"] for r in TackleTable(spark, table).read().collect()}
    assert rows[1] is None
    assert json.loads(rows[2]) == {"extra": "kept"}


def test_stream_to_table_and_metrics_listener(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(100):
            f.write(json.dumps({"id": i, "name": f"n{i}"}) + "\n")

    collector = StreamMetricsCollector()
    spark.streams.addListener(collector)
    try:
        df = file_stream(spark, str(src), "id int, name string", fmt="json")
        q = stream_to_table(df, str(tmp_path / "tgt"), str(tmp_path / "ck"))
        q.processAllAvailable()
        progress = list(q.recentProgress)
        q.awaitTermination(60)
        # listener events are delivered asynchronously; under a loaded
        # machine (full-suite run) delivery can lag arbitrarily
        import time

        deadline = time.monotonic() + 30
        while not collector.events and time.monotonic() < deadline:
            time.sleep(0.5)
        # Merge pull-mode progress UNCONDITIONALLY: the async bus may have
        # delivered only a subset (e.g. just the zero-row trailing batch).
        # ingest_progress dedupes on (runId, batchId), so listener-delivered
        # and pulled events never double-count.
        for p in progress:
            collector.ingest_progress(json.loads(p.json) if hasattr(p, "json") else p)
    finally:
        spark.streams.removeListener(collector)

    assert TackleTable(spark, str(tmp_path / "tgt")).read().count() == 100
    assert collector.events, "listener captured no progress events"
    mdf = collector.to_df(spark)
    assert mdf.agg(F.sum("num_input_rows")).first()[0] >= 100
    assert collector.summary(spark).count() >= 1


def test_ann_delete_occupancy_dial_margin(spark):
    """Pin the cdc_ann_index_deletes rebalance dial's safety margin.

    The entry's oracle hard-pins rebalance_triggered=1 from MEASURED
    occupancy on the gate corpus; if the driver regenerates testdata and
    the post-delete max/mean occupancy drifts under the dial, that pin
    flips and the drive goes red with no local signal. This test measures
    the same statistic the entry measures (coarse quantizer trained on the
    FULL sf0.01 embeddings, occupancy counted over the forget-list
    survivors) and asserts the documented >=3.7% margin over the dial — a
    regeneration flake fails HERE first, with instructions (ADVICE r9)."""
    from lakehouse_tacklebox_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
        unit_normalize,
    )
    from lakehouse_tacklebox_spark.queries.streaming_battery import (
        _ANN_DEL_CENTROIDS,
        _ANN_DEL_DIAL_PPM,
    )
    from lakehouse_tacklebox_spark.sources.catalog import load_tables

    sf_dir = "/root/testdata/sf0.01"
    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"].select(
        "vec_id", "embedding"
    )
    cu = unit_normalize(e).localCheckpoint(eager=False)
    # iters=1 mirrors the entry (maintenance-semantics certification dial)
    coarse = kmeans_centroids(cu, k=_ANN_DEL_CENTROIDS, iters=1)
    survivors = cu.filter(F.col("vec_id") % 7 != 3)
    occ = [
        r["n"]
        for r in ivf_assign(survivors, coarse, nprobe=1)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    ratio_ppm = max(occ) * _ANN_DEL_CENTROIDS * 1_000_000 // sum(occ)
    assert ratio_ppm > _ANN_DEL_DIAL_PPM, (
        f"occupancy ratio {ratio_ppm} ppm no longer exceeds the "
        f"{_ANN_DEL_DIAL_PPM} dial — cdc_ann_index_deletes' pinned "
        "rebalance_triggered=1 would go red; re-measure and lower the dial."
    )
    margin = (ratio_ppm - _ANN_DEL_DIAL_PPM) / _ANN_DEL_DIAL_PPM
    assert margin >= 0.037, (
        f"dial margin {margin:.4f} < 0.037 — testdata regeneration has "
        "eroded the documented safety margin; re-measure occupancy and "
        "re-pick _ANN_DEL_DIAL_PPM before the drive flakes."
    )
