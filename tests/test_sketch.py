"""Misra-Gries heavy hitters: the no-false-negative guarantee under
aggressive compression (capacity far below distinct count), and
exactness of the verified answer."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators.sketch import heavy_hitters_exact


def test_mg_matches_exact_groupby_under_heavy_compression(spark):
    # Zipf-ish synthetic stream: key k appears 2000//(k+1) times,
    # 200 distinct keys, capacity only 8 — the bulk-decrement path runs
    # constantly, and the threshold N/9 keeps just the head keys
    rows = [(f"k{k:03d}",) for k in range(200) for _ in range(2000 // (k + 1))]
    df = spark.createDataFrame(rows, ["w"]).repartition(16)
    got = heavy_hitters_exact(df, "w", capacity=8).collect()

    exact = (
        df.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_total = sum(r["n"] for r in exact)
    want = sorted(
        ((r["w"], r["n"]) for r in exact if r["n"] * 9 > n_total),
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r["w"], r["n"]) for r in got] == want
    assert want, "test distribution must produce a non-empty head"
    assert len(want) < 200, "threshold must exclude the tail"


def test_mg_empty_and_all_light_inputs(spark):
    empty = spark.createDataFrame([], "w string")
    assert heavy_hitters_exact(empty, "w", capacity=4).collect() == []
    # uniform distribution where nothing qualifies: 40 keys x 5, N=200,
    # threshold 200/5=40 > 5 — result must be empty, not "top keys"
    rows = [(f"u{k}",) for k in range(40) for _ in range(5)]
    df = spark.createDataFrame(rows, ["w"]).repartition(8)
    assert heavy_hitters_exact(df, "w", capacity=4).collect() == []


def test_skew_advisor_discriminates_and_prices_salt(spark):
    from lakehouse_tacklebox_spark.plans.profiler import skew_advisor

    # hot: one key with 50% of rows over a uniform tail; cold: uniform
    rows = [(("HOT" if i % 2 == 0 else f"t{i % 20}"), i % 64) for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "u"]).repartition(8)
    got = skew_advisor(df, ["k", "u"], capacity=10, target_share_ppm=31250)
    out = got.collect()
    # u is uniform (64 keys x ~1.6% each < 1/11) — contributes nothing
    assert all(r["column"] == "k" for r in out)
    hot = [r for r in out if r["skew_key"] == "HOT"]
    assert len(hot) == 1
    # exact integer arithmetic: 2000/4000 -> 500000 ppm -> ceil(/31250)=16
    assert hot[0]["n"] == 2000
    assert hot[0]["share_ppm"] == 500_000
    assert hot[0]["salt_factor"] == 16
    # heaviest first
    assert out[0]["skew_key"] == "HOT"


def test_mg_native_key_types_survive_the_sketch(spark):
    # bigint keys exercise the non-string schema path (the sentinel None
    # must not collapse the Arrow column to float64)
    rows = [(7,)] * 50 + [(k,) for k in range(20) for _ in range(2)]
    df = spark.createDataFrame(rows, "w long").repartition(4)
    got = heavy_hitters_exact(df, "w", capacity=5).collect()
    assert [(r["w"], r["n"]) for r in got] == [(7, 50 + 2)]


def test_mg_merge_preserves_heavy_keys_across_arbitrary_merge_trees():
    from lakehouse_tacklebox_spark.operators.sketch import mg_merge

    # 40% heavy key spread thinly across 20 chunk summaries, uniform
    # noise keys differing per chunk — merge pairwise then fold, with
    # capacity 6 forcing compression at every step
    import collections
    chunks = []
    truth = collections.Counter()
    for i in range(20):
        c = {"HEAVY": 40, f"a{i}": 12, f"b{i}": 12, f"c{i}": 12,
             f"d{i}": 12, f"e{i}": 12}
        truth.update(c)
        chunks.append(c)
    n = sum(truth.values())
    # fold left with re-compression each step (a worst-case merge tree)
    acc = {}
    for c in chunks:
        acc = mg_merge([acc, c], capacity=6)
    # the mergeable-MG bound: undercount <= n/(m+1); HEAVY holds 40/100
    # of the stream so it MUST survive with positive count
    assert truth["HEAVY"] * 7 > n
    assert "HEAVY" in acc and acc["HEAVY"] > 0
    assert truth["HEAVY"] - acc["HEAVY"] <= n // 7
    assert len(acc) <= 6


def test_skew_advisor_and_join_size_empty_edges(spark):
    from lakehouse_tacklebox_spark.plans.profiler import (
        functional_deps,
        join_size_estimate,
        skew_advisor,
    )

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    assert skew_advisor(df, []).collect() == []
    # functional_deps([]) mirrors the same contract (ADVICE r7): a typed
    # empty frame, not an IndexError
    fd = functional_deps([])
    assert fd.collect() == []
    assert fd.columns == [
        "table_name", "determinant", "dependent", "n_det", "n_pair", "holds", "violations",
    ]
    # disjoint key spaces: TOTAL row must be zeros, not nulls
    left = spark.createDataFrame([("a",)], "k string")
    right = spark.createDataFrame([("b",)], "k string")
    got = join_size_estimate(left, right, "k").collect()
    assert [(r["join_key"], r["left_rows"], r["right_rows"], r["est_rows"]) for r in got] == [
        ("*TOTAL*", 0, 0, 0)
    ]


def test_mg_mv_fold_exactly_once_across_restart_and_replay(spark, tmp_path):
    """The streaming sketch-MV fold (stream_heavy_hitters_mv's shape)
    must survive a stop/restart on the same checkpoint AND a zombie
    re-application of an already-committed epoch: the final candidate
    re-count equals the exact one-shot HAVING answer either way."""
    import os

    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators.sketch import (
        _mg_partition_summary,
        mg_merge,
    )
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    capacity = 5
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    # HEAVY holds ~40% of the stream; noise keys differ per wave
    wave1 = [("HEAVY " * 10 + "x1 y1 z1").strip()]
    wave2 = [("HEAVY " * 10 + "x2 y2 z2").strip(), "a b c d e f"]
    spark.createDataFrame([(t,) for t in wave1], "text string").write.parquet(
        str(src / "w1")
    )

    TackleTable.create(spark, state_dir, schema="w string, mg_count bigint, is_total int")

    def _fold(batch_df, epoch):
        s = batch_df.sparkSession
        table = TackleTable(s, state_dir)
        if table.txn_version("fold") >= epoch:
            return
        toks = batch_df.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        summ = toks.mapInPandas(
            _mg_partition_summary("w", capacity), schema="w string, mg_count long, is_total int"
        ).collect()
        prev = TackleTable(s, state_dir).read().collect()
        n_total = sum(r["mg_count"] for r in prev + summ if r["is_total"] == 1)
        counters = mg_merge(
            [{r["w"]: r["mg_count"]} for r in prev + summ if r["is_total"] == 0], capacity
        )
        new_state = s.createDataFrame(
            [(k, int(c), 0) for k, c in sorted(counters.items())] + [("", int(n_total), 1)],
            "w string, mg_count bigint, is_total int",
        )
        table.overwrite(new_state, txn=("fold", epoch))

    def _drain(path_root):
        schema = spark.read.parquet(*[str(p) for p in src.iterdir()]).schema
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path_root) + "/*")
            .writeStream.foreachBatch(_fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    _drain(src)  # run 1: wave-1 only
    v_after_run1 = TackleTable(spark, state_dir).version()
    spark.createDataFrame([(t,) for t in wave2], "text string").write.parquet(
        str(src / "w2")
    )
    _drain(src)  # run 2, same checkpoint: only the new files fold

    table = TackleTable(spark, state_dir)
    # zombie replay of the last committed epoch: state must not move
    last_epoch = table.txn_version("fold")
    docs_all = spark.read.parquet(*[str(p) for p in src.iterdir()])
    v_before = table.version()
    _fold(docs_all, last_epoch)  # replays with an already-committed stamp
    assert table.version() == v_before

    state = table.read()
    n_total = state.filter(F.col("is_total") == 1).agg(F.sum("mg_count")).collect()[0][0]
    toks = docs_all.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
    assert n_total == toks.count()
    candidates = [r["w"] for r in state.filter(F.col("is_total") == 0).collect()]
    exact = {
        r["w"]: r["n"]
        for r in toks.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    heavy = {w for w, n in exact.items() if n * (capacity + 1) > n_total}
    assert heavy == {"heavy"}
    assert heavy <= set(candidates)  # pigeonhole: no qualifying key lost
