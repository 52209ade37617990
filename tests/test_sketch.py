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
