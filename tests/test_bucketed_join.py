"""Bucketed co-located joins: the shuffle-free fact-to-fact join path.

At 100 TB the recurring lineitem↔orders join is the dominant shuffle.
Bucketing both tables by the join key at WRITE time (bucketBy → sorted
buckets) lets every subsequent join run bucket-to-bucket with NO
exchange on either side — the cluster-scale answer to "this join runs
every hour, stop shuffling 100 TB for it". These tests pin that the
plan actually degrades to zero Exchanges, not just that results match.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.sources import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse.dir is a static conf — bucketed tables land in the
    # session's default warehouse and are dropped on teardown
    t = load_tables(spark, SF_DIR, ["lineitem", "orders"])
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df, key in (
        ("li_b", t["lineitem"], "l_orderkey"),
        ("ord_b", t["orders"], "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a stale location from a crashed prior session blocks saveAsTable
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    yield t
    for name in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan(df) -> str:
    # keep only AQE's final plan — the string repeats the pre-AQE
    # initial plan below it, which would double-count Exchange nodes
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Join on the bucket key: both sides scan their buckets directly —
    zero Exchange nodes feeding the join (the unbucketed same join
    shuffles both sides). Broadcast is disabled for the check: at gate
    SF the dim fits a broadcast, which would test the wrong plan — the
    bucketed path is for when BOTH sides are fact-sized."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_b")
        o = spark.table("ord_b")
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        joined.collect()  # finalize the AQE plan
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # only the post-join aggregate's exchange may appear (5 groups);
        # the join inputs come straight from bucket scans
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, f"bucketed join still shuffles: {n_exchanges} exchanges\n{plan}"
        assert "SelectedBucketsCount" in plan
        # and the unbucketed baseline DOES shuffle both join inputs
        t = bucketed
        base = (
            t["lineitem"]
            .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        base.collect()
        base_exchanges = _plan(base).count("Exchange hashpartitioning")
        assert base_exchanges >= 2, "baseline should shuffle join inputs"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_results_match_unbucketed(spark, bucketed):
    li = spark.table("li_b")
    o = spark.table("ord_b")
    got = {
        (r["o_orderpriority"], r["n"])
        for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t = bucketed
    want = {
        (r["o_orderpriority"], r["n"])
        for r in t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_bucketed_groupby_on_bucket_key_skips_exchange(spark, bucketed):
    """Aggregation keyed on the bucket column also rides the bucketing:
    no pre-agg exchange (map-side output is already key-partitioned)."""
    li = spark.table("li_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(agg)
    assert plan.count("Exchange hashpartitioning") == 0, plan
