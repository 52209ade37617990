"""Expectations: warn/drop/fail semantics, single-pass observe metrics."""

import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators.expectations import ExpectationFailed, Expectations
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_drop_and_warn_with_metrics(spark):
    cust = load_tables(spark, SF_DIR, ["customer"])["customer"]
    checked = (
        Expectations("cust_quality")
        .expect_or_drop("nonneg_balance", "c_acctbal >= 0")
        .expect("building_segment", "c_mktsegment = 'BUILDING'", action="warn")
        .apply(cust)
    )
    n_kept = checked.df.count()  # executes the pass; metrics now observed
    n_neg = cust.filter("c_acctbal < 0").count()
    assert n_kept == cust.count() - n_neg
    assert checked.quarantine.count() == n_neg
    m = checked.metrics()
    assert m["nonneg_balance"] == n_neg
    assert m["building_segment"] == cust.filter("c_mktsegment <> 'BUILDING'").count()


def test_fail_action_raises(spark):
    cust = load_tables(spark, SF_DIR, ["customer"])["customer"]
    with pytest.raises(ExpectationFailed):
        Expectations().expect_or_fail("impossible", "c_acctbal > 1e12").apply(cust)
    # passing fail-expectation does not raise
    out = Expectations().expect_or_fail("key_set", "c_custkey IS NOT NULL").apply(cust)
    assert out.df.count() == cust.count()


def test_null_condition_counts_as_violation(spark):
    df = spark.createDataFrame([(1, 10.0), (2, None), (3, -5.0)], "id int, v double")
    checked = Expectations().expect_or_drop("v_pos", "v > 0").apply(df)
    assert sorted(r.id for r in checked.df.collect()) == [1]
    assert sorted(r.id for r in checked.quarantine.collect()) == [2, 3]
    assert checked.metrics()["v_pos"] == 2


def test_single_pass_no_double_scan(spark):
    """The violation counters must ride the main pass (observe), not
    trigger a second aggregation job over the source."""
    cust = load_tables(spark, SF_DIR, ["customer"])["customer"]
    checked = Expectations().expect("x", "c_acctbal >= 0", action="warn").apply(cust)
    plan = checked.df._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
