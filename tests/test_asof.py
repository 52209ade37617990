"""asof_join semantics the parquet battery can't hit: equal-timestamp
matches (<= not <), no-prior-row nulls, and multi-key grouping."""

from __future__ import annotations

from lakehouse_tacklebox_spark.operators.asof import asof_join


def test_asof_join_equal_ts_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 5, "l2"), (2, 7, "l3")],
        "k int, ts int, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r_at_10"), (1, 3, "r_at_3")],
        "k int, ts int, payload string",
    )
    got = {
        (r["k"], r["ts"]): r["payload_right"]
        for r in asof_join(left, right, keys=["k"], right_cols=["payload"]).collect()
    }
    assert got == {
        (1, 10): "r_at_10",  # equal ts matches (<=)
        (1, 5): "r_at_3",    # latest at-or-before
        (2, 7): None,        # key with no right rows
    }


def test_asof_join_keeps_left_payload_and_row_count(spark):
    left = spark.createDataFrame([(1, 2, "x"), (1, 1, "y")], "k int, ts int, name string")
    right = spark.createDataFrame([(1, 1, 9.5)], "k int, ts int, v double")
    out = asof_join(left, right, keys=["k"], right_cols=["v"])
    rows = sorted(out.collect(), key=lambda r: r["ts"])
    assert out.count() == 2  # left join: every left row survives
    assert [r["name"] for r in rows] == ["y", "x"]
    assert [r["v_right"] for r in rows] == [9.5, 9.5]
