"""Property-based + concurrency tests for TackleTable.

A random sequence of table operations must keep TackleTable equivalent
to an in-memory model, and every historical version must stay readable
(immutability of committed versions). Concurrent blind appends must all
land exactly once (commit-protocol retry).
"""

import threading

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_tacklebox_spark.operators.skew import salted_join, top_keys
from lakehouse_tacklebox_spark.tablestore.table import TackleTable

SCHEMA = "k bigint, v string"


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]).astype({"k": "int64", "v": "str"})) if rows else spark.createDataFrame([], SCHEMA)


ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 9), st.sampled_from("abc")), min_size=1, max_size=4)),
        st.tuples(st.just("delete"), st.integers(0, 9)),
        st.tuples(st.just("update"), st.integers(0, 9)),
        st.tuples(st.just("overwrite"), st.lists(st.tuples(st.integers(0, 9), st.sampled_from("xy")), max_size=3)),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(sequence=ops)
def test_random_op_sequences_match_model(spark, tmp_path_factory, sequence):
    root = tmp_path_factory.mktemp("prop")
    t = TackleTable.create(spark, str(root / "t"), schema=SCHEMA)
    model: list[tuple[int, str]] = []
    snapshots = {0: list(model)}

    for op, arg in sequence:
        if op == "append":
            rows = [(int(k), v) for k, v in arg]
            t.append(_df(spark, rows))
            model.extend(rows)
        elif op == "delete":
            t.delete(f"k = {arg}")
            model = [(k, v) for k, v in model if k != arg]
        elif op == "update":
            t.update(f"k = {arg}", {"v": "'Z'"})
            model = [(k, "Z") if k == arg else (k, v) for k, v in model]
        elif op == "overwrite":
            rows = [(int(k), v) for k, v in arg]
            t.overwrite(_df(spark, rows))
            model = list(rows)
        snapshots[t.version()] = list(model)

    assert sorted((r.k, r.v) for r in t.read().collect()) == sorted(model)
    # every committed version is still exactly readable (time travel)
    for v, snap in snapshots.items():
        assert sorted((r.k, r.v) for r in t.read(version=v).collect()) == sorted(snap)


def test_concurrent_appends_all_land(spark, tmp_path):
    t = TackleTable.create(spark, str(tmp_path / "conc"), schema=SCHEMA)
    errors = []

    def writer(i):
        try:
            t.append(_df(spark, [(i, f"w{i}")]))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    rows = sorted(r.k for r in t.read().collect())
    assert rows == list(range(8))
    assert t.version() == 8  # one commit per writer, serialized by retry


def test_salted_join_equals_plain_join(spark):
    import pyspark.sql.functions as F

    big = spark.range(0, 5000).select((F.col("id") % 3).alias("k"), F.col("id").alias("payload"))
    small = spark.createDataFrame([(0, "zero"), (1, "one"), (2, "two"), (7, "ghost")], "k bigint, label string")
    plain = big.join(small, ["k"], "inner")
    salted = salted_join(big, small, ["k"], "inner", salt=8)
    assert salted.count() == plain.count() == 5000
    assert sorted((r.k, r.payload, r.label) for r in salted.collect()) == sorted(
        (r.k, r.payload, r.label) for r in plain.collect()
    )
    hot = top_keys(big, ["k"], n=1).collect()[0]
    assert hot.pct_of_table > 30.0
