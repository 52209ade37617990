"""Corpus-prep operators: properties the oracle parity can't express —
determinism under repartitioning, packing invariants, scrub behavior,
decontamination recall, incremental-vs-full dedup equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators import corpus as C


def test_stratified_sample_invariant_under_repartition(spark):
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("stratum")
    )
    rates = {"0": 30, "1": 70, "2": 0}
    a = {r["id"] for r in C.stratified_sample(df, "stratum", rates, "id").collect()}
    b = {
        r["id"]
        for r in C.stratified_sample(df.repartition(13), "stratum", rates, "id").collect()
    }
    assert a == b, "sample membership must not depend on partitioning"
    # rate sanity: ~30% / ~70% / 0%
    n0 = sum(1 for i in a if i % 3 == 0)
    n1 = sum(1 for i in a if i % 3 == 1)
    assert not any(i % 3 == 2 for i in a)
    assert 0.2 < n0 / (2000 / 3) < 0.4
    assert 0.6 < n1 / (2000 / 3) < 0.8


def test_pack_shards_budget_and_order(spark):
    rows = [("a", i, 50 + (i % 7) * 10) for i in range(40)] + [("b", 0, 5000)]
    df = spark.createDataFrame(rows, ["grp", "seq", "toks"])
    packed = C.pack_shards(df, "grp", "seq", "toks", budget=200).collect()
    by_shard: dict[tuple, list] = {}
    for r in packed:
        by_shard.setdefault((r["grp"], r["shard_id"]), []).append(r)
    for (grp, _), members in by_shard.items():
        total = sum(m["toks"] for m in members)
        biggest = max(m["toks"] for m in members)
        # a shard only exceeds the budget by (at most) its final document
        assert total - biggest < 200, (grp, total, biggest)
    # shards are contiguous in seq order
    a_rows = sorted((r for r in packed if r["grp"] == "a"), key=lambda r: r["seq"])
    shard_seq = [r["shard_id"] for r in a_rows]
    assert shard_seq == sorted(shard_seq)
    # an over-budget row still gets exactly one shard
    assert len([r for r in packed if r["grp"] == "b"]) == 1


def test_scrub_pii_multi_pattern(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com or call 12-345-678-9012 twice 12-345-678-9012")],
        ["id", "t"],
    )
    out = C.scrub_pii(df, "t").collect()[0]
    assert out["n_phone"] == 2
    assert out["n_email"] == 1
    assert "[PHONE]" in out["t_scrubbed"] and "[EMAIL]" in out["t_scrubbed"]
    assert "a@b.com" not in out["t_scrubbed"]
    assert "12-345-678-9012" not in out["t_scrubbed"]


def test_contamination_flags_recall_and_precision(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens → a 5-gram exists
    train = spark.createDataFrame(
        [
            (1, f"prefix {shared} suffix tail words here"),  # contains eval 5-gram
            (2, "totally unrelated words without any overlap at all"),
            (3, "short doc"),  # too short to shingle → clean
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, shared)], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["contaminated"]
        for r in C.contamination_flags(train, ev, "doc_id", "text", n=5).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_vocabulary_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "  A  b  ")], ["doc_id", "text"]
    )
    got = {r["token"]: (r["tf"], r["df"]) for r in C.vocabulary(df, "text", id_col="doc_id").collect()}
    assert got == {"a": (4, 3), "b": (2, 2), "c": (1, 1)}


def test_repetition_scores_flags_repeats(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # one dominant trigram
            (2, "one two three four five six seven eight"),  # all distinct
            (3, "x"),  # too short → zeros
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in C.repetition_scores(df, "doc_id", "text", n=3).collect()}
    assert got[1]["rep_ratio"] == 1.0 and got[1]["n_grams"] == 4
    assert got[2]["top_gram_count"] == 1
    assert got[3]["n_grams"] == 0 and got[3]["rep_ratio"] == 0.0


def test_incremental_dedup_matches_full_rebuild(spark):
    texts = ["doc one", "doc two", "doc three", "doc one", "doc four", "doc two"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    existing = df.filter(F.col("doc_id") < 3)
    incoming = df.filter(F.col("doc_id") >= 3)
    survivors = {
        r["doc_id"] for r in C.incremental_dedup(incoming, existing, "text", "doc_id").collect()
    }
    # doc 3 duplicates doc 0, doc 5 duplicates doc 1 → only doc 4 survives
    assert survivors == {4}


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    """weighted_sample keeps a row iff md5-bucket(id) < weight_ppm — a
    pure function of the row, so the kept set survives repartitioning
    and reruns, and appending rows never flips prior decisions."""
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators.corpus import weighted_sample

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        # weights sweep 0..1e6 so both keep and drop branches are hit
        ((F.col("id") % 11) * 100_000).cast("long").alias("weight_ppm"),
    )
    kept1 = {r.doc_id for r in weighted_sample(df, "weight_ppm", "doc_id").collect()}
    kept2 = {
        r.doc_id
        for r in weighted_sample(df.repartition(13), "weight_ppm", "doc_id").collect()
    }
    assert kept1 == kept2 and 0 < len(kept1) < 2000
    # weight 0 never keeps; weight 1e6 always keeps
    zeros = {r.doc_id for r in df.filter(F.col("weight_ppm") == 0).collect()}
    full = {r.doc_id for r in df.filter(F.col("weight_ppm") == 1_000_000).collect()}
    assert not (kept1 & zeros)
    assert full <= kept1
    # appending rows does not flip earlier decisions
    bigger = df.unionByName(
        spark.range(2000, 3000).select(
            F.col("id").alias("doc_id"), F.lit(500_000).cast("long").alias("weight_ppm")
        )
    )
    kept3 = {r.doc_id for r in weighted_sample(bigger, "weight_ppm", "doc_id").collect()}
    assert {d for d in kept3 if d < 2000} == kept1
    # realized rate tracks the probability mass (law of large numbers)
    expected = sum(((i % 11) * 100_000) for i in range(2000)) / 1_000_000
    assert abs(len(kept1) - expected) / expected < 0.1


def test_leakage_safe_split_groups_never_straddle(spark):
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators.corpus import leakage_safe_split

    # 60 groups x 5 members; assignment must be constant within a group
    rows = [(g * 100 + m, f"grp{g}") for g in range(60) for m in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "gk"])
    out = leakage_safe_split(df, F.col("gk"))
    per_group = out.groupBy("gk").agg(F.countDistinct("split").alias("ns")).collect()
    assert all(r["ns"] == 1 for r in per_group)
    # all three splits populated at this group count, and the
    # assignment is partition-invariant (pure function of the key)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    re_assigned = leakage_safe_split(df.repartition(7), F.col("gk"))
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in re_assigned.collect()}
    assert a == b


def test_leakage_safe_split_rejects_bad_percents(spark):
    import pytest
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators.corpus import leakage_safe_split

    df = spark.createDataFrame([(1, "a")], ["doc_id", "gk"])
    with pytest.raises(ValueError):
        leakage_safe_split(df, F.col("gk"), splits=[("train", 80), ("val", 30)])


def test_join_size_estimate_matches_actual_join(spark):
    from lakehouse_tacklebox_spark.plans.profiler import join_size_estimate

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 1 + [(None,)], "k string"
    )
    right = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 5 + [("d",)] * 2 + [(None,)], "k string"
    )
    got = join_size_estimate(left, right, "k", top_n=5).collect()
    by_key = {r["join_key"]: r for r in got}
    # per-key products: a=3*4=12, b=2*5=10; c/d unmatched; nulls excluded
    assert set(by_key) == {"a", "b", "*TOTAL*"}
    assert (by_key["a"]["left_rows"], by_key["a"]["right_rows"], by_key["a"]["est_rows"]) == (3, 4, 12)
    assert by_key["b"]["est_rows"] == 10
    # the forecast IS the actual inner-join cardinality
    actual = left.join(right, "k").count()
    assert by_key["*TOTAL*"]["est_rows"] == 22 == actual
    # heaviest first, TOTAL sorts ahead (largest est_rows)
    assert [r["join_key"] for r in got] == ["*TOTAL*", "a", "b"]
