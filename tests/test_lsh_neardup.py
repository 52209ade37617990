"""Random-hyperplane LSH near-dup: precision 1.0, recall vs exact."""

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators import similarity as S
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_neardup_precision_and_recall(spark):
    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    exact = {(r.id_a, r.id_b) for r in S.neardup_pairs(e, threshold=0.95).collect()}
    got = {(r.id_a, r.id_b): r.cosine for r in S.neardup_pairs_lsh(e, threshold=0.95).collect()}
    # precision 1.0 by construction (exact verification after bucketing)
    assert set(got) <= exact
    # banded sign-bit recall at cosine>=0.95 should be near-total
    if exact:
        recall = len(got) / len(exact)
        assert recall >= 0.8, f"recall {recall} over {len(exact)} exact pairs"


def test_lsh_bands_deterministic_and_jvm_side(spark):
    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    s1 = {(r.vec_id, r.band_idx): r.band_key for r in S.rp_lsh_bands(e).collect()}
    s2 = {(r.vec_id, r.band_idx): r.band_key for r in S.rp_lsh_bands(e).collect()}
    assert s1 == s2
    # 4 bands per vector, 4-bit keys
    n_vec = e.count()
    assert len(s1) == 4 * n_vec
    assert all(len(k) == 4 and set(k) <= {"0", "1"} for k in s1.values())
    # no Python UDFs in the plan
    plan = S.rp_lsh_bands(e)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lsh_candidate_count_beats_all_pairs(spark):
    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    n = e.count()
    sig = S.rp_lsh_bands(e)
    a = sig.select(F.col("vec_id").alias("id_a"), "band_idx", "band_key")
    b = sig.select(F.col("vec_id").alias("id_b"), "band_idx", "band_key")
    n_cand = a.join(b, ["band_idx", "band_key"]).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct().count()
    assert n_cand < n * (n - 1) / 2 * 0.5  # bucketing prunes at least half the pairs
