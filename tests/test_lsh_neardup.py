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


def test_lsh_kernel_equivalence(spark):
    """The Arrow/numpy kernel must produce IDENTICAL pairs and 6-dp
    cosines to the expr kernel (whose fold order mirrors the DuckDB
    oracle term-for-term). Numpy changes only the accumulation order;
    the measured margins (min |v·plane| 2.26e-7 across gate corpora,
    candidate cosines nowhere near a 0.5e-6 rounding boundary) sit
    orders of magnitude above ~1e-13 reordering noise. Threshold 0.3 so
    the comparison is over a NON-EMPTY pair set on the isotropic gate
    corpus (133 pairs at sf0.001)."""
    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    a = sorted(
        map(tuple, S.neardup_pairs_lsh(e, threshold=0.3, n_planes=64, bands=8, kernel="expr").collect())
    )
    b = sorted(
        map(tuple, S.neardup_pairs_lsh(e, threshold=0.3, n_planes=64, bands=8, kernel="arrow").collect())
    )
    assert a == b
    assert len(a) > 50  # non-vacuous: the corpus yields real pairs at 0.3


def test_lsh_recall_on_jittered_neardups(spark):
    """The gate corpora are isotropic random (max off-diagonal cosine
    ~0.6), so the 0.95-threshold near-dup queries are correctly EMPTY
    there and the recall clause above is vacuous. Pin recall on a corpus
    with KNOWN near-dups: every vector gets a jittered twin (cosine
    ≥ ~0.99), and the 64-plane/8-band query parameterization must
    recover ≥ 95% of the twin pairs (theoretical banded bound 0.988 at
    0.95, higher at 0.99)."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, dim = 300, 64
    base = rng.normal(size=(n, dim))
    jit = base + 0.05 * rng.normal(size=(n, dim))  # cosine ~0.999
    rows = [(i, base[i].astype(float).tolist()) for i in range(n)] + [
        (n + i, jit[i].astype(float).tolist()) for i in range(n)
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = {(r.id_a, r.id_b) for r in S.neardup_pairs(e, threshold=0.95).collect()}
    got = {(r.id_a, r.id_b) for r in S.neardup_pairs_lsh(e, threshold=0.95, n_planes=64, bands=8).collect()}
    assert got <= exact  # precision 1.0
    assert len(exact) >= n  # every twin pair is a true near-dup
    recall = len(got) / len(exact)
    assert recall >= 0.95, f"recall {recall} over {len(exact)} exact pairs"


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


def test_jaccard_df_cap_bounds_boilerplate_explosion(spark):
    """A boilerplate shingle shared by k docs makes k² candidate pairs in
    the uncapped postings self-join. max_doc_freq drops such
    stop-shingles before the join, so candidates come only from rare
    shingles — and pairs untouched by the cap keep their exact Jaccard."""
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators import dedup as D

    boiler = "terms of service apply to all content on this site"
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c") for i in range(100)]
    # docs 0/1: identical unique tails -> a true near-dup pair
    rows[1] = (1, rows[0][1].replace("unique0c", "unique0d"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.shingle(docs, "text", n=3)

    uncapped = D.jaccard_pairs(sh, "doc_id", "shingles", threshold=0.0)
    capped = D.jaccard_pairs(sh, "doc_id", "shingles", threshold=0.0, max_doc_freq=10)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert n_uncapped >= 100 * 99 / 2  # every doc pair shares boilerplate
    assert n_capped < 100  # rare-shingle candidates only

    # the true near-dup survives, with Jaccard over rare shingles only
    hit = capped.filter("id_a = 0 AND id_b = 1").collect()
    assert hit and hit[0]["jaccard"] > 0.3

    # a cap above every DF reproduces the exact uncapped result
    noop = D.jaccard_pairs(sh, "doc_id", "shingles", threshold=0.0, max_doc_freq=1000)
    assert sorted(map(tuple, noop.collect())) == sorted(map(tuple, uncapped.collect()))


def test_jaccard_for_pairs_matches_postings_join(spark):
    """The per-candidate verifier (array_intersect) must produce the same
    values as the postings self-join when given every pair."""
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators import dedup as D

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over a lazy dog"),
        (2, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
        (3, "the quick brown cat naps under the lazy dog"),
    ]
    sh = D.shingle(spark.createDataFrame(rows, "doc_id long, text string"), "text", n=3)
    full = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in D.jaccard_pairs(sh, "doc_id", "shingles", threshold=0.0).collect()
    }
    pairs = spark.createDataFrame(sorted(full), "id_a long, id_b long")
    per_pair = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in D.jaccard_for_pairs(pairs, sh, "doc_id", "shingles").collect()
    }
    assert per_pair == full


def test_minhash_seeds_are_independent_hash_functions(spark):
    """Regression: pyspark's ``F.transform`` treats a two-argument lambda
    as (element, index), so a seed captured via ``lambda x, s=s:`` was
    silently replaced by the array index — every signature position
    collapsed to one POSITION-DEPENDENT hash, and a 0.99-Jaccard pair
    whose texts differ by one leading token (shifting every index) missed
    every band. Pin both properties the real MinHash must have."""
    from lakehouse_tacklebox_spark.operators import dedup as D

    docs = spark.createDataFrame([(1, ["a b c", "b c d", "c d e", "d e f"])],
                                 "doc_id long, shingles array<string>")
    sig = D.minhash_signatures(docs, "doc_id", "shingles", num_hashes=16).collect()[0].sig
    # independent seeds -> positions are (overwhelmingly) not all equal
    assert len(set(sig)) > 8

    # permutation invariance: shingle ORDER must not change the signature
    rev = spark.createDataFrame([(1, ["d e f", "c d e", "b c d", "a b c"])],
                                "doc_id long, shingles array<string>")
    assert D.minhash_signatures(rev, "doc_id", "shingles", num_hashes=16).collect()[0].sig == sig


def test_minhash_lsh_finds_position_shifted_neardup(spark):
    """A duplicate with one token PREPENDED (the sf0.01 doc 285/301 shape:
    91 of 92 shingles shared, but every shingle at a different index) must
    be caught by banded MinHash — the broken index-as-seed variant missed
    it with probability ~1."""
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators import dedup as D

    base = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, base),
        (2, "extra " + base),  # shifts every token position by one
        (3, " ".join(f"other{i}" for i in range(60))),
    ]
    sh = D.shingle(spark.createDataFrame(rows, "doc_id long, text string"), "text", n=3)
    sigs = D.minhash_signatures(sh, "doc_id", "shingles", num_hashes=48)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=16, rows_per_band=3)
    ver = D.jaccard_for_pairs(cand, sh, "doc_id", "shingles").filter(F.col("jaccard") >= 0.2)
    got = {(r.id_a, r.id_b) for r in ver.collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)


def test_rp_lsh_bands_empty_corpus(spark):
    from lakehouse_tacklebox_spark.operators import similarity as S

    e = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = S.rp_lsh_bands(e)
    assert out.collect() == []
    assert out.columns == ["vec_id", "band_idx", "band_key"]


def test_neardup_arrow_string_ids_and_guard(spark):
    """neardup_pairs_arrow must honor the id column's Spark type (string
    ids included) and refuse to stage an over-sized corpus through the
    driver instead of silently collecting it."""
    import pytest

    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    s = e.select(
        F.concat(F.lit("doc-"), F.format_string("%06d", "vec_id")).alias("vec_id"),
        "embedding",
    )
    pairs = S.neardup_pairs_arrow(s, threshold=0.3)
    assert dict(pairs.dtypes) == {"id_a": "string", "id_b": "string"}
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    exact = {
        (f"doc-{r.id_a:06d}", f"doc-{r.id_b:06d}")
        for r in S.neardup_pairs(e, threshold=0.3).collect()
    }
    assert got == exact and len(got) > 50

    with pytest.raises(ValueError, match="max_broadcast_rows"):
        S.neardup_pairs_arrow(e, threshold=0.3, max_broadcast_rows=10)


def test_incremental_lsh_store_readback_exact_equality(spark, tmp_path):
    """sf0.001 pin behind dedup_incremental_lsh's signature-certified
    maintenance (VERDICT r11 item 5): the bucket store after appending
    the batch's bands, read back, equals a from-scratch banding of the
    full corpus ROW-FOR-ROW (exact join, not just the 4-fold signature
    the entry gates on) — and the signature agrees with the exact
    verdict in both the equal and the tampered case."""
    from lakehouse_tacklebox_spark.operators import dedup as D
    from lakehouse_tacklebox_spark.operators.signature import rowset_signature
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    d = load_tables(spark, SF_DIR, ["documents"])["documents"]
    sh = D.shingle_hashes(d.select("doc_id", "text"), "text", n=3)
    sigs = D.minhash_signatures(sh, "doc_id", "shingles", num_hashes=48).filter(
        F.col("sig").getItem(0).isNotNull()
    )
    exist = D.lsh_band_buckets(
        sigs.filter(F.col("doc_id") % 3 != 0), "doc_id", bands=16, rows_per_band=3
    )
    inc = D.lsh_band_buckets(
        sigs.filter(F.col("doc_id") % 3 == 0), "doc_id", bands=16, rows_per_band=3
    ).localCheckpoint(eager=True)
    store = TackleTable.create(spark, str(tmp_path / "idx"), exist)
    store.append(inc, txn=("lsh_index_append", 1))

    back = TackleTable(spark, str(tmp_path / "idx")).read()
    full = D.lsh_band_buckets(sigs, "doc_id", bands=16, rows_per_band=3)
    cols = ["doc_id", "band", "band_hash"]

    n_full = full.count()
    assert n_full > 0
    assert back.count() == n_full
    assert back.join(full, cols).count() == n_full  # exact row-set equality
    assert rowset_signature(back, cols) == rowset_signature(full, cols)

    # tampered store (one row dropped) must move the signature
    one = back.limit(1)
    tampered = back.join(one, cols, "left_anti")
    assert rowset_signature(tampered, cols) != rowset_signature(full, cols)
