"""Product-quantization ANN: codebook determinism, encoding shape, the
full-shortlist exactness contract, and the measured recall floor of the
production shortlist on the isotropic gate corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators import similarity as S
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]


def test_pq_codebooks_shape_and_determinism(spark):
    e = _emb(spark)
    b1 = S.pq_codebooks(e, m=4, ksub=16, iters=2)
    rows = b1.collect()
    assert len(rows) == 4 * 16
    assert {r["sub_idx"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["sub_vec"]) == 16 for r in rows)  # 64 dims / 4 subspaces
    # hash-seeded k-means: a re-run must reproduce the same codebooks
    b2 = S.pq_codebooks(e, m=4, ksub=16, iters=2)
    assert sorted(map(str, rows)) == sorted(map(str, b2.collect()))


def test_pq_encode_codes_in_range(spark):
    e = _emb(spark)
    books = S.pq_codebooks(e, m=4, ksub=16, iters=2)
    codes = S.pq_encode(e, books)
    got = codes.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.min("m"), F.max("m"), F.min("lo"), F.max("hi"), F.count(F.lit(1))
    ).first()
    assert got["min(m)"] == got["max(m)"] == 4
    assert got["min(lo)"] >= 0 and got["max(hi)"] <= 15
    assert got["count(1)"] == e.count()


def test_pq_full_shortlist_reproduces_bruteforce(spark):
    """The ranking contract: ADC may only PRE-FILTER — with the shortlist
    opened to the whole corpus the exact re-rank sees everything, so the
    result must equal knn_bruteforce pair-for-pair AND rank-for-rank,
    regardless of codebook quality."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5)
    books = S.pq_codebooks(e, m=4, ksub=16, iters=2)
    codes = S.pq_encode(e, books)
    n = e.count()
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.knn_pq_adc(codes, q, books, e, k=5, shortlist=n).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.knn_bruteforce(e, q, k=5).collect()
    }
    assert got == want


def test_pq_shortlist_recall_floor(spark):
    """recall@5 of the production shape (ADC shortlist 50 + exact
    re-rank) vs brute force on the isotropic corpus — PQ's hardest case.
    The 40% battery floor needs real margin here."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 10)
    books = S.pq_codebooks(e, m=4, ksub=16, iters=3)
    codes = S.pq_encode(e, books)
    bf = S.knn_bruteforce(e, q, k=5).select("query_id", "neighbor_id")
    pq = S.knn_pq_adc(codes, q, books, e, k=5, shortlist=50).select(
        F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2")
    )
    hits = bf.join(
        pq, (F.col("query_id") == F.col("q2")) & (F.col("neighbor_id") == F.col("n2"))
    ).count()
    total = bf.count()
    assert total == 50
    assert hits * 100 >= total * 40, f"recall@5 {hits}/{total} below the 40% floor"


def test_ivfpq_full_probe_reproduces_bruteforce(spark):
    """Composed IVF-PQ ranking contract: probing every list with the
    shortlist opened to the corpus must reproduce knn_bruteforce exactly
    — the residual-ADC inverted index may only ever PRE-FILTER."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5)
    n = e.count()
    coarse, books, codes = S.ivfpq_index(e, num_centroids=8, m=8, ksub=16, iters=2)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.knn_ivfpq(
            e, q, coarse, books, codes, k=5, nprobe=8, shortlist=n
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.knn_bruteforce(e, q, k=5).collect()
    }
    assert got == want


def test_sq_codes_in_range_and_deterministic(spark):
    e = _emb(spark)
    bounds = S.sq_bounds(e)
    brows = bounds.collect()
    assert len(brows) == 64 and all(r["mn"] <= r["mx"] for r in brows)
    codes = S.sq_encode(e, bounds)
    rows = codes.collect()
    assert len(rows) == e.count()
    assert all(
        len(r["codes"]) == 64 and all(0 <= c <= 255 for c in r["codes"]) for r in rows
    )
    # floor arithmetic: a re-run is bit-identical
    rows2 = S.sq_encode(e, bounds).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_sq_full_shortlist_reproduces_bruteforce(spark):
    """With the shortlist opened to the whole corpus, the SQ scan may
    only PRE-FILTER, never alter the exact re-rank: pair-for-pair,
    rank-for-rank equality with brute force."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 10)
    bounds = S.sq_bounds(e)
    codes = S.sq_encode(e, bounds).localCheckpoint(eager=True)
    qcodes = codes.filter(F.col("vec_id") < 10)
    n = e.count()
    got = sorted(
        map(tuple, S.knn_sq(codes, qcodes, e, q, k=5, shortlist=n).collect())
    )
    exp = sorted(map(tuple, S.knn_bruteforce(e, q, k=5).collect()))
    assert got == exp


def test_sq_production_shortlist_recall(spark):
    """The production shortlist (max(50, n/10)) measured 100% recall@5
    at every gate scale — pin the floor well above the PQ tier's (the
    4x codec preserves ordering the 32x codec cannot)."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 10)
    bounds = S.sq_bounds(e)
    codes = S.sq_encode(e, bounds).localCheckpoint(eager=True)
    qcodes = codes.filter(F.col("vec_id") < 10)
    n = e.count()
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_sq(codes, qcodes, e, q, k=5, shortlist=max(50, n // 10)).collect()
    }
    exp = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_bruteforce(e, q, k=5).collect()
    }
    assert len(got & exp) * 100 >= len(exp) * 90
