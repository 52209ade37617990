"""Iterator pandas-UDF embedder: determinism, normalization, init-once."""

import numpy as np
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators.embed import HashEmbedder, embed_text
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_embed_deterministic_and_normalized(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    out = embed_text(docs, dim=16)
    rows = out.select("doc_id", "text", "embedding").limit(30).collect()
    assert all(len(r.embedding) == 16 for r in rows)
    ref = HashEmbedder(16)
    for r in rows:
        expect = ref.encode(__import__("pandas").Series([r.text]))[0]
        np.testing.assert_allclose(np.array(r.embedding), np.array(expect), rtol=1e-6)
        norm = np.linalg.norm(r.embedding)
        assert norm == 0 or abs(norm - 1.0) < 1e-5


def test_embed_two_runs_identical(spark):
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    a = {r.doc_id: tuple(r.embedding) for r in embed_text(docs).select("doc_id", "embedding").collect()}
    b = {r.doc_id: tuple(r.embedding) for r in embed_text(docs).select("doc_id", "embedding").collect()}
    assert a == b


def test_embeddings_feed_knn(spark):
    """End-to-end LLM-pipeline slice: embed -> cosine self-similarity."""
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"].limit(50)
    emb = embed_text(docs, dim=16).select("doc_id", "embedding")
    dot = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"), dot.alias("cos"))
    )
    rows = pairs.collect()
    assert rows and all(-1.0001 <= r.cos <= 1.0001 for r in rows)


def test_ivf_recall_vs_bruteforce(spark):
    """knn_ivf is approximate; quantify it. The fixture embeddings are
    uniform random (same-label cosine == diff-label cosine == 0), the
    hardest case for IVF: with balanced k-means lists, nprobe of 8 lists
    scans ~nprobe/8 of the corpus and recall tracks that fraction
    (measured: 0.38/0.62/0.78 at nprobe 2/3/4). Pin a floor at the
    battery's nprobe=3, monotonicity in nprobe, and exactness when every
    list is probed. (The old 0.90-at-nprobe-3 number came from
    degenerate take-first-k 'centroids' that collapsed the corpus into
    one giant list — near-brute-force recall with no pruning at all.)"""
    from lakehouse_tacklebox_spark.operators import similarity as S

    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in S.knn_bruteforce(e, q, k=5).collect()}
    cents = S.kmeans_centroids(e, k=8)  # train once, reuse across probes

    def recall(nprobe):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in S.knn_ivf(e, q, k=5, num_centroids=8, nprobe=nprobe, centroids=cents).collect()
        }
        return len(exact & approx) / len(exact)

    r3 = recall(3)
    assert r3 >= 0.5, f"recall@5 dropped to {r3}"
    assert recall(4) >= r3  # more probes never hurt
    assert recall(8) == 1.0  # probing every list IS brute force


def test_kmeans_lists_are_balanced(spark):
    """The scale property IVF actually buys: k-means lists partition the
    corpus roughly evenly, so probing nprobe lists scans ~nprobe/k of
    the vectors. Degenerate centroids fail this badly (one list held
    ~90% of the corpus); real Lloyd's iterations must keep every list
    under 3x its fair share on the uniform fixture."""
    from lakehouse_tacklebox_spark.operators import similarity as S

    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    cents = S.kmeans_centroids(e, k=8)
    sizes = (
        S.ivf_assign(e, cents, nprobe=1)
        .groupBy("centroid_id")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in sizes)
    assert len(sizes) == 8  # no empty lists on the fixture
    assert max(r["count"] for r in sizes) <= 3 * n / 8


def test_kmeans_deterministic_and_sampled_training(spark):
    """Hash-seeded Lloyd's is reproducible run-to-run, and hash-sample
    training (the 100 TB path) still yields full-coverage centroids."""
    from lakehouse_tacklebox_spark.operators import similarity as S

    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    a = {r.centroid_id: tuple(r.embedding) for r in S.kmeans_centroids(e, k=4, iters=2).collect()}
    b = {r.centroid_id: tuple(r.embedding) for r in S.kmeans_centroids(e, k=4, iters=2).collect()}
    assert a == b
    sampled = S.kmeans_centroids(e, k=4, iters=2, sample_mod=4).collect()
    assert len(sampled) == 4
    assert all(len(r.embedding) == 64 for r in sampled)
