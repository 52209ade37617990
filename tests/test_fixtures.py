"""fixtures.py's load-bearing claim is that a memoized trained
structure is OBSERVATIONALLY IDENTICAL to retraining (the trainers are
xxhash-seeded and deterministic) — certify it by comparing every
fixture against a live training run on the same corpus, and that a
second fixture call returns the same rows (memo stability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators import similarity as S
from lakehouse_tacklebox_spark.queries import fixtures as FX
from lakehouse_tacklebox_spark.sources import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_frozen_kmeans_equals_live(spark):
    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    live = S.kmeans_centroids(e.select("vec_id", "embedding"), k=8, iters=4)
    froz = FX.frozen_kmeans(spark, SF_DIR, k=8, iters=4)
    key = lambda df: sorted(
        (r["centroid_id"], tuple(r["embedding"])) for r in df.collect()
    )
    assert key(froz) == key(live)
    # memo stability: a second call returns the identical rows
    assert key(FX.frozen_kmeans(spark, SF_DIR, k=8, iters=4)) == key(live)


def test_frozen_ivfpq_equals_live(spark):
    e = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    lc, lb, lcodes = S.ivfpq_index(e, num_centroids=8, m=4, ksub=8, iters=1)
    fc, fb, fcodes = FX.frozen_ivfpq(spark, SF_DIR, num_centroids=8, m=4, ksub=8, iters=1)
    ckey = lambda df: sorted(
        (r["centroid_id"], tuple(r["embedding"])) for r in df.collect()
    )
    bkey = lambda df: sorted(
        (r["sub_idx"], r["code"], tuple(r["sub_vec"])) for r in df.collect()
    )
    codekey = lambda df: sorted(
        (r["vec_id"], r["centroid_id"], tuple(r["codes"])) for r in df.collect()
    )
    assert ckey(fc) == ckey(lc)
    assert bkey(fb) == bkey(lb)
    assert codekey(fcodes) == codekey(lcodes)


def test_frozen_shingle_census_equals_inline(spark):
    from lakehouse_tacklebox_spark.operators import dedup as D

    d = load_tables(spark, SF_DIR, ["documents"])["documents"]
    sh = D.shingle_hashes(d.select("doc_id", "text"), "text", n=3)
    live_totals = _rows(
        sh.select("doc_id", F.size("shingles").cast("bigint").alias("n_shingles")),
        ["doc_id", "n_shingles"],
    )
    live_census = _rows(
        sh.select("doc_id", F.explode("shingles").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("owner")),
        ["h", "df", "owner"],
    )
    totals, census = FX.frozen_shingle_census(spark, SF_DIR, n=3)
    assert _rows(totals, ["doc_id", "n_shingles"]) == live_totals
    assert _rows(census, ["h", "df", "owner"]) == live_census
