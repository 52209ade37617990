"""Process-scoped cache of deterministic trained structures (k-means
centroids, PQ codebooks, composed IVF-PQ indexes) shared across battery
entries.

Every producer here is xxhash-seeded and deterministic for a given
(sf_dir, params) — see ``operators/similarity.py`` (kmeans_centroids
seeds from the k smallest xxhash64(id) vectors; every iteration is a
pure DataFrame program) — so returning a memoized copy is
observationally identical to retraining. Entries that certify a
read-back against a from-scratch ENCODE still run those encodes live;
only the TRAINING pass (a dozen tiny driver-latency-bound Lloyd jobs —
measured 12 s for 500 rows at sf0.01, pure scheduler overhead) is
shared. This is VERDICT r10 item 3: the expensive drive entries mostly
re-derived identical private codebook/centroid fixtures, and bench.py's
min-of-2 protocol re-derived them twice more per query.

Cache shape: small structures (centroids, codebooks — at most
m·ksub ≤ 128 rows) are collected rows rebuilt per call with
``createDataFrame`` (session-independent); corpus-sized code tables are
parquet in a process-temp dir — robust to cache clears and RDD
unpersists (bench.py purges persisted RDDs between phases), and never
pinned in executor memory. A lock guards each key so the threaded
drive (SPARK_GRAFT_DRIVE_JOBS > 1) builds each fixture exactly once.
"""

from __future__ import annotations

import os
import tempfile
import threading

from pyspark.sql import DataFrame, functions as F

from lakehouse_tacklebox_spark.operators import similarity as S
from lakehouse_tacklebox_spark.sources import load_tables

_ROWS: dict = {}
_PATHS: dict = {}
_LOCK = threading.Lock()
_KEYLOCKS: dict = {}


def _keylock(key) -> threading.Lock:
    with _LOCK:
        return _KEYLOCKS.setdefault(key, threading.Lock())


def _corpus_fp(sf_dir: str, table: str) -> tuple:
    """Cheap source-data fingerprint folded into every memo key: the
    (path, size, mtime_ns) of the table's parquet file(s). If the test
    data under sf_dir is regenerated mid-process, the stale frozen
    structures stop matching the key and retrain instead of silently
    certifying against structures trained on vanished data (ADVICE
    r11). A stat per file, no data read."""
    root = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    paths = [root]
    if os.path.isdir(root):
        paths = sorted(
            os.path.join(d, f)
            for d, _, files in os.walk(root)
            for f in files
            if not f.startswith(("_", "."))
        )
    out = []
    for p in paths:
        try:
            st = os.stat(p)
            out.append((p, st.st_size, st.st_mtime_ns))
        except OSError:
            out.append((p, -1, -1))
    return tuple(out)


def _emb(spark, sf_dir) -> DataFrame:
    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


def _centroid_df(spark, rows) -> DataFrame:
    return spark.createDataFrame(rows, "centroid_id INT, embedding ARRAY<DOUBLE>")


def _books_df(spark, rows) -> DataFrame:
    return spark.createDataFrame(rows, "sub_idx INT, code INT, sub_vec ARRAY<DOUBLE>")


def frozen_kmeans(
    spark,
    sf_dir: str,
    k: int,
    iters: int,
    unit: bool = False,
    subset: str | None = None,
) -> DataFrame:
    """Memoized ``S.kmeans_centroids`` over the embeddings corpus.

    ``unit`` trains on the unit-normalized corpus (the IVF coarse-
    quantizer convention); ``subset="history"`` restricts training to
    ``vec_id % 3 != 0`` (the incremental-ingest entries' history half).
    Returns (centroid_id, embedding array<double>) — identical rows to
    a fresh training run, by determinism of the trainer.
    """
    key = ("kmeans", os.path.abspath(sf_dir), _corpus_fp(sf_dir, "embeddings"), k, iters, unit, subset)
    with _keylock(key):
        if key not in _ROWS:
            e = _emb(spark, sf_dir).select("vec_id", "embedding")
            if subset == "history":
                e = e.filter(F.col("vec_id") % 3 != 0)
            elif subset is not None:  # pragma: no cover - guard
                raise ValueError(f"unknown subset {subset!r}")
            if unit:
                e = S.unit_normalize(e, "embedding")
            # eager checkpoint: every Lloyd iteration re-reads its input,
            # so without this each iteration re-derives the scan +
            # normalization (the pre-fixture call sites checkpointed
            # their training input for the same reason)
            e = e.localCheckpoint(eager=True)
            cents = S.kmeans_centroids(e, k=k, iters=iters)
            _ROWS[key] = [
                (r["centroid_id"], list(r["embedding"])) for r in cents.collect()
            ]
    return _centroid_df(spark, _ROWS[key])


def frozen_pq_codebooks(spark, sf_dir: str, m: int, ksub: int, iters: int) -> DataFrame:
    """Memoized ``S.pq_codebooks`` over the embeddings corpus."""
    key = ("pqbooks", os.path.abspath(sf_dir), _corpus_fp(sf_dir, "embeddings"), m, ksub, iters)
    with _keylock(key):
        if key not in _ROWS:
            books = S.pq_codebooks(_emb(spark, sf_dir), m=m, ksub=ksub, iters=iters)
            _ROWS[key] = [
                (r["sub_idx"], r["code"], list(r["sub_vec"])) for r in books.collect()
            ]
    return _books_df(spark, _ROWS[key])


def frozen_ivfpq(
    spark, sf_dir: str, num_centroids: int, m: int, ksub: int, iters: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Memoized ``S.ivfpq_index`` over the embeddings corpus.

    Returns (coarse, books, codes) with the exact schemas of the live
    trainer; codes round-trip through a process-temp parquet so the
    corpus-sized table is scanned, not rebuilt from driver rows.
    """
    key = ("ivfpq", os.path.abspath(sf_dir), _corpus_fp(sf_dir, "embeddings"), num_centroids, m, ksub, iters)
    with _keylock(key):
        if key not in _ROWS:
            coarse, books, codes = S.ivfpq_index(
                _emb(spark, sf_dir),
                num_centroids=num_centroids,
                m=m,
                ksub=ksub,
                iters=iters,
            )
            path = os.path.join(
                tempfile.mkdtemp(prefix="fixture_ivfpq_"), "codes"
            )
            codes.write.parquet(path)
            _ROWS[key] = (
                [(r["centroid_id"], list(r["embedding"])) for r in coarse.collect()],
                [(r["sub_idx"], r["code"], list(r["sub_vec"])) for r in books.collect()],
            )
            _PATHS[key] = path
    coarse_rows, books_rows = _ROWS[key]
    return (
        _centroid_df(spark, coarse_rows),
        _books_df(spark, books_rows),
        spark.read.parquet(_PATHS[key]),
    )


def frozen_shingle_census(spark, sf_dir: str, n: int = 3):
    """Memoized 3-gram shingle statistics of the documents corpus: the
    per-doc distinct-shingle totals and the global (df, owner) census —
    the two tables every novelty/boilerplate curation query starts
    from. Computing the census is one explode + one hash-keyed shuffle
    of every shingle in the corpus; at 100 TB a pipeline materializes
    it ONCE as a shared intermediate and serves every downstream signal
    from the (much smaller) census, which is exactly what this fixture
    does for the gate/bench processes (VERDICT r10 item 7). Returns
    (totals, census): (doc_id, n_shingles) and (h, df, owner).
    """
    key = ("shingle_census", os.path.abspath(sf_dir), _corpus_fp(sf_dir, "documents"), n)
    with _keylock(key):
        if key not in _PATHS:
            from lakehouse_tacklebox_spark.operators import dedup as D

            d = load_tables(spark, sf_dir, ["documents"])["documents"]
            sh = D.shingle_hashes(d.select("doc_id", "text"), "text", n=n)
            base = tempfile.mkdtemp(prefix="fixture_shingles_")
            totals_path = os.path.join(base, "totals")
            census_path = os.path.join(base, "census")
            sh.select(
                "doc_id", F.size("shingles").cast("bigint").alias("n_shingles")
            ).write.parquet(totals_path)
            (
                sh.select("doc_id", F.explode("shingles").alias("h"))
                .groupBy("h")
                .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("owner"))
                .write.parquet(census_path)
            )
            _PATHS[key] = (totals_path, census_path)
    totals_path, census_path = _PATHS[key]
    return spark.read.parquet(totals_path), spark.read.parquet(census_path)


def frozen_dup_pairs(spark, sf_dir: str) -> DataFrame:
    """Memoized exact-verified near-dup pair set (3-gram Jaccard >= 0.2,
    MinHash(48) + LSH(16x3) candidates) — the shared input graph of the
    dup-cluster CC entries (dedup_cluster_cc, graph_cc_incremental).

    dedup_minhash_lsh demonstrates and prices the pair GENERATION
    pipeline itself and therefore does NOT use this fixture; the CC
    entries price what happens AFTER the pairs exist, which at 100 TB
    reads a materialized pair table — exactly what this parquet is.
    Deterministic for a given corpus (xxhash-seeded signatures, exact
    verify), so the memo is observationally identical to recomputing.
    Returns (id_a bigint, id_b bigint).
    """
    key = ("dup_pairs", os.path.abspath(sf_dir), _corpus_fp(sf_dir, "documents"))
    with _keylock(key):
        if key not in _PATHS:
            from lakehouse_tacklebox_spark.operators import dedup as D
            from lakehouse_tacklebox_spark.queries.textops import _spread

            d = _spread(load_tables(spark, sf_dir, ["documents"])["documents"])
            sh = D.shingle_hashes(d.select("doc_id", "text"), "text", n=3)
            sigs = D.minhash_signatures(sh, "doc_id", "shingles", num_hashes=48).filter(
                F.col("sig").getItem(0).isNotNull()
            )
            cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=16, rows_per_band=3)
            verified = D.jaccard_for_pairs(cand, sh, "doc_id", "shingles")
            path = os.path.join(tempfile.mkdtemp(prefix="fixture_dup_pairs_"), "pairs")
            (
                verified.filter(F.col("jaccard") >= 0.2)
                .select(
                    F.col("id_a").cast("bigint").alias("id_a"),
                    F.col("id_b").cast("bigint").alias("id_b"),
                )
                .write.parquet(path)
            )
            _PATHS[key] = path
    return spark.read.parquet(_PATHS[key])
