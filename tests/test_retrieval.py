"""Independent certification of the retrieval entries (the standing rule
from the round-8 BPE lesson: the DuckDB oracle replays the SAME program,
so every transform/ranking entry also gets a reference implemented
SEPARATELY from the Spark code — same spec, different code path)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- BM25+RRF


def _py_hybrid(docs: dict[int, str], vecs: dict[int, list[float]], n_q: int = 3):
    """Pure-Python replay of the rag_hybrid_retrieval spec: rational
    integer BM25 (k1=1.2, b=0.75), exact cosine leg, integer RRF."""
    tok = {
        d: [w for w in re.split(r"\s+", t.lower().strip()) if re.fullmatch("[a-z]+", w) and len(w) >= 2]
        for d, t in docs.items()
    }
    dl = {d: len(ws) for d, ws in tok.items() if ws}
    n_docs, total = len(dl), sum(dl.values())
    df: Counter = Counter()
    for d, ws in tok.items():
        df.update(set(ws))
    kw_lists = {}
    for q in range(n_q):
        scores: dict[int, int] = defaultdict(int)
        for w in set(tok.get(q, [])):
            for d, ws in tok.items():
                if d == q:
                    continue
                tf = ws.count(w)
                if not tf:
                    continue
                idf = ((2 * (n_docs - df[w]) + 1) * 1_000_000) // (2 * df[w] + 1)
                ratio = (44000 * tf * total) // (
                    20 * tf * total + 6 * total + 18 * dl[d] * n_docs
                )
                scores[d] += idf * ratio
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        kw_lists[q] = {d: r + 1 for r, (d, _) in enumerate(ranked)}
    vec_lists = {}
    for q in range(n_q):
        qv = np.array(vecs[q], dtype=np.float64)
        sims = []
        for d, v in vecs.items():
            if d == q:
                continue
            cv = np.array(v, dtype=np.float64)
            c = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
            sims.append((round(c, 6), d))
        sims.sort(key=lambda t: (-t[0], t[1]))
        vec_lists[q] = {d: r + 1 for r, (_, d) in enumerate(sims[:10])}
    out = []
    for q in range(n_q):
        fused = {}
        for d in set(kw_lists[q]) | set(vec_lists[q]):
            kr = kw_lists[q].get(d, -1)
            vr = vec_lists[q].get(d, -1)
            rrf = (1_000_000 // (60 + kr) if kr > 0 else 0) + (
                1_000_000 // (60 + vr) if vr > 0 else 0
            )
            fused[d] = (kr, vr, rrf)
        top = sorted(fused.items(), key=lambda kv: (-kv[1][2], kv[0]))[:5]
        for fr, (d, (kr, vr, rrf)) in enumerate(top, 1):
            out.append((q, d, kr, vr, rrf, fr))
    return out


def test_hybrid_matches_python_reference_on_gate_sample(spark):
    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    )
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        ).fetchall()
    )
    from lakehouse_tacklebox_spark.queries.retrieval import rag_hybrid_retrieval

    got = [
        (r["query_id"], r["doc_id"], r["kw_rank"], r["vec_rank"], r["rrf_ppm"], r["fused_rank"])
        for r in rag_hybrid_retrieval(spark, SF_DIR).collect()
    ]
    exp = _py_hybrid({int(k): v for k, v in docs.items()},
                     {int(k): list(v) for k, v in vecs.items()})
    assert got == exp and len(got) == 15


# --------------------------------------------------------------------- MMR


def _py_mmr(vecs: dict[int, list[float]], n_q: int = 3, shortlist: int = 20, k: int = 5):
    """Pure-Python replay of the knn_mmr_rerank spec: SQ floor codec,
    integer zero-centered dots, greedy 7*qdot - 3*maxsel."""
    ids = sorted(vecs)
    mat = np.array([vecs[i] for i in ids], dtype=np.float64)
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    span = np.where(mx == mn, 1.0, mx - mn)
    codes = np.where(
        mx == mn, 0, np.minimum(np.floor((mat - mn) * 255.0 / span), 255.0)
    ).astype(np.int64)
    z = 2 * codes - 255
    idx = {i: r for r, i in enumerate(ids)}
    out = []
    for q in range(n_q):
        dots = {i: int(z[idx[q]] @ z[idx[i]]) for i in ids if i != q}
        cand = sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))[:shortlist]
        cand_ids = [i for i, _ in cand]
        qdot = dict(cand)
        picked: list[int] = []
        for rank in range(1, k + 1):
            best = None
            for c in cand_ids:
                if c in picked:
                    continue
                if picked:
                    maxp = max(int(z[idx[c]] @ z[idx[s]]) for s in picked)
                    score = 7 * qdot[c] - 3 * maxp
                else:
                    score = 7 * qdot[c]
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            _, c, score = best
            picked.append(c)
            out.append((q, c, qdot[c], score, rank))
    return out


def test_mmr_matches_python_reference_on_gate_corpus(spark):
    con = duckdb.connect()
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        ).fetchall()
    )
    from lakehouse_tacklebox_spark.queries.retrieval import knn_mmr_rerank

    got = [
        (r["query_id"], r["neighbor_id"], r["qdot"], r["mmr_score"], r["mmr_rank"])
        for r in knn_mmr_rerank(spark, SF_DIR).collect()
    ]
    exp = _py_mmr({int(k): list(v) for k, v in vecs.items()})
    assert got == exp and len(got) == 15


def test_mmr_actually_diversifies(spark):
    """MMR's point: the picked set is not just the qdot top-5. On the
    gate corpus at least one query must reorder vs pure relevance (if
    this ever degenerates the entry is measuring nothing)."""
    con = duckdb.connect()
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        ).fetchall()
    )
    exp = _py_mmr({int(k): list(v) for k, v in vecs.items()})
    reordered = 0
    for q in range(3):
        rows = [t for t in exp if t[0] == q]
        by_rank = [t[1] for t in sorted(rows, key=lambda t: t[4])]
        by_qdot = [t[1] for t in sorted(rows, key=lambda t: (-t[2], t[1]))]
        if by_rank != by_qdot:
            reordered += 1
    assert reordered >= 1


# --------------------------------------------------- incremental LSH ingest


def test_incremental_lsh_equals_full_restricted_to_batch(spark):
    """The incremental entry's pair set == dedup_minhash_lsh's (full
    corpus) restricted to pairs touching the batch — signatures are
    per-doc, so the split must not change what bands together."""
    from lakehouse_tacklebox_spark.queries.textops import (
        dedup_incremental_lsh,
        dedup_minhash_lsh,
    )

    full = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
        if r["id_a"] % 3 == 0 or r["id_b"] % 3 == 0
    }
    inc_rows = dedup_incremental_lsh(spark, SF_DIR).collect()
    assert all(r["index_merge_match"] == 1 for r in inc_rows)
    inc = {(r["id_a"], r["id_b"], r["jaccard"]) for r in inc_rows}
    assert inc == full and len(inc) > 0


# ------------------------------------------------------- late interaction


def _py_late_interaction(
    docs: dict[int, str], n_q: int = 3, win: int = 8, buckets: int = 64,
    shortlist: int = 20, k: int = 5,
):
    """Pure-Python replay of the rag_late_interaction spec: md5
    feature-hash count vectors over 8-token windows, whole-doc coarse
    shortlist, then sum-over-query-windows of max-over-doc-windows
    integer dots."""
    import hashlib

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % buckets

    wvecs: dict[int, list[Counter]] = {}
    dvecs: dict[int, Counter] = {}
    for d, t in docs.items():
        toks = [
            w for w in re.split(r"\s+", t.lower().strip())
            if re.fullmatch("[a-z]+", w) and len(w) >= 2
        ]
        wins = [Counter(bucket(w) for w in toks[i : i + win])
                for i in range(0, len(toks), win)]
        if wins:
            wvecs[d] = wins
            dvecs[d] = sum(wins, Counter())

    def dot(a: Counter, b: Counter) -> int:
        return sum(c * b[x] for x, c in a.items() if x in b)

    out = []
    for q in range(n_q):
        coarse = {
            d: dot(dvecs[q], v) for d, v in dvecs.items()
            if d != q and dot(dvecs[q], v) > 0
        }
        short = sorted(coarse.items(), key=lambda kv: (-kv[1], kv[0]))[:shortlist]
        scored = []
        for d, cd in short:
            ms = sum(
                max((dot(qw, dw) for dw in wvecs[d]), default=0)
                for qw in wvecs[q]
            )
            scored.append((d, cd, ms))
        scored.sort(key=lambda t: (-t[2], t[0]))
        for r, (d, cd, ms) in enumerate(scored[:k], 1):
            out.append((q, d, cd, ms, r))
    return out


def test_late_interaction_matches_python_reference_on_gate_sample(spark):
    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    )
    from lakehouse_tacklebox_spark.queries.retrieval import rag_late_interaction

    got = [
        (r["query_id"], r["doc_id"], r["coarse_dot"], r["maxsim"], r["li_rank"])
        for r in rag_late_interaction(spark, SF_DIR).collect()
    ]
    exp = _py_late_interaction({int(kk): v for kk, v in docs.items()})
    assert got == exp and len(got) == 15


def test_late_interaction_maxsim_rewards_local_match(spark, tmp_path):
    """MaxSim semantics pin: a doc that matches the query's two windows
    in two DIFFERENT regions outscores a doc that concentrates the same
    matched tokens in one region — the property single-vector scoring
    cannot express (both have identical whole-doc count vectors)."""
    import pandas as pd

    qa = "alpha beta gamma delta epsilon zeta eta theta"      # window 1
    qb = "iota kappa lam mu nu xi omi pi"                     # window 2
    spread = qa + " " + qb                                    # matches both windows
    clumped = qa + " " + qa                                   # same tokens, one region doubled
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 10, 11],
            "text": [qa + " " + qb, spread, clumped],
            "source": ["t"] * 3,
            "lang": ["en"] * 3,
        }
    )
    d = str(tmp_path / "li")
    import os

    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))

    from lakehouse_tacklebox_spark.queries.retrieval import rag_late_interaction

    rows = {
        (r["query_id"], r["doc_id"]): (r["maxsim"], r["li_rank"])
        for r in rag_late_interaction(spark, d).collect()
        if r["query_id"] == 0
    }
    ms_spread, rk_spread = rows[(0, 10)]
    ms_clump, rk_clump = rows[(0, 11)]
    assert ms_spread > ms_clump and rk_spread < rk_clump
