"""Independent certification of text_span_excision: the DuckDB oracle
replays the SAME window/union/segment program, and same-program parity
can mask a shared misconception (the round-8 BPE boundary-bleed bug
passed its oracle for exactly that reason) — so this test checks the
transform against a brute-force pure-Python excision on crafted corpora
that exercise every edge: overlapping flagged windows, back-to-back
spans, a fully-removed doc, docs below the 8-token window size, and
duplicates planted at doc heads/tails.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F


def brute_excise(docs: dict[int, str], window: int = 8):
    """Reference implementation: flag every w-token window occurring in
    >= 2 distinct docs, remove the union of flagged [i, i+w) spans,
    report (n_tokens, n_removed, n_kept_segments, md5(cleaned))."""
    toks = {d: re.split(r"\s+", t.lower().strip()) for d, t in docs.items()}
    seen: dict[str, set[int]] = {}
    for d, t in toks.items():
        for i in range(len(t) - window + 1):
            seen.setdefault(" ".join(t[i : i + window]), set()).add(d)
    dup = {w for w, ds in seen.items() if len(ds) >= 2}
    out = {}
    for d, t in toks.items():
        removed = set()
        for i in range(len(t) - window + 1):
            if " ".join(t[i : i + window]) in dup:
                removed.update(range(i, i + window))
        if not removed:
            continue
        kept = [i for i in range(len(t)) if i not in removed]
        segs = sum(1 for j, i in enumerate(kept) if j == 0 or kept[j - 1] != i - 1)
        cleaned = " ".join(t[i] for i in kept)
        out[d] = (
            len(t),
            len(removed),
            segs,
            hashlib.md5(cleaned.encode()).hexdigest(),
        )
    return out


def _run_entry(spark, docs: dict[int, str]):
    from lakehouse_tacklebox_spark.queries.textops import text_span_excision
    import tempfile

    df = spark.createDataFrame(
        [(d, t, "synthetic", "en") for d, t in docs.items()],
        "doc_id long, text string, source string, lang string",
    )
    tmp = tempfile.mkdtemp(prefix="excise_")
    df.write.parquet(f"{tmp}/documents.parquet")
    rows = text_span_excision(spark, tmp).collect()
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_kept_segments"],
            r["cleaned_md5"],
        )
        for r in rows
    }


def test_excision_matches_bruteforce_on_crafted_corpus(spark):
    w = [f"w{i}" for i in range(40)]
    shared_a = " ".join(w[0:8])      # one exact 8-window, planted twice
    shared_b = " ".join(w[10:19])    # 9 tokens -> two overlapping windows
    docs = {
        # duplicate at the HEAD, unique tail
        1: shared_a + " " + " ".join(w[20:30]),
        # duplicate at the TAIL
        2: " ".join(w[30:40]) + " " + shared_a,
        # fully-removed doc: nothing but the 9-token shared run
        3: shared_b,
        # duplicate in the middle -> two kept segments
        4: " ".join(w[20:25]) + " " + shared_b + " " + " ".join(w[25:30]),
        # back-to-back duplicates -> one merged removed run
        5: shared_a + " " + shared_a + " tailone tailtwo",
        6: "short doc under window size",
        7: " ".join(w[0:7]) + " distinct ending here now",  # 7-token prefix of shared_a: NOT a dup window
    }
    assert _run_entry(spark, docs) == brute_excise(docs)


def test_excision_matches_bruteforce_on_gate_sample(spark):
    """The first 150 gate docs through both implementations — real text,
    real duplicate structure."""
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT doc_id, text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') ORDER BY doc_id LIMIT 150"
    ).fetchall()
    docs = {int(d): t for d, t in rows}
    got = _run_entry(spark, docs)
    exp = brute_excise(docs)
    assert got == exp and len(exp) > 0


def brute_excise_incremental(docs: dict[int, str], window: int = 8):
    """Reference for the INCREMENTAL path: existing = doc_id % 3 != 0,
    incoming = doc_id % 3 == 0; flag an incoming window iff it occurs
    anywhere in existing OR in >= 2 distinct incoming docs; excise only
    incoming docs."""
    toks = {d: re.split(r"\s+", t.lower().strip()) for d, t in docs.items()}
    exist_wins: set[str] = set()
    inc_seen: dict[str, set[int]] = {}
    for d, t in toks.items():
        for i in range(len(t) - window + 1):
            key = " ".join(t[i : i + window])
            if d % 3 != 0:
                exist_wins.add(key)
            else:
                inc_seen.setdefault(key, set()).add(d)
    dup = {w for w, ds in inc_seen.items() if w in exist_wins or len(ds) >= 2}
    out = {}
    for d, t in toks.items():
        if d % 3 != 0:
            continue
        removed = set()
        for i in range(len(t) - window + 1):
            if " ".join(t[i : i + window]) in dup:
                removed.update(range(i, i + window))
        if not removed:
            continue
        kept = [i for i in range(len(t)) if i not in removed]
        segs = sum(1 for j, i in enumerate(kept) if j == 0 or kept[j - 1] != i - 1)
        cleaned = " ".join(t[i] for i in kept)
        out[d] = (
            len(t),
            len(removed),
            segs,
            hashlib.md5(cleaned.encode()).hexdigest(),
        )
    return out


def _run_incremental_entry(spark, docs: dict[int, str]):
    from lakehouse_tacklebox_spark.queries.textops import (
        text_span_excision_incremental,
    )
    import tempfile

    df = spark.createDataFrame(
        [(d, t, "synthetic", "en") for d, t in docs.items()],
        "doc_id long, text string, source string, lang string",
    )
    tmp = tempfile.mkdtemp(prefix="excise_inc_")
    df.write.parquet(f"{tmp}/documents.parquet")
    rows = text_span_excision_incremental(spark, tmp).collect()
    assert all(r["census_merge_match"] == 1 for r in rows)
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_kept_segments"],
            r["cleaned_md5"],
        )
        for r in rows
    }


def test_incremental_excision_matches_bruteforce_on_crafted_corpus(spark):
    """Crafted so every two-phase branch fires: an incoming window that
    dupes an EXISTING 1-doc window (the store must hold count-1 rows), a
    within-batch duplicate with no existing occurrence, an existing-only
    duplicate pair (must NOT surface — only batch docs are excised), and
    incoming docs with no flagged window."""
    w = [f"w{i}" for i in range(60)]
    exist_hit = " ".join(w[0:8])     # in ONE existing doc + one incoming
    batch_dup = " ".join(w[10:18])   # in TWO incoming docs, no existing
    exist_only = " ".join(w[20:28])  # duplicated across existing docs only
    docs = {
        # existing (d % 3 != 0)
        1: exist_hit + " " + " ".join(w[30:40]),
        2: exist_only + " " + " ".join(w[40:50]),
        4: " ".join(w[50:60]) + " " + exist_only,
        # incoming (d % 3 == 0)
        3: " ".join(w[30:35]) + " " + exist_hit + " " + " ".join(w[35:40]),
        6: batch_dup + " unique middle words here " + " ".join(w[40:45]),
        9: " ".join(w[45:50]) + " " + batch_dup,
        12: "completely unique incoming document with no duplicate window at all",
        15: "short batch doc",
    }
    got = _run_incremental_entry(spark, docs)
    exp = brute_excise_incremental(docs)
    assert got == exp and len(exp) == 3  # docs 3, 6, 9


def test_incremental_equals_full_restricted_to_batch(spark):
    """The equivalence argument in the register note, checked end-to-end
    on real gate text: the incremental entry's output == the batch
    entry's output restricted to incoming (doc_id % 3 == 0) docs."""
    full = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_kept_segments"],
            r["cleaned_md5"],
        )
        for r in __import__(
            "lakehouse_tacklebox_spark.queries.textops", fromlist=["text_span_excision"]
        ).text_span_excision(spark, "/root/testdata/sf0.001").collect()
        if r["doc_id"] % 3 == 0
    }
    inc = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_kept_segments"],
            r["cleaned_md5"],
        )
        for r in __import__(
            "lakehouse_tacklebox_spark.queries.textops",
            fromlist=["text_span_excision_incremental"],
        ).text_span_excision_incremental(spark, "/root/testdata/sf0.001").collect()
    }
    assert inc == full and len(inc) > 0
