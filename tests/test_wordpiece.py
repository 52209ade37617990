"""Independent certification of text_wordpiece_segment (standing rule:
the DuckDB oracle replays the same spec, so every transform/tokenizer
entry also gets a reference implemented separately — same spec,
different code path)."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

SF_DIR = "/root/testdata/sf0.001"

_VOCAB = 50
_MAXLEN = 6
_TOP = 30


def _py_wordpiece(docs: dict[int, str]):
    """Pure-Python replay of the text_wordpiece_segment spec."""
    words: Counter = Counter()
    for t in docs.values():
        for w in re.split(r"\s+", t.lower().strip()):
            if re.fullmatch("[a-z]+", w) and len(w) >= 2:
                words[w] += 1

    piece_wt: Counter = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(2, _MAXLEN + 1):
                if i + l <= len(w):
                    piece_wt[w[i : i + l]] += c
    multi = {
        p
        for p, _ in sorted(piece_wt.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB]
    }
    vocab = multi | {ch for w in words for ch in w}

    uses: Counter = Counter()
    n_words: Counter = Counter()
    for w, c in words.items():
        pos, seen = 0, set()
        while pos < len(w):
            for l in range(min(_MAXLEN, len(w) - pos), 0, -1):
                if w[pos : pos + l] in vocab:
                    uses[w[pos : pos + l]] += c
                    seen.add(w[pos : pos + l])
                    pos += l
                    break
        for p in seen:
            n_words[p] += 1

    ranked = sorted(uses.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP]
    return [(p, u, n_words[p], r) for r, (p, u) in enumerate(ranked, 1)]


def test_wordpiece_matches_python_reference_on_gate_sample(spark):
    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    )
    from lakehouse_tacklebox_spark.queries.textops import text_wordpiece_segment

    got = [
        (r["piece"], r["n_uses"], r["n_words"], r["rank"])
        for r in text_wordpiece_segment(spark, SF_DIR).collect()
    ]
    exp = _py_wordpiece({int(k): v for k, v in docs.items()})
    assert got == exp and len(got) == min(_TOP, len(exp))


def test_wordpiece_vocab_cut_forces_fallback(spark):
    """The top-50 cut is load-bearing: on the gate corpus some greedy
    step must consume a piece SHORTER than the longest substring at its
    cursor (i.e. fallback actually happens), and multi-char pieces must
    dominate usage (the walk is not degenerate single-char chopping)."""
    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    )
    words: Counter = Counter()
    for t in docs.values():
        for w in re.split(r"\s+", t.lower().strip()):
            if re.fullmatch("[a-z]+", w) and len(w) >= 2:
                words[w] += 1
    piece_wt: Counter = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(2, _MAXLEN + 1):
                if i + l <= len(w):
                    piece_wt[w[i : i + l]] += c
    assert len(piece_wt) > _VOCAB, "corpus must overflow the vocab cut"

    rows = _py_wordpiece(docs)
    assert any(len(p) > 1 for p, *_ in rows), "multi-char pieces must be used"
    multi = {
        p
        for p, _ in sorted(piece_wt.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB]
    }
    vocab = multi | {ch for w in words for ch in w}
    fallback = False
    for w in words:
        pos = 0
        while pos < len(w):
            longest = max(
                (l for l in range(1, min(_MAXLEN, len(w) - pos) + 1)
                 if w[pos : pos + l] in vocab)
            )
            maxsub = min(_MAXLEN, len(w) - pos)
            if longest < maxsub and maxsub >= 2:
                fallback = True
            pos += longest
    assert fallback, "greedy must fall back below the max substring length somewhere"


# --- hypothesis property: Spark == reference on arbitrary corpora ----------

import os

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcde", min_size=2, max_size=7)
_doc = st.lists(_word, min_size=2, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=5)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(_corpus)
def test_wordpiece_spark_equals_reference_on_random_corpora(spark, tmp_path_factory, docs):
    """For arbitrary corpora: the Spark census equals the pure-Python
    reference, and the reference's greedy walk is TOTAL (singles always
    match) with pieces concatenating back to each word — so a Spark
    mismatch can only come from the engine side, never the spec."""
    d = str(tmp_path_factory.mktemp("wp"))
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
        }
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"))

    from lakehouse_tacklebox_spark.queries.textops import text_wordpiece_segment

    got = [
        (r["piece"], r["n_uses"], r["n_words"], r["rank"])
        for r in text_wordpiece_segment(spark, d).collect()
    ]
    exp = _py_wordpiece(dict(enumerate(docs)))
    assert got == exp

    # totality + reconstruction of the reference walk
    words = {
        w
        for t in docs
        for w in re.split(r"\s+", t.lower().strip())
        if re.fullmatch("[a-z]+", w) and len(w) >= 2
    }
    piece_wt: Counter = Counter()
    for w in words:
        for i in range(len(w)):
            for l in range(2, _MAXLEN + 1):
                if i + l <= len(w):
                    piece_wt[w[i : i + l]] += 1
    multi = {
        p
        for p, _ in sorted(piece_wt.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB]
    }
    vocab = multi | {ch for w in words for ch in w}
    for w in words:
        pos, parts = 0, []
        while pos < len(w):
            length = max(
                l
                for l in range(1, min(_MAXLEN, len(w) - pos) + 1)
                if w[pos : pos + l] in vocab
            )
            parts.append(w[pos : pos + length])
            pos += length
        assert "".join(parts) == w
