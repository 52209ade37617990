"""Certify the BYTE-level BPE replace-chain (text_bpe_bytes) against a
pure-Python byte-BPE reference on adversarial strings — including
multi-byte UTF-8 codepoints the gate corpus lacks — and pin the no-OOV
property: every Unicode string tokenizes, and the merged symbols
concatenate back to its exact UTF-8 byte stream (tokenization is a
lossless re-grouping; decoding the hex recovers the original string).

Also certifies the byte-level trainer (the unrolled-CTE DuckDB program
with _BPE_BYTES_V0) against a brute-force pure-Python trainer on the
sf0.001 corpus, mirroring tests/test_bpe.py's char-level pin.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.queries.textops import (
    _BPE_BYTES_MERGES,
    _BPE_BYTES_V0,
    _bpe_expr_sql,
    _bpe_train_oracle,
)

SF_DIR = "/root/testdata/sf0.001"

# Adversarial apply set: merge-boundary runs, overlaps, repeats, plus
# multi-byte UTF-8 (2-, 3-, 4-byte codepoints, combining marks, mixed
# scripts) — the byte-fallback cases a char-level tokenizer can't see.
ADVERSARIAL = [
    "erer", "ererer", "rerere", "stst", "ststst", "tstst",
    "master", "error", "torrent", "distorted", "orow", "owow",
    "é", "éé", "café", "naïve", "über", "soufflé",
    "漢", "漢字", "日本語テスト", "한국어",
    "🙂", "🙂🙂", "a🙂b", "🇺🇳",
    "é", "ño",  # combining acute / tilde
    "mixed漢er字st", "er漢er", "αβγer",
    "a", "zz", "-", "--", "a-b", "1234", "!?!",
]


def byte_syms(word: str) -> list[str]:
    return [f"{b:02X}" for b in word.encode("utf-8")]


def true_byte_bpe(word: str, merges) -> list[str]:
    """Textbook greedy BPE over hex-byte symbols: apply merges in rank
    order, each pass exhaustive left-to-right over the symbol list."""
    syms = byte_syms(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _chain_tokens_spark(spark, words, merges) -> dict[str, list[str]]:
    df = spark.createDataFrame([(w,) for w in words], "w string")
    sym = (
        "concat(' ', trim(regexp_replace(hex(encode(w, 'UTF-8')),"
        " '(..)', '$1  ')), ' ')"
    )
    out = df.select(
        "w", F.expr(_bpe_expr_sql(sym, merges)).alias("bpe")
    ).collect()
    return {r["w"]: r["bpe"].strip().split("  ") for r in out}


def test_byte_chain_equals_python_reference(spark):
    got = _chain_tokens_spark(spark, ADVERSARIAL, _BPE_BYTES_MERGES)
    for w in ADVERSARIAL:
        assert got[w] == true_byte_bpe(w, _BPE_BYTES_MERGES), w


def test_no_oov_and_roundtrip_on_any_unicode(spark):
    """The no-OOV pin: every adversarial string tokenizes into symbols
    drawn from base-256 ∪ learned merges, and the symbols concatenate
    back to the exact UTF-8 hex — decoding recovers the original."""
    merged = {a + b for a, b in _BPE_BYTES_MERGES}
    got = _chain_tokens_spark(spark, ADVERSARIAL, _BPE_BYTES_MERGES)
    for w in ADVERSARIAL:
        toks = got[w]
        assert all(len(t) == 2 or t in merged for t in toks), (w, toks)
        hexcat = "".join(toks)
        assert hexcat == w.encode("utf-8").hex().upper(), w
        assert bytes.fromhex(hexcat).decode("utf-8") == w


def test_duckdb_chain_matches_python_reference():
    """Oracle-side apply program on the same adversarial strings."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE words AS SELECT * FROM (VALUES "
        + ", ".join(f"(?)" for _ in ADVERSARIAL)
        + ") t(w)",
        ADVERSARIAL,
    )
    sym = (
        "concat(' ', trim(regexp_replace(hex(encode(w)), '(..)',"
        " '\\1  ', 'g')), ' ')"
    )
    rows = con.execute(
        f"SELECT w, {_bpe_expr_sql(sym, _BPE_BYTES_MERGES)} AS bpe FROM words"
    ).fetchall()
    for w, bpe in rows:
        assert bpe.strip().split("  ") == true_byte_bpe(w, _BPE_BYTES_MERGES), w


def _python_byte_trainer(weighted_vocab: dict[str, int], n: int):
    """Brute-force byte-BPE trainer: weighted adjacent-pair census over
    the vocab, argmax (count desc, pair asc), apply, repeat."""
    vocab = {tuple(byte_syms(w)): c for w, c in weighted_vocab.items()}
    merges = []
    for _ in range(n):
        census: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                census[(syms[i], syms[i + 1])] += c
        if not census:
            break
        (a, b), cnt = min(
            census.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        new_vocab: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_byte_trainer_matches_python_on_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    got = con.execute(_bpe_train_oracle(10, v0_sql=_BPE_BYTES_V0)).fetchall()

    texts = con.execute("SELECT trim(text) FROM documents").fetchall()
    vocab: Counter = Counter()
    for (t,) in texts:
        for w in re.split(r"\s+", t):
            if w and len(w.encode("utf-8")) >= 2:
                vocab[w] += 1
    want = _python_byte_trainer(vocab, 10)
    assert [(a, b, n) for _, a, b, _, n in got] == want
