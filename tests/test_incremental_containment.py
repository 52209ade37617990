"""dedup_incremental_containment certification beyond the driver oracle:
the incremental path (batch probing the persisted index) must equal the
FULL-recompute operator restricted to batch-touching pairs, and both
cross orientations must actually occur on the gate corpus (neither
store-probe join is vacuous)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_equals_full_recompute_restricted(spark):
    from lakehouse_tacklebox_spark.operators.dedup import containment_pairs
    from lakehouse_tacklebox_spark.queries.textops import (
        dedup_incremental_containment,
    )
    from lakehouse_tacklebox_spark.sources import load_tables

    got = dedup_incremental_containment(spark, SF_DIR).collect()
    assert got and all(r["index_merge_match"] == 1 for r in got)
    inc = {
        (r["id_a"], r["id_b"], r["inter"], r["sz_a"], r["containment_ppm"])
        for r in got
    }

    # full recompute with the batch-agnostic operator (no df cap, as in
    # the entry), restricted to batch-touching pairs
    d = load_tables(spark, SF_DIR, ["documents"])["documents"]
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    base = d.select("doc_id", toks.alias("w"))
    chunks = base.filter(F.size("w") >= 40).select(
        (F.col("doc_id") + 10000).alias("doc_id"), F.slice("w", 1, 25).alias("w")
    )
    aug = base.unionByName(chunks)
    grams = F.expr(
        "CASE WHEN size(w) >= 3 THEN transform(sequence(3, size(w)), "
        "i -> concat_ws(' ', w[i-3], w[i-2], w[i-1])) "
        "ELSE CAST(array() AS array<string>) END"
    )
    full = {
        (r["id_a"], r["id_b"], r["inter"], r["sz_a"], r["containment_ppm"])
        for r in containment_pairs(
            aug.select("doc_id", grams.alias("grams")),
            "doc_id",
            "grams",
            threshold_ppm=900000,
        ).collect()
        if r["id_a"] % 3 == 0 or r["id_b"] % 3 == 0
    }
    assert inc == full

    # both cross orientations occur: a batch doc contained in history
    # AND a history doc contained in the batch (the two store probes)
    assert any(a % 3 == 0 and b % 3 != 0 for a, b, *_ in inc)
    assert any(a % 3 != 0 and b % 3 == 0 for a, b, *_ in inc)


def test_index_append_equals_full_recompute_rowsets(spark):
    """Full row-set equality pin for the index-maintenance read-back.

    The entry certifies the appended index against a from-scratch
    recompute with an order-invariant (count, xor-hash, sum-hash)
    signature — one aggregate pass, no full-postings shuffle. This test
    keeps the EXACT row-set equality pinned at sf0.001: history-index ∪
    batch-index must equal the from-scratch index of the union corpus,
    row for row (postings exactly; doc arrays as content sets, since
    prefix order is a performance choice)."""
    from lakehouse_tacklebox_spark.operators.dedup import _containment_docs
    from lakehouse_tacklebox_spark.queries.textops import _spread
    from lakehouse_tacklebox_spark.sources import load_tables

    d = _spread(load_tables(spark, SF_DIR, ["documents"])["documents"])
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    base = d.select("doc_id", toks.alias("w"))
    chunks = base.filter(F.size("w") >= 40).select(
        (F.col("doc_id") + 10000).alias("doc_id"), F.slice("w", 1, 25).alias("w")
    )
    aug = base.unionByName(chunks)
    grams = F.expr(
        "CASE WHEN size(w) >= 3 THEN transform(sequence(3, size(w)), "
        "i -> concat_ws(' ', w[i-3], w[i-2], w[i-1])) "
        "ELSE CAST(array() AS array<string>) END"
    )
    shingled = aug.select("doc_id", grams.alias("grams")).persist()
    T = 900000

    docs_ex, post_ex = _containment_docs(
        shingled.filter(F.col("doc_id") % 3 != 0), "doc_id", "grams", T, None
    )
    docs_inc, post_inc = _containment_docs(
        shingled.filter(F.col("doc_id") % 3 == 0), "doc_id", "grams", T, None
    )
    full_docs, full_post = _containment_docs(shingled, "doc_id", "grams", T, None)

    post_union = {
        (r["doc_id"], r["sh"])
        for r in post_ex.unionByName(post_inc).collect()
    }
    post_full = {(r["doc_id"], r["sh"]) for r in full_post.collect()}
    assert post_union == post_full and post_full

    canon = lambda fr: {
        (r["doc_id"], frozenset(r["arr"]), r["sz"], r["prefix_len"])
        for r in fr.collect()
    }
    assert canon(docs_ex.unionByName(docs_inc)) == canon(full_docs)
    shingled.unpersist()
