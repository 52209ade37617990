"""Corpus-preparation operators for training-data pipelines: deterministic
sampling, token-budget sharding, and PII scrubbing.

All three are pure JVM expression compositions (no UDFs): at 100 TB these
run inside whole-stage codegen, shuffle only where a window/groupBy
demands it, and are reproducible run-to-run — the property that matters
for dataset versioning (a re-run selects byte-identical training sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators.dedup import shingle, shingle_hashes


def hash_bucket(col, buckets: int = 100):
    """Deterministic bucket in [0, buckets) from the md5 of a value's
    string form. Engine-portable (any system with md5 + hex→int yields
    identical buckets — DuckDB: ``('0x' || substr(md5(v), 1, 15))::BIGINT
    % buckets``), unlike rand(seed), whose stream depends on partitioning.
    The first 15 hex chars (60 bits) stay inside a signed BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long") % buckets


def stratified_sample(
    df: DataFrame, strata_col: str, rates: dict[str, int], id_col: str, default_rate: int = 0
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its id's hash
    bucket falls below its stratum's percentage rate.

    Unlike ``df.sampleBy`` (per-partition RNG: resampling after a
    repartition changes the selected rows), membership depends only on
    the id value — stable across cluster size, partitioning, and reruns,
    so the sampled corpus is a reproducible artifact. Selection is a
    map-side filter; no shuffle.
    """
    rate = None
    for stratum, pct in sorted(rates.items()):
        cond = F.when(F.col(strata_col) == stratum, F.lit(pct))
        rate = cond if rate is None else rate.when(F.col(strata_col) == stratum, F.lit(pct))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    return df.filter(hash_bucket(F.col(id_col)) < rate)


def pack_shards(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Sequential token-budget sharding: within each partition (e.g.
    language), order rows deterministically and cut a new shard every
    ``budget`` size units: shard = floor(running_size_before_row / budget).

    One window shuffle on (part_col); no driver loop. This is the
    scale-sane approximation of bin packing — true first-fit packing is
    inherently sequential, while contiguous cuts over a deterministic
    order parallelize per partition and over-fill a shard by at most one
    document. Rows larger than ``budget`` get a shard of their own.
    """
    w = W.partitionBy(part_col).orderBy(order_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum(size_col).over(w)
    return df.withColumn(
        shard_col, F.floor((cum - F.col(size_col)) / F.lit(budget)).cast("long")
    )


def contamination_flags(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an evaluation set.

    The eval side (benchmark suites: thousands of documents, not
    billions) collapses to its DISTINCT shingle set and is broadcast, so
    the corpus side is a map-side semi-join probe — the 100 TB scan
    never shuffles, and documents too short to shingle are trivially
    clean. Returns ``train`` plus a boolean ``contaminated`` column.

    ``probe`` (optional): frame to shingle for hit detection instead of
    ``train`` — pass a cheaper UPSTREAM superset (e.g. the pre-dedup
    corpus) when ``train`` itself is the product of an expensive plan, so
    that plan isn't recomputed for the probe branch. Flags still attach
    to ``train``; extra probe-only ids are dropped by the join.
    """
    # Hash-shingles on BOTH sides: the gram strings never materialize, the
    # broadcast set is 8-byte longs (a few MB even for large eval suites)
    # and the probe's semi join compares fixed-width keys. A 64-bit
    # cross-collision mis-flagging a clean document needs ~2^64 /
    # (|eval shingles| · |corpus grams|) luck — immaterial next to the
    # n-gram heuristic itself. explode_outer keeps the inferred size()
    # probe out of the upstream scan stage (see dedup.jaccard_pairs).
    eval_sh = (
        shingle_hashes(eval_df.select(text_col), text_col, n=n)
        .select(F.explode("shingles").alias("__s"))
        .distinct()
    )
    probe = train if probe is None else probe
    hit_ids = (
        shingle_hashes(probe.select(id_col, text_col), text_col, n=n)
        .select(id_col, F.explode_outer("shingles").alias("__s"))
        .filter(F.col("__s").isNotNull())
        .join(F.broadcast(eval_sh), "__s", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        train.join(hit_ids, id_col, "left")
        .withColumn("contaminated", F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


def vocabulary(
    df: DataFrame, text_col: str, min_doc_freq: int = 1, id_col: str | None = None
) -> DataFrame:
    """Corpus vocabulary: per-token corpus frequency (``tf``) and document
    frequency (``df``) — the first step of any tokenizer/BPE training or
    stopword derivation run over a training corpus.

    explode → one hash aggregation; ``df`` rides the same shuffle as a
    count of distinct ids per token. At 100 TB this is the canonical
    word-count shape: partial aggregation map-side, one shuffle on token.
    """
    id_col = id_col or df.columns[0]
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    out = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("__doc").alias("df"),
    )
    return out.filter(F.col("df") >= min_doc_freq) if min_doc_freq > 1 else out


# Public, intentionally simple patterns — a real deployment swaps in its
# own (the operator shape is what matters: regexp_count + regexp_replace
# stay JVM-side; never a per-row Python UDF for redaction).
PII_PATTERNS = {
    "phone": r"\b\d{2,3}-\d{3}-\d{3,4}-\d{4}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


def scrub_pii(
    df: DataFrame, text_col: str, patterns: dict[str, str] | None = None, out_col: str | None = None
) -> DataFrame:
    """Redact PII patterns from ``text_col`` and count hits per kind.

    Adds ``n_<kind>`` match-count columns and ``out_col`` (default
    ``<text_col>_scrubbed``) with every pattern replaced by ``[<KIND>]``.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or f"{text_col}_scrubbed"
    scrubbed = F.col(text_col)
    for kind, pat in patterns.items():
        df = df.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col, scrubbed)


def repetition_scores(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Intra-document repetition scoring (Gopher-style quality rule): how
    dominated is a document by its single most frequent word ``n``-gram?

    Adds ``n_grams`` (total n-gram occurrences), ``top_gram_count`` (the
    modal n-gram's occurrences) and ``rep_ratio`` (their quotient).
    Counting goes explode → two hash aggregations (one shuffle on
    (doc, gram)); the per-doc quadratic array-ops alternative is O(len²)
    per document and dies on long documents, so it is deliberately not
    used. Documents too short to shingle score 0.
    """
    # Hash-shingles end-to-end: the grams never exist as strings (the
    # hash is computed inside the shingling transform), so explode and
    # the (doc, gram) shuffle move fixed-width longs; a 64-bit collision
    # inside ONE document's grams is vanishingly unlikely at any doc
    # size. explode_outer (not explode): a bare explode lets
    # InferFiltersFromGenerate sink an inlined size(shingles)>0 probe
    # below the caller's repartition into the scan stage (see
    # dedup.jaccard_pairs).
    g = shingle_hashes(df.select(id_col, text_col), text_col, n=n, out_col="__g", distinct=False)
    per = (
        g.select(id_col, F.explode_outer("__g").alias("__gram"))
        .filter(F.col("__gram").isNotNull())
        .groupBy(id_col, "__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    agg = per.groupBy(id_col).agg(
        F.sum("__c").alias("n_grams"), F.max("__c").alias("top_gram_count")
    )
    return (
        df.join(agg, id_col, "left")
        .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
        .withColumn("top_gram_count", F.coalesce("top_gram_count", F.lit(0)))
        .withColumn(
            "rep_ratio",
            F.when(
                F.col("n_grams") > 0, F.col("top_gram_count") / F.col("n_grams")
            ).otherwise(F.lit(0.0)),
        )
    )


def incremental_dedup(
    incoming: DataFrame, existing: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Dedup an incoming batch against an already-ingested corpus: drop
    rows whose normalized-content fingerprint exists in ``existing``,
    then keep one row per fingerprint within the batch (min ``id_col``).

    This is the daily-increment flow at corpus scale: the historical
    side is projected to its 32-byte digest column before the anti-join,
    so the shuffle moves fingerprints, never documents; the within-batch
    dedup reuses the same digest.
    """
    from lakehouse_tacklebox_spark.operators.dedup import dedup_exact, fingerprint_sha2

    inc = fingerprint_sha2(incoming, text_col)
    seen = fingerprint_sha2(existing.select(text_col), text_col).select("fingerprint")
    fresh = inc.join(seen, "fingerprint", "left_anti")
    return dedup_exact(fresh, cols=["fingerprint"], tiebreaker=id_col)


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    total: int = 200,
    limit_bound: int | None = None,
) -> DataFrame:
    """Temperature-flattened mixing (α = 0.5): select ``total`` rows with
    each stratum's quota ∝ √n instead of n — the standard LLM-data
    recipe for rebalancing a multi-source corpus without dropping small
    strata. Quotas are largest-remainder apportionment over integer-milli
    weights floor(√n·1000): base floor(w·total/Σw) per stratum, then the
    floor deficit (total − Σbase) is handed out one row each to the
    strata with the largest integer remainders (ties → stratum order),
    and each quota is finally capped at the stratum's row count. Row
    choice within a stratum is md5-rank of the id — a pure function of
    the id (identical across reruns, partitionings, and engines, the
    :func:`stratified_sample` contract). All quota arithmetic is bigint
    (DIV / %), never floating division, so the apportionment is
    engine-exact.

    Returns (stratum, id, sample_rank, take_n) for the selected rows.
    Output size is exactly ``total`` whenever no stratum caps out
    (take_n ≤ n for all); when a stratum has fewer rows than its quota
    the shortfall is NOT re-redistributed, so the output is
    Σ min(take_n, n) ≤ total.

    Scale: stratum counts and quotas are a tiny agg + broadcast (the
    remainder ranking is a window over one row per stratum); the
    per-stratum ranking filters ``sample_rank <= limit_bound`` FIRST
    (a constant bound → Spark's WindowGroupLimit keeps only that many
    rows per stratum map-side before the shuffle), then applies the
    variable quota on the survivors — the corpus is never fully sorted.
    ``limit_bound`` defaults to ``total`` (no stratum's quota can
    exceed the grand total).
    """
    limit_bound = total if limit_bound is None else limit_bound
    strata = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n"))
    w = strata.select(
        stratum_col,
        "n",
        F.floor(F.sqrt(F.col("n").cast("double")) * 1000.0).cast("bigint").alias("wgt"),
    )
    tw = w.agg(F.sum("wgt").alias("total_w"))
    q0 = w.join(F.broadcast(tw)).select(
        stratum_col,
        "n",
        F.expr(f"(wgt * CAST({int(total)} AS BIGINT)) DIV total_w").alias("base"),
        F.expr(f"(wgt * CAST({int(total)} AS BIGINT)) % total_w").alias("rem_num"),
    )
    rem_rank = W.orderBy(F.desc("rem_num"), F.col(stratum_col))
    all_rows = W.partitionBy(F.lit(1))
    quota = (
        q0.select(
            stratum_col,
            "n",
            "base",
            F.row_number().over(rem_rank).alias("rrank"),
            F.sum("base").over(all_rows).alias("base_sum"),
        )
        .select(
            stratum_col,
            F.least(
                F.col("base")
                + F.when(
                    F.col("rrank") <= F.lit(int(total)) - F.col("base_sum"), F.lit(1)
                ).otherwise(F.lit(0)),
                F.col("n"),
            )
            .cast("bigint")
            .alias("take_n"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy(stratum_col).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    )
    ranked = (
        df.select(stratum_col, id_col)
        .withColumn("sample_rank", rk)
        .filter(F.col("sample_rank") <= limit_bound)  # constant → WindowGroupLimit
    )
    return (
        ranked.join(F.broadcast(quota), stratum_col)
        .filter(F.col("sample_rank") <= F.col("take_n"))
        .select(
            stratum_col,
            id_col,
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
            "take_n",
        )
    )


def weighted_sample(df: DataFrame, weight_ppm_col: str, id_col: str) -> DataFrame:
    """Deterministic weighted (importance) sampling: keep a row with
    probability ``weight_ppm / 1e6``, decided by whether the id's md5
    bucket in [0, 1e6) falls below the row's weight — the standard
    quality-weighted subsampling step of LLM-corpus curation (keep
    high-quality docs with certainty, downsample low-quality ones
    instead of hard-dropping them).

    Like :func:`stratified_sample`, membership is a pure function of
    the id value — identical across reruns, partitionings, cluster
    sizes, and engines (DuckDB replays the same md5 arithmetic) — so
    the sampled corpus is a reproducible, versionable artifact, and a
    re-run over an APPENDED corpus keeps exactly the rows it kept
    before (incremental-ingest safe). Selection is a map-side filter;
    no shuffle, no RNG stream.
    """
    return df.filter(
        hash_bucket(F.col(id_col), 1_000_000) < F.col(weight_ppm_col)
    )


def leakage_safe_split(
    df: DataFrame,
    group_col,
    splits: list[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
) -> DataFrame:
    """Group-aware train/val/test assignment: every row whose
    ``group_col`` value matches lands in the SAME split, because the
    split is a pure function of the group key's md5 bucket — the
    contamination guard of LLM-corpus curation (a near-duplicate of a
    training document must never reach the eval split, or the eval
    measures memorization; Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL'22 §5 documents the train/test
    leakage this prevents).

    A doc-level split (bucket on doc_id) does NOT have this property —
    duplicate groups straddle splits. Callers pick the grouping
    resolution: an exact-dup digest, a near-dup cluster id from
    ``dedup_cluster_assign``, or a prefix fingerprint.

    Map-side only (no shuffle, no RNG stream): the assignment is
    engine-portable md5 arithmetic, stable under repartitioning,
    appends, and reruns — the property that makes the split a
    versionable artifact at 100 TB rather than a sampled accident.

    ``splits``: (name, percent) pairs, percents summing to 100;
    boundaries are cumulative (default: [0,80) train, [80,90) val,
    [90,100) test).
    """
    splits = list(splits)
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    b = hash_bucket(group_col, 100)
    expr = None
    cum = 0
    for name, pct in splits[:-1]:
        cum += pct
        cond = b < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = expr.otherwise(last) if expr is not None else F.lit(last)
    return df.withColumn("split", expr)


def epoch_shuffle(
    df: DataFrame, id_col: str, seed: int, n_buckets: int = 8
) -> DataFrame:
    """Deterministic seed-keyed global shuffle for training epochs.

    Each row gets a 60-bit md5 sort key over ``"<seed>:<id>"`` — a pure
    function of (seed, id), so the permutation is identical across
    reruns, partitionings, cluster sizes, and engines (the
    ``weighted_sample`` md5 discipline; DuckDB computes the same key as
    ``('0x' || substr(md5(seed || ':' || id), 1, 15))::BIGINT``), and a
    different seed yields an independent permutation — one seed per
    epoch. Appending rows never perturbs existing keys (each key reads
    only its own row), so a grown corpus keeps its old docs' relative
    order.

    Returns (``id_col``, sort_key, bucket) with ``bucket = sort_key %
    n_buckets``. The global order is (sort_key, id); a training loader
    that needs materialized shuffle order writes bucket-partitioned
    files sorted by sort_key within each bucket — one repartition + a
    local sort, never a global one — and streams buckets in key order.
    No window, no global sort: at 100 TB the key is a map-side
    projection and the bucketed write is the only shuffle.
    """
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed).cast("string"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return df.select(
        F.col(id_col),
        key.alias("sort_key"),
        (key % n_buckets).alias("bucket"),
    )
