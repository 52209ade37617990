"""Deduplication operators: exact, keep-latest, MinHash-LSH, SimHash,
n-gram Jaccard.

The exact/keep-latest forms re-express the reference's ROW_NUMBER merge
dedup (Step 1:184-190, Step 5 mergeFunc). The near-dup family is the
training-data-pipeline extension: all of it is built from JVM-side
expressions (xxhash64, explode, groupBy) — no Python UDFs — so the hot
path stays in whole-stage codegen and scales by shuffle capacity, not
Python throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def keep_latest(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """One row per key, keeping the greatest (order_by...) tuple.

    Deterministic if order_by ends in a unique column. This is the
    engine's canonical pre-merge dedup (reference: ROW_NUMBER()=1 idiom).
    """
    w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dedup_exact(df: DataFrame, cols: list[str], tiebreaker: str) -> DataFrame:
    """Exact dedup on cols, keeping the row with the smallest tiebreaker.

    Hash-groupBy under the hood: shuffles once on the dedup key. For
    100 TB runs, pre-hash wide string keys to a fixed-width digest first
    (see fingerprint_sha2) so the shuffle key is 32 bytes, not documents.
    """
    w = W.partitionBy(*cols).orderBy(F.col(tiebreaker))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def fingerprint_sha2(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Normalize whitespace + lowercase, then SHA-256 — content identity
    for exact dedup (datavalidator.py:35 hash-identity idiom)."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.sha2(normalized, 256))


def shingle(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles", distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per row (array column), deduped by default.

    Tokenization is split-on-whitespace of the lowercased text; shingles
    are the n-token sliding windows. ``distinct=False`` keeps every
    occurrence (needed by repetition scoring, where multiplicity IS the
    signal).
    """
    df = df.withColumn("__toks", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    # Zip n shifted slices of the token array, then concat per struct.
    # NOT a per-position lambda over element_at/slice: Catalyst's
    # CollapseProject inlines the __toks projection into the transform
    # lambda, and a per-position formulation then re-evaluates split()
    # for every gram position — O(len²) per document (measured 8-16 s
    # for a 260k-gram corpus that this form does in <1 s). Here the
    # slices are row-level expressions, so worst-case inlining costs n
    # splits per ROW — still linear.
    t = F.col("__toks")
    n_grams = F.greatest(F.size(t) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(t, 1 + off, n_grams) for off in range(n)])
    grams = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(off)] for off in range(n)]))
    if distinct:
        grams = F.array_distinct(grams)
    ngrams = F.when(F.size(t) >= n, grams).otherwise(
        F.expr("cast(array() as array<string>)")
    )
    return df.withColumn(out_col, ngrams).drop("__toks")


def shingle_hashes(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles", distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per row as 64-bit HASHES (array<long>).

    Same tokenization and windowing as :func:`shingle`, but each gram is
    hashed inside the transform lambda (``xxhash64(tok₀..tokₙ₋₁)`` —
    multi-arg hashing, so token boundaries are part of the hash) instead
    of materializing the gram string. This halves the shingling cost of
    the dedup pipelines (no per-gram string allocation; array_distinct
    and the downstream explode/shuffle all run over fixed-width longs)
    and is the form every hash-based consumer (jaccard postings, minhash
    signatures, pair-verify intersect) actually needs — the gram TEXT is
    only needed by diagnostics, which use :func:`shingle`.
    """
    df = df.withColumn("__toks", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    t = F.col("__toks")
    n_grams = F.greatest(F.size(t) - (n - 1), F.lit(0))
    # transform-over-sequence with element_at indexing, NOT
    # arrays_zip(slice...): the zip form allocates n sliced array copies
    # plus a struct per gram before the lambda ever hashes, and measured
    # 5.5x slower on a cold plan over the sf1 corpus (7.7 s vs 1.4 s for
    # the 2.6M-gram explode). Hash values are IDENTICAL (same n tokens
    # into the same multi-arg xxhash64 — certified count+xor at sf1 for
    # n=3 and n=5), so every downstream fixture/cert is unaffected.
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.xxhash64(*[F.element_at(t, i + off) for off in range(n)]),
    )
    if distinct:
        grams = F.array_distinct(grams)
    ngrams = F.when(F.size(t) >= n, grams).otherwise(F.expr("cast(array() as array<bigint>)"))
    return df.withColumn(out_col, ngrams).drop("__toks")


def _seeded_hash(seed: int):
    """One-argument transform lambda hashing an element with a fixed seed.

    Must stay one-argument: pyspark's ``F.transform`` treats a TWO-argument
    lambda as (element, index) and silently binds the second parameter to
    the array index — a closure default like ``lambda x, s=s:`` therefore
    hashes with the element's position instead of the seed, collapsing all
    signature positions to one position-dependent hash function.
    """
    return lambda x: F.xxhash64(x, F.lit(seed))


def minhash_signatures(
    df: DataFrame, id_col: str, shingle_col: str, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per document: for seed s, min over shingles of
    xxhash64(shingle, s). Deterministic, JVM-side (no UDF).

    Returns (id_col, sig array<bigint>).
    """
    sig = F.array(
        *[
            F.array_min(F.transform(F.col(shingle_col), _seeded_hash(s)))
            for s in range(num_hashes)
        ]
    )
    return df.select(F.col(id_col), sig.alias("sig"))


def lsh_band_buckets(
    sig_df: DataFrame, id_col: str, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band MinHash signatures into (id, band, band_hash) bucket rows —
    the LSH INDEX representation: persiting these rows (e.g. in a
    TackleTable keyed on (band, band_hash)) is what lets a new ingest
    batch find its near-dup candidates against an already-indexed corpus
    with one equi-join instead of re-banding history
    (dedup_incremental_lsh). Bucket hash = xxhash64 of the band's
    ``rows_per_band`` signature slots, a pure per-row projection."""
    return sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws(",", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash) buckets.

    Scale path for near-dup at 100 TB: candidate generation is a
    groupBy/join on 16-byte bucket keys — never a full cross join. Skewed
    buckets (boilerplate docs) are bounded by AQE skew-join splitting.
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    banded = lsh_band_buckets(sig_df, id_col, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    hashed: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Explode→join-on-shingle→count intersection, then |A∪B| from per-doc
    sizes. This is the verification stage after LSH candidate generation
    (or a standalone exact method at moderate cardinality).

    ``max_doc_freq`` is the scale guard: the postings self-join is
    quadratic in per-shingle document frequency, so one boilerplate
    shingle shared by 10⁵ docs would emit 10¹⁰ candidate pairs. Shingles
    whose posting count exceeds the cap are dropped BEFORE the self-join
    (from sizes and intersections alike), i.e. similarity is computed
    over the stop-shingle-filtered shingle space — near-dup pairs whose
    only overlap is ultra-common boilerplate sit below any useful
    threshold anyway. Pairs none of whose shingles were capped get the
    exact uncapped Jaccard. Pick the cap so gate-scale corpora are
    uncapped (testdata max DF: 7 at sf0.01, 25 at sf0.1) and candidate
    counts stay bounded by ``n_shingles * cap²`` on adversarial corpora.
    """
    # Shingle strings hash to 8-byte keys before the join: the shuffle
    # moves fixed-width longs instead of n-gram strings (64-bit collision
    # odds are negligible at any realistic corpus cardinality).
    # ``hashed=True`` (shingle_hashes input): the grams are already
    # 64-bit longs, explode them directly.
    #
    # Physical shape: one fully-pipelined DAG, no persist barrier. The
    # stop-shingle cap is enforced by broadcasting the STOP set — the
    # shingles whose document frequency EXCEEDS the cap — and left-anti
    # joining it into every postings branch map-side. The stop set is
    # tiny by construction at any corpus scale (it is exactly the
    # pathological boilerplate: empty at every gate SF, and even on a
    # 100 TB crawl a few million 8-byte hashes ≈ tens of MB), so the
    # broadcast always fits; the census that derives it is a partial-
    # aggregating groupBy whose shuffle moves one (hash, count) row per
    # DISTINCT shingle, never the postings. The postings explode is
    # recomputed per branch (census + sizes + both join sides) rather
    # than persisted: it is a narrow, allocation-light map over the
    # corpus (with hashed grams), the branches run concurrently inside
    # one job, and a cache-write barrier here measured ~2× the pipelined
    # wall-clock at bench scale (the r3 regression was exactly such a
    # barrier, plus a second materialization). Callers whose upstream is
    # expensive (normalization, decompression) should persist
    # ``shingled`` itself — the minhash pipeline does.
    # explode_OUTER + null-filter, not plain explode: a bare explode makes
    # InferFiltersFromGenerate synthesize `size(shingles) > 0` and
    # predicate pushdown then sinks that filter — with the whole shingle
    # expression inlined ~12× — BELOW the caller's repartition into the
    # (often single-task) file-scan stage, serializing the most expensive
    # compute of the query. An outer explode infers nothing; the
    # isNotNull filter references the GENERATED column, which nothing can
    # push below the Generate. (Measured: 1.66 s single-task stage → gone.)
    exploded = shingled.select(
        F.col(id_col), F.explode_outer(F.col(shingle_col)).alias("sh")
    ).filter(F.col("sh").isNotNull())
    if not hashed:
        exploded = exploded.select(F.col(id_col), F.xxhash64("sh").alias("sh"))
    if max_doc_freq is not None:
        stop = (
            exploded.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh")
        )
        exploded = exploded.join(F.broadcast(stop), "sh", "left_anti")
    sizes = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def md5_hash60(col) -> "F.Column":
    """Portable 60-bit token hash: the first 15 hex chars of md5.

    Unlike xxhash64 this is computable by any engine with md5 + hex
    parsing (DuckDB: ``('0x' || substr(md5(t),1,15))::BIGINT``), which
    makes simhash signatures oracle-checkable. 60 bits keeps the value
    inside a signed BIGINT on both sides.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, token_hash=None
) -> DataFrame:
    """SimHash over whitespace tokens, built from JVM expressions.

    Each token hashes to ``bits`` bits (xxhash64 by default; pass
    ``token_hash=md5_hash60, bits=60`` for the engine-portable variant);
    per bit position the signature takes the sign of the sum of ±1
    votes, weighted by term frequency. Computed via explode +
    groupBy(sum) over bit columns, which partial-aggregates map-side —
    no per-row Python.
    """
    hash_fn = token_hash if token_hash is not None else F.xxhash64
    # explode_outer: keep InferFiltersFromGenerate from sinking a
    # size(split(...)) probe into the upstream scan stage (see
    # jaccard_pairs); split() never yields an empty array so no
    # null-filter is needed.
    tokens = df.select(
        F.col(id_col), F.explode_outer(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok")
    ).withColumn("h", hash_fn(F.col("tok")))
    one = F.lit(1).cast("long")
    votes = tokens.groupBy(id_col).agg(
        *[
            # shiftleft instead of a python 1<<i literal: 1<<63 overflows
            # a SQL BIGINT literal, the JVM shift wraps correctly
            F.sum(F.when(F.col("h").bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return votes.select(F.col(id_col), sim.alias("simhash"))


def hamming_pairs(sim_df: DataFrame, id_col: str, max_distance: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidate generation uses the pigeonhole trick: split 64 bits into
    (max_distance+1) blocks; any pair within distance shares ≥1 exact
    block → join on (block_idx, block_value) instead of cross join.
    """
    blocks = max_distance + 1
    width = 64 // blocks
    block_cols = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1))
            for i in range(blocks)
        ]
    )
    banded = sim_df.select(F.col(id_col), F.col("simhash"), F.posexplode(block_cols).alias("blk", "blk_val"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    ).filter(F.col("hamming") <= max_distance)


def jaccard_for_pairs(
    pairs: DataFrame, shingled: DataFrame, id_col: str, shingle_col: str
) -> DataFrame:
    """Exact Jaccard for a GIVEN candidate-pair set (id_a, id_b) — the
    verify stage after LSH. Joins each pair to its two shingle arrays and
    intersects them per row (JVM array_intersect), so the cost is
    O(candidates · doc_size): no postings self-join, no all-pairs pass.
    This is the verification shape that survives corpus scale; use
    jaccard_pairs only when the candidate set itself must be generated
    from shingle overlap."""
    sets = shingled.select(F.col(id_col), F.col(shingle_col).alias("__shs"))
    a = sets.select(F.col(id_col).alias("id_a"), F.col("__shs").alias("__sa"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("__shs").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size("__sa") + F.size("__sb") - inter
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .drop("__sa", "__sb")
    )


def containment_pairs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold_ppm: int = 900000,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Directed n-gram CONTAINMENT |A∩B| / |A| — the asymmetric
    complement to :func:`jaccard_pairs`. Jaccard divides by the union,
    so a short document fully embedded in a long one (a quoted article,
    a RAG chunk, a boilerplate-wrapped repost) scores LOW and survives
    symmetric dedup; containment divides by the CONTAINED side's size
    and flags exactly those subset-duplicates (Broder's resemblance vs
    containment distinction, SEQUENCES'97).

    Candidate generation uses PREFIX FILTERING (Bayardo et al., WWW'07;
    Chaudhuri et al., ICDE'06) instead of the full postings self-join:
    order each doc's shingle set by ascending GLOBAL document frequency
    (rarest first, hash tie-break), and emit probe postings only from
    the prefix of length ``sz − ⌈t·sz⌉ + 1``. Soundness: a pair passing
    the threshold needs ``inter ≥ ⌈t·|A|⌉`` shared shingles, and any
    ``sz_A − ⌈t·sz_A⌉ + 1`` elements of A must contain one of them — so
    every qualifying pair has a prefix hit and NO result row is lost
    (pure candidate pruning; the rows are pinned by the dedup_containment
    oracle). At t = 0.9 the probe side shrinks ~10× by length alone, and
    because the prefix holds each doc's RAREST shingles the df² mass
    collapses much further — this is the fix for the 44.6M-candidate
    super-linear growth VERDICT r8 flagged; the ``max_doc_freq`` cap
    (which drops stop shingles and CHANGES results) stays as an
    independent, optional dial. Verification is exact per candidate via
    ``array_intersect`` on the per-doc hash arrays — O(candidates ·
    doc_size), the same shape as :func:`jaccard_for_pairs`.

    Directed: both (A,B) orientations are scored, and the score is
    exact integer ppm (``inter·10⁶ div |A|``) so the result is
    engine-reproducible. Shingle multiplicity is collapsed per doc
    (set semantics) before sizing.
    """
    docs, exploded = _containment_docs(
        shingled, id_col, shingle_col, threshold_ppm, max_doc_freq
    )
    cand = _containment_candidates_from(docs, exploded, id_col)
    a = docs.select(
        F.col(id_col).alias("id_a"),
        F.col("arr").alias("__sa"),
        F.col("sz").cast("bigint").alias("sz_a"),
    )
    b = docs.select(F.col(id_col).alias("id_b"), F.col("arr").alias("__sb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("__sa", "__sb")).cast("bigint"))
        .withColumn(
            "containment_ppm",
            F.expr("CAST((inter * CAST(1000000 AS BIGINT)) div sz_a AS BIGINT)"),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
        .select("id_a", "id_b", "inter", "sz_a", "containment_ppm")
    )


def _containment_docs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold_ppm: int,
    max_doc_freq: int | None,
) -> tuple[DataFrame, DataFrame]:
    """(docs, exploded) for the prefix-filtered containment join: docs =
    (id, arr, sz, prefix_len) with ``arr`` the doc's distinct shingle
    hashes ordered by (global df asc, hash asc) — rarest first — and
    ``prefix_len = sz − ⌈threshold·sz⌉ + 1`` computed in exact integer
    arithmetic; exploded = the distinct (id, sh) postings."""
    exploded = (
        shingled.select(F.col(id_col), F.explode_outer(F.col(shingle_col)).alias("sh"))
        .filter(F.col("sh").isNotNull())
        .select(F.col(id_col), F.xxhash64("sh").alias("sh"))
        .distinct()
    )
    if max_doc_freq is not None:
        stop = (
            exploded.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh")
        )
        exploded = exploded.join(F.broadcast(stop), "sh", "left_anti")
    dfs = exploded.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    docs = (
        exploded.join(dfs, "sh")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("ord"))
        .select(
            F.col(id_col),
            F.expr("transform(ord, x -> x.sh)").alias("arr"),
            F.size("ord").alias("sz"),
        )
        .withColumn(
            "prefix_len",
            F.expr(
                "CAST(sz - (sz * CAST({t} AS BIGINT) + 999999) div 1000000 + 1 AS INT)".format(
                    t=int(threshold_ppm)
                )
            ),
        )
    )
    return docs, exploded


def _containment_candidates_from(docs: DataFrame, exploded: DataFrame, id_col: str) -> DataFrame:
    pre = docs.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.expr("slice(arr, 1, greatest(prefix_len, 0))")).alias("sh"),
    )
    post = exploded.select(F.col(id_col).alias("id_b"), "sh")
    return (
        pre.join(post, "sh")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def containment_candidates(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold_ppm: int = 900000,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """The prefix-filtered candidate PAIR set containment_pairs verifies
    — exposed so scale readouts (bench.py's containment_candidate_pairs)
    measure the exact candidate mass the production operator generates."""
    docs, exploded = _containment_docs(
        shingled, id_col, shingle_col, threshold_ppm, max_doc_freq
    )
    return _containment_candidates_from(docs, exploded, id_col)
