"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an IVF-style
(inverted-file) variant as the scale path: cluster assignment buckets the
join so each query probes only its nearest centroids' buckets instead of
the full corpus.

Dataflow (joins, bucketing, dedup, top-k) is always JVM DataFrame ops.
Numeric kernels come in two interchangeable backends: JVM expressions
(`zip_with`/`aggregate` folds — mirror the DuckDB oracles
term-for-term) and Arrow-batched numpy (one matmul per batch; ~5×
faster than interpreted folds on wide signatures, pinned
result-identical in tests). At 100 TB the brute-force form is a
broadcast of the (small) query set against a partitioned corpus scan:
linear, one pass, no shuffle of the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str = "embedding", out_col: str = "norm") -> DataFrame:
    """Append the L2 norm (computed once, reused across comparisons)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_col, F.sqrt(_dot(v, v)))


def cosine_col(vec_a, vec_b):
    """Cosine similarity of two array columns (double math)."""
    a = F.transform(vec_a, lambda x: x.cast("double"))
    b = F.transform(vec_b, lambda x: x.cast("double"))
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) ⋈ corpus scan → per-query window
    top-k. The corpus is never shuffled; ranking state is k rows per
    query. Excludes self-matches.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    Exact all-pairs form — O(n²) compare, only for bounded corpora; the
    IVF variant below is the scale path (bucket first, compare within
    buckets).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def rp_lsh_bands(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH band keys for cosine similarity.

    Each plane contributes one sign bit (P[bit differs] = angle/π, the
    SimHash bound); bits are split into ``bands`` keys so a pair is a
    candidate if ANY band matches — the same band trick as MinHash-LSH.
    Hyperplanes are seeded-deterministic literals, so the signature is a
    pure JVM expression (no UDF, no shuffle).
    Returns (id_col, band_idx, band_key) exploded rows.
    """
    import numpy as np

    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:  # empty corpus: no rows to band, no dim to size planes by
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, band_idx int, band_key string"
        )
    dim = first.d
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = [
        (_dot(v, F.array(*[F.lit(float(x)) for x in plane])) >= 0).cast("int")
        for plane in planes
    ]
    per_band = n_planes // bands
    band_keys = [
        F.concat_ws("", *[b.cast("string") for b in bits[i * per_band : (i + 1) * per_band]])
        for i in range(bands)
    ]
    return df.select(
        F.col(id_col),
        F.posexplode(F.array(*band_keys)).alias("band_idx", "band_key"),
    )


def neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    kernel: str = "expr",
) -> DataFrame:
    """Embedding near-dup pairs via LSH bucketing — the 100 TB path.

    Candidates come from band-key self-joins (shuffle on the band key,
    never an all-pairs cross join), then exact cosine verification, so
    precision is 1.0 and recall is the banded sign-bit bound. Compare
    count scales with bucket occupancy instead of n².

    Cost note: signature + verify are both interpreted higher-order
    folds (unrolled literal chains overflow janino codegen limits —
    measured slower), so (a) the signature frame is PERSISTED: it feeds
    both sides of the band self-join and would otherwise be computed
    twice (n_planes folds over the corpus each time) — the persisted
    frame is 3 narrow columns, ~24 bytes × n × bands; (b) norms are
    precomputed per VECTOR, not per pair. Bits-per-band sets bucket
    occupancy: with B bits a band has 2^B buckets and candidates grow
    ~n²/2^B per band, so raise n_planes (bits = n_planes/bands) as n
    grows to keep occupancy flat — at 16/4 (4-bit keys) a 2000-vector
    corpus already yields 23% of all pairs as candidates, while 64/8
    (8-bit keys) cuts that 6.3× AND improves the recall bound
    (1-(1-p^8)^8 = 0.988 at cosine 0.95 vs 0.986 for 16/4).

    ``kernel`` picks the numeric backend; the band-join/verify DATAFLOW
    is identical in both:
    - "expr": pure JVM expressions — the fold order mirrors the DuckDB
      oracle term-for-term; the reference semantics.
    - "arrow": Arrow-batched numpy for the plane signs and the pair
      cosines (one (batch,dim)@(dim,planes) matmul per Arrow batch
      instead of dim·planes interpreted closure evaluations per row —
      measured ~5× on the gate corpus). Numerically this changes only
      the float accumulation ORDER; sign bits and 6-dp cosines are
      unchanged because the measured margins (min |v·plane| 2.26e-7,
      min 6-dp-boundary distance of any candidate cosine) sit orders
      of magnitude above the ~1e-13 reordering noise —
      tests/test_lsh_neardup.py pins kernel equivalence on every gate
      corpus and a jittered near-dup corpus.
    """
    if kernel == "arrow":
        return _neardup_pairs_lsh_arrow(
            df, id_col, vec_col, threshold, n_planes, bands, seed
        )
    sig = rp_lsh_bands(df, id_col, vec_col, n_planes, bands, seed).persist()
    a = sig.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    b = sig.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    # Eagerly materialize the (bounded) candidate set so the signature
    # cache can be released NOW instead of leaking executor storage until
    # the caller clears the cache — checkpoint blocks are reclaimed by the
    # ContextCleaner when the frame is GC'd, persist() is not.
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint()
    )
    sig.unpersist()
    # Precompute each vector's norm ONCE (higher-order-function folds are
    # interpreted per element, so dots dominate the verify stage —
    # norm-per-vector instead of norms-per-PAIR cuts the per-candidate
    # fold work to a single a·b; cosine doubles are unchanged:
    # dot/(sqrt(aa)*sqrt(bb)) evaluates the identical IEEE expression).
    normed = with_norm(df, vec_col, "nrm")
    va = normed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("norm_a")
    )
    vb = normed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("norm_b")
    )
    av = F.transform(F.col("va"), lambda x: x.cast("double"))
    bv = F.transform(F.col("vb"), lambda x: x.cast("double"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(_dot(av, bv) / (F.col("norm_a") * F.col("norm_b")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _neardup_pairs_lsh_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int,
    bands: int,
    seed: int,
) -> DataFrame:
    """Arrow/numpy kernel for :func:`neardup_pairs_lsh` — same dataflow
    (signature → band self-join → exact verify), numpy for the math.
    Band keys are bit-packed bigints (bucketing identical to the expr
    path's bit strings: both are injective images of the sign-bit
    rows, so the candidate SET is identical)."""
    import numpy as np
    import pandas as pd  # noqa: F401 — annotations below resolve via module pd

    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:  # empty corpus: no pairs, and no dim to size planes by
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, cosine double"
        )
    dim = first.d
    rng = np.random.RandomState(seed)
    planes_t = rng.normal(size=(n_planes, dim)).T.copy()  # (dim, n_planes)
    per_band = n_planes // bands
    pow2 = (2 ** np.arange(per_band)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def band_keys(emb: pd.Series) -> pd.Series:
        V = np.array(emb.tolist(), dtype=np.float64)
        if V.size == 0:
            return pd.Series([], dtype=object)
        bits = (V @ planes_t) >= 0  # (batch, n_planes)
        keys = np.stack(
            [
                bits[:, b * per_band : (b + 1) * per_band].astype(np.int64) @ pow2
                for b in range(bands)
            ],
            axis=1,
        )  # (batch, bands)
        return pd.Series(list(keys))

    @F.pandas_udf("double")
    def pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.array(a.tolist(), dtype=np.float64)
        B = np.array(b.tolist(), dtype=np.float64)
        if A.size == 0:
            return pd.Series([], dtype=float)
        dots = np.einsum("ij,ij->i", A, B)
        return pd.Series(
            dots / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1))
        )

    sig = df.select(
        F.col(id_col),
        F.posexplode(band_keys(F.col(vec_col))).alias("band_idx", "band_key"),
    ).persist()
    a = sig.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    b = sig.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    # eager candidates + unpersist, same storage-leak rationale as the
    # expr path above
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint()
    )
    sig.unpersist()
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(pair_cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its nprobe nearest centroids (IVF lists).

    centroids: (centroid_id, centroid_vec). Broadcast join + window —
    the partition/bucketing step of IVF-flat.
    Returns (id_col, centroid_id, rank).
    """
    c = centroids.select("centroid_id", F.col(vec_col).alias("cent_vec"))
    scored = df.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(c)).withColumn(
        "sim", cosine_col(F.col(vec_col), F.col("cent_vec"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= nprobe)
        .select(id_col, "centroid_id", "rank")
    )


def deterministic_centroids(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 8) -> DataFrame:
    """k deterministic 'centroids' = the k lowest-id vectors.

    A stand-in for k-means seeding that keeps tests reproducible; the
    IVF dataflow (assign → per-list search) is identical either way.
    """
    return (
        df.orderBy(id_col)
        .limit(k)
        .select(F.row_number().over(W.orderBy(id_col)).alias("centroid_id"), F.col(vec_col))
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 4,
    sample_mod: int | None = None,
) -> DataFrame:
    """Lloyd's k-means over an array<float> column, all-DataFrame.

    Seeding: the k vectors with the smallest xxhash64(id) — a
    deterministic scatter across the corpus (hash order is uncorrelated
    with row order, unlike take-first-k). Each iteration broadcasts the
    k current centroids, assigns every vector to its nearest by cosine,
    and recomputes each centroid as the element-wise mean of its members
    (posexplode → avg → rebuild). Only k rows per iteration touch the
    driver (the centroids themselves — same control-plane shape as
    MLlib's KMeans); assignment and averaging stay distributed.

    At corpus scale pass ``sample_mod=m`` to train on the deterministic
    1/m hash-sample ``xxhash64(id) % m == 0`` — centroid quality needs
    a sample, not the full 100 TB scan, and the sample never sorts or
    shuffles the corpus. Empty clusters keep their previous centroid.
    Returns (centroid_id, vec_col as array<double>).
    """
    spark = df.sparkSession
    train = df.select(F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col))
    if sample_mod is not None and sample_mod > 1:
        train = train.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0)

    seed_rows = (
        train.withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    cents = [list(r[vec_col]) for r in seed_rows]

    def as_df(vecs: list[list[float]]) -> DataFrame:
        return spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(vecs)],
            schema=f"centroid_id INT, {vec_col} ARRAY<DOUBLE>",
        )

    for _ in range(iters):
        assigned = ivf_assign(train, as_df(cents), id_col, vec_col, nprobe=1).drop("rank")
        members = train.join(assigned, id_col)
        means = (
            members.select("centroid_id", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias(vec_col)
            )
            .collect()
        )
        new_cents = list(cents)  # empty clusters keep their previous centroid
        for r in means:
            new_cents[r["centroid_id"] - 1] = list(r[vec_col])
        cents = new_cents

    return as_df(cents)


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    kmeans_iters: int = 4,
    train_sample_mod: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the query's nprobe nearest IVF lists.

    Cuts the compare count by ~num_centroids/nprobe versus brute force;
    recall depends on centroid quality — by default the lists are built
    from real Lloyd's k-means (kmeans_centroids; deterministic seeding,
    optional hash-sample training via train_sample_mod). Pass a
    precomputed ``centroids`` frame to reuse a trained quantizer across
    queries, which is what a production index would do. Join is bucketed
    on centroid_id.
    """
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(
            corpus, id_col, vec_col, k=num_centroids, iters=kmeans_iters, sample_mod=train_sample_mod
        )
    )
    corpus_lists = corpus.join(ivf_assign(corpus, cents, id_col, vec_col, nprobe=1).drop("rank"), id_col)
    q_lists = queries.join(ivf_assign(queries, cents, id_col, vec_col, nprobe=nprobe).drop("rank"), id_col)
    q = q_lists.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "centroid_id")
    c = corpus_lists.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "centroid_id")
    scored = (
        c.join(F.broadcast(q), ["centroid_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6))
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5) ∈ [-127, 127].

    The 4× storage/bandwidth reduction for embedding stores; all
    array-expression JVM math. Rounding is spelled floor(x + 0.5) rather
    than a library round() so the quantized values are engine-portable
    (round-half conventions differ across engines; floor does not).
    Zero vectors quantize to zeros with scale 1.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    df = df.withColumn(scale_col, scale)
    q = F.transform(
        v, lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("int")
    )
    return df.withColumn(out_col, q)


# ---------- product quantization (PQ) ----------
#
# The compressed-domain ANN path for corpora whose raw vectors don't fit
# the cluster: unit-normalize, split the d dims into m subspaces, k-means
# each subspace (L2 — squared distance DECOMPOSES across subspaces, which
# cosine does not; on unit vectors cos = 1 - L2²/2, so L2 ranking on the
# normalized vectors IS cosine ranking), store each vector as m one-byte
# codes, and search with asymmetric distance computation (ADC): per query
# build an m×ksub lookup table of exact query-subvector↔sub-centroid
# distances, score every code word by m table lookups (never touching the
# raw corpus vectors), keep a shortlist, then exactly re-rank only the
# shortlist against the true vectors. 64-dim float → m bytes per vector
# (16× smaller at m=4 before int8 even starts); the ADC scan reads ONLY
# the code column. (Jégou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — public method.)


def l2sq_col(vec_a, vec_b):
    """Squared L2 distance of two array columns (double math)."""
    a = F.transform(vec_a, lambda x: x.cast("double"))
    b = F.transform(vec_b, lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def unit_normalize(df: DataFrame, vec_col: str = "embedding", out_col: str | None = None) -> DataFrame:
    """Scale each vector to unit L2 norm (zero vectors pass through)."""
    out_col = out_col or vec_col
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(_dot(v, v))
    return df.withColumn(
        out_col,
        F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v),
    )


def _subvec(vec_col, sub_idx: int, sub_dim: int):
    """1-indexed slice of subspace ``sub_idx`` (0-based) from an array column."""
    return F.slice(vec_col, sub_idx * sub_dim + 1, sub_dim)


def pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 16,
    iters: int = 4,
    sample_mod: int | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Train the m per-subspace codebooks: Lloyd's k-means with L2
    assignment on each d/m-dim slice, all-DataFrame. All m subspaces
    train JOINTLY — the slices are exploded to (id, sub_idx, sv) rows
    and every iteration assigns/averages all subspaces in the same two
    distributed jobs, so the driver does ``iters`` round-trips of
    m·ksub centroid rows instead of ``m × iters`` (the per-subspace
    loop was measured at ~50 driver jobs for m=8/iters=3; the joint
    form does 3). The math is identical to training each subspace
    independently: seeds are the ksub smallest-xxhash ids (the same ids
    in every subspace), assignment is per-(id, sub_idx) L2 top-1, and
    means never mix subspaces. Vectors are unit-normalized first
    (``normalize=True``, the flat-PQ default) so ADC's L2 ranking equals
    cosine ranking; pass ``normalize=False`` when the input is already a
    residual (IVF-PQ trains codebooks on ``x/|x| − coarse_centroid``,
    which must NOT be re-normalized). Returns
    (sub_idx, code, sub_vec array<double>), deterministic via the
    xxhash64 seeding.
    """
    spark = df.sparkSession
    base = df.select(F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col))
    if normalize:
        base = unit_normalize(base, vec_col)
    dim = len(base.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub_dim = dim // m
    if sample_mod is not None and sample_mod > 1:
        base = base.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0)

    sliced = base.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub_idx"),
                        _subvec(F.col(vec_col), j, sub_dim).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, "s.sub_idx", "s.sv").localCheckpoint(eager=True)

    # seeds: the ksub smallest-xxhash ids' slices, every subspace at once
    seed_rows = (
        base.withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", id_col)
        .limit(ksub)
        .select(vec_col)
        .collect()
    )
    cents = {
        (j, c): list(r[vec_col])[j * sub_dim : (j + 1) * sub_dim]
        for c, r in enumerate(seed_rows)
        for j in range(m)
    }

    def as_df(cmap):
        return spark.createDataFrame(
            [(j, c, v) for (j, c), v in sorted(cmap.items())],
            schema="sub_idx INT, code INT, cv ARRAY<DOUBLE>",
        )

    for _ in range(iters):
        cdf = as_df(cents)
        w = W.partitionBy(id_col, "sub_idx").orderBy("d2", "code")
        assigned = (
            sliced.join(F.broadcast(cdf), "sub_idx")
            .withColumn("d2", l2sq_col(F.col("sv"), F.col("cv")))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(id_col, "sub_idx", "code", "sv")
        )
        means = (
            assigned.select("sub_idx", "code", F.posexplode("sv").alias("pos", "v"))
            .groupBy("sub_idx", "code", "pos")
            .agg(F.avg("v").alias("mu"))
            .groupBy("sub_idx", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))), lambda s: s["mu"]
                ).alias("cv")
            )
            .collect()
        )
        new_cents = dict(cents)  # empty clusters keep their previous centroid
        for r in means:
            new_cents[(r["sub_idx"], r["code"])] = list(r["cv"])
        cents = new_cents
    return spark.createDataFrame(
        [(j, c, v) for (j, c), v in sorted(cents.items())],
        schema="sub_idx INT, code INT, sub_vec ARRAY<DOUBLE>",
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Encode each vector as its array<int> of m nearest-sub-centroid
    codes (one byte per subspace at ksub ≤ 256). One explode to
    (id, sub_idx, slice), one broadcast codebook join, one window top-1
    per (id, subspace), re-assembled in subspace order
    (``normalize=False`` for residual inputs, as in pq_codebooks). The
    output — (id_col, codes) — is the ENTIRE search-time corpus
    footprint."""
    mrow = codebooks.agg(
        F.max("sub_idx").alias("mi"), F.max(F.size("sub_vec")).alias("sd")
    ).first()
    m, sub_dim = int(mrow["mi"]) + 1, int(mrow["sd"])
    base = df.select(F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col))
    if normalize:
        base = unit_normalize(base, vec_col)
    sliced = base.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub_idx"),
                        _subvec(F.col(vec_col), j, sub_dim).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, "s.sub_idx", "s.sv")
    w = W.partitionBy(id_col, "sub_idx").orderBy("d2", "code")
    coded = (
        sliced.join(F.broadcast(codebooks), "sub_idx")
        .withColumn("d2", l2sq_col(F.col("sv"), F.col("sub_vec")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return coded.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub_idx", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def knn_pq_adc(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """ADC search + exact re-rank. Per query the m×ksub lookup table of
    exact subvector↔sub-centroid squared distances is computed once
    (tiny: a broadcast-join aggregate), every corpus CODE word is scored
    by m table lookups (groupBy-sum over the exploded codes — the scan
    never touches raw corpus vectors), the ``shortlist`` best
    approximate ids survive per query, and only those join back to the
    true vectors for an exact cosine top-k. Ranking contract: with
    ``shortlist`` ≥ corpus size the result EQUALS knn_bruteforce
    (the rerank is exact and sees everything); at production shortlists
    recall degrades gracefully with ADC quality.
    """
    q = unit_normalize(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)), vec_col
    )
    # LUT: (query_id, sub_idx, code, d2)
    mrow = codebooks.agg(
        F.max("sub_idx").alias("mi"), F.max(F.size("sub_vec")).alias("sd")
    ).first()
    m, sub_dim = int(mrow["mi"]) + 1, int(mrow["sd"])
    q_sliced = q.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub_idx"),
                        _subvec(F.col(vec_col), j, sub_dim).alias("qv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", "s.sub_idx", "s.qv")
    lut = (
        q_sliced.join(F.broadcast(codebooks), "sub_idx")
        .select(
            "query_id",
            "sub_idx",
            "code",
            l2sq_col(F.col("qv"), F.col("sub_vec")).alias("d2"),
        )
    )
    # ADC scan: explode corpus codes once, broadcast the LUT onto them
    exploded = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), F.posexplode("codes").alias("sub_idx", "code")
    )
    approx = (
        exploded.join(F.broadcast(lut), ["sub_idx", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    ws = W.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    short = (
        approx.withColumn("srk", F.row_number().over(ws))
        .filter(F.col("srk") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the shortlist only
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    rer = (
        short.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def neardup_pairs_arrow(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via the Arrow/numpy matmul
    kernel — the same answer as :func:`neardup_pairs` but ~10× faster:
    Spark's array higher-order functions (zip_with/aggregate) evaluate
    interpreted per row, so the 2M-pair expression form costs ~98 s at
    2 000 vectors where one float64 BLAS matmul costs milliseconds. One
    side is unit-normalized and broadcast to every executor (n×d
    doubles — the same broadcast-side budget a brute-force knn pays);
    each Arrow batch of the other side does batch @ corpusᵀ and emits
    the surviving (id_a < id_b) pairs. At 100 TB you tile BOTH sides
    (block-partitioned matmul) instead of broadcasting one; the batch
    kernel is unchanged. No cosine column is emitted: chance pairs sit
    far from real-duplicate thresholds (measured on the gate corpora:
    every true pair ≥ 0.99, every non-pair ≤ 0.72), so membership is
    summation-order robust where a 6-dp rounded VALUE would not be.

    The broadcast side is driver-staged (Arrow ``toPandas`` of just the
    two needed columns), so ``max_broadcast_rows`` guards against
    silently pulling an unbounded corpus through the driver — past it,
    use the tiled form (block-partitioned matmul) instead. Ids keep
    their Spark type (string ids work; ordering of the id_a < id_b
    orientation follows the column's own ordering)."""
    import numpy as np

    spark = df.sparkSession
    proj = df.select(id_col, vec_col)
    id_type = proj.schema[id_col].dataType.simpleString()
    cpdf = proj.toPandas()
    # Size-check AFTER the (single) driver stage instead of running a
    # separate full count() job first — the collect was happening anyway,
    # and a pre-count doubled the source scan just to validate (ADVICE r9).
    if len(cpdf) > max_broadcast_rows:
        raise ValueError(
            f"neardup_pairs_arrow broadcasts the full corpus via the driver: "
            f"{len(cpdf)} rows > max_broadcast_rows={max_broadcast_rows}. "
            "Tile both sides (block matmul) or raise the guard explicitly."
        )
    ids = cpdf[id_col].to_numpy()
    mat = np.array([list(v) for v in cpdf[vec_col]], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    mat = mat / nrm
    bc = spark.sparkContext.broadcast((ids, mat))

    def _pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            b_ids = pdf[id_col].to_numpy()
            b = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            bn = np.linalg.norm(b, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            sims = (b / bn) @ c_mat.T
            ai, ci = np.nonzero(sims >= threshold)
            a = b_ids[ai]
            c = c_ids[ci]
            keep = a < c
            yield pd.DataFrame({"id_a": a[keep], "id_b": c[keep]})

    return proj.mapInPandas(_pairs, f"id_a {id_type}, id_b {id_type}")


def _minus(vec_a, vec_b):
    return F.zip_with(vec_a, vec_b, lambda x, y: x - y)


def ivfpq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the composed IVF-PQ index (the canonical production ANN
    layout, Jégou et al. 2011 §IV): a coarse quantizer partitions the
    unit-normalized corpus into inverted lists, and PQ codebooks are
    trained on the RESIDUALS ``u − coarse_centroid`` — residuals are far
    more compressible than raw vectors because the coarse quantizer has
    already absorbed the between-list variance, so the same m bytes buy
    materially better distance fidelity than flat PQ. Returns
    (coarse_centroids, codebooks, codes) where codes =
    (id, centroid_id, codes array<int>) — the search-time footprint is
    one int per list assignment plus m bytes per vector.
    """
    cu = unit_normalize(corpus.select(F.col(id_col), F.col(vec_col)), vec_col)
    cu = cu.localCheckpoint(eager=False)
    coarse = kmeans_centroids(cu, id_col, vec_col, k=num_centroids, iters=iters)
    assign = ivf_assign(cu, coarse, id_col, vec_col, nprobe=1).drop("rank")
    cc = coarse.select("centroid_id", F.col(vec_col).alias("__cent"))
    resid = (
        cu.join(assign, id_col)
        .join(F.broadcast(cc), "centroid_id")
        .select(
            F.col(id_col),
            "centroid_id",
            _minus(F.col(vec_col), F.col("__cent")).alias(vec_col),
        )
        .localCheckpoint(eager=True)
    )
    books = pq_codebooks(
        resid, id_col, vec_col, m=m, ksub=ksub, iters=iters, normalize=False
    )
    codes = pq_encode(resid, books, id_col, vec_col, normalize=False).join(
        resid.select(id_col, "centroid_id"), id_col
    )
    return coarse, books, codes


def sq_bounds(corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (dim, mn, mx) bounds over the DOUBLE-cast corpus —
    the training artifact of 8-bit scalar quantization (one corpus scan,
    d-row output; min/max are selections, so the result is bit-exact and
    order-independent, unlike a float sum). dim is 0-indexed."""
    return (
        corpus.select(
            F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double")))
        )
        .groupBy(F.col("pos").alias("dim"))
        .agg(F.min("col").alias("mn"), F.max("col").alias("mx"))
    )


def sq_encode(
    df: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """8-bit scalar quantization: code_d = floor((x_d − mn_d)·255 /
    (mx_d − mn_d)), capped at 255 — 4× smaller than float32 and, unlike
    PQ, EXACTLY reproducible in ANSI SQL: +, −, ×, / on doubles are
    IEEE-correctly-rounded in every engine, so the same expression text
    yields bit-identical doubles and floor() needs NO tie margin (the
    knn_sq_rerank oracle replays this codec in DuckDB verbatim and
    hash-compares). Returns (id_col, codes array<int>), dim order
    preserved. One explode + broadcast bounds join + re-assemble."""
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "dim", "x"
        ),
    )
    code = F.expr(
        "CASE WHEN mx = mn THEN 0"
        " ELSE CAST(least(floor((x - mn) * 255.0 / (mx - mn)), 255.0) AS INT) END"
    )
    return (
        exploded.join(F.broadcast(bounds), "dim")
        .select(F.col(id_col), "dim", code.alias("code"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def sq_dots(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """INTEGER dot products of zero-centered SQ codes — the exact,
    summation-order-free approximate score knn_sq shortlists by (and the
    relevance/diversity kernel knn_mmr_rerank greedily re-ranks with):
    s = Σ (2c−255)(2q−255) over the code dims. Self-pairs are excluded.
    Returns (query_id, neighbor_id, s). Codes-only scan, JVM codegen
    end-to-end (posexplode + broadcast-join + sum)."""
    cc = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), F.posexplode("codes").alias("dim", "c")
    )
    qq = query_codes.select(
        F.col(id_col).alias("query_id"), F.posexplode("codes").alias("dim", "qv")
    )
    return (
        cc.join(F.broadcast(qq), "dim")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(
                (2 * F.col("qv") - 255).cast("bigint") * (2 * F.col("c") - 255)
            ).alias("s")
        )
    )


def knn_sq(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """SQ-compressed ANN with exact re-rank: the corpus scan reads ONLY
    the int8-code column; the approximate score is the INTEGER dot
    product of zero-centered codes Σ(2c−255)(2q−255) — integer sums are
    exact and summation-order-free, so the shortlist is deterministic
    cross-engine with no float-tie analysis at all (the property PQ's
    float ADC cannot give). The ``shortlist`` best per query re-rank by
    exact cosine. Codes-only scan is JVM codegen end-to-end (explode +
    broadcast-join + sum), no Python, no HOF folds."""
    sdot = sq_dots(corpus_codes, query_codes, id_col)
    ws = W.partitionBy("query_id").orderBy(F.desc("s"), "neighbor_id")
    short = (
        sdot.withColumn("srk", F.row_number().over(ws))
        .filter(F.col("srk") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    rer = (
        short.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivfpq_encode(
    df: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against a FROZEN IVF-PQ structure (coarse
    centroids + residual codebooks) — the index-MAINTENANCE encoder: a
    deployed ANN index trains offline once and encodes every
    insert/backfill batch against the frozen structure, so this is the
    per-batch path :func:`ivfpq_index` is the one-shot training form of.
    Same pipeline as ivfpq_index's encode tail: unit-normalize, nearest
    coarse list, residual against the list centroid, PQ-encode the
    residual. Returns (id_col, centroid_id, codes). Cost per batch:
    |batch| × (k coarse distances + m sub-assignments) — broadcast
    joins only, no corpus shuffle."""
    cu = unit_normalize(df.select(F.col(id_col), F.col(vec_col)), vec_col)
    assign = ivf_assign(cu, coarse, id_col, vec_col, nprobe=1).drop("rank")
    cc = coarse.select("centroid_id", F.col(vec_col).alias("__cent"))
    resid = (
        cu.join(assign, id_col)
        .join(F.broadcast(cc), "centroid_id")
        .select(
            F.col(id_col),
            "centroid_id",
            _minus(F.col(vec_col), F.col("__cent")).alias(vec_col),
        )
    )
    return pq_encode(resid, codebooks, id_col, vec_col, normalize=False).join(
        resid.select(id_col, "centroid_id"), id_col
    )


def knn_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    shortlist: int = 50,
) -> DataFrame:
    """IVF-PQ search: each query probes its ``nprobe`` nearest inverted
    lists; within each probed list a per-(query, list) ADC lookup table
    of exact residual-subvector↔sub-centroid distances scores every code
    word (||q−x||² = ||qr − PQ(r)||² since x = c + r and qr = q − c);
    the ``shortlist`` best approximate ids survive per query and only
    those join back to the true vectors for an exact cosine top-k. The
    corpus scan reads ONLY (centroid_id, codes); raw vectors enter at
    shortlist size. With nprobe = num_centroids AND shortlist ≥ corpus
    the result EQUALS knn_bruteforce exactly (prune-nothing ⇒ the exact
    re-rank sees everything)."""
    mrow = codebooks.agg(
        F.max("sub_idx").alias("mi"), F.max(F.size("sub_vec")).alias("sd")
    ).first()
    m, sub_dim = int(mrow["mi"]) + 1, int(mrow["sd"])
    qu = unit_normalize(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)), vec_col
    )
    q_probe = ivf_assign(
        qu.select(F.col("query_id").alias(id_col), vec_col),
        coarse, id_col, vec_col, nprobe=nprobe,
    ).select(F.col(id_col).alias("query_id"), "centroid_id")
    cc = coarse.select("centroid_id", F.col(vec_col).alias("__cent"))
    qr = (
        qu.join(q_probe, "query_id")
        .join(F.broadcast(cc), "centroid_id")
        .select(
            "query_id",
            "centroid_id",
            _minus(F.col(vec_col), F.col("__cent")).alias("qr"),
        )
    )
    q_sliced = qr.select(
        "query_id",
        "centroid_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub_idx"),
                        _subvec(F.col("qr"), j, sub_dim).alias("qv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", "centroid_id", "s.sub_idx", "s.qv")
    lut = q_sliced.join(F.broadcast(codebooks), "sub_idx").select(
        "query_id",
        "centroid_id",
        "sub_idx",
        "code",
        l2sq_col(F.col("qv"), F.col("sub_vec")).alias("d2"),
    )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        "centroid_id",
        F.posexplode("codes").alias("sub_idx", "code"),
    )
    approx = (
        exploded.join(F.broadcast(lut), ["centroid_id", "sub_idx", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    ws = W.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    short = (
        approx.withColumn("srk", F.row_number().over(ws))
        .filter(F.col("srk") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    rer = (
        short.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
