"""Retrieval-serving entries — the query-time half of the RAG corpus the
LLM-pipeline operators build: hybrid keyword+vector search with rank
fusion, and diversity re-ranking over the compressed (SQ) domain.

Reference anchor: dbsys21/lakehouse-tacklebox
00-quickstarts/llm-dolly-chatbot (02-Data-preparation.py builds the
vector store; 03-Q&A-prompt-engineering runs filtered/similarity
retrieval). The reference retrieves with an external vector library;
here retrieval itself is expressed Spark-first so one engine serves
ingest AND query, and every ranking is DuckDB-replayable.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators import similarity as S
from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables


@register(
    "rag_hybrid_retrieval",
    bench=True,
    tags=("retrieval", "text", "similarity", "rag"),
    # Hybrid search — the retrieval pattern every production RAG stack
    # runs (keyword BM25 + vector cosine, reciprocal-rank-fused): both
    # legs and the fusion are INTEGER-EXACT so DuckDB hash-compares the
    # whole ranking. BM25 is the k1=1.2, b=0.75 form with the two float
    # spots made rational: idf -> the raw Robertson ratio
    # (N-df+0.5)/(df+0.5) scaled to ppm via (2(N-df)+1)*1e6 DIV (2df+1)
    # — a deliberate VARIANT: each term's weight is monotone in the same
    # argument as the usual log idf (per-doc sums can differ from
    # log-idf BM25, which is the price of integer exactness; the rarer
    # term still always outweighs the commoner at equal tf) — and the
    # tf-norm ratio tf*(k1+1)/(tf+k1*(1-b+b*L/avg))
    # == 44*tf*total / (20*tf*total + 6*total + 18*L*N) exactly (avg =
    # total/N; multiply through by 20*total), emitted in milli. Per-term
    # contributions and their per-doc sums are BIGINTs — no float ever.
    # RRF = 1e6 DIV (60+rank) summed over the legs (Cormack et al.'s
    # k=60), integer again; sentinel -1 marks a doc absent from a leg.
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents
    ), tok AS (
        SELECT doc_id, w FROM toks
        WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
    ), dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY doc_id
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len) AS BIGINT) AS total
        FROM dl
    ), dft AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY w
    ), tft AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, w
    ), qt AS (
        SELECT DISTINCT doc_id AS query_id, w FROM tok WHERE doc_id < 3
    ), bm AS (
        SELECT qt.query_id, tft.doc_id,
               CAST(sum(
                 (((2*(s.n_docs - dft.df) + 1) * 1000000) // (2*dft.df + 1))
                 * ((44000*tft.tf*s.total)
                    // (20*tft.tf*s.total + 6*s.total + 18*dl.len*s.n_docs))
               ) AS BIGINT) AS score
        FROM qt
        JOIN tft USING (w)
        JOIN dft USING (w)
        JOIN dl ON dl.doc_id = tft.doc_id
        CROSS JOIN stats s
        WHERE tft.doc_id <> qt.query_id
        GROUP BY 1, 2
    ), kw AS (
        SELECT query_id, doc_id, r FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS r
            FROM bm
        ) WHERE r <= 10
    ), vec AS (
        SELECT query_id, doc_id, r FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     round(list_cosine_similarity(
                        CAST(q.embedding AS DOUBLE[]),
                        CAST(c.embedding AS DOUBLE[])), 6) DESC,
                     c.vec_id) AS r
            FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 3
        ) WHERE r <= 10
    ), fused AS (
        SELECT coalesce(kw.query_id, vec.query_id) AS query_id,
               coalesce(kw.doc_id, vec.doc_id) AS doc_id,
               CAST(coalesce(kw.r, -1) AS BIGINT) AS kw_rank,
               CAST(coalesce(vec.r, -1) AS BIGINT) AS vec_rank,
               CAST(coalesce(1000000 // (60 + kw.r), 0)
                    + coalesce(1000000 // (60 + vec.r), 0) AS BIGINT) AS rrf_ppm
        FROM kw FULL OUTER JOIN vec
          ON kw.query_id = vec.query_id AND kw.doc_id = vec.doc_id
    )
    SELECT query_id, doc_id, kw_rank, vec_rank, rrf_ppm,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_ppm DESC, doc_id) AS fused_rank
        FROM fused
    ) WHERE fused_rank <= 5
    ORDER BY query_id, fused_rank
    """,
)
def rag_hybrid_retrieval(spark, sf_dir):
    """Hybrid retrieval: BM25 keyword top-10 + exact-cosine vector
    top-10, reciprocal-rank fusion (k=60), fused top-5 per query — the
    two-leg serving query every RAG deployment runs, expressed as one
    Spark plan with every ranking integer-exact (see register note for
    the rational BM25 derivation). Plan shape at 100 TB: tf/df are
    map-side-combining censuses (one corpus scan); the BM25 leg is a
    posting-list join — the 3 queries' DISTINCT terms broadcast onto
    the (doc, term) tf frame, so cost ∝ the probed terms' postings, not
    the corpus; the vector leg here is the exact brute-force baseline
    (the ANN entries — knn_ivf_pruned_scan, knn_filtered_ivf — are its
    scale path, same output contract); fusion joins two k-bounded
    lists. doc_id and vec_id are aligned in the fixture, which is what
    lets one entry fuse both modalities."""
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]

    tok = (
        d.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    ).localCheckpoint(eager=False)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("total"),
    )
    dft = tok.groupBy("w").agg(F.count_distinct("doc_id").cast("bigint").alias("df"))
    tft = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    qt = tok.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "w"
    ).distinct()

    bm = (
        tft.join(F.broadcast(qt), "w")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dft, "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.expr(
                "(((2*(n_docs - df) + 1) * CAST(1000000 AS BIGINT)) DIV (2*df + 1))"
                " * ((44000*tf*total)"
                "    DIV (20*tf*total + 6*total + 18*len*n_docs))"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").cast("bigint").alias("score"))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    kw = (
        bm.withColumn("r", F.row_number().over(wk))
        .filter(F.col("r") <= 10)
        .select("query_id", "doc_id", F.col("r").alias("kw_r"))
    )
    vec = (
        S.knn_bruteforce(e, e.filter(F.col("vec_id") < 3), k=10)
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("vec_r"),
        )
    )
    fused = (
        kw.join(vec, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("kw_r"), F.lit(-1)).cast("bigint").alias("kw_rank"),
            F.coalesce(F.col("vec_r"), F.lit(-1)).cast("bigint").alias("vec_rank"),
            (
                F.coalesce(F.expr("CAST(1000000 AS BIGINT) DIV (60 + kw_r)"), F.lit(0))
                + F.coalesce(
                    F.expr("CAST(1000000 AS BIGINT) DIV (60 + vec_r)"), F.lit(0)
                )
            ).cast("bigint").alias("rrf_ppm"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.col("rrf_ppm").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("fused_rank") <= 5)
        .orderBy("query_id", "fused_rank")
    )


_MMR_K = 5
_MMR_SHORTLIST = 20


def _mmr_oracle(k: int = _MMR_K, shortlist: int = _MMR_SHORTLIST) -> str:
    """Unrolled k-stage MMR SQL for DuckDB (the _bpe_train_oracle
    pattern): replay the SQ floor codec, the integer query dots, the
    top-``shortlist`` candidate cut, the candidate-pair dots, then k
    greedy argmax stages of mmr_score = 7*qdot - 3*max(pdot to the
    selected set) — every value BIGINT, so the replay is exact.
    MATERIALIZED is load-bearing (stages reference earlier CTEs more
    than once)."""
    parts = [
        """WITH corpus AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), dims AS MATERIALIZED (
        SELECT i AS dim, min(v[i]) AS mn, max(v[i]) AS mx
        FROM corpus, unnest(range(1, len(v) + 1)) AS t(i)
        GROUP BY 1
    ), codes AS MATERIALIZED (
        SELECT vec_id, list(CASE WHEN mx = mn THEN 0
            ELSE CAST(least(floor((v[dim] - mn) * 255.0 / (mx - mn)), 255.0) AS INT) END
            ORDER BY dim) AS c
        FROM corpus, dims
        GROUP BY vec_id
    ), qc AS MATERIALIZED (SELECT vec_id AS query_id, c AS q FROM codes WHERE vec_id < 3),
    sdot AS MATERIALIZED (
        SELECT query_id, c.vec_id AS neighbor_id,
               CAST(sum((2*q[i]-255) * (2*c.c[i]-255)) AS BIGINT) AS qdot
        FROM qc, codes c, unnest(range(1, len(q)+1)) AS t(i)
        WHERE c.vec_id <> query_id
        GROUP BY 1, 2
    ), cand AS MATERIALIZED (
        SELECT query_id, neighbor_id, qdot FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY qdot DESC, neighbor_id) AS rk
            FROM sdot
        ) WHERE rk <= %(shortlist)d
    ), pair AS MATERIALIZED (
        SELECT a.query_id, a.neighbor_id AS ida, b.neighbor_id AS idb,
               CAST(sum((2*ac.c[i]-255) * (2*bc.c[i]-255)) AS BIGINT) AS pdot
        FROM cand a
        JOIN cand b ON b.query_id = a.query_id AND b.neighbor_id <> a.neighbor_id
        JOIN codes ac ON ac.vec_id = a.neighbor_id
        JOIN codes bc ON bc.vec_id = b.neighbor_id,
        unnest(range(1, len(ac.c)+1)) AS t(i)
        GROUP BY 1, 2, 3
    ), s1 AS MATERIALIZED (
        SELECT query_id, neighbor_id, qdot,
               CAST(7*qdot AS BIGINT) AS mmr_score,
               CAST(1 AS BIGINT) AS mmr_rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY qdot DESC, neighbor_id) AS rk
            FROM cand
        ) WHERE rk = 1
    ), p1 AS MATERIALIZED (SELECT query_id, neighbor_id FROM s1)"""
        % {"shortlist": shortlist}
    ]
    for st in range(2, k + 1):
        parts.append(
            f""", s{st} AS MATERIALIZED (
        SELECT query_id, neighbor_id, qdot, mmr_score,
               CAST({st} AS BIGINT) AS mmr_rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY mmr_score DESC, neighbor_id) AS rk
            FROM (
                SELECT c.query_id, c.neighbor_id, c.qdot,
                       CAST(7*c.qdot - 3*max(pr.pdot) AS BIGINT) AS mmr_score
                FROM cand c
                JOIN p{st - 1} p ON p.query_id = c.query_id
                JOIN pair pr ON pr.query_id = c.query_id
                            AND pr.ida = c.neighbor_id
                            AND pr.idb = p.neighbor_id
                WHERE NOT EXISTS (
                    SELECT 1 FROM p{st - 1} x
                    WHERE x.query_id = c.query_id
                      AND x.neighbor_id = c.neighbor_id)
                GROUP BY 1, 2, 3
            )
        ) WHERE rk = 1
    ), p{st} AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM p{st - 1}
        UNION ALL SELECT query_id, neighbor_id FROM s{st}
    )"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k + 1))
    parts.append(f"\nSELECT query_id, neighbor_id, qdot, mmr_score, mmr_rank"
                 f" FROM ({union}) ORDER BY query_id, mmr_rank")
    return "".join(parts)


@register(
    "knn_mmr_rerank",
    bench=True,
    tags=("retrieval", "similarity", "ann", "quantization", "rag"),
    # MMR (maximal marginal relevance, Carbonell & Goldstein 1998) — the
    # diversity re-rank RAG retrievers run so the k passages handed to
    # the LLM aren't k near-copies of the same chunk. Run ENTIRELY in
    # the SQ integer-dot domain: relevance = zero-centered code dot to
    # the query, diversity = max code dot to the already-selected set,
    # greedy pick k=5 from a top-20 shortlist with score 7*qdot -
    # 3*maxsel (lambda = 0.7 scaled by 10; stage 1 = pure relevance, so
    # its score is 7*qdot). Integer dots are summation-order-free, so
    # DuckDB replays codec, shortlist, pair dots, and all five greedy
    # stages EXACTLY (unrolled materialized CTEs, the _bpe_train_oracle
    # pattern) — a greedy iterative algorithm, fully hash-compared.
    oracle=_mmr_oracle(),
)
def knn_mmr_rerank(spark, sf_dir):
    """Diversity-aware re-ranking (MMR) over the SQ-compressed domain —
    the serving-side complement of the dedup operators: instead of
    deleting near-dups at ingest, the retriever PENALIZES redundancy at
    query time (7*relevance - 3*max-similarity-to-picked, greedy, k=5
    from a 20-candidate shortlist; first pick = max relevance). Staying
    in integer code dots makes the greedy trajectory deterministic and
    engine-exact (no float argmax ties, no summation-order risk — the
    knn_sq property applied to an ITERATIVE algorithm). Scale: the
    shortlist is the same codes-only scan knn_sq deploys; everything
    after is k-bounded per query (20 candidates, 380 pair dots, 5
    window passes over ~20 rows) — the greedy loop never touches the
    corpus."""
    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    bounds = S.sq_bounds(e).localCheckpoint(eager=True)
    codes = S.sq_encode(e, bounds).localCheckpoint(eager=True)
    qcodes = codes.filter(F.col("vec_id") < 3)

    sdot = S.sq_dots(codes, qcodes).withColumnRenamed("s", "qdot")
    wq = W.partitionBy("query_id").orderBy(F.col("qdot").desc(), "neighbor_id")
    cand = (
        sdot.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _MMR_SHORTLIST)
        .select("query_id", "neighbor_id", F.col("qdot").cast("bigint").alias("qdot"))
        .localCheckpoint(eager=True)
    )
    candc = cand.join(
        codes.select(F.col("vec_id").alias("neighbor_id"), "codes"), "neighbor_id"
    )
    a = candc.select("query_id", F.col("neighbor_id").alias("ida"), F.col("codes").alias("ca"))
    b = candc.select("query_id", F.col("neighbor_id").alias("idb"), F.col("codes").alias("cb"))
    pair = (
        a.join(b, "query_id")
        .filter(F.col("ida") != F.col("idb"))
        .withColumn(
            "pdot",
            F.expr(
                "aggregate(zip_with(ca, cb,"
                " (x, y) -> CAST(2*x-255 AS BIGINT) * CAST(2*y-255 AS BIGINT)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ),
        )
        .select("query_id", "ida", "idb", "pdot")
        .localCheckpoint(eager=True)
    )

    s1 = (
        cand.withColumn("rk", F.row_number().over(wq.orderBy(F.col("qdot").desc(), "neighbor_id")))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            "neighbor_id",
            "qdot",
            (7 * F.col("qdot")).cast("bigint").alias("mmr_score"),
            F.lit(1).cast("bigint").alias("mmr_rank"),
        )
    ).localCheckpoint(eager=True)
    picked = s1.select("query_id", "neighbor_id")
    stages = [s1]
    for st in range(2, _MMR_K + 1):
        rem = cand.join(picked, ["query_id", "neighbor_id"], "left_anti")
        mx = (
            pair.join(
                picked.select("query_id", F.col("neighbor_id").alias("idb")),
                ["query_id", "idb"],
            )
            .groupBy("query_id", "ida")
            .agg(F.max("pdot").alias("maxp"))
        )
        wk = W.partitionBy("query_id").orderBy(F.col("mmr_score").desc(), "neighbor_id")
        stage = (
            rem.join(
                mx,
                (rem["query_id"] == mx["query_id"]) & (rem["neighbor_id"] == mx["ida"]),
            )
            .select(
                rem["query_id"],
                rem["neighbor_id"],
                rem["qdot"],
                (7 * rem["qdot"] - 3 * mx["maxp"]).cast("bigint").alias("mmr_score"),
            )
            .withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") == 1)
            .select(
                "query_id",
                "neighbor_id",
                "qdot",
                "mmr_score",
                F.lit(st).cast("bigint").alias("mmr_rank"),
            )
        ).localCheckpoint(eager=True)
        stages.append(stage)
        picked = picked.unionByName(stage.select("query_id", "neighbor_id"))

    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out.orderBy("query_id", "mmr_rank")


_LI_WIN = 8         # tokens per late-interaction unit (window)
_LI_BUCKETS = 64    # feature-hash dimensionality
_LI_SHORTLIST = 20  # coarse candidates re-ranked per query
_LI_K = 5


@register(
    "rag_late_interaction",
    bench=True,
    tags=("retrieval", "text", "similarity", "rag"),
    # Late-interaction re-ranking (the ColBERT MaxSim idea, Khattab &
    # Zaharia SIGIR'20): a document is MANY vectors, not one; score(q,d)
    # = sum over q's units of the MAX dot to any of d's units — matching
    # is deferred ("late") so a candidate scores on its best-matching
    # region per query region instead of one blurred whole-doc vector.
    # Without a trained encoder in the env, units are 8-token windows
    # and unit vectors are 64-bucket feature-hash count vectors (md5
    # hashing trick — engine-portable, integer); the SERVING ALGEBRA —
    # coarse single-vector shortlist, then sum-of-max late interaction
    # over unit pairs — is the real thing, and every dot is a BIGINT so
    # DuckDB replays shortlist, unit pairs, and both rankings exactly.
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> regexp_matches(x, '^[a-z]+$') AND length(x) >= 2) AS w
        FROM documents
    ), tok AS MATERIALIZED (
        SELECT doc_id, CAST((i - 1) // {_LI_WIN} AS INT) AS win,
               ('0x' || substr(md5(w[i]), 1, 15))::BIGINT % {_LI_BUCKETS} AS b
        FROM base, unnest(range(1, len(w) + 1)) AS t(i)
    ), wvec AS MATERIALIZED (
        SELECT doc_id, win, b, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2, 3
    ), dvec AS MATERIALIZED (
        SELECT doc_id, b, CAST(sum(c) AS BIGINT) AS c FROM wvec GROUP BY 1, 2
    ), coarse AS MATERIALIZED (
        SELECT q.doc_id AS query_id, d.doc_id,
               CAST(sum(q.c * d.c) AS BIGINT) AS coarse_dot
        FROM dvec q JOIN dvec d USING (b)
        WHERE q.doc_id < 3 AND d.doc_id <> q.doc_id
        GROUP BY 1, 2
    ), short AS MATERIALIZED (
        SELECT query_id, doc_id, coarse_dot FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY coarse_dot DESC, doc_id) AS rk
            FROM coarse
        ) WHERE rk <= {_LI_SHORTLIST}
    ), pair AS MATERIALIZED (
        SELECT s.query_id, s.doc_id, q.win AS qwin, d.win AS dwin,
               CAST(sum(q.c * d.c) AS BIGINT) AS dot
        FROM short s
        JOIN wvec q ON q.doc_id = s.query_id
        JOIN wvec d ON d.doc_id = s.doc_id AND d.b = q.b
        GROUP BY 1, 2, 3, 4
    ), maxsim AS MATERIALIZED (
        SELECT query_id, doc_id, CAST(sum(mx) AS BIGINT) AS maxsim
        FROM (SELECT query_id, doc_id, qwin, max(dot) AS mx
              FROM pair GROUP BY 1, 2, 3)
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, coarse_dot, maxsim,
           CAST(li_rank AS BIGINT) AS li_rank
    FROM (
        SELECT s.query_id, s.doc_id, s.coarse_dot, m.maxsim,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY m.maxsim DESC, s.doc_id) AS li_rank
        FROM short s
        JOIN maxsim m ON m.query_id = s.query_id AND m.doc_id = s.doc_id
    )
    WHERE li_rank <= {_LI_K}
    ORDER BY query_id, li_rank
    """,
)
def rag_late_interaction(spark, sf_dir):
    """Late-interaction (MaxSim) retrieval: coarse single-vector top-20
    shortlist, then per-query-window best-match scoring over the
    shortlist — the third rung of the serving ladder (BM25 keyword →
    single-vector dense → multi-vector late interaction), completing the
    retrieval family next to rag_hybrid_retrieval (fusion) and
    knn_mmr_rerank (diversity).

    Unit vectors are md5 feature-hash count vectors over 8-token
    windows (the trained-encoder stand-in; the serving algebra is the
    part being built). The coarse stage uses the window vectors' SUM —
    the whole-doc count vector — so shortlist and re-rank share one
    census. Plan shape at 100 TB: the window census is one corpus scan
    with map-side combine; the coarse stage joins on the 64-value
    bucket key with the 3 query vectors BROADCAST, so cost ~ corpus
    bucket rows, not corpus x queries; the MaxSim stage touches only
    shortlist docs' window rows (20 per query) joined to broadcast
    query windows — the expensive sum-of-max interaction never sees the
    corpus, exactly how a deployed ColBERT tier bounds its FLOPs. Every
    dot is a BIGINT (count vectors), so shortlist boundary, max ties,
    and final ranks are engine-exact with no float argmax risk.
    """
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    from lakehouse_tacklebox_spark.operators.corpus import hash_bucket

    toks = F.expr(
        "filter(split(lower(trim(text)), '\\\\s+'),"
        " x -> x RLIKE '^[a-z]+$' AND length(x) >= 2)"
    )
    tok = d.select("doc_id", F.posexplode(toks).alias("pos", "w"))
    wtok = tok.select(
        "doc_id",
        F.floor(F.col("pos") / _LI_WIN).cast("int").alias("win"),
        hash_bucket(F.col("w"), _LI_BUCKETS).alias("b"),
    )
    wvec = (
        wtok.groupBy("doc_id", "win", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    dvec = wvec.groupBy("doc_id", "b").agg(F.sum("c").cast("bigint").alias("c"))
    qdoc = dvec.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "b", F.col("c").alias("cq")
    )
    coarse = (
        dvec.join(F.broadcast(qdoc), "b")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("c") * F.col("cq")).cast("bigint").alias("coarse_dot"))
    )
    wq = W.partitionBy("query_id").orderBy(F.col("coarse_dot").desc(), "doc_id")
    short = (
        coarse.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _LI_SHORTLIST)
        .select("query_id", "doc_id", "coarse_dot")
        .localCheckpoint(eager=True)
    )
    qwin = wvec.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("win").alias("qwin"),
        "b",
        F.col("c").alias("cq"),
    )
    cwin = wvec.join(F.broadcast(short.select("query_id", "doc_id")), "doc_id").select(
        "query_id", "doc_id", F.col("win").alias("dwin"), "b", F.col("c").alias("cd")
    )
    pair = (
        cwin.join(F.broadcast(qwin), ["query_id", "b"])
        .groupBy("query_id", "doc_id", "qwin", "dwin")
        .agg(F.sum(F.col("cq") * F.col("cd")).cast("bigint").alias("dot"))
    )
    best = pair.groupBy("query_id", "doc_id", "qwin").agg(F.max("dot").alias("mx"))
    maxsim = best.groupBy("query_id", "doc_id").agg(
        F.sum("mx").cast("bigint").alias("maxsim")
    )
    wl = W.partitionBy("query_id").orderBy(F.col("maxsim").desc(), "doc_id")
    return (
        short.join(maxsim, ["query_id", "doc_id"])
        .withColumn("li_rank", F.row_number().over(wl).cast("bigint"))
        .filter(F.col("li_rank") <= _LI_K)
        .orderBy("query_id", "li_rank")
    )


@register(
    "rag_rm3_expansion",
    bench=True,
    tags=("retrieval", "text", "rag", "prf"),
    # Pseudo-relevance feedback (the RM3 shape: Lavrenko & Croft
    # relevance models, as deployed in Indri/Anserini) — the rung of
    # the retrieval ladder between plain BM25 (rag_hybrid_retrieval's
    # keyword leg) and the re-rankers (knn_mmr_rerank,
    # rag_late_interaction): a first-pass BM25 top-10 per query, an
    # expansion-term model over the feedback docs (weight(w|q) =
    # Σ_d tf(w,d)·1e6 DIV len(d) — the uniform-prior relevance model
    # made integer-rational), the top-5 non-query terms appended with a
    # 7:3 original:expansion weight split (the integer dial the MMR
    # entry uses), and a second weighted-BM25 pass. EVERYTHING is
    # BIGINT arithmetic — both passes, the term model, the weights —
    # so DuckDB hash-compares the full second-pass ranking, and
    # new_vs_firstpass pins that expansion actually moves the ranking
    # (a PRF that returns the first-pass list is vacuous).
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents
    ), tok AS (
        SELECT doc_id, w FROM toks
        WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
    ), dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY doc_id
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len) AS BIGINT) AS total
        FROM dl
    ), dft AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY w
    ), tft AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, w
    ), qt AS (
        SELECT DISTINCT doc_id AS query_id, w FROM tok WHERE doc_id < 3
    ), bm1 AS (
        SELECT qt.query_id, tft.doc_id,
               CAST(sum(
                 (((2*(s.n_docs - dft.df) + 1) * 1000000) // (2*dft.df + 1))
                 * ((44000*tft.tf*s.total)
                    // (20*tft.tf*s.total + 6*s.total + 18*dl.len*s.n_docs))
               ) AS BIGINT) AS score
        FROM qt
        JOIN tft USING (w)
        JOIN dft USING (w)
        JOIN dl ON dl.doc_id = tft.doc_id
        CROSS JOIN stats s
        WHERE tft.doc_id <> qt.query_id
        GROUP BY 1, 2
    ), fb AS (
        SELECT query_id, doc_id, r FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS r
            FROM bm1
        ) WHERE r <= 10
    ), relmodel AS (
        SELECT fb.query_id, tft.w,
               CAST(sum((tft.tf * 1000000) // dl.len) AS BIGINT) AS wgt_ppm
        FROM fb
        JOIN tft ON tft.doc_id = fb.doc_id
        JOIN dl ON dl.doc_id = fb.doc_id
        WHERE NOT EXISTS (
            SELECT 1 FROM qt WHERE qt.query_id = fb.query_id AND qt.w = tft.w
        )
        GROUP BY 1, 2
    ), exp AS (
        SELECT query_id, w FROM (
            SELECT query_id, w,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY wgt_ppm DESC, w) AS er
            FROM relmodel
        ) WHERE er <= 5
    ), q2 AS (
        SELECT query_id, w, CAST(7 AS BIGINT) AS qw FROM qt
        UNION ALL
        SELECT query_id, w, CAST(3 AS BIGINT) AS qw FROM exp
    ), bm2 AS (
        SELECT q2.query_id, tft.doc_id,
               CAST(sum(
                 q2.qw
                 * (((2*(s.n_docs - dft.df) + 1) * 1000000) // (2*dft.df + 1))
                 * ((44000*tft.tf*s.total)
                    // (20*tft.tf*s.total + 6*s.total + 18*dl.len*s.n_docs))
               ) AS BIGINT) AS score
        FROM q2
        JOIN tft USING (w)
        JOIN dft USING (w)
        JOIN dl ON dl.doc_id = tft.doc_id
        CROSS JOIN stats s
        WHERE tft.doc_id <> q2.query_id
        GROUP BY 1, 2
    ), final AS (
        SELECT query_id, doc_id, score,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, doc_id) AS BIGINT)
                   AS rank
        FROM bm2
    )
    SELECT f.query_id, f.doc_id, f.score, f.rank,
           CAST(CASE WHEN fb.r IS NULL OR fb.r > 5 THEN 1 ELSE 0 END AS INT)
               AS new_vs_firstpass
    FROM final f
    LEFT JOIN fb ON fb.query_id = f.query_id AND fb.doc_id = f.doc_id
    WHERE f.rank <= 5
    ORDER BY f.query_id, f.rank
    """,
)
def rag_rm3_expansion(spark, sf_dir):
    """Pseudo-relevance-feedback retrieval (RM3 shape): BM25 first pass
    → integer-rational relevance model over the top-10 feedback docs →
    top-5 expansion terms per query (non-query terms, weight
    Σ tf·1e6 DIV len) → second BM25 pass with a 7:3 original:expansion
    term-weight split → top-5, flagged where expansion surfaced a doc
    the first pass missed. Plan shape at 100 TB: tf/df/len censuses are
    one corpus scan (shared by both passes — computed once here); each
    pass is a posting-list join bounded by the probed terms' postings
    (the expansion adds ≤5 terms/query, so the second pass costs the
    same shape as the first); the relevance model touches only the
    10·|queries| feedback docs' postings. No floats anywhere — see the
    register note."""
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    tok = (
        d.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    ).localCheckpoint(eager=False)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("total"),
    )
    dft = tok.groupBy("w").agg(F.count_distinct("doc_id").cast("bigint").alias("df"))
    tft = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=True)
    qt = tok.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "w"
    ).distinct().localCheckpoint(eager=True)

    # int64 headroom guard (ADVICE r11): the largest intermediates are
    # the saturation numerator 44000·tf·total and the per-doc score sum
    # ≤ max_len · qw · idf_ppm_max · sat_max. At the gate scales these
    # sit ~7 orders of magnitude under 2^63, but non-ANSI Spark WRAPS
    # on overflow where ANSI DuckDB raises — the engines would diverge
    # silently rather than both failing loudly. Raise here instead; the
    # documented remedy at larger corpora is computing the idf factor
    # at reduced ppm scale (1e3) or splitting the corpus census.
    g = dl.agg(
        F.max("len").alias("max_len"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len").alias("total"),
    ).collect()[0]
    idf_ppm_max = (2 * int(g["n_docs"]) + 1) * 1_000_000 // 3
    if (
        44000 * int(g["max_len"]) * int(g["total"]) >= 2**62
        or int(g["max_len"]) * 7 * idf_ppm_max * 2200 >= 2**62
    ):
        raise ValueError(
            "rag_rm3_expansion: integer BM25 score terms would approach "
            "int64 range at this corpus size; recompute idf at reduced "
            "ppm scale before running"
        )

    contrib = F.expr(
        "(((2*(n_docs - df) + 1) * CAST(1000000 AS BIGINT)) DIV (2*df + 1))"
        " * ((44000*tf*total)"
        "    DIV (20*tf*total + 6*total + 18*len*n_docs))"
    )

    def bm25(qterms, weighted: bool):
        scored = (
            tft.join(F.broadcast(qterms), "w")
            .filter(F.col("doc_id") != F.col("query_id"))
            .join(dft, "w")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .withColumn("c", contrib)
        )
        if weighted:
            scored = scored.withColumn("c", F.col("qw") * F.col("c"))
        return scored.groupBy("query_id", "doc_id").agg(
            F.sum("c").cast("bigint").alias("score")
        )

    wk = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    fb = (
        bm25(qt, weighted=False)
        .withColumn("r", F.row_number().over(wk))
        .filter(F.col("r") <= 10)
        .select("query_id", "doc_id", "r")
        .localCheckpoint(eager=True)
    )

    relmodel = (
        fb.join(tft, "doc_id")
        .join(dl, "doc_id")
        .withColumn("t_ppm", F.expr("(tf * CAST(1000000 AS BIGINT)) DIV len"))
        .groupBy("query_id", "w")
        .agg(F.sum("t_ppm").cast("bigint").alias("wgt_ppm"))
        .join(qt, ["query_id", "w"], "left_anti")
    )
    we = W.partitionBy("query_id").orderBy(F.col("wgt_ppm").desc(), "w")
    exp = (
        relmodel.withColumn("er", F.row_number().over(we))
        .filter(F.col("er") <= 5)
        .select("query_id", "w")
    )
    q2 = qt.withColumn("qw", F.lit(7).cast("bigint")).unionByName(
        exp.withColumn("qw", F.lit(3).cast("bigint"))
    )

    final = (
        bm25(q2, weighted=True)
        .withColumn("rank", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rank") <= 5)
    )
    return (
        final.join(
            fb.select("query_id", "doc_id", F.col("r").alias("fb_r")),
            ["query_id", "doc_id"],
            "left",
        )
        .select(
            "query_id",
            "doc_id",
            "score",
            "rank",
            F.when(F.col("fb_r").isNull() | (F.col("fb_r") > 5), 1)
            .otherwise(0)
            .cast("int")
            .alias("new_vs_firstpass"),
        )
        .orderBy("query_id", "rank")
    )


@register(
    "rag_eval_metrics",
    bench=True,
    tags=("retrieval", "text", "rag", "evaluation"),
    # Retrieval EVALUATION harness — the measurement half every RAG/
    # training-data stack needs next to its retrievers: per query,
    # recall@5 and MRR@5 of the integer BM25 first pass (identical
    # contrib formula to rag_rm3_expansion's first pass) against an
    # n-gram-overlap relevance truth (docs sharing >= 2 distinct
    # 5-grams with the query doc — the text_contamination_attribution
    # leak rule, reused as graded qrels). Metrics are integer ppm
    # (MRR = 1e6 DIV first-hit rank; recall = hits*1e6 DIV min(n_rel,5))
    # so the whole evaluation hash-compares; ranks fully tie-broken.
    oracle="""
    WITH tok AS (
        SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents
        ) WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= 2
    ), dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY doc_id
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(len) AS BIGINT) AS total
        FROM dl
    ), dft AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY w
    ), tft AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, w
    ), qt AS (
        SELECT DISTINCT doc_id AS query_id, w FROM tok WHERE doc_id < 3
    ), bm1 AS (
        SELECT qt.query_id, tft.doc_id,
               CAST(sum(
                 (((2*(s.n_docs - dft.df) + 1) * 1000000) // (2*dft.df + 1))
                 * ((44000*tft.tf*s.total)
                    // (20*tft.tf*s.total + 6*s.total + 18*dl.len*s.n_docs))
               ) AS BIGINT) AS score
        FROM qt
        JOIN tft USING (w)
        JOIN dft USING (w)
        JOIN dl ON dl.doc_id = tft.doc_id
        CROSS JOIN stats s
        WHERE tft.doc_id <> qt.query_id
        GROUP BY 1, 2
    ), ranked AS (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        FROM bm1
    ), top5 AS (
        SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 5
    ), sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)]) AS shingles
        FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM documents)
        WHERE len(t) >= 5
    ), qs AS (
        SELECT doc_id AS query_id, unnest(shingles) AS s FROM sh WHERE doc_id < 3
    ), cs AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id >= 3
    ), rel AS (
        SELECT qs.query_id, cs.doc_id
        FROM qs JOIN cs USING (s)
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ), nrel AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY query_id
    ), hits AS (
        SELECT t.query_id,
               CAST(count(*) AS BIGINT) AS hits_at5,
               CAST(min(t.rank) AS BIGINT) AS first_hit_rank
        FROM top5 t JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        GROUP BY t.query_id
    )
    SELECT n.query_id,
           n.n_rel,
           coalesce(h.hits_at5, 0) AS hits_at5,
           CAST(coalesce(1000000 // h.first_hit_rank, 0) AS BIGINT) AS mrr_ppm,
           CAST(coalesce(h.hits_at5, 0) * 1000000 // least(n.n_rel, 5) AS BIGINT)
               AS recall_at5_ppm
    FROM nrel n LEFT JOIN hits h USING (query_id)
    ORDER BY n.query_id
    """,
)
def rag_eval_metrics(spark, sf_dir):
    """Retrieval evaluation: integer BM25 top-5 per query (docs 0-2),
    scored against n-gram-overlap qrels (>= 2 shared distinct 5-grams),
    reported per query as (n_rel, hits@5, MRR ppm, recall@5 ppm). One
    token census feeds the retrieval leg and one shingle census the
    truth leg; both passes are posting-bounded joins, the metrics are
    k-bounded arithmetic — the evaluation costs no more than the
    retrieval it measures. At 100 TB qrels are a table and this whole
    entry is the nightly retrieval-quality job."""
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    # The token/shingle explodes inflate each doc ~1000x, but partition
    # count follows the FILE splits of the raw scan (2 splits at sf1 →
    # the whole census ran on 2 cores). Spread the corpus across the
    # session's parallelism before the heavy per-token work; on a real
    # cluster the same dial is spark.sql.files.maxPartitionBytes sized
    # to post-explode (not on-disk) bytes.
    d = d.repartition(spark.sparkContext.defaultParallelism)
    tok = (
        d.select(
            "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        ).filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    ).localCheckpoint(eager=False)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("total"),
    )
    qt = (
        tok.filter(F.col("doc_id") < 3)
        .select(F.col("doc_id").alias("query_id"), "w")
        .distinct()
    )
    # Census pruning (VERDICT r12 item 4): df and tf are only ever read
    # for QUERY terms, so restrict the census input to the query
    # vocabulary BEFORE the (doc_id, w) group-by — the expensive shuffle
    # shrinks from every token in the corpus to the query-term postings,
    # identical integers out (non-query terms contribute to no score).
    # dl/stats stay corpus-global, as BM25 requires.
    tokq = tok.join(F.broadcast(qt.select("w").distinct()), "w")
    dft = tokq.groupBy("w").agg(F.count_distinct("doc_id").cast("bigint").alias("df"))
    tft = tokq.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    contrib = F.expr(
        "(((2*(n_docs - df) + 1) * CAST(1000000 AS BIGINT)) DIV (2*df + 1))"
        " * ((44000*tf*total)"
        "    DIV (20*tf*total + 6*total + 18*len*n_docs))"
    )
    bm1 = (
        tft.join(F.broadcast(qt), "w")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dft, "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("c", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("bigint").alias("score"))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")

    def retrieval_leg():
        return (
            bm1.withColumn("rank", F.row_number().over(wk).cast("bigint"))
            .filter(F.col("rank") <= 5)
            .select("query_id", "doc_id", "rank")
            .localCheckpoint(eager=True)
        )

    # qrels: >= 2 shared distinct 5-grams (the contamination leak rule).
    # Gram hashes come from posexplode + four window lead()s + one
    # multi-arg xxhash64 — the same hash values shingle_hashes would
    # produce, but every step stays inside whole-stage codegen. The
    # higher-order transform() route evaluates its lambda INTERPRETED
    # per gram (~14 µs/gram measured: 36 s for the 2.5M-gram sf1
    # corpus vs <1 s for this shape), so at census scale the window
    # form wins despite its one doc-keyed shuffle of the token list.
    tk = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("pos", "tkn"),
    )
    wsh = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tkn", i).over(wsh) for i in range(1, 5)]
    grams5 = (
        tk.select(
            "doc_id",
            F.xxhash64(F.col("tkn"), *leads).alias("s"),
            leads[-1].alias("__tail"),
        )
        .filter(F.col("__tail").isNotNull())
        .select("doc_id", "s")
        .distinct()
    )
    qsh = grams5.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "s"
    )
    csh = grams5.filter(F.col("doc_id") >= 3)
    def qrels_leg():
        return (
            # query-side shingles are 3 docs' worth — broadcast them so the
            # corpus-wide shingle explosion stays a scan-side probe instead
            # of a full shuffle (same pruning story as the token leg).
            # Engine-parity caveat (ADVICE r12): Spark compares 64-bit
            # hashed shingles while the oracle compares gram STRINGS, so a
            # cross-doc xxhash64 collision could add a phantom shared
            # shingle on the Spark side only — vanishing at gate scales
            # (the established contamination-entry pattern); if qrels ever
            # gate at larger corpora, verify candidate pairs on gram
            # strings or dual-seeded hashes as the exact-Jaccard path does.
            csh.join(F.broadcast(qsh), "s")
            .groupBy("query_id", "doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= 2)
            .select("query_id", "doc_id")
            .localCheckpoint(eager=True)
        )

    # The retrieval leg (BM25 top-5) and the truth leg (5-gram qrels)
    # read different censuses of the same corpus and meet only at the
    # final hits join — two independent job chains, overlapped from
    # driver threads (guide §2.6) so the corpus scans and census
    # shuffles of one leg back-fill the other's stragglers.
    from lakehouse_tacklebox_spark.operators.concurrency import run_concurrent

    top5, rel = run_concurrent(spark, retrieval_leg, qrels_leg)
    nrel = rel.groupBy("query_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    hits = (
        top5.join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("hits_at5"),
            F.min("rank").cast("bigint").alias("first_hit_rank"),
        )
    )
    return (
        nrel.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce("hits_at5", F.lit(0)).cast("bigint").alias("hits_at5"),
            F.coalesce(
                F.expr("CAST(1000000 AS BIGINT) DIV first_hit_rank"), F.lit(0)
            )
            .cast("bigint")
            .alias("mrr_ppm"),
            F.expr(
                "CAST(coalesce(hits_at5, 0) * CAST(1000000 AS BIGINT)"
                " DIV least(n_rel, CAST(5 AS BIGINT)) AS BIGINT)"
            ).alias("recall_at5_ppm"),
        )
        .orderBy("query_id")
    )
