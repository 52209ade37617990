"""SQL-surface battery: Spark 4 SQL features exercised as spark.sql
plans — recursive CTEs (SPARK-24497, new in Spark 4.0) and correlated
LATERAL subqueries — each oracled against DuckDB's implementation of
the same standard SQL. These queries are deliberately written in SQL
rather than the DataFrame API: the capability under test is the SQL
front-end itself (a reference user's ad-hoc SQL must keep working after
the switch), while Catalyst still owns the physical plan.
"""

from __future__ import annotations

from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables


def _views(spark, sf_dir, tables):
    t = load_tables(spark, sf_dir, tables)
    for name, df in t.items():
        df.createOrReplaceTempView(name)


@register(
    "sql_recursive_hierarchy",
    tags=("sql", "recursive-cte", "hierarchy"),
    # DuckDB runs the IDENTICAL recursive CTE; both engines must agree
    # on every (depth, n, nations) row. DIV (// in DuckDB) keeps the
    # parent derivation in exact integer arithmetic.
    oracle="""
    WITH RECURSIVE chain(c_custkey, c_nationkey, depth) AS (
        SELECT c_custkey, c_nationkey, 0 FROM customer WHERE c_custkey = 0
        UNION ALL
        SELECT c.c_custkey, c.c_nationkey, ch.depth + 1
        FROM customer c JOIN chain ch ON c.c_custkey // 10 = ch.c_custkey
        WHERE c.c_custkey > 0
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS nations
    FROM chain GROUP BY depth ORDER BY depth
    """,
)
def sql_recursive_hierarchy(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE) walking a 10-ary
    org-chart hierarchy derived from customer ids (parent = key DIV 10,
    root = key 0): per-depth census of customers and their nation
    spread. The recursion is a real iterative plan — each step joins
    the frontier to the fact on the derived parent key — and the
    traversal covers the full table (1 + 9 + 90 + 900 + ... = all
    customers), so a lost or duplicated frontier row moves a count.
    Scale: each iteration shuffles only the frontier ⋈ fact join on the
    parent key; depth is O(log₁₀ keys), so 100 TB of customers is
    ~10 iterations, not a driver loop."""
    _views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        WITH RECURSIVE chain(c_custkey, c_nationkey, depth) AS (
            SELECT c_custkey, c_nationkey, 0 FROM customer WHERE c_custkey = 0
            UNION ALL
            SELECT c.c_custkey, c.c_nationkey, ch.depth + 1
            FROM customer c JOIN chain ch ON c.c_custkey DIV 10 = ch.c_custkey
            WHERE c.c_custkey > 0
        )
        SELECT depth,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count(DISTINCT c_nationkey) AS BIGINT) AS nations
        FROM chain GROUP BY depth ORDER BY depth
        """
    )


@register(
    "sql_lateral_topk",
    tags=("sql", "lateral", "topk"),
    # Same correlated LATERAL in DuckDB; money compared as exact cents,
    # ties fully broken by custkey inside the LIMIT.
    oracle="""
    SELECT r.r_name, x.c_custkey,
           CAST(round(CAST(x.c_acctbal AS DECIMAL(14,2)) * 100) AS BIGINT) AS acctbal_cents
    FROM region r, LATERAL (
        SELECT c.c_custkey, c.c_acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3
    ) x
    ORDER BY r.r_name, acctbal_cents DESC, x.c_custkey
    """,
)
def sql_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery: top-3 customers by balance per
    region, the per-row-subquery formulation a reference user writes
    ad hoc (the window-function rewrite exists elsewhere in the battery
    — win_topn_per_group — so this entry pins the LATERAL front-end
    specifically). Ties fully broken inside the LIMIT; money compared
    as exact cents."""
    _views(spark, sf_dir, ["region", "nation", "customer"])
    return spark.sql(
        """
        SELECT r.r_name, x.c_custkey,
               CAST(round(CAST(x.c_acctbal AS DECIMAL(14,2)) * 100) AS BIGINT) AS acctbal_cents
        FROM region r, LATERAL (
            SELECT c.c_custkey, c.c_acctbal
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3
        ) x
        ORDER BY r.r_name, acctbal_cents DESC, x.c_custkey
        """
    )


@register(
    "udtf_chunk_documents",
    tags=("sql", "udtf", "corpus"),
    # DuckDB rebuilds the identical chunking relationally (list slices
    # over unnested ranges) and the chunk CONTENT is pinned through the
    # engine-portable md5-60-bit hash — a UDTF that drops, reorders, or
    # mis-splits one token changes a hash and fails the compare.
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
        FROM documents
    ),
    c AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               array_to_string(w[i*32+1 : least((i+1)*32, len(w))], ' ') AS chunk_text,
               CAST(least(32, len(w) - i*32) AS INT) AS n_tokens
        FROM t, UNNEST(range(0, CAST(ceil(len(w)/32.0) AS BIGINT))) AS u(i)
        WHERE len(w) > 0
    )
    SELECT doc_id, chunk_idx, n_tokens,
           ('0x' || substr(md5(chunk_text), 1, 15))::BIGINT AS chunk_hash
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def udtf_chunk_documents(spark, sf_dir):
    """Python user-defined TABLE function (Spark 4's @udtf — the F-family
    UDF surface extended to set-returning functions): a chunker UDTF
    yields one row per non-overlapping 32-token window of each document,
    invoked through SQL's `LATERAL udtf(...)` exactly as a reference
    user would call a DLT-style expansion function. Content is verified,
    not just shape: every chunk's md5-60-bit hash must match the
    relational rebuild. Scale: the UDTF streams rows per input row (no
    per-doc materialization beyond its own chunks), Spark distributes it
    like any projection; heavy-duty chunking stays available on the pure
    JVM path (corpus_chunk_windows) — this entry pins the API surface."""
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, n_tokens int, chunk_hash long")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            toks = text.lower().strip().split()
            if not toks:
                return
            for i in range(0, len(toks), 32):
                c = toks[i : i + 32]
                h = int(hashlib.md5(" ".join(c).encode()).hexdigest()[:15], 16)
                yield doc_id, i // 32, len(c), h

    _views(spark, sf_dir, ["documents"])
    spark.udtf.register("chunk_doc", Chunker)
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk_hash
        FROM documents d, LATERAL chunk_doc(d.doc_id, d.text) c
        ORDER BY c.doc_id, c.chunk_idx
        """
    )
