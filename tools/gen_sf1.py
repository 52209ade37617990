"""Deterministic sf1 testdata synthesized from the driver's sf0.1.

The driver ships sf0.001/0.01/0.1 only; the bench's scale-drift section
needs one decade more (~6M lineitem) to catch accidental quadratics the
small gate can't. sf1 = 10 key-shifted replicas of sf0.1, built so every
workload dimension scales LINEARLY:

- all keys (custkey/orderkey/partkey/suppkey/doc_id/vec_id/user_id/
  event_id) shift by r·19,200,000 — divisible by every modulus the
  batteries use (3, 12, 16, 48, 64, 192), so modular fixtures
  (media modality/dims cycles) keep their distribution; referential
  integrity holds because fact and dim keys shift together.
- document TEXT gets a per-replica vowel permutation (translate), so
  replicas share almost no shingles: per-shingle document frequency —
  and therefore postings-join fan-out in the dedup family — stays at
  its sf0.1 level instead of 10x (which would make the pair joins grow
  100x and measure data blowup, not engine drift). Within a replica the
  similarity structure is exactly the original.
- EMBEDDINGS get a per-replica cyclic component shift — an orthogonal
  transform, so within-replica cosine structure is preserved exactly
  while cross-replica neighbors decorrelate; ANN candidate counts scale
  ~10x, not 100x.
- replica 0 is byte-identical to sf0.1; region/nation stay as-is;
  event timestamps keep their one-month span (time-bucket densities
  scale 10x, windows stay the same width).

Output: $OUT (default /root/repo/.sf1_testdata), one parquet per table.
Idempotent — skips tables whose parquet already exists.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sf1_testdata"
REPLICAS = 10
OFF = 19_200_000  # divisible by lcm(3, 12, 16, 48, 64) * 100

# replica-indexed vowel permutations (index 0 = identity)
VOWELS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio", "aeiuo", "eiuoa", "iuoae", "uoaei", "oaeiu"]


def _copy(con, table: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
    )


def _replicate(con, table: str, select_for_replica) -> None:
    parts = " UNION ALL ".join(select_for_replica(r) for r in range(REPLICAS))
    con.execute(f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    done = {t for t in os.listdir(OUT) if t.endswith(".parquet")}

    def need(t):
        return f"{t}.parquet" not in done

    for t in ("region", "nation"):
        if need(t):
            _copy(con, t)

    if need("customer"):
        _replicate(con, "customer", lambda r: f"""
            SELECT c_custkey + {r * OFF} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet')""")
    if need("supplier"):
        _replicate(con, "supplier", lambda r: f"""
            SELECT s_suppkey + {r * OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM read_parquet('{SRC}/supplier.parquet')""")
    if need("part"):
        _replicate(con, "part", lambda r: f"""
            SELECT p_partkey + {r * OFF} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
            FROM read_parquet('{SRC}/part.parquet')""")
    if need("orders"):
        _replicate(con, "orders", lambda r: f"""
            SELECT o_orderkey + {r * OFF} AS o_orderkey, o_custkey + {r * OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet')""")
    if need("lineitem"):
        _replicate(con, "lineitem", lambda r: f"""
            SELECT l_orderkey + {r * OFF} AS l_orderkey, l_partkey + {r * OFF} AS l_partkey,
                   l_suppkey + {r * OFF} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet')""")
    if need("events"):
        _replicate(con, "events", lambda r: f"""
            SELECT event_id + {r * OFF} AS event_id, ts, user_id + {r * OFF} AS user_id,
                   event_type, value, props
            FROM read_parquet('{SRC}/events.parquet')""")
    if need("documents"):
        _replicate(con, "documents", lambda r: f"""
            SELECT doc_id + {r * OFF} AS doc_id,
                   translate(text, 'aeiou', '{VOWELS[r]}') AS text,
                   lang, source, n_chars
            FROM read_parquet('{SRC}/documents.parquet')""")
    if need("embeddings"):
        _replicate(con, "embeddings", lambda r: f"""
            SELECT vec_id + {r * OFF} AS vec_id,
                   CAST(list_concat(embedding[{r + 1}:], embedding[:{r}]) AS FLOAT[]) AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet')""")
    con.close()
    print(f"sf1 testdata ready at {OUT}")


if __name__ == "__main__":
    main()
