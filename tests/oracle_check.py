"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(columns sorted by name, rows sorted, exact equality after normalizing
timestamps). Catching a mismatch here means catching it before the
driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows_to_sorted(rows, col_names):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [col_names[i] for i in order]


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    con = duck_connection(sf_dir)
    res = con.execute(oracle_sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    s_sorted, cols = _rows_to_sorted(spark_rows, spark_cols)
    d_sorted, _ = _rows_to_sorted(duck_rows, duck_cols)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if sr != dr:
            n_bad += 1
            if n_bad <= 3:
                diff_cols = [
                    (cols[j], sr[j], dr[j])
                    for j in range(len(cols))
                    if sr[j] != dr[j]
                ]
                problems.append(f"row {i} differs: {diff_cols}")
    if n_bad > 3:
        problems.append(f"... {n_bad} differing rows total")
    return problems
