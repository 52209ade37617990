"""Parity of every oracle-carrying registered query against DuckDB at
sf0.001 — the local twin of the driver's correctness gate."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_tacklebox_spark.queries import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_check import compare

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    problems = compare(df, spec.oracle, SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_no_rows_only_queries_remain():
    """Since round 8 every registered query carries a DuckDB oracle
    (knn_ivf, the last rows-only entry, was folded into a
    self-certifying shape). This pins that invariant: a new rows-only
    registration must be a deliberate, reviewed decision."""
    assert ROWS_ONLY_QUERIES == [], ROWS_ONLY_QUERIES


def test_hll_sketch_rollup_error_bound(spark):
    """The merged-sketch rollup is now SELF-CERTIFYING (the query emits
    the exact distinct plus a ≤3% accuracy flag the driver oracle
    asserts); this test pins the certification locally: both flags
    columns true AND the exact count agrees with DuckDB."""
    from lakehouse_tacklebox_spark.queries import REGISTRY

    est = REGISTRY["agg_hll_sketch_rollup"].fn(spark, SF_DIR).collect()[0]
    import duckdb, os

    con = duckdb.connect()
    exact = con.execute(
        f"SELECT count(DISTINCT o_custkey) FROM read_parquet('{os.path.join(SF_DIR, 'orders.parquet')}')"
    ).fetchone()[0]
    con.close()
    assert est["union_estimate_within_3pct"] == 1
    assert est["exact_customers_global"] == exact, (
        est["exact_customers_global"],
        exact,
    )
