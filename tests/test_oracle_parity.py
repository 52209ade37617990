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


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    # Must produce a stable schema and be collectable (≥0 rows).
    assert df.columns
    df.collect()
