"""Query registry: every graded query/operator in one place.

Each entry pairs a Spark DataFrame-API implementation with (where
SQL-expressible) a DuckDB oracle SQL string over the same parquet tables.
The driver's correctness gate runs both and hash-compares values, so:

- every computed column is aliased identically on both sides,
- float aggregates are rounded identically on both sides,
- any LIMIT/top-k is fully tie-broken so results are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags, bench=bench)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}


# Import side-effect modules that populate REGISTRY.
from lakehouse_tacklebox_spark.queries import (  # noqa: E402,F401
    aggregates,
    cdc_battery,
    joins,
    metrics,
    multimodal,
    plans_battery,
    scalars,
    setops,
    similarity,
    streaming_battery,
    textops,
    tpch,
    tpch_extra,
    tpch_extra2,
    tpch_extra3,
    validation,
    windows,
)
