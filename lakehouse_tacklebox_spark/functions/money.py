"""Exact decimal money arithmetic.

Double-precision money math is not reproducible across engines: Spark's
``round`` rounds the double's shortest decimal representation while other
engines (DuckDB, Postgres) round the exact binary value, so products of
2-decimal inputs (price × (1-discount)) diverge at half-cent boundaries.

The fix is exact DECIMAL arithmetic end-to-end: cast inputs to fixed
precision, multiply/sum in decimal (deterministic, engine-independent),
round, then cast back to double. Precisions are chosen so a 3-factor
product stays ≤ DECIMAL(30,10) — under the 38-digit cap of both Spark and
DuckDB, so neither engine applies lossy precision reduction.

Cost note: decimal ops are a few× slower than double ops per-row, but
remain JVM-side / codegen'd; for 100 TB aggregates the scan still
dominates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dmoney(c: Column | str) -> Column:
    """2-decimal money amount → DECIMAL(14,2) (exact)."""
    return F.col(c).cast("decimal(14,2)") if isinstance(c, str) else c.cast("decimal(14,2)")


def drate(c: Column) -> Column:
    """Small rate factor (e.g. 1-discount, 1+tax) → DECIMAL(7,4)."""
    return c.cast("decimal(7,4)")


def dsum_dbl(c: Column, scale: int = 2) -> Column:
    """SUM in exact decimal, rounded, returned as double."""
    return F.round(F.sum(c), scale).cast("double")


def round_dbl(c: Column, scale: int = 2) -> Column:
    """Round (decimal input ⇒ exact half-up) and return double."""
    return F.round(c, scale).cast("double")
