"""Testdata catalog: load the driver-provided parquet star schema.

Scans are plain ``spark.read.parquet`` so Catalyst gets native parquet
pushdown (PushedFilters / ReadSchema pruning). Nothing is cached here —
callers decide; at 100 TB you never blanket-cache a fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
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

# Dimension tables small enough to broadcast at any scale factor. At 100 TB
# the facts (orders/lineitem/events) grow; these stay bounded (catalog-style
# dims), so broadcast hints on them remain valid.
BROADCAST_DIMS = ("region", "nation", "supplier")


def maybe_broadcast(df: DataFrame, name: str) -> DataFrame:
    """Scale-aware broadcast policy: hint only dimensions that stay
    bounded at any scale factor (``BROADCAST_DIMS``).

    For SF-growing tables (customer, part, orders, ...) return the frame
    un-hinted and let ``spark.sql.autoBroadcastJoinThreshold`` + AQE pick
    the strategy from the *measured* size at runtime. A forced
    ``F.broadcast`` on a table that grows with the data bypasses that
    threshold and OOMs the build side at the 100 TB design point, so query
    code must never hard-hint those — route every dim hint through here.
    At small SF AQE still broadcasts them (sizes are far below the
    threshold), so plans and bench numbers are unchanged where it's safe.
    """
    return F.broadcast(df) if name in BROADCAST_DIMS else df


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to session-TZ TimestampType
    regardless of how the parquet file encodes it.

    The driver's testdata has shipped ``ts`` both as parquet
    TIMESTAMP(NANOS) (readable only as long under nanosAsLong — convert
    with integer division, float would lose precision above 2^53) and as
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Dispatch on the observed
    type so either layout works under any caller-provided session.
    """
    from pyspark.sql.types import LongType, TimestampType

    t = df.schema[col].dataType
    if isinstance(t, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if not isinstance(t, TimestampType):
        # TIMESTAMP_NTZ → TimestampType; values identical under UTC session
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    """Return {table_name: DataFrame} for the parquet files in sf_dir."""
    # Runtime confs the query battery depends on, set here so results are
    # correct even under a caller-provided SparkSession (e.g. the driver's):
    # nanos parquet timestamps read as long (converted back in _read), and
    # UTC session time zone so timestamp arithmetic matches the oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return {name: _read(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
