"""Slowly-changing-dimension operators (batch forms).

SCD1 (overwrite-latest), SCD2 (validity intervals), and as-of snapshot
reads — the batch re-expression of the reference's merge patterns
(Step 12:165-316, Advanced CDC With SCD in Databricks.py:436-489). The
incremental/streaming forms live in ``streaming.apply_changes`` and
``tablestore`` (merge); these pure-DataFrame forms are the semantics
oracle the incremental paths are tested against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators.dedup import keep_latest


def scd1_latest(updates: DataFrame, keys: list[str], sequence_col: str, tiebreaker: str) -> DataFrame:
    """SCD1: current state = latest row per key by (sequence, tiebreaker)."""
    return keep_latest(updates, keys=keys, order_by=[sequence_col, tiebreaker])


def scd2_from_changes(
    changes: DataFrame,
    keys: list[str],
    sequence_col: str,
    tiebreaker: str,
) -> DataFrame:
    """Build the full SCD2 history from a change feed.

    Handles out-of-order arrivals by construction (a global sort per key
    rebuilds intervals), which is why the streaming path's
    interval-repair merge is tested against this.

    Appends: __valid_from, __valid_to (null = open), __is_current.
    """
    w = W.partitionBy(*keys).orderBy(F.col(sequence_col), F.col(tiebreaker))
    nxt = F.lead(sequence_col).over(w)
    return (
        changes.withColumn("__valid_from", F.col(sequence_col))
        .withColumn("__valid_to", nxt)
        .withColumn("__is_current", F.when(nxt.isNull(), F.lit(True)).otherwise(F.lit(False)))
    )


def scd2_asof(history: DataFrame, as_of) -> DataFrame:
    """Point-in-time read of an SCD2 history table."""
    ts = F.lit(as_of).cast("timestamp")
    return history.filter(
        (F.col("__valid_from") <= ts) & (F.col("__valid_to").isNull() | (F.col("__valid_to") > ts))
    )


def apply_scd1_batch(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    sequence_col: str,
    tiebreaker: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Merge a batch of updates into a current-state table (SCD1).

    Union + keep-latest: equivalent to MERGE whenMatchedUpdateAll /
    whenNotMatchedInsertAll with sequence-ordered conflict resolution
    (delta_sync.py:59-63 semantics). If delete_col is set, rows whose
    latest operation flags a delete drop out (APPLY AS DELETE WHEN).
    """
    cols = current.columns
    merged = keep_latest(
        current.select(*cols).unionByName(updates.select(*cols)),
        keys=keys,
        order_by=[sequence_col, tiebreaker],
    )
    if delete_col is not None:
        merged = merged.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return merged
