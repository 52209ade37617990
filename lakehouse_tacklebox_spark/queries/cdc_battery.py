"""CDC battery: SCD2 APPLY CHANGES with late events, oracle-checked.

The hard case (SURVEY.md §7 hard part #1): a late change must SPLIT an
already-committed validity interval. The query feeds a deterministic
change feed in TWO batches — the second batch is entirely late events
landing between committed intervals — through the real incremental
path (apply_changes_batch → TackleTable merge + interval repair), and
returns the final history. The DuckDB oracle computes intervals from
ALL changes at once with lead(); parity proves the incremental repair
converges to the batch-rebuild answer.

The target table lives in a per-call temp directory (the query is about
the semantics, not the storage location).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.streaming.apply_changes import apply_changes_batch
from lakehouse_tacklebox_spark.tablestore import TackleTable


def _change_feed(spark, sf_dir):
    """Per selected order key: seq 1 (insert), seq 3 (second update), and
    a LATE seq 2 that must split the [1, 3) interval. A sliver of keys
    also gets a seq 4 delete tombstone."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    base = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    v1 = base.select("o_orderkey", F.lit(1).alias("seq"), F.lit("CREATED").alias("status"), "price", F.lit(False).alias("is_delete"))
    v3 = base.select("o_orderkey", F.lit(3).alias("seq"), F.lit("SHIPPED").alias("status"), (F.col("price") + 10).alias("price"), F.lit(False).alias("is_delete"))
    late_v2 = base.select("o_orderkey", F.lit(2).alias("seq"), F.lit("PAID").alias("status"), (F.col("price") + 5).alias("price"), F.lit(False).alias("is_delete"))
    v4_del = base.filter(F.col("o_orderkey") % 194 == 0).select(
        "o_orderkey", F.lit(4).alias("seq"), F.lit("GONE").alias("status"), F.col("price"), F.lit(True).alias("is_delete")
    )
    return v1.unionByName(v3), late_v2.unionByName(v4_del)


@register(
    "cdc_scd2_late_events",
    tags=("cdc", "scd2", "streaming"),
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_orderkey % 97 = 0
    ),
    changes AS (
        SELECT o_orderkey, 1 AS seq, 'CREATED' AS status, price FROM base
        UNION ALL SELECT o_orderkey, 2, 'PAID',    price + 5 FROM base
        UNION ALL SELECT o_orderkey, 3, 'SHIPPED', price + 10 FROM base
        UNION ALL SELECT o_orderkey, 4, 'GONE', price FROM base WHERE o_orderkey % 194 = 0
    ),
    hist AS (
        SELECT o_orderkey, seq, status, round(price, 2) AS price,
               lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS valid_to
        FROM changes
    )
    SELECT o_orderkey, seq AS valid_from, valid_to, status, price,
           -- a tombstone stays in history but is never current
           valid_to IS NULL AND status <> 'GONE' AS is_current
    FROM hist
    """,
)
def cdc_scd2_late_events(spark, sf_dir):
    """SCD2 apply-changes across two batches where batch 2 is all late
    events (interval splits) plus tombstones; output is the final
    validity history."""
    batch1, batch2 = _change_feed(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc_scd2_")
    path = f"{tmp}/target"
    try:
        for batch in (batch1, batch2):
            apply_changes_batch(
                path,
                batch,
                keys=["o_orderkey"],
                sequence_by="seq",
                apply_as_delete_when="is_delete",
                scd_type=2,
            )
        hist = TackleTable(spark, path).read()
        out = (
            hist.select(
                "o_orderkey",
                F.col("__valid_from").cast("int").alias("valid_from"),
                F.col("__valid_to").cast("int").alias("valid_to"),
                "status",
                F.round("price", 2).alias("price"),
                F.col("__is_current").alias("is_current"),
            )
            .orderBy("o_orderkey", "valid_from")
        )
        # materialize before the temp dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
