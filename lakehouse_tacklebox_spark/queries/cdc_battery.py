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


@register(
    "cdc_scd3_prev_value",
    tags=("cdc", "scd3", "transactions"),
    # SCD Type 3 — current + immediately-previous value as COLUMNS (the
    # "show me what changed" dimension shape), completing the SCD pair
    # with cdc_scd2_late_events, and sharing its hard case: batch 2 is
    # entirely LATE events, and a late middle change must replace the
    # PREVIOUS column without touching current (seq 1 < 2 < 3 arriving
    # as [1,3] then [2]: prev flips CREATED→PAID, current stays).
    # Maintenance is the real MERGE path: each batch's source rows are
    # resolved against the stored state (top-2 by sequence over stored
    # current/previous + batch changes — correct under ANY arrival
    # order), then whenMatchedUpdateAll / whenNotMatchedInsertAll
    # rewrites only touched files. The oracle ranks the full change set
    # per key and reads off seq-max and second-max.
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
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM changes
    )
    SELECT c.o_orderkey,
           c.status AS cur_status, CAST(c.seq AS BIGINT) AS cur_seq,
           round(c.price, 2) AS cur_price,
           p.status AS prev_status, CAST(p.seq AS BIGINT) AS prev_seq
    FROM ranked c JOIN ranked p
      ON p.o_orderkey = c.o_orderkey AND p.rn = 2
    WHERE c.rn = 1
    ORDER BY c.o_orderkey
    """,
)
def cdc_scd3_prev_value(spark, sf_dir):
    """SCD3 apply-changes across two batches where batch 2 is all late
    events: the dimension keeps (current, previous) as columns, and
    each batch is folded in with an arrival-order-independent rule —
    new state = top-2 changes by sequence over {stored current, stored
    previous, batch} — resolved per key BEFORE the MERGE so the write
    is a plain whenMatchedUpdateAll / whenNotMatchedInsertAll
    touched-file rewrite. At scale the resolve is one key-partitioned
    top-2 window over (2 stored rows + batch rows) per touched key and
    the MERGE rewrites only files holding touched keys; untouched
    dimension files never move."""
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import Window as W

    batch1, batch2 = _change_feed(spark, sf_dir)
    # SCD3 treats the tombstone as a regular change to a terminal status
    batch1 = batch1.drop("is_delete")
    batch2 = batch2.drop("is_delete")

    tmp = _tempfile.mkdtemp(prefix="cdc_scd3_")
    path = f"{tmp}/target"
    state_schema = (
        "o_orderkey bigint, cur_status string, cur_seq bigint,"
        " cur_price double, prev_status string, prev_seq bigint"
    )
    try:
        t = TackleTable.create(spark, path, schema=state_schema)
        for i, batch in enumerate((batch1, batch2), start=1):
            stored = TackleTable(spark, path).read()
            cur_rows = stored.select(
                "o_orderkey",
                F.col("cur_seq").alias("seq"),
                F.col("cur_status").alias("status"),
                F.col("cur_price").alias("price"),
            )
            prev_rows = stored.filter(F.col("prev_seq").isNotNull()).select(
                "o_orderkey",
                F.col("prev_seq").alias("seq"),
                F.col("prev_status").alias("status"),
                F.lit(None).cast("double").alias("price"),
            )
            cand = (
                batch.select(
                    "o_orderkey",
                    F.col("seq").cast("bigint").alias("seq"),
                    "status",
                    F.col("price").cast("double").alias("price"),
                )
                .unionByName(cur_rows)
                .unionByName(prev_rows)
            )
            w = W.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
            top2 = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
            cur = top2.filter(F.col("rn") == 1).select(
                "o_orderkey",
                F.col("status").alias("cur_status"),
                F.col("seq").alias("cur_seq"),
                F.col("price").alias("cur_price"),
            )
            prv = top2.filter(F.col("rn") == 2).select(
                "o_orderkey",
                F.col("status").alias("prev_status"),
                F.col("seq").alias("prev_seq"),
            )
            resolved = cur.join(prv, "o_orderkey", "left").select(
                "o_orderkey", "cur_status", "cur_seq", "cur_price",
                "prev_status", "prev_seq",
            ).localCheckpoint(eager=True)
            (
                TackleTable(spark, path)
                .merge(resolved, on=["o_orderkey"])
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .withTransaction("scd3_apply", i)
                .execute()
            )
        out = (
            TackleTable(spark, path)
            .read()
            .filter(F.col("prev_seq").isNotNull())
            .select(
                "o_orderkey",
                "cur_status",
                F.col("cur_seq").cast("bigint").alias("cur_seq"),
                F.round("cur_price", 2).alias("cur_price"),
                "prev_status",
                F.col("prev_seq").cast("bigint").alias("prev_seq"),
            )
            .orderBy("o_orderkey")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)
