"""Storage-layout battery: bucketed co-located joins and idempotent
epoch-replay MV maintenance, driver-checked against DuckDB oracles.

Both capabilities were pytest-only infrastructure through round 6
(tests/test_bucketed_join.py, tests/test_tablestore.py); these entries
put them behind the correctness gate. Reference bar: the Delta
`txn`/`foreachBatch` exactly-once discussion in the reference's Step 5
migration guide and its bucketed-layout performance notes
(30-performance) — semantics re-expressed Spark-first, no code shared.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.functions import dmoney, drate
from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables


@register(
    "join_bucketed_colocated",
    tags=("join", "bucketing", "storage"),
    bench=False,
    oracle="""
    SELECT o_orderpriority, l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(5,4))) * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Fact-fact join with ZERO join-input exchanges via bucketing: both
    facts are written bucketed by the join key (8 buckets, sorted), so
    the sort-merge join reads co-located buckets directly instead of
    shuffling either side — the storage layout that makes a repeated
    100 TB fact-fact join affordable (the shuffle is paid ONCE at write
    time, then amortized across every subsequent join on that key).

    The query asserts the plan property inline — `Exchange
    hashpartitioning` may appear at most once (the post-join |groups|-row
    aggregate), never under the join — and the driver's row/hash compare
    proves bucketing is invisible to results. The join carries a
    `merge` strategy hint so the co-located sort-merge path is what
    executes even where the dim would fit a broadcast at gate SF (a
    broadcast plan would test nothing about bucketing); a strategy hint
    is scale-safe, unlike a forced broadcast.
    """
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    # session-unique table names per sf_dir so sf0.01/sf0.1 drives in one
    # session don't collide; external path keeps the warehouse in /tmp
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.mkdtemp(prefix=f"bucketed_{tag}_")
    names = {}
    for name, df, key in (
        ("li", t["lineitem"].select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"), "l_orderkey"),
        ("ord", t["orders"].select("o_orderkey", "o_orderpriority"), "o_orderkey"),
    ):
        tbl = f"bkt_{name}_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(tmp, tbl))
            .format("parquet")
            .saveAsTable(tbl)
        )
        names[name] = tbl

    li = spark.table(names["li"])
    o = spark.table(names["ord"])
    rev_cents = F.round(
        dmoney("l_extendedprice") * drate(F.lit(1) - F.col("l_discount")) * 100
    ).cast("bigint")
    out = (
        li.hint("merge")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(rev_cents).cast("bigint").alias("rev_cents"),
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )
    # inline plan pin: bucketed scans feed the join directly; only the
    # post-join aggregate may introduce an exchange
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 1, f"bucketed join inputs still shuffle: {n_ex} exchanges"
    return out


@register(
    "stream_idempotent_mv_replay",
    tags=("streaming", "transactions", "incremental"),
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(5,4))) * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY returnflag
    """,
)
def stream_idempotent_mv_replay(spark, sf_dir):
    """Exactly-once incremental MV under DELIBERATE epoch replay: the
    fact streams in micro-batches into a merge-maintained aggregate view
    stamped with Delta-style ``txn`` versions — then the LAST epoch is
    replayed twice more (the foreachBatch failover model: the merge
    committed but the checkpoint didn't advance, so a restarted writer
    re-runs the epoch). The stamp travels in the same commit as the
    data, so both replays must no-op and the final view must equal
    DuckDB's one-shot batch aggregate — any double-apply fails the
    hash compare, making writer idempotence a driver-checked claim
    rather than a pytest-only one.

    Scale: per-batch cost is a |batch| partial aggregate plus a
    |groups|-row merge; the replay guard is one log-tail read
    (txn_version) re-validated inside the commit's retry loop, so even
    a zombie writer racing the retry cannot double-apply
    (tablestore/table.py _commit).
    """
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    tmp = tempfile.mkdtemp(prefix="idem_mv_")
    src_dir = os.path.join(tmp, "src")
    tbl_dir = os.path.join(tmp, "tbl")
    ckpt = os.path.join(tmp, "ckpt")

    t = load_tables(spark, sf_dir, ["lineitem"])
    t["lineitem"].select("l_returnflag", "l_extendedprice", "l_discount").repartition(
        4
    ).write.parquet(src_dir)

    rev_cents = F.round(
        dmoney("l_extendedprice") * drate(F.lit(1) - F.col("l_discount")) * 100
    ).cast("bigint")

    TackleTable.create(
        spark, tbl_dir, schema="returnflag string, n_rows bigint, rev_cents bigint"
    )

    last = {"epoch": None, "batch": None}

    def _upsert(batch_df, epoch):
        s = batch_df.sparkSession
        table = TackleTable(s, tbl_dir)
        if table.txn_version("idem_mv") >= epoch:
            return  # retried epoch already committed
        parts = (
            batch_df.groupBy(F.col("l_returnflag").alias("returnflag"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(rev_cents).cast("bigint").alias("rev_cents"),
            )
        )
        combined = (
            table.read()
            .unionByName(parts)
            .groupBy("returnflag")
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum("rev_cents").cast("bigint").alias("rev_cents"),
            )
        )
        (
            table.merge(combined, on=["returnflag"])
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .withTransaction("idem_mv", epoch)
            .execute()
        )

    def _upsert_tracking(batch_df, epoch):
        # keep a handle to the newest batch only; the source files stay on
        # disk until after the replay below, so no persist is needed
        last["epoch"], last["batch"] = epoch, batch_df
        _upsert(batch_df, epoch)

    raw_schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_upsert_tracking)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()  # never leave a zombie stream running past the deadline
        raise TimeoutError("availableNow stream exceeded the 300s deadline")

    # failover replay: the last epoch runs twice more — both must no-op
    if last["epoch"] is not None:
        _upsert(last["batch"], last["epoch"])
        _upsert(last["batch"], last["epoch"])

    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    return (
        TackleTable(spark, tbl_dir)
        .read()
        .select("returnflag", "n_rows", "rev_cents")
        .orderBy("returnflag")
    )


@register(
    "table_skipping_pointlookup",
    tags=("tablestore", "data-skipping", "storage"),
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(CAST(o_totalprice AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS cents
    FROM orders
    WHERE o_custkey = 42
    ORDER BY o_orderkey
    """,
)
def table_skipping_pointlookup(spark, sf_dir):
    """Min/max-stats file skipping under a point lookup: orders is
    rewritten into a TackleTable z-ordered by o_custkey (OPTIMIZE with
    per-file stats committed in the log), then one customer's rows are
    read through the stats-pruned scan. The query asserts inline that
    files WERE skipped (a clustered point lookup that scans everything
    is a broken layout), and the driver's hash compare against the raw
    parquet proves pruning never loses or invents rows — the
    completeness half of the data-skipping contract, now
    driver-checked rather than pytest-only (tests/test_data_skipping.py
    pins the same invariants at unit level).

    Scale: this is THE 100 TB point-lookup path — log-held min/max per
    file means the lookup touches O(files containing the key) after
    z-order, not the table; the rewrite cost is the one-time OPTIMIZE
    every real deployment already pays.
    """
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.mkdtemp(prefix=f"skip_{tag}_")
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    t = TackleTable.create(spark, os.path.join(tmp, "ord"), orders.repartition(8))
    # size files to the table (≥8 files at any SF) so there is always
    # something to skip — a fixed row target degenerates to one file on
    # the smallest gate corpus and the skip assertion goes vacuous
    target = max(64, orders.count() // 8)
    t.optimize(target_file_rows=target, zorder_by=["o_custkey"])
    cond = "o_custkey = 42"
    kept, skipped = t.prune_files(cond)
    assert skipped, "z-ordered point lookup must skip files"
    return (
        t.scan(cond)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice").cast("decimal(14,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "table_version_diff",
    tags=("tablestore", "time-travel", "audit"),
    # The oracle recomputes the diff census from the base data and the
    # two deterministic mutations — the engine side must reconstruct
    # the SAME census purely from time-travel reads of the commit log.
    # Money deltas are exact cents so an update that leaked into the
    # wrong version (or a delete that missed a file rewrite) moves a
    # bigint and fails the hash.
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(round(CAST(o_totalprice AS DECIMAL(14,2)) * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT 'removed' AS change, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(-sum(cents) AS BIGINT) AS cents_delta
    FROM base WHERE o_orderkey % 97 = 0
    UNION ALL
    SELECT 'updated', CAST(count(*) AS BIGINT),
           CAST(count(*) * 100 AS BIGINT)
    FROM base WHERE o_orderkey % 50 = 0 AND o_orderkey % 97 <> 0
    UNION ALL
    SELECT 'unchanged', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
    FROM base WHERE o_orderkey % 50 <> 0 AND o_orderkey % 97 <> 0
    ORDER BY change
    """,
)
def table_version_diff(spark, sf_dir):
    """Time-travel semantic diff — the audit question 'what changed
    between version 0 and now, row by row?' answered from the commit
    log alone: a TackleTable is mutated twice (UPDATE bumps price +1.00
    on the %50 keys, DELETE removes the %97 keys), then the head and
    v0 snapshots are full-outer joined on the key and classified into
    removed / updated / unchanged with exact cents deltas. This is the
    reconciliation pattern the reference's validator family runs
    between environments, pointed instead at two VERSIONS of one table
    — no CDF required, so it works across any version gap including
    compactions. Scale: both snapshots are pruned scans, the diff join
    shuffles on the table key once, and the census is a 3-row agg."""
    import os
    import shutil
    import tempfile

    from lakehouse_tacklebox_spark.functions import dmoney
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    tmp = tempfile.mkdtemp(prefix="vdiff_")
    try:
        orders = load_tables(spark, sf_dir, ["orders"])["orders"]
        base = orders.filter(F.col("o_orderkey") % 7 == 0).select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
        )
        t = TackleTable.create(spark, os.path.join(tmp, "t"), base)
        t.update("o_orderkey % 50 = 0", {"price": "price + 1.0"})
        t.delete("o_orderkey % 97 = 0")

        cents = lambda c: F.round(dmoney(c) * 100).cast("bigint")  # noqa: E731
        v0 = t.read(version=0).select(
            "o_orderkey", cents("price").alias("cents_before")
        )
        head = t.read().select("o_orderkey", cents("price").alias("cents_after"))
        diff = v0.join(head, "o_orderkey", "full_outer").select(
            F.when(F.col("cents_after").isNull(), "removed")
            .when(F.col("cents_before").isNull(), "added")
            .when(F.col("cents_after") != F.col("cents_before"), "updated")
            .otherwise("unchanged")
            .alias("change"),
            (F.coalesce("cents_after", F.lit(0)) - F.coalesce("cents_before", F.lit(0))).alias(
                "delta"
            ),
        )
        out = (
            diff.groupBy("change")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("delta").cast("bigint").alias("cents_delta"),
            )
            .orderBy("change")
        )
        # materialize before the temp table vanishes
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "table_optimize_compaction",
    tags=("tablestore", "storage", "maintenance", "time-travel"),
    # The small-file lifecycle, driver-checked end-to-end (it was
    # pytest-only through round 9): 8 micro-appends fragment the table
    # into many small files — the shape every streaming ingest produces
    # — then OPTIMIZE compacts, time-travel still serves the
    # pre-compaction version (a rewrite adds a version, it must not
    # destroy history), and VACUUM physically reclaims the orphaned
    # small files. Content certification is the driver's hash compare:
    # the census below is computed THROUGH the compacted table and the
    # oracle recomputes it from raw parquet — compaction must lose or
    # invent nothing, to the cent. Flags pin the mechanics: fewer
    # files after OPTIMIZE, history intact before VACUUM, files
    # physically removed by it.
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(CAST(o_totalprice AS DECIMAL(14,2)) * 100)
                    AS BIGINT)) AS BIGINT) AS cents,
           CAST(1 AS INT) AS compacted_fewer_files,
           CAST(1 AS INT) AS history_preserved,
           CAST(1 AS INT) AS vacuum_reclaimed
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def table_optimize_compaction(spark, sf_dir):
    """OPTIMIZE + VACUUM lifecycle under fragmented ingest: orders
    arrives as 8 micro-appends (2 files each — the streaming small-file
    problem), OPTIMIZE rewrites the ~16 small files into a handful of
    right-sized ones, the pre-compaction snapshot stays readable
    (row-count-identical) until VACUUM reclaims the orphans. The
    returned census runs through the compacted table and the oracle
    recomputes it from raw parquet, so the rewrite is certified
    content-preserving to the cent. Scale: OPTIMIZE cost ∝ rewritten
    bytes and is scoped by `where` in production (compact today's
    partition, not the years-deep table); VACUUM is a log-vs-disk
    set difference, no data reads."""
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.mkdtemp(prefix=f"compact_{tag}_")
    path = os.path.join(tmp, "ord")
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]

    first = orders.filter(F.col("o_orderkey") % 8 == 0).repartition(2)
    t = TackleTable.create(spark, path, first)
    for m in range(1, 8):
        t.append(orders.filter(F.col("o_orderkey") % 8 == m).repartition(2))

    files_before = len(t._active_files()[0])
    v_pre = t.version()
    n_pre = t.read().count()

    target = max(64, orders.count() // 4)
    t.optimize(target_file_rows=target)
    files_after = len(t._active_files()[0])
    compacted = files_after < files_before

    # history: the pre-compaction snapshot must still serve
    history_ok = t.read(version=v_pre).count() == n_pre

    # vacuum: the orphaned small files must physically disappear
    removed = t.vacuum(keep_versions=1)
    vacuumed = removed > 0

    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                    "bigint"
                )
            ).cast("bigint").alias("cents"),
        )
        .withColumn(
            "compacted_fewer_files", F.lit(1 if compacted else 0).cast("int")
        )
        .withColumn("history_preserved", F.lit(1 if history_ok else 0).cast("int"))
        .withColumn("vacuum_reclaimed", F.lit(1 if vacuumed else 0).cast("int"))
        .orderBy("o_orderpriority")
    )


@register(
    "table_restore_bad_write",
    tags=("tablestore", "storage", "time-travel", "maintenance"),
    # The incident-recovery half of the maintenance lifecycle
    # (OPTIMIZE/VACUUM have table_optimize_compaction): a bad job
    # overwrites the table with corrupted data (every price doubled),
    # RESTORE flips the active file set back to the pre-incident
    # version as a NEW commit — old files reactivate without a data
    # rewrite, the bad version stays time-travelable for the
    # post-mortem, and writes continue on top. The census is read
    # through the restored table; the oracle recomputes it from raw
    # parquet, so the restore is certified byte-faithful, and the
    # flags pin that the corruption was real (sum moved) and that the
    # bad snapshot remains auditable.
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(CAST(o_totalprice AS DECIMAL(14,2)) * 100)
                    AS BIGINT)) AS BIGINT) AS cents,
           CAST(1 AS INT) AS corruption_detected,
           CAST(1 AS INT) AS restore_roundtrip,
           CAST(1 AS INT) AS bad_version_auditable
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def table_restore_bad_write(spark, sf_dir):
    """RESTORE after a bad write: the table is corrupted by an
    overwrite that doubles every price, detected by census divergence,
    and rolled back with RESTORE — a metadata-only commit that
    reactivates the previous version's files (no data rewrite; cost is
    one log entry regardless of table size, the property that matters
    when the table is 100 TB). The bad version remains readable by
    version number for the post-mortem. Driver certification: the
    priority census through the restored head equals the raw-parquet
    oracle to the cent."""
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.mkdtemp(prefix=f"restore_{tag}_")
    path = os.path.join(tmp, "ord")
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]

    t = TackleTable.create(spark, path, orders.repartition(4))
    v_good = t.version()
    cents = F.round(F.col("o_totalprice").cast("decimal(14,2)") * 100).cast("bigint")
    good_sum = t.read().agg(F.sum(cents).cast("bigint").alias("s")).collect()[0]["s"]

    # the bad job: every price doubled
    t.overwrite(orders.withColumn("o_totalprice", F.col("o_totalprice") * 2))
    v_bad = t.version()
    bad_sum = t.read().agg(F.sum(cents).cast("bigint").alias("s")).collect()[0]["s"]
    corruption = bad_sum != good_sum

    t.restore(v_good)
    restored_sum = t.read().agg(F.sum(cents).cast("bigint").alias("s")).collect()[0]["s"]
    roundtrip = restored_sum == good_sum

    auditable = (
        t.read(version=v_bad).agg(F.sum(cents).cast("bigint").alias("s")).collect()[0]["s"]
        == bad_sum
    )

    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("cents"),
        )
        .withColumn("corruption_detected", F.lit(1 if corruption else 0).cast("int"))
        .withColumn("restore_roundtrip", F.lit(1 if roundtrip else 0).cast("int"))
        .withColumn("bad_version_auditable", F.lit(1 if auditable else 0).cast("int"))
        .orderBy("o_orderpriority")
    )


@register(
    "table_vacuum_retention",
    tags=("tablestore", "storage", "time-travel", "maintenance"),
    # The retention-horizon half of VACUUM (table_optimize_compaction
    # only pins that vacuum reclaims compaction debris): after a
    # rewriting DELETE, the pre-delete version is still time-travelable
    # — until VACUUM with keep_versions=1 physically drops its files.
    # Flags certify the full contract: the horizon is real (the old
    # version READ fine before vacuum and fails after), the current
    # head is untouched (census equals the raw-parquet oracle), the
    # commit LOG survives (history still lists every version — vacuum
    # deletes data files, never provenance), and a second vacuum is a
    # no-op (nothing left outside the horizon). At 100 TB this is the
    # storage-cost lever: time travel is priced in retained files, and
    # vacuum is the explicit, idempotent act that trades audit depth
    # for space.
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(1 AS INT) AS historical_readable_before,
           CAST(1 AS INT) AS historical_pruned_after,
           CAST(1 AS INT) AS current_read_intact,
           CAST(1 AS INT) AS vacuum_idempotent,
           CAST(1 AS INT) AS log_preserved
    FROM documents
    WHERE doc_id % 4 <> 1
    GROUP BY source
    ORDER BY source
    """,
)
def table_vacuum_retention(spark, sf_dir):
    """VACUUM retention semantics: a rewriting DELETE leaves the
    pre-delete files on disk (time travel to v1 still works); VACUUM
    keep_versions=1 drops exactly the files outside the horizon —
    after it, the v1 read fails, the head census is byte-identical to
    the oracle, the commit log still lists every version, and a second
    vacuum removes nothing. Cost ∝ files outside the horizon (a local
    file walk against the kept set — no data read, no shuffle)."""
    from lakehouse_tacklebox_spark.tablestore.table import TackleTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.mkdtemp(prefix=f"vacret_{tag}_")
    path = os.path.join(tmp, "docs")
    d = load_tables(spark, sf_dir, ["documents"])["documents"].select(
        "doc_id", "source", "n_chars"
    )

    t = TackleTable.create(spark, path, d.repartition(4))
    v_full = t.version()
    t.delete("doc_id % 4 = 1")

    def _v1_count():
        try:
            return t.read(version=v_full).count()
        except Exception:
            return None

    n_total = d.count()
    historical_before = _v1_count() == n_total
    ops_before_vacuum = [h.get("operation") for h in t.history()]

    removed1 = t.vacuum(keep_versions=1)
    historical_after = _v1_count() is None
    removed2 = t.vacuum(keep_versions=1)
    idempotent = (removed1 > 0) and (removed2 == 0)
    # vacuum deletes data files, never log entries: the operations that
    # produced the table's state must still be listed afterwards.
    # Asserted as set-containment plus "vacuum removed nothing" (count
    # taken before/after), NOT a pinned total history length — a future
    # logged operation (e.g. vacuum stamping its own commit entry) would
    # flip an exact-length pin even though the retention contract holds
    # (ADVICE r11).
    ops = [h.get("operation") for h in t.history()]
    log_preserved = (
        "CREATE" in ops
        and "DELETE" in ops
        and len(ops) >= len(ops_before_vacuum)
        and all(o in ops for o in ops_before_vacuum)
    )

    survivors = t.read().localCheckpoint(eager=True)
    expected = d.filter(F.col("doc_id") % 4 != 1)
    n_exp = expected.count()
    intact = (survivors.count() == n_exp) and (
        survivors.join(expected, ["doc_id", "source", "n_chars"]).count() == n_exp
    )

    return (
        survivors.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "historical_readable_before",
            F.lit(1 if historical_before else 0).cast("int"),
        )
        .withColumn(
            "historical_pruned_after", F.lit(1 if historical_after else 0).cast("int")
        )
        .withColumn("current_read_intact", F.lit(1 if intact else 0).cast("int"))
        .withColumn("vacuum_idempotent", F.lit(1 if idempotent else 0).cast("int"))
        .withColumn("log_preserved", F.lit(1 if log_preserved else 0).cast("int"))
        .orderBy("source")
    )
