"""TransactionManager: multi-statement execute + rollback semantics."""

import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.tablestore.transactions import (
    TackleCatalog,
    TempTableManager,
    TransactionManager,
    parse_altered_tables,
    retry_with_backoff,
    split_statements,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = TackleCatalog(spark, str(tmp_path / "cat"))
    nation = load_tables(spark, SF_DIR, ["nation"])["nation"]
    cat.create("nation_t", nation)
    return cat


def test_split_and_parse():
    sql = "INSERT INTO a SELECT 1; UPDATE b SET x = ';'; SELECT * FROM c"
    stmts = split_statements(sql)
    assert len(stmts) == 3
    assert parse_altered_tables(stmts) == ["a", "b"]


def test_transaction_commit_chain(spark, catalog):
    txm = TransactionManager(catalog)
    out = txm.execute_transaction(
        """
        CREATE TABLE big_nations AS SELECT * FROM nation_t WHERE n_nationkey >= 10;
        INSERT INTO big_nations SELECT * FROM nation_t WHERE n_nationkey < 3;
        UPDATE big_nations SET n_name = 'X' WHERE n_nationkey = 10;
        DELETE FROM big_nations WHERE n_nationkey = 2;
        SELECT count(*) AS n FROM big_nations
        """
    )
    total = catalog.tables["nation_t"].read().filter("n_nationkey >= 10 OR n_nationkey < 3").count() - 1
    assert out.collect()[0].n == total
    t = catalog.tables["big_nations"]
    assert t.read().filter("n_nationkey = 10").collect()[0].n_name == "X"
    assert t.read().filter("n_nationkey = 2").count() == 0


def test_transaction_rollback_restores_and_drops(spark, catalog):
    txm = TransactionManager(catalog)
    v0 = catalog.tables["nation_t"].version()
    n0 = catalog.tables["nation_t"].read().count()
    with pytest.raises(Exception):
        txm.execute_transaction(
            """
            CREATE TABLE scratch AS SELECT * FROM nation_t;
            DELETE FROM nation_t WHERE n_nationkey < 100;
            INSERT INTO nation_t SELECT * FROM missing_table
            """
        )
    # nation_t restored to pre-transaction version content; scratch dropped
    assert catalog.tables["nation_t"].read().count() == n0
    assert "scratch" not in catalog.tables
    assert catalog.tables["nation_t"].version() > v0  # restore is a new commit, history preserved


def test_transaction_merge_statement(spark, catalog):
    txm = TransactionManager(catalog)
    txm.execute_transaction(
        """
        CREATE TABLE tgt AS SELECT n_nationkey, n_name FROM nation_t WHERE n_nationkey < 10;
        MERGE INTO tgt t USING (
            SELECT n_nationkey, concat(n_name, '_v2') AS n_name FROM nation_t WHERE n_nationkey < 15
        ) s ON t.n_nationkey = s.n_nationkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    rows = {r.n_nationkey: r.n_name for r in catalog.tables["tgt"].read().collect()}
    assert len(rows) == 15
    assert all(v.endswith("_v2") for v in rows.values())


def test_explicit_tables_mode_rolls_back_listed_only(spark, catalog):
    txm = TransactionManager(catalog)
    with pytest.raises(Exception):
        txm.execute_transaction(
            ["DELETE FROM nation_t WHERE n_nationkey = 0", "SELECT * FROM nope"],
            tables=["nation_t"],
        )
    assert catalog.tables["nation_t"].read().filter("n_nationkey = 0").count() == 1


def test_retry_with_backoff_retries():
    from lakehouse_tacklebox_spark.tablestore.table import CommitConflictError

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise CommitConflictError("race")
        return "ok"

    assert retry_with_backoff(flaky, base_s=0.01) == "ok"
    assert calls["n"] == 3


def test_temp_table_manager_breaks_lineage(spark):
    ttm = TempTableManager(spark)
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = ttm.create_or_replace("probe_tmp", df)
    assert out.count() == 100
    assert spark.table("probe_tmp").agg(F.sum("x")).collect()[0][0] == 9900
    # materialized: plan is a parquet scan, not the range lineage
    assert "probe_tmp" in out.inputFiles()[0] or out.inputFiles()
    ttm.remove_all()


def test_parse_dml_behind_cte_prelude():
    """The reference parses DML at AST depth 1, so `WITH ... INSERT` must
    report the DML target, not read as a SELECT."""
    stmts = [
        "WITH fresh AS (SELECT * FROM src WHERE day = ')') INSERT INTO tgt SELECT * FROM fresh",
        "WITH a AS (SELECT 1), b (x, y) AS (SELECT 2, 3) UPDATE t2 SET v = 1",
        "WITH d AS (SELECT * FROM (SELECT 1)) DELETE FROM t3 WHERE x IN (SELECT * FROM d)",
        "WITH s AS (SELECT 1) SELECT * FROM s",  # plain CTE select: no write
        "WITH broken AS (SELECT 1",  # malformed: non-altering fallback
    ]
    assert parse_altered_tables(stmts) == ["tgt", "t2", "t3"]


def test_parse_use_scoping_and_copy_into():
    """USE switches the database for subsequent unqualified names
    (reference USE-scoping); COPY INTO is a write even though the
    reference has to scrub it before sqlglot."""
    stmts = [
        "INSERT INTO plain SELECT 1",
        "USE db1",
        "INSERT INTO t1 SELECT 1",
        "COPY INTO t2 FROM '/data/x' FILEFORMAT = PARQUET",
        "USE SCHEMA db2",
        "DELETE FROM t3",
        "UPDATE other.t4 SET x = 1",  # already qualified: untouched
    ]
    assert parse_altered_tables(stmts) == [
        "plain",
        "db1.t1",
        "db1.t2",
        "db2.t3",
        "other.t4",
    ]
