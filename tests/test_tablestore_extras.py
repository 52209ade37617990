"""Clone, identity/generated columns, catalog listing, session variables."""

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.tablestore.clone import clone
from lakehouse_tacklebox_spark.tablestore.columns import ColumnManagedTable
from lakehouse_tacklebox_spark.tablestore.table import TackleTable
from lakehouse_tacklebox_spark.tablestore.transactions import TackleCatalog

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def nation_table(spark, tmp_path):
    nation = load_tables(spark, SF_DIR, ["nation"])["nation"]
    return TackleTable.create(spark, str(tmp_path / "nation"), nation)


def test_shallow_clone_zero_copy(spark, tmp_path, nation_table):
    c = clone(nation_table, str(tmp_path / "shallow"))
    assert c.read().count() == nation_table.read().count()
    # zero data copy: clone's data dir is empty
    assert not os.listdir(os.path.join(c.path, "data"))
    hist = c.history()
    assert hist[-1]["operation"] == "CLONE" and not hist[-1]["operationParameters"]["deep"]
    # clone evolves independently of the source
    c.delete("n_nationkey >= 10")
    assert c.read().count() == 10
    assert nation_table.read().count() == 25
    # vacuum on the clone never touches source files
    c.vacuum(keep_versions=1)
    assert nation_table.read().count() == 25


def test_deep_clone_independent_files(spark, tmp_path, nation_table):
    c = clone(nation_table, str(tmp_path / "deep"), deep=True)
    assert c.read().count() == 25
    assert os.listdir(os.path.join(c.path, "data"))
    # mutating the source does not affect the deep clone
    nation_table.delete("true")
    assert c.read().count() == 25


def test_identity_and_generated_columns(spark, tmp_path):
    base = spark.createDataFrame([], "id bigint, name string, name_upper string")
    t = TackleTable.create(spark, str(tmp_path / "mgd"), base)
    mgd = ColumnManagedTable(t, identity_col="id", generated={"name_upper": "upper(name)"})

    batch = spark.createDataFrame([("a",), ("b",), ("c",)], "name string").withColumn("id", F.lit(None).cast("bigint")).withColumn("name_upper", F.lit("WRONG"))
    mgd.append(batch)
    rows1 = mgd.read().collect()
    ids1 = sorted(r.id for r in rows1)
    assert len(set(ids1)) == 3 and min(ids1) >= 0  # unique; gaps allowed (Delta identity contract)
    # GENERATED ALWAYS: provided value overwritten
    assert all(r.name_upper == r.name.upper() for r in rows1)

    mgd.append(spark.createDataFrame([("d",), ("e",)], "name string").withColumn("id", F.lit(None).cast("bigint")).withColumn("name_upper", F.lit(None).cast("string")))
    rows2 = mgd.read().collect()
    ids2 = sorted(r.id for r in rows2)
    assert len(set(ids2)) == 5
    # second batch strictly above the first (monotone, gaps allowed)
    assert min(set(ids2) - set(ids1)) > max(ids1)


def test_catalog_listing_with_filters(spark, tmp_path):
    cat = TackleCatalog(spark, str(tmp_path / "cat"))
    nation = load_tables(spark, SF_DIR, ["nation"])["nation"]
    cat.create("bronze_nation", nation)
    cat.create("silver_nation", nation.filter("n_nationkey < 5"))
    cat.create("tmp_scratch", nation.limit(1))

    all_rows = cat.list_tables_df().collect()
    assert [r.table for r in all_rows] == ["bronze_nation", "silver_nation", "tmp_scratch"]
    assert all(r.size_bytes > 0 and r.num_files >= 1 for r in all_rows)

    filtered = cat.list_tables_df(include=["*_nation"], exclude=["bronze_*"]).collect()
    assert [r.table for r in filtered] == ["silver_nation"]


def test_session_variables_native(spark):
    """M18: Spark 4 DECLARE/SET VARIABLE — the reference's Step 15
    named_struct variables pattern works natively."""
    spark.sql("DECLARE OR REPLACE VARIABLE threshold INT DEFAULT 10")
    nation = load_tables(spark, SF_DIR, ["nation"])["nation"]
    nation.createOrReplaceTempView("nation_v")
    n1 = spark.sql("SELECT count(*) AS n FROM nation_v WHERE n_nationkey < threshold").collect()[0].n
    assert n1 == 10
    spark.sql("SET VARIABLE threshold = 3")
    n2 = spark.sql("SELECT count(*) AS n FROM nation_v WHERE n_nationkey < threshold").collect()[0].n
    assert n2 == 3
