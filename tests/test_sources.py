"""Batch readers, COPY INTO idempotence, distributed file export."""

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.sources import readers as R
from lakehouse_tacklebox_spark.tablestore.copy_into import copy_into, loaded_files
from lakehouse_tacklebox_spark.tablestore.table import TackleTable


@pytest.fixture()
def json_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for i in range(3):
        with open(d / f"batch_{i}.json", "w") as f:
            for j in range(10):
                f.write(json.dumps({"id": i * 10 + j, "v": f"x{j}"}) + "\n")
    return str(d)


def test_read_json_and_csv_and_direct_path(spark, tmp_path, json_dir):
    df = R.read_json(spark, json_dir)
    assert df.count() == 30 and set(df.columns) == {"id", "v"}

    csv_path = str(tmp_path / "c.csv")
    with open(csv_path, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    cdf = R.read_csv(spark, csv_path)
    assert [r.a for r in cdf.orderBy("a").collect()] == [1, 2]

    ddf = R.read_direct_path(spark, "json", json_dir)
    assert ddf.count() == 30


def test_read_xml_native(spark, tmp_path):
    p = str(tmp_path / "x.xml")
    open(p, "w").write("<rows><row><a>1</a><b>x</b></row><row><a>2</a><b>y</b></row></rows>")
    df = R.read_xml(spark, p, row_tag="row")
    assert [(r.a, r.b) for r in df.orderBy("a").collect()] == [(1, "x"), (2, "y")]


def test_copy_into_is_idempotent(spark, tmp_path, json_dir):
    first = R.read_json(spark, json_dir).limit(0)
    t = TackleTable.create(spark, str(tmp_path / "tbl"), first)

    r1 = copy_into(t, json_dir, file_format="json")
    assert r1["numLoadedFiles"] == 3 and r1["numOutputRows"] == 30
    # re-run: nothing new, no new commit
    v = t.version()
    r2 = copy_into(t, json_dir, file_format="json")
    assert r2["numLoadedFiles"] == 0 and t.version() == v
    # new file arrives: only it is ingested
    with open(os.path.join(json_dir, "batch_9.json"), "w") as f:
        f.write(json.dumps({"id": 99, "v": "new"}) + "\n")
    r3 = copy_into(t, json_dir, file_format="json")
    assert r3["numLoadedFiles"] == 1 and r3["numOutputRows"] == 1
    assert t.read().count() == 31
    assert len(loaded_files(t)) == 4


def test_copy_into_pattern_and_transform(spark, tmp_path, json_dir):
    first = spark.createDataFrame([], "id bigint, v string, id2 bigint")
    t = TackleTable.create(spark, str(tmp_path / "tbl2"), first)
    r = copy_into(
        t,
        json_dir,
        file_format="json",
        pattern="batch_1.json",
        transform=lambda df: df.withColumn("id2", F.col("id") * 2),
    )
    assert r["numLoadedFiles"] == 1
    rows = t.read().orderBy("id").collect()
    assert len(rows) == 10 and all(x.id2 == x.id * 2 for x in rows)


def test_export_files_distributed_copy(spark, tmp_path, json_dir):
    dest = str(tmp_path / "out")
    files = R.list_files_df(spark, json_dir)
    statuses = R.export_files(files, dest, partitions=2).collect()
    assert all(s.status == "OK" for s in statuses)
    assert sorted(os.listdir(dest)) == sorted(os.listdir(json_dir))


def test_jdbc_scan_against_embedded_derby(spark, tmp_path):
    """S10 end-to-end with a real JDBC endpoint: Spark bundles Derby, so
    an embedded database exercises the actual JDBC read path (driver
    load, query pushdown, type mapping) — no network needed."""
    from lakehouse_tacklebox_spark.sources.readers import read_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute("CREATE TABLE metrics (id INT, name VARCHAR(20), score DOUBLE)")
        st.execute("INSERT INTO metrics VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', 3.5)")
        st.close()
    finally:
        conn.close()

    df = read_jdbc(
        spark,
        url,
        "SELECT id, name, score FROM metrics WHERE score > 2.0",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    got = sorted((r.ID, r.NAME, r.SCORE) for r in df.collect())
    assert got == [(2, "b", 2.5), (3, "c", 3.5)]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC write/read roundtrip; predicate pushdown reaches the ORC scan
    like parquet (same data source V2 path)."""
    from lakehouse_tacklebox_spark.sources import load_tables
    from lakehouse_tacklebox_spark.sources.readers import read_orc, write_orc
    from tests.conftest import SF_DIR

    nation = load_tables(spark, SF_DIR, ["nation"])["nation"]
    p = str(tmp_path / "nation_orc")
    write_orc(nation, p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
    filtered = back.filter(F.col("n_nationkey") >= 10).select("n_name")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_nationkey" in plan
    assert filtered.count() == nation.filter("n_nationkey >= 10").count()
