"""Profiler, query analyzer, optimizer strategy: value-level checks."""

import pytest
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.plans import optimizer as OPT
from lakehouse_tacklebox_spark.plans import profiler as PR
from lakehouse_tacklebox_spark.plans import query_analyzer as QA
from lakehouse_tacklebox_spark.queries.plans_battery import QUERY_LOG_FIXTURE
from lakehouse_tacklebox_spark.sources import load_tables
from lakehouse_tacklebox_spark.tablestore.transactions import TackleCatalog

SF_DIR = "/root/testdata/sf0.001"


def test_profile_exact_matches_direct_aggregates(spark):
    cust = load_tables(spark, SF_DIR, ["customer"])["customer"]
    prof = {r.column: r for r in PR.profile(cust, exact=True).collect()}
    assert prof["c_custkey"].n_rows == cust.count()
    assert prof["c_custkey"].n_distinct == cust.select("c_custkey").distinct().count()
    assert prof["c_acctbal"].n_nulls == cust.filter(F.col("c_acctbal").isNull()).count()
    mn, mx = cust.agg(F.min("c_mktsegment"), F.max("c_mktsegment")).collect()[0]
    assert (prof["c_mktsegment"].min_value, prof["c_mktsegment"].max_value) == (mn, mx)


def test_profile_is_single_job(spark):
    cust = load_tables(spark, SF_DIR, ["customer"])["customer"]
    plan = PR.profile(cust)._jdf.queryExecution().executedPlan().toString()
    # one scan: the unpivot must not re-read the table per column
    assert plan.count("Scan parquet") == 1


def test_query_analyzer_extractions():
    sql = (
        "SELECT c_mktsegment, count(*) FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "WHERE c_acctbal > 100 AND o_orderdate >= DATE '1995-01-01' "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )
    p = QA.extract_query_profile(sql)
    assert p["tables"] == ["customer", "orders"]
    assert set(p["filter_columns"]) == {"c_acctbal", "o_orderdate"}
    assert set(p["join_columns"]) == {"c_custkey", "o_custkey"}
    assert p["group_columns"] == ["c_mktsegment"]


def test_parse_query_log_counts(spark):
    log = spark.createDataFrame(QUERY_LOG_FIXTURE, "query_text string, duration_s double")
    stats = {(r.TableName, r.ColumnName): r for r in OPT.parse_query_log(log).collect()}
    # c_acctbal is filtered in fixtures 1, 4 and grouped via avg in 5 (agg, not GROUP BY)
    r = stats[("customer", "c_acctbal")]
    assert r.FilterCount == 2
    # c_custkey joins customer<->orders in fixtures 2 and 6
    assert stats[("customer", "c_custkey")].JoinCount == 2
    assert stats[("orders", "o_custkey")].JoinCount >= 2


def test_strategy_ranks_and_applies(spark, tmp_path):
    log = spark.createDataFrame(QUERY_LOG_FIXTURE, "query_text string, duration_s double")
    scored = OPT.scale_and_score(OPT.parse_query_log(log))
    tables = load_tables(spark, SF_DIR, ["customer", "orders"])
    schemas = {name: df.columns for name, df in tables.items()}
    strategies = OPT.build_strategy(scored, schemas, table_size_gb={"customer": 4.0, "orders": 300.0})
    by_name = {s.table: s for s in strategies}
    # schema filter dropped misattributed columns
    assert all(c in schemas["customer"] for c in by_name["customer"].zorder_by)
    assert len(by_name["customer"].zorder_by) <= 2
    # file-size ladder: 4 GB -> 16 MB files, 300 GB -> 256 MB files
    assert by_name["customer"].target_file_bytes == 16 << 20
    assert by_name["orders"].target_file_bytes == 256 << 20
    assert by_name["customer"].analyze and not by_name["orders"].analyze

    # apply to a real catalog: optimize commits a clustered version
    cat = TackleCatalog(spark, str(tmp_path / "cat"))
    cat.create("customer", tables["customer"])
    versions = OPT.run_strategy(cat, [by_name["customer"]])
    assert versions["customer"] >= 1
    hist = cat.tables["customer"].history()
    assert hist[0]["operation"] == "OPTIMIZE"
    assert hist[0]["operationParameters"]["zorderBy"] == by_name["customer"].zorder_by
    # clustering preserved content
    assert cat.tables["customer"].read().count() == tables["customer"].count()


def test_recommend_end_to_end_blends_write_patterns(spark, tmp_path):
    """Full profile→score→strategy chain, including write-predicate
    mining from the table's own commit history."""
    tables = load_tables(spark, SF_DIR, ["customer", "orders"])
    cat = TackleCatalog(spark, str(tmp_path / "cat3"))
    t_orders = cat.create("orders", tables["orders"])
    cat.create("customer", tables["customer"])
    # generate write history: repeated merges keyed on o_orderkey
    upd = tables["orders"].limit(100)
    t_orders.merge(upd, on=["o_orderkey"]).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    t_orders.delete("o_orderkey = -1")

    log = spark.createDataFrame(QUERY_LOG_FIXTURE, "query_text string, duration_s double")
    strategies = {s.table: s for s in OPT.recommend(cat, log, sample_size=5_000)}
    assert set(strategies) == {"customer", "orders"}
    assert strategies["orders"].zorder_by  # non-empty cluster set
    # write-pattern mining saw the merge/delete keys
    wc = OPT.write_pattern_stats(t_orders.history())
    assert wc.get("o_orderkey", 0) >= 1
    # applying the recommendation commits OPTIMIZE versions
    versions = OPT.run_strategy(cat, list(strategies.values()))
    assert set(versions) == {"customer", "orders"}


def test_zorder_clustering_tightens_file_envelopes(spark, tmp_path):
    """Range-clustered files must have non-overlapping key ranges, the
    property that makes parquet row-group skipping effective."""
    orders = load_tables(spark, SF_DIR, ["orders"])["orders"]
    cat = TackleCatalog(spark, str(tmp_path / "cat2"))
    t = cat.create("orders", orders.repartition(8))
    t.optimize(target_file_rows=400, zorder_by=["o_custkey"])
    df = t.read().select("o_custkey", F.input_file_name().alias("f"))
    spans = df.groupBy("f").agg(F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi")).collect()
    spans = sorted([(r.lo, r.hi) for r in spans])
    assert len(spans) > 1
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if a[1] > b[0])
    assert overlaps == 0
