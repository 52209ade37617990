"""Connected components: label propagation vs known graphs + the oracle."""

from __future__ import annotations

from oracle_check import compare

from lakehouse_tacklebox_spark.operators.cluster import cluster_survivors, connected_components

from conftest import SF_DIR


def _cc(spark, edges, vertices=None):
    e = spark.createDataFrame(edges, ["id_a", "id_b"])
    v = spark.createDataFrame([(x,) for x in vertices], ["id"]) if vertices else None
    got = connected_components(e, vertices=v).collect()
    return {r["id"]: r["component"] for r in got}


def test_cc_triangle_chain_singleton(spark):
    # triangle {1,2,3}, chain 10-11-12-13, singleton 99
    comp = _cc(
        spark,
        [(2, 1), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13)],
        vertices=[1, 2, 3, 10, 11, 12, 13, 99],
    )
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 99: 99}


def test_cc_long_path_converges(spark):
    # a 16-vertex path exercises multi-round propagation (diameter 15)
    edges = [(i, i + 1) for i in range(15)]
    comp = _cc(spark, edges)
    assert set(comp.values()) == {0}
    assert len(comp) == 16


def test_cc_bridge_merges_two_cliques(spark):
    edges = [(1, 2), (2, 3), (20, 21), (21, 22), (3, 20)]
    comp = _cc(spark, edges)
    assert set(comp.values()) == {1}


def test_cluster_survivors_keeps_min_and_unclustered(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 7]], ["doc_id", "text"])
    comps = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], ["doc_id", "component"])
    kept = sorted(r["doc_id"] for r in cluster_survivors(df, comps, "doc_id").collect())
    assert kept == [1, 7]


def test_dedup_cluster_assign_oracle(spark):
    from lakehouse_tacklebox_spark.queries import REGISTRY

    spec = REGISTRY["dedup_cluster_assign"]
    assert compare(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR) == []
