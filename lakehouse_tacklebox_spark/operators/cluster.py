"""Connected components over near-dup pair edges: cluster assignment for
corpus deduplication.

After candidate generation + verification (MinHash-LSH / SimHash /
exact Jaccard) the pair set (id_a, id_b) must become CLUSTERS so one
canonical document survives per group (reference analogue: the merge
dedup keeps one row per key, Step 1:184-190; here the "key" is the
transitive near-dup closure).

The algorithm is hash-min label propagation (the standard MapReduce /
Pregel formulation of connected components): every vertex starts
labeled with its own id; each round every vertex takes the min label
among itself and its neighbors; converged when no label changes.

Scale notes (100 TB corpus):
- Each round is one shuffle of the edge list joined to the current
  labels — O(|E|) per round, no driver-side graph state. Labels and
  edges stay DataFrames throughout.
- Near-dup graphs have tiny diameter (clusters are quasi-cliques), so
  rounds-to-converge is ~2-4, not O(n). ``max_iter`` only backstops
  adversarial chains.
- ``localCheckpoint`` truncates lineage each round; without it the plan
  doubles per iteration and the optimizer chokes long before data does.
- Convergence is detected with a count() of changed labels — a scalar
  per round, the one acceptable driver-side action in an iterative job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) where component = min vertex id reachable.

    ``edges`` is an undirected pair list; ``vertices`` (optional) adds
    isolated vertices, which come back as their own singleton component.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # Materialize the edge list FIRST, then derive the vertex set from the
    # checkpointed edges: the upstream pair-generation pipeline (often an
    # expensive similarity join) runs exactly once, not once per consumer.
    sym = sym.localCheckpoint(eager=True)
    verts = sym.select("u").distinct()
    if vertices is not None:
        verts = verts.union(vertices.select(F.col(id_col).alias("u"))).distinct()
    labels = verts.select(F.col("u"), F.col("u").alias("label")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min over {own label} ∪ {neighbor labels}
        msgs = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.u"), "inner")
            .select(F.col("e.u").alias("u"), F.col("l.label").alias("label"))
        )
        propagated = labels.unionByName(msgs).groupBy("u").agg(F.min("label").alias("label"))
        # pointer jumping: also adopt the label's own label (path halving).
        # Quasi-clique near-dup graphs converge in ~2 rounds either way;
        # this turns adversarial chain-shaped graphs from O(diameter)
        # rounds into O(log diameter) for one extra self-join per round.
        new_labels = (
            propagated.alias("x")
            .join(propagated.alias("y"), F.col("x.label") == F.col("y.u"), "left")
            .select(
                F.col("x.u").alias("u"),
                F.least(F.col("x.label"), F.col("y.label")).alias("label"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.u") == F.col("o.u"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("component"))


def cluster_survivors(
    df: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Keep one canonical row per component: the min-id member (which is
    exactly the component label), plus every unclustered row."""
    comp = components.withColumnRenamed("id", id_col) if "id" in components.columns else components
    joined = df.join(comp, id_col, "left")
    return joined.filter(
        F.col("component").isNull() | (F.col("component") == F.col(id_col))
    ).drop("component")
