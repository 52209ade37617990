"""Connected components via alternating min-label propagation — the
transitive-closure step a dedup pipeline runs after LSH candidate
generation (near-dup PAIRS become dup CLUSTERS), and the third member
of the fixed-iteration graph family (with PageRank and BFS in
queries/graph.py).

Spark-first shape: labels start at the node id; each iteration every
node takes the min of its own label and its neighbors' labels — one
aggregate-messages shuffle (edges ⋈ labels grouped on dst) per
iteration, checkpointed so the plan stays k-shallow. Min-label is
CANONICAL (the fixed point labels every node with its component's
smallest node id), which is what makes the incremental merge below
equal a from-scratch recompute once both converge.

At 100 TB: edges hash-partition on src, labels on node, each iteration
is one shuffle bounded by |E|, min() combines map-side, and there is
no driver-side state but the loop counter. Components with diameter
<= k are exact after k iterations; dup clusters (near-cliques by
construction) converge in 2-3. For power-law web-scale graphs the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond") halves label-path lengths per round; plain
min-propagation with a fixed k is the right trade here because the
gate needs a replayable program, and k is certified by a converged
flag rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def symmetric_edges(pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b") -> DataFrame:
    """Undirected pair list -> symmetric (src, dst) edge frame."""
    fwd = pairs.select(
        F.col(a_col).cast("bigint").alias("src"), F.col(b_col).cast("bigint").alias("dst")
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def cc_label_trace(edges: DataFrame, iters: int) -> list[DataFrame]:
    """Min-label propagation over a SYMMETRIC (src, dst) edge frame.

    Returns ``iters + 1`` label frames (node, label): element 0 is the
    identity labelling over the edge frame's node set, element k the
    labels after k propagation steps. Every frame is eagerly
    checkpointed — k iterations build k independent one-shuffle plans,
    never one 2^k-deep plan. Iteration joins carry .hint("merge"): a
    label table is not broadcastable at scale, and under the gate's
    concurrent drive several entries' AQE broadcasts together exhaust
    the vanilla driver heap (same rationale as the PageRank loop,
    queries/graph.py:126).
    """
    nodes = edges.select(F.col("src").alias("node")).distinct()
    lab = nodes.withColumn("label", F.col("node").cast("bigint")).localCheckpoint(eager=True)
    out = [lab]
    for _ in range(iters):
        msgs = edges.join(
            lab.withColumnRenamed("node", "src").hint("merge"), "src"
        ).select(F.col("dst").alias("node"), "label")
        lab = (
            lab.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").cast("bigint").alias("label"))
            .localCheckpoint(eager=True)
        )
        out.append(lab)
    return out


def cc_min_label(edges: DataFrame, iters: int) -> DataFrame:
    """Final (node, label) after ``iters`` min-label propagation steps."""
    return cc_label_trace(edges, iters)[-1]


def merge_labels_incremental(
    base_labels: DataFrame, new_pairs: DataFrame, iters: int
) -> DataFrame:
    """Fold a batch of NEW pairs into an existing component labelling
    without re-running CC on the base graph.

    The classic contraction step: relabel each new edge's endpoints
    with their base component label (nodes unknown to the store keep
    their own id), build the LABEL GRAPH from the relabelled edges,
    run min-label CC on THAT — it has one node per touched component,
    not per document, so a batch prices at batch-size — and compose
    the root map back over the store. Because min-label is canonical,
    the merged labelling equals a from-scratch recompute over
    base + batch once both converge (certified by the caller's
    matches_full flag, never assumed).

    ``base_labels``: (node, label) at the base fixed point.
    ``new_pairs``: (id_a, id_b) undirected new edges.
    Returns (node, label) covering base nodes plus new-edge endpoints.
    """
    bl = base_labels.select("node", F.col("label").cast("bigint").alias("label"))
    ends = symmetric_edges(new_pairs)  # both orientations = both endpoints relabelled
    relab = (
        ends.join(bl.withColumnRenamed("node", "src").withColumnRenamed("label", "la"), "src", "left")
        .join(bl.withColumnRenamed("node", "dst").withColumnRenamed("label", "lb"), "dst", "left")
        .select(
            F.coalesce("la", F.col("src").cast("bigint")).alias("src"),
            F.coalesce("lb", F.col("dst").cast("bigint")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    roots = cc_min_label(relab, iters).withColumnRenamed("node", "old_label").withColumnRenamed(
        "label", "root"
    )
    # New-edge endpoints enter the store with their (possibly fresh)
    # pre-merge label so singleton-until-now nodes get component rows.
    touched = (
        ends.select(F.col("src").alias("node"))
        .distinct()
        .join(bl, "node", "left")
        .select("node", F.coalesce("label", F.col("node").cast("bigint")).alias("label"))
    )
    merged_nodes = bl.unionByName(touched).groupBy("node").agg(F.min("label").alias("label"))
    return (
        merged_nodes.join(roots, merged_nodes["label"] == roots["old_label"], "left")
        .select("node", F.coalesce("root", "label").cast("bigint").alias("label"))
    )
