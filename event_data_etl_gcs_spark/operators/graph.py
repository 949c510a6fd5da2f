"""Iterative graph operators: connected components over candidate-pair
edges — the cluster step of every dedup pipeline (pairs -> groups ->
one representative per group).

Algorithm: label propagation to the minimum id. Each iteration joins the
current labels across the edge list and takes the per-node min of
neighbor labels; converges in O(diameter) iterations. Dedup-duplicate
components are near-cliques (diameter 1-2), so a handful of iterations
suffice; the loop stops early when an iteration changes nothing.

Scale notes: each iteration is one shuffle join on node id over the edge
list — the standard large-scale CC formulation (cf. "hash-to-min").
Labels are cached per iteration and the previous generation unpersisted;
convergence is checked with a cheap anti-join count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node
    id reachable. Deterministic."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().cache()

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    labels.count()

    changed = 0
    for _ in range(max_iterations):
        # candidate label per node = min(own, min over neighbors' labels)
        neighbor_labels = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(
                labels.alias("o"),
                (F.col("n.node") == F.col("o.node"))
                & (F.col("n.component") != F.col("o.component")),
            )
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # exiting on the iteration cap means some component's diameter
        # exceeds max_iterations and its labels are NOT converged — wrong
        # silently, and the reachability oracle would fail with no hint.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); raise "
            "max_iterations (long duplicate chains have large diameters)"
        )
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs -> (doc id, cluster representative = min id in the
    connected component)."""
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_rep")
    )
