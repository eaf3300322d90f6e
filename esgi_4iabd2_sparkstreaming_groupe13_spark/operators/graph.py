"""Iterative graph algorithms on DataFrames.

``connected_components`` — min-label propagation — turns near-dup
PAIRS into dedup CLUSTERS (the step an LLM-corpus pipeline actually
needs: pick one representative per duplicate cluster, drop the rest).

Implementation is the classic alternating label-propagation loop:
every node adopts the smallest label among itself and its neighbors
until fixpoint. Iterations = O(component diameter); near-dup clusters
are shallow (a handful of hops), so convergence is fast. Each
iteration localCheckpoints the label frame — truncating the lineage
so the plan doesn't grow with iterations (the standard trap of
iterative DataFrame algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``nodes``: one column ``node_col``. ``edges``: undirected pairs
    (``src_col``, ``dst_col``). Returns (node, component) where
    component = min id in the node's connected component. Isolated
    nodes are their own component.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))

    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
            .withColumnRenamed("src", "node_n")
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.node_n, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
