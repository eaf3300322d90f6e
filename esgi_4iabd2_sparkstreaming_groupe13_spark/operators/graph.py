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

    Raises ``RuntimeError`` if the loop hits ``max_iterations`` without
    reaching the fixpoint — silently returning partially-propagated
    labels would split long near-dup chains into separate clusters.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))

    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint()

    changed = 1
    for _ in range(max_iterations):
        prev = labels
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
            .withColumnRenamed("src", "node_n")
        )
        # the old label is in scope inside the join, so the per-node
        # "did it shrink" flag rides along in the same pass — no
        # separate old-vs-new join; the convergence probe is then one
        # cheap agg over the just-materialized checkpoint blocks
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.node_n, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nmin"), F.col("component")) < F.col("component"))
                .cast("long")
                .alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.agg(F.sum("_chg")).first()[0] or 0
        labels = new_labels.drop("_chg")
        # The agg above materialized new_labels' checkpoint, so the
        # previous iteration's blocks are no longer reachable from any
        # live lineage — drop them now instead of waiting for the
        # ContextCleaner. Without this, a 20-iteration run pins 20
        # copies of the label frame in executor storage. The FINAL
        # frame stays cached for the caller (unpersisting a
        # localCheckpoint is destructive — lineage is truncated, so
        # the data could never be recomputed); it is released by GC
        # once the caller drops the reference.
        prev.unpersist()
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing) — a component's "
            "diameter exceeds the cap; raise max_iterations (iterations "
            "needed = O(component diameter))"
        )
    return labels
