"""Iterative graph algorithms on DataFrames.

``connected_components`` — turns near-dup PAIRS into dedup CLUSTERS
(the step an LLM-corpus pipeline actually needs: pick one
representative per duplicate cluster, drop the rest). Two
interchangeable algorithms:

* ``label_prop`` (default) — min-label propagation: every node adopts
  the smallest label among itself and its neighbors until fixpoint.
  Iterations = O(component DIAMETER); near-dup clusters are shallow
  (a handful of hops), so convergence is fast and each round is one
  join + one aggregate.
* ``star`` — alternating large-star/small-star edge rewriting
  (Kiveris et al., "Connected Components in MapReduce and Beyond"):
  each round re-points edges at neighborhood minima, collapsing
  components into stars in O(log d) rounds — the right choice when a
  pathological CHAIN corpus (quotation chains, template lineages)
  would push label propagation past its iteration cap.

Both localCheckpoint per iteration — truncating the lineage so the
plan doesn't grow with rounds (the standard trap of iterative
DataFrame algorithms) — and both raise rather than silently returning
a partial clustering at the cap.
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
    algorithm: str = "label_prop",
    fallback_to_star: bool = True,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``nodes``: one column ``node_col``. ``edges``: undirected pairs
    (``src_col``, ``dst_col``). Returns (node, component) where
    component = min id in the node's connected component. Isolated
    nodes are their own component.

    ``algorithm``: ``label_prop`` (default — O(diameter) rounds, right
    for shallow near-dup clusters) or ``star`` (O(log d) rounds via
    alternating large-star/small-star — right for deep chains; see
    module docstring).

    If label propagation hits ``max_iterations`` without reaching the
    fixpoint (a component's diameter exceeds the cap — a template-
    lineage or quotation-chain corpus can legitimately produce 20+-hop
    chains), it does NOT return the partially-propagated labels (that
    would silently split long chains into separate clusters): with
    ``fallback_to_star`` (default) it discards the partial state and
    re-solves with the star algorithm, whose O(log diameter) rounds
    finish any chain the cap stopped; with ``fallback_to_star=False``
    it raises ``RuntimeError`` instead (for callers that treat
    non-convergence as a data-quality signal).
    """
    if algorithm == "star":
        return _connected_components_star(
            nodes, edges, node_col, src_col, dst_col, max_iterations
        )
    if algorithm != "label_prop":
        raise ValueError(
            f"unknown algorithm {algorithm!r}: use 'label_prop' or 'star'"
        )
    # Materialize the edge list ONCE (r12): `edges` is typically the
    # tail of an expensive pipeline (minhash_lsh_pairs behind
    # dedup_clusters), and every loop iteration below consumes `sym` —
    # without this checkpoint each iteration re-ran the candidate
    # self-join + est_j + exact-verify stages of that pipeline. The
    # pair list itself is duplicate-population-sized, so the
    # checkpoint is cheap. (The star variant already did this.)
    e0 = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    sym = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    # Iterate ONLY over edge-incident nodes (r12, VERDICT r11 item 5):
    # in a near-dup graph the overwhelming majority of nodes are
    # singletons with nothing to propagate, yet the loop used to carry
    # the CORPUS-sized label frame through every join + localCheckpoint
    # (~1.7 s of q_best_rep's 8.5 s at sf0.1; at web scale it would be
    # a per-iteration full-corpus materialization). The incident set is
    # ≤ 2·|edges| — the loop now scales with the DUPLICATE population,
    # not the corpus; singletons rejoin as their own component in one
    # final broadcast-shaped left join. Semi-join against `nodes` keeps
    # the old contract that only listed nodes are labeled or followed.
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    incident = sym.select(F.col("src").alias("node")).distinct()
    labels = all_nodes.join(incident, "node", "left_semi").select(
        "node", F.col("node").alias("component")
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
            # LAZY checkpoint (r16 optimization round): eager=True ran
            # one job to materialize the blocks and a SECOND job for
            # the convergence probe below — the probe itself is the
            # first action, so letting IT materialize the checkpoint
            # halves the per-iteration job count (the dominant cost of
            # the loop is fixed per-job overhead, not data). Blocks are
            # identical once materialized; lineage truncation is the
            # same.
            .localCheckpoint(eager=False)
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
        if fallback_to_star:
            import warnings

            warnings.warn(
                f"connected_components(label_prop) hit the "
                f"{max_iterations}-iteration cap with {changed} labels "
                "still changing (component diameter exceeds the cap) — "
                "re-solving with algorithm='star' (O(log diameter) "
                "rounds)",
                RuntimeWarning,
                stacklevel=2,
            )
            labels.unpersist()
            e0.unpersist()
            return _connected_components_star(
                nodes, edges, node_col, src_col, dst_col, max_iterations
            )
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing) — a component's "
            "diameter exceeds the cap; raise max_iterations (iterations "
            "needed = O(component diameter)), or use algorithm='star' "
            "(O(log diameter) rounds)"
        )
    # singletons (no incident edge) are their own component; `labels`
    # is duplicate-population-sized, so this join broadcasts
    e0.unpersist()
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def _star_half_round(pairs: DataFrame, large: bool) -> DataFrame:
    """One large-star (``large=True``) or small-star half-round over an
    undirected pair list. Per node u with m = min(N(u) ∪ {u}):

    * large-star re-points every strictly-LARGER neighbor at m —
      every edge {a,b}, a<b is re-emitted by its smaller endpoint, so
      connectivity is preserved;
    * small-star re-points every strictly-smaller neighbor AND u
      ITSELF at m (the paper's (N⁻(u) ∪ {u}) \\ {m} emission — without
      the self edge a leaf's only link would collapse to (m, m) and
      vanish); here every edge is re-emitted by its larger endpoint.

    One keyed shuffle for the neighborhood-min aggregate + one join —
    the same geometry as a label-prop round, but each round HALVES
    pointer-chain depth instead of walking one hop."""
    sym = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    joined = sym.join(mins, "src")
    if large:
        kept = joined.filter(F.col("dst") > F.col("src")).select(
            F.col("dst").alias("src"), F.col("m").alias("dst")
        )
    else:
        kept = joined.filter(F.col("dst") < F.col("src")).select(
            F.col("dst").alias("src"), F.col("m").alias("dst")
        ).union(
            mins.select(F.col("src"), F.col("m").alias("dst"))
        )
    return kept.filter(F.col("src") != F.col("dst")).distinct()


def _edge_checksum(pairs: DataFrame) -> tuple[int, int]:
    """Order-insensitive fingerprint of an edge set: (count, xor of a
    64-bit hash per pair). Cheap convergence probe — one aggregate over
    the just-checkpointed blocks instead of an exceptAll shuffle."""
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.struct("src", "dst"))), F.lit(0)
        ).alias("x"),
    ).first()
    return row["n"], row["x"]


def _connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src_col: str,
    dst_col: str,
    max_iterations: int,
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al.): converges in O(log d) full rounds, so a
    max_iterations that caps label_prop on a 1000-hop chain finishes
    here in ~10. Fixpoint = edge set unchanged across one full round
    (64-bit-checksum compare; collision probability ~2⁻⁶⁴)."""
    pairs = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    sig = _edge_checksum(pairs)
    converged = pairs.isEmpty()
    for _ in range(max_iterations):
        if converged:
            break
        prev = pairs
        pairs = _star_half_round(pairs, large=True).localCheckpoint()
        pairs.count()  # materialize before dropping the parent blocks
        prev.unpersist()
        prev = pairs
        pairs = _star_half_round(pairs, large=False).localCheckpoint()
        new_sig = _edge_checksum(pairs)
        prev.unpersist()
        if new_sig == sig:
            converged = True
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in "
            f"{max_iterations} rounds — raise max_iterations "
            "(rounds needed = O(log component diameter))"
        )
    # at fixpoint the edges form stars (v → component min); a node's
    # component is the min over its incident centers, itself if isolated
    sym = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    centers = sym.groupBy("src").agg(F.min("dst").alias("_cmin"))
    out = (
        nodes.select(F.col(node_col).alias("node"))
        .join(centers, F.col("node") == centers.src, "left")
        .select(
            "node",
            F.least(
                F.col("node"), F.coalesce(F.col("_cmin"), F.col("node"))
            ).alias("component"),
        )
    )
    return out


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Global triangle census over an undirected graph — one row
    (n_edges, n_wedges, n_triangles). Triangles are the unit of
    clustering-coefficient / community-density analysis over derived
    graphs (co-occurrence, near-dup adjacency, entity links).

    Scale design — degree orientation (the standard MapReduce
    triangle trick): counting by joining raw adjacency on shared
    endpoints explodes on hubs (a degree-d node contributes d²
    wedges). Instead every undirected edge is directed from its
    lower- to its higher-(degree, id) endpoint, which provably bounds
    every out-degree by O(√m); wedges are then built only from each
    node's OUT-neighbors (Σ C(outdeg, 2) ≤ O(m^1.5) total, no hub
    blow-up) with the (deg, id) order enforced between the two
    neighbors, and a wedge closes iff its (v, w) pair exists in the
    same oriented edge set — each triangle counted exactly once from
    its minimum-rank corner. All integer arithmetic end to end.

    Inputs may contain duplicates, self-loops, or either orientation;
    they are canonicalized (least/greatest + distinct) first.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        e.join(deg.withColumnsRenamed({"node": "a", "deg": "deg_a"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "deg_b"}), "b")
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
            "deg_hi"
        ),
    )
    left = oriented.withColumnsRenamed(
        {"hi": "v", "deg_hi": "deg_v"}
    )
    right = oriented.withColumnsRenamed(
        {"hi": "w", "deg_hi": "deg_w"}
    )
    wedges = left.join(right, "lo").filter(
        (F.col("deg_v") < F.col("deg_w"))
        | ((F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    n_edges = e.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_edges")
    )
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_wedges")
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_triangles")
    )
    return n_edges.crossJoin(F.broadcast(n_wedges)).crossJoin(
        F.broadcast(n_tri)
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list (callers
    symmetrize for undirected graphs): (node, rank) after exactly
    ``iterations`` power steps — the influence/centrality scoring a
    pipeline runs over derived graphs (citation/link/co-occurrence)
    to weight sources or pick cluster exemplars.

    Semantics: r ← (1−d)/n + d·(Σ_in r/outdeg + dangling_mass/n),
    uniform init 1/n, dangling (no-out-edge) mass redistributed
    uniformly every step so Σr stays 1. Fixed iteration count (not a
    convergence test) keeps the plan deterministic and re-runnable.

    Scale shape: each step is ONE shuffle (contributions grouped by
    dst) plus two broadcast-sized frames (the scalar dangling mass
    and the node→rank join is on the nodes table, |V| rows, not
    edges); ranks are localCheckpoint-ed per step so the plan doesn't
    grow with iterations (the standard iterative-DataFrame trap, same
    treatment as connected_components). Edge volume is touched
    ``iterations`` times — on a cluster, persist the (src, outdeg)-
    annotated edges once and reuse.

    Determinism: double arithmetic with per-dst sums; ranks are
    rounded to 6 dp only at the END. Reduction order can perturb the
    last ulps (~1e-15) — like the transcendental outputs, a 6-dp
    boundary flip has probability ~0 (oracle-checked in practice).
    """
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).distinct()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outdeg = e.groupBy(F.col("_src").alias("node")).agg(
        F.count(F.lit(1)).alias("_outdeg")
    )
    annotated = e.join(
        outdeg.withColumnsRenamed({"node": "_src"}), "_src"
    ).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        with_rank = annotated.join(
            ranks.withColumnsRenamed({"node": "_src"}), "_src"
        )
        contrib = with_rank.groupBy(
            F.col("_dst").alias("node")
        ).agg(F.sum(F.col("rank") / F.col("_outdeg")).alias("_in"))
        # dangling mass: rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(outdeg, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dm") / n
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
