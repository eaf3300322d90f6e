"""Similarity search over embedding columns (M4(e); cf. PAPERS.md —
top-k similarity EDBT'20, REPOSE ICDE'21).

Two tiers:

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the full corpus; per-partition ranking via a
  partitioned window (WindowGroupLimit — per-group heap, no global
  sort). The corpus side streams; nothing quadratic materializes.
* ``ivf_topk`` — the scale path: IVF-style coarse quantization. A
  deterministic centroid subset partitions the corpus into cells
  (one broadcast argmin pass); queries probe only the ``nprobe``
  nearest cells. Search cost drops from O(N) to O(N·nprobe/cells)
  per query at the price of recall — the standard ANN trade.

All arithmetic is double-precision, element-order sequential, so
results are bit-reproducible (and oracle-comparable for the exact
tier). No UDFs: ``zip_with``/``aggregate`` higher-order functions
keep the math JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential element order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: each query vector vs the whole corpus.

    The query side is a handful of rows → broadcast; the corpus never
    shuffles until the final per-query top-k window (k rows per query
    survive the partial rank thanks to WindowGroupLimit pushdown).
    Self-matches excluded; ties broken by neighbor id for determinism.
    """
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        embeddings.alias("c")
        .crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_threshold_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_ids: int | None = None,
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ threshold.

    Exact form is O(N²) — only for modest N or as LSH verification;
    ``max_ids`` restricts the corpus for bounded use. The scale path
    is bucketing by random-hyperplane signs (SimHash-for-vectors)
    before pairing — see ``ivf_topk``'s assignment machinery.
    """
    src = embeddings
    if max_ids is not None:
        src = src.filter(F.col(id_col) < max_ids)
    a = src.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = src.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroid_stride: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse assignment with deterministic centroids (every
    ``stride``-th vector — reproducible without a k-means fit; swap in
    trained centroids at deployment). Returns (centroids, assigned)."""
    centroids = embeddings.filter(
        F.col(id_col) % centroid_stride == 0
    ).select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec"))

    scored = (
        embeddings.crossJoin(F.broadcast(centroids))
        .select(
            F.col(id_col),
            F.col(vec_col),
            "cell_id",
            cosine_expr(F.col(vec_col), F.col("cvec")).alias("csim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cell_id"))
    assigned = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(id_col, vec_col, "cell_id")
    )
    return centroids, assigned


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    centroid_stride: int = 50,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the ``nprobe`` best cells per query, exact
    cosine rank within the probed subset. Approximate (rows-only
    correctness check); the exact tier is the oracle baseline."""
    centroids, assigned = ivf_assign(embeddings, centroid_stride, id_col, vec_col)
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    qcells = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "qvec", "cell_id",
            cosine_expr(F.col("qvec"), F.col("cvec")).alias("csim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cell_id"))
    probes = (
        qcells.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qvec", "cell_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
