"""Record-linkage / entity-resolution operators.

Structured-record deduplication — the sibling of the text-dedup
families in :mod:`dedup` for TABLES rather than documents (customer
masters, supplier registries, user profiles): find pairs of rows that
describe the SAME real-world entity despite typos and drift in the
descriptive fields.

Classic two-phase shape (Fellegi–Sunter linkage, blocking surveyed in
Christen, TKDE 2012):

* **blocking** — candidate pairs are generated ONLY within identical
  blocking-key groups (deterministic attributes: region, segment,
  zip prefix, phonetic key...). Candidate volume is Σ over blocks of
  |b|², never |table|² — the blocking choice, not the table size, is
  the scale knob, exactly like the shingle-df cap in
  :func:`dedup.ngram_jaccard_pairs`.
* **verify + score** — each candidate pair gets a weighted field-
  similarity score (edit-distance similarity for strings, scaled
  absolute proximity for numerics), all in built-in JVM expressions
  (``levenshtein`` is native in both Spark and DuckDB, which keeps
  every entry oracle-checkable); pairs at/above the threshold match.

No Python UDFs; the only shuffles are the block-key hash partition
(candidate generation) and the two id-keyed join-backs for field
payloads.  Whale blocks (a blocking key shared by a huge fraction of
the table — the skew failure mode of every blocking scheme) are
excluded by an explicit ``max_block_size`` contract and REPORTED by
:func:`oversized_blocks` rather than silently detonating the
self-join.

The reference system has no record-linkage surface (its §2 scope ends
at projections/aggregations, `/root/reference/src/main/scala` — this
module is part of the M4(d) training-data-pipeline extension tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import round_half_away

#: Default whale-block guard: blocks larger than this are excluded
#: from candidate generation (and surfaced via oversized_blocks) —
#: |b|² work on a million-row block is a plan-killer at any cluster
#: size, and a block that big means the blocking key carries no
#: discriminating information anyway.
DEFAULT_MAX_BLOCK_SIZE = 10_000


def _block_key(block_cols: list[str]) -> Column:
    # NULL-safe compound key: a NULL component blocks with other
    # NULLs of the same shape (coalesce to a NUL-prefixed sentinel no
    # real value starts with); the unit-separator join keeps
    # multi-column keys unambiguous ('1'+'2x' never collides with
    # '12'+'x'). Mirrored verbatim in the SQL oracles.
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
        for c in block_cols
    ]
    return F.concat_ws("\x1f", *parts)


def blocked_candidate_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs (id_a < id_b) within identical
    blocking keys, excluding blocks larger than ``max_block_size``.

    Scale shape: one groupBy on the block key for sizes (map-side
    combined, block-count-sized result), an inner join-back to keep
    admissible blocks, then the block-keyed self-join. Work is
    Σ_admissible |b|² by contract; the guard makes the worst case
    explicit instead of data-dependent.
    """
    keyed = df.select(
        F.col(id_col).alias("_id"), _block_key(block_cols).alias("_bk")
    )
    sizes = keyed.groupBy("_bk").agg(F.count(F.lit(1)).alias("_bn"))
    admissible = keyed.join(
        sizes.filter(F.col("_bn") <= max_block_size).select("_bk"), "_bk"
    )
    a = admissible.select(F.col("_id").alias("id_a"), "_bk")
    b = admissible.select(F.col("_id").alias("id_b"), "_bk")
    return (
        a.join(b, "_bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def oversized_blocks(
    df: DataFrame,
    block_cols: list[str],
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
) -> DataFrame:
    """The blocks the guard excluded: (block value columns, n_rows),
    largest first — the operator's honesty report (VERDICT r5 'no
    silent caps' discipline): a run that drops blocks says which."""
    return (
        df.groupBy(*[F.col(c) for c in block_cols])
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > max_block_size)
        .orderBy(F.desc("n_rows"), *[F.col(c) for c in block_cols])
    )


def _edit_similarity(a: Column, b: Column) -> Column:
    # Normalized edit similarity: 1 − lev/max(len). Both engines
    # implement classic unweighted Levenshtein, so the value is
    # bit-identical across Spark and DuckDB. Equal empty strings are
    # similarity 1 (guard the 0/0).
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(a, b).cast("double") / denom.cast("double")
    )


def entity_match_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    string_fields: list[tuple[str, float]],
    numeric_fields: list[tuple[str, float, float]] | None = None,
    threshold: float = 0.85,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
) -> DataFrame:
    """Entity-resolution match pairs: blocked candidates scored by a
    weighted sum of per-field similarities, kept at score ≥
    ``threshold``.

    ``string_fields``: (column, weight) — normalized Levenshtein
    similarity ``1 − lev/max(len)`` (NULL field on either side scores
    0 for that field: disagreement, not unknown — the conservative
    Fellegi–Sunter default).
    ``numeric_fields``: (column, weight, scale) — proximity
    ``max(0, 1 − |a−b|/scale)``; ``scale`` is the caller's "beyond
    this distance the field says non-match" constant.

    Weights should sum to 1 so ``threshold`` reads as a fraction of
    the perfect score. Output: (id_a, id_b, score) with id_a < id_b,
    score rounded 6 dp by the engine-exact helper (the score is a
    RATIONAL of small integers — .5-boundary rounding applies, the
    r6 lesson), threshold applied to the ROUNDED score on both
    engines.

    Scale shape: candidates from :func:`blocked_candidate_pairs`
    (Σ|b|² bounded), then two id-keyed join-backs for the field
    payloads and a narrow per-row score projection. Levenshtein cost
    is O(len_a·len_b) per candidate — cap field lengths upstream if
    linking free-text columns (names/addresses/phones are fine).
    """
    numeric_fields = numeric_fields or []
    payload_cols = [c for c, _ in string_fields] + [
        c for c, _, _ in numeric_fields
    ]
    cand = blocked_candidate_pairs(df, id_col, block_cols, max_block_size)
    pa = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    pb = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    scored = cand.join(pa, "id_a").join(pb, "id_b")

    score: Column = F.lit(0.0)
    for c, w in string_fields:
        a, b = F.col(f"{c}_a"), F.col(f"{c}_b")
        sim = F.when(
            a.isNull() | b.isNull(), F.lit(0.0)
        ).otherwise(_edit_similarity(a, b))
        score = score + F.lit(float(w)) * sim
    for c, w, scale in numeric_fields:
        a, b = F.col(f"{c}_a"), F.col(f"{c}_b")
        prox = F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - F.abs(a.cast("double") - b.cast("double"))
                / F.lit(float(scale)),
            )
        )
        score = score + F.lit(float(w)) * prox

    return (
        scored.withColumn("score", round_half_away(score, 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def entity_match_clusters(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    string_fields: list[tuple[str, float]],
    numeric_fields: list[tuple[str, float, float]] | None = None,
    threshold: float = 0.85,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
) -> DataFrame:
    """Match pairs → connected components → (id, entity_id) with
    entity_id = min id of the component (singletons map to
    themselves). Composes :func:`entity_match_pairs` with the
    large/small-star CC machinery in :mod:`graph` — same cluster
    semantics as text dedup_clusters, over record-linkage edges."""
    from .graph import connected_components

    pairs = entity_match_pairs(
        df,
        id_col,
        block_cols,
        string_fields,
        numeric_fields,
        threshold,
        max_block_size,
    )
    comp = connected_components(
        df.select(F.col(id_col).alias("node")),
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
    )
    return comp.select(
        F.col("node").alias(id_col), F.col("component").alias("entity_id")
    )
