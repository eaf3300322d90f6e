"""Partition-invariance determinism gate (r15).

The r14 float64-phash corruption was PARTITIONING-DEPENDENT: it only
fired when a corrupt payload shared an Arrow batch with clean rows,
so 192 oracles over fixed parquet layouts never saw it — the fused
streaming equivalence test did, by accident of its micro-batch
split. This gate makes that discovery systematic: every listed query
must produce a BIT-IDENTICAL (order-insensitive) result when the
input tables are adversarially round-robin-repartitioned
(``SPARK_GRAFT_INPUT_PARTITIONS``, sources/batch.py:load_table) into
partition counts unrelated to the file layout — 1 (everything
co-batched, the r14 trigger shape) and 7 (scatter + odd width).

At 100 TB partitioning is an execution detail the optimizer is free
to change (AQE coalescing, split sizing, skew handling); any result
that depends on it is a latent wrong-answer bug. Checksum =
(count, xor of row hashes) — the same order-insensitive force the
bench harness uses.

Exclusions (documented, contract-level): queries whose registry entry
FITS a model or builds a persisted artifact as a side effect are
covered by their own oracle checks; none of the curated list below
does. Approximate-sketch queries (HLL, CMS, GK) ARE included — their
merge operators are commutative by construction, and the driver gate
already hash-pins them on a fixed layout; this gate proves the
stronger claim that the sketch results don't secretly lean on that
layout.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.caching import (
    release_cached,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import QUERIES

# one representative per operator family: hash agg, exact/approx
# percentiles, window frames, global index, exact+fuzzy dedup, LSH,
# SimHash, graph election, ANN, quantization, sketches, TPC-H joins,
# media decode chain, BPE, sessionization, skew rewrites
GATED = [
    "q_count_by_key",
    "q_amount_stats",
    "q_percentiles",
    "q_percentiles_approx",
    "q_median_exact",
    "q_window_frames",
    "q_topn_per_group",
    "q_global_index",
    "q_dedup_exact",
    "q_line_dedup",
    "q_minhash_lsh",
    "q_simhash",
    "q_prefix_jaccard",
    "q_best_rep",
    "q_cosine_topk",
    "q_embed_quantize",
    "q_hll_groups",
    "q_theta_overlap",
    # r16: the capped-KMV build runs a per-PARTITION bounded-heap
    # partial (mapInPandas) — the exact class this gate exists for:
    # the partial's output depends on layout, the final top-k must not
    "q_theta_capped",
    "q_theta_state_overlap",
    "q_cms_heavy",
    "q_state_quantiles",
    "q_tpch_q1",
    "q_tpch_q18",
    "q_media_phash",
    "q_media_neardup",
    "q_media_prep",
    "q_bpe_encode",
    "q_sessionize",
    "q_agg_state",
    "q_skew_running",
]


def _checksum(df) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("checksum"),
    ).collect()[0]
    return row["n"], row["checksum"]


def test_gated_queries_are_partition_invariant(spark, sf_dir, monkeypatch):
    by_name = {s.name: s for s in QUERIES}
    missing = [n for n in GATED if n not in by_name]
    assert not missing, f"gate list drifted from registry: {missing}"

    baselines: dict[str, tuple[int, int]] = {}
    monkeypatch.delenv("SPARK_GRAFT_INPUT_PARTITIONS", raising=False)
    for name in GATED:
        baselines[name] = _checksum(by_name[name].fn(spark, sf_dir))
        release_cached()

    divergent: list[str] = []
    for n_parts in ("1", "7"):
        monkeypatch.setenv("SPARK_GRAFT_INPUT_PARTITIONS", n_parts)
        for name in GATED:
            got = _checksum(by_name[name].fn(spark, sf_dir))
            release_cached()
            if got != baselines[name]:
                divergent.append(
                    f"{name}@{n_parts}: {got} != {baselines[name]}"
                )
    assert not divergent, (
        "partitioning-dependent results (each is a latent wrong-answer "
        "bug at scale):\n" + "\n".join(divergent)
    )


def test_input_partitions_knob_shapes_the_scan(spark, sf_dir, monkeypatch):
    """The lever itself: N partitions after load, unset = scan splits."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_table,
    )

    monkeypatch.setenv("SPARK_GRAFT_INPUT_PARTITIONS", "7")
    assert load_table(spark, sf_dir, "orders").rdd.getNumPartitions() == 7
    monkeypatch.delenv("SPARK_GRAFT_INPUT_PARTITIONS")
    df = load_table(spark, sf_dir, "orders")
    assert df.rdd.getNumPartitions() >= 1
