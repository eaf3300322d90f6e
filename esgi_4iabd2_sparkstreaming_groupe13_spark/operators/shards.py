"""Tokenizer-shard export — the last-mile packaging stage between a
prepared corpus and a trainer.

A training job does not consume a DataFrame: it consumes SHARD FILES —
fixed-token-budget units a data loader can open independently, shuffle
at the shard level, checkpoint against ("resumed at shard 1371"), and
verify before burning accelerator time on them. This module turns
:func:`~..operators.corpus.pack_sequences` output into that layout:

* :func:`assign_token_shards` — pure, oracle-checkable assignment:
  packing bins are rolled into shards by the same next-fit running-sum
  arithmetic that built the bins (a bin NEVER splits across shards, so
  a sequence never splits across files; a shard overshoots its budget
  by at most one bin, exactly like a bin overshoots by at most one
  document). Everything is a deterministic function of document ids —
  two runs, two engines, two cluster layouts produce byte-identical
  assignments.
* :func:`export_token_shards` — the physical write: range-partition by
  shard id (files = contiguous shard segments, the same two-step as
  ``zorder_write``), ``partitionBy`` into one directory per shard, and
  publish with the stage → audit-staged-bytes → manifest-as-commit-
  marker → swap protocol shared with :mod:`.publish` (readers see the
  previous export or the complete new one, never a partial tree). The
  ``_MANIFEST.json`` records per-shard token counts, row counts,
  order-insensitive id/content checksums, and file byte sizes.
* :func:`verify_shards` — the trainer-side admission gate: recompute
  every per-shard stat from the published bytes and diff.

Scale shape: one hash aggregate over doc-level rows (bin totals,
map-side combined), a running sum over BINS (≈ total_tokens / 4096
rows — handled by the scale-safe two-pass prefix machinery, never a
single-partition window), one shuffle join of the doc-level frame on
``bin_id``, and one range exchange for the write. No collect touches
doc-level data; the manifest aggregate is |shards|-sized.

The reference has no training-export stage (its sinks are NDJSON
micro-batch files, ``StreamProcessor.scala:131-138``); this is part of
the mandated beyond-parity LLM-pipeline surface.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import pack_sequences
from .maintenance import _swap_suffix
from .publish import MANIFEST_NAME, commit_stage, heal_publish
from .windows import global_running_sum

#: Default shard budget: 4 packing bins of 4096 tokens. Production
#: exports use ~10⁸ (a few hundred MB of uint16 tokens per shard); the
#: arithmetic is budget-independent.
DEFAULT_TOKENS_PER_SHARD = 16_384


def assign_token_shards(
    packed: DataFrame,
    tokens_per_shard: int = DEFAULT_TOKENS_PER_SHARD,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bin_col: str = "bin_id",
) -> DataFrame:
    """Roll packing bins into shards: (id, n_tokens, bin_id, shard_id)
    with ``shard_id = floor(bin_start_offset / tokens_per_shard)``,
    where ``bin_start_offset`` is the running token total of all bins
    BEFORE this one in ``bin_id`` order.

    Next-fit at bin granularity: bins stay whole (a packed sequence
    never splits across shard files), shard ids are dense and ordered,
    and a shard's token total exceeds ``tokens_per_shard`` by less
    than one bin — the same deterministic overshoot contract as
    :func:`~.corpus.pack_sequences` itself.

    One doc-level shuffle total (the join back on ``bin_id``); the
    running sum runs over the bins frame, ~budget× smaller than docs.
    """
    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be positive")
    bins = packed.groupBy(bin_col).agg(
        F.sum(tokens_col).alias("_bin_tokens")
    )
    cum = global_running_sum(bins, [bin_col], "_bin_tokens", sum_col="_cum")
    shard_of_bin = cum.select(
        bin_col,
        F.floor(
            (F.col("_cum") - F.col("_bin_tokens")) / tokens_per_shard
        )
        .cast("long")
        .alias("shard_id"),
    )
    return packed.join(shard_of_bin, bin_col).select(
        F.col(id_col), F.col(tokens_col), F.col(bin_col), F.col("shard_id")
    )


def shard_summary(assigned: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-shard rollup of an assignment — (shard_id, n_docs, n_bins,
    n_tokens, id_checksum): the logical half of the manifest, usable as
    a pre-export audit without writing anything. The checksum is an
    order-insensitive xor fold of xxhash64 over ids, so any engine that
    agrees on membership agrees on the value."""
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.sum("n_tokens").alias("n_tokens"),
        F.bit_xor(F.xxhash64(F.col(id_col))).alias("id_checksum"),
    )


def export_token_shards(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int = 4096,
    tokens_per_shard: int = DEFAULT_TOKENS_PER_SHARD,
    split: str | None = None,
) -> dict:
    """Pack ``docs``, assign shards, and publish one directory per
    shard (``shard_id=K/``) under ``path`` atomically; returns the
    manifest. ``split`` is a label recorded in the manifest (a trainer
    exports each split — train/val/test — to its own path; leakage-safe
    split ASSIGNMENT is :func:`~.corpus.assign_splits`' job upstream).

    Write layout: range-partition on (shard_id, bin_id, id) with one
    target partition per shard, sort within partitions, then
    ``partitionBy(shard_id)`` — each shard directory receives one
    contiguous, internally-ordered file per writing task (≈1 per
    shard), so a loader streams a shard sequentially.

    Publish protocol (shared with :mod:`.publish`): stage-dir write →
    per-shard audit of the STAGED BYTES → ``_MANIFEST.json`` written
    last as the commit marker → swap rename. ``heal_publish`` recovers
    a crash at any point.
    """
    from .windows import refuse_unpinned

    refuse_unpinned("export_token_shards")
    spark = docs.sparkSession
    packed = pack_sequences(docs, text_col, id_col, budget_tokens)
    # persisted across the two actions below (the n_shards aggregate
    # and the staged write): without it the whole corpus-level pack →
    # bin-agg → assignment chain runs TWICE, roughly doubling the most
    # expensive stage of the export
    assigned = assign_token_shards(
        packed, tokens_per_shard, id_col=id_col
    ).persist()
    try:
        payload = docs.select(id_col, text_col).join(assigned, id_col)

        n_shards_row = assigned.agg(
            F.coalesce(F.max("shard_id") + 1, F.lit(0)).alias("n")
        ).first()
        n_shards = int(n_shards_row["n"])

        target = Path(path)
        heal_publish(str(target))
        stage = target.with_name(f"{target.name}__stage_{_swap_suffix()}")
        writer = payload
        if n_shards > 0:
            writer = payload.repartitionByRange(
                n_shards, "shard_id", "bin_id", id_col
            ).sortWithinPartitions("shard_id", "bin_id", id_col)
        (
            writer.write.mode("errorifexists")
            .partitionBy("shard_id")
            .parquet(str(stage))
        )
    finally:
        assigned.unpersist()

    manifest = _audit_shards(spark, str(stage), text_col, id_col)
    manifest.update(
        {
            "format": "parquet",
            "budget_tokens": budget_tokens,
            "tokens_per_shard": tokens_per_shard,
            "split": split,
            # the columns the content checksums were computed over —
            # verify_shards reads these instead of guessing positionally
            "id_col": id_col,
            "text_col": text_col,
        }
    )
    # manifest-as-commit-marker write + two-rename swap, shared with
    # publish_dataset (one protocol, one implementation)
    commit_stage(stage, target, manifest)
    return manifest


def _audit_shards(
    spark: SparkSession, path: str, text_col: str, id_col: str
) -> dict:
    """Per-shard stats recomputed from published/staged BYTES (not the
    logical plan — the manifest must describe what a loader will read):
    one |shards|-sized aggregate pass + a filesystem listing."""
    # an empty export writes no parquet files at all (partitionBy emits
    # no directories), which a bare read can't infer a schema from
    if not any(Path(path).rglob("*.parquet")):
        return {
            "n_shards": 0,
            "row_count": 0,
            "total_tokens": 0,
            "shards": {},
        }
    live = spark.read.parquet(path)
    rows = (
        live.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("bin_id").alias("n_bins"),
            F.sum("n_tokens").alias("n_tokens"),
            F.bit_xor(F.xxhash64(F.col(id_col))).alias("id_checksum"),
            F.bit_xor(
                F.xxhash64(F.struct(F.col(id_col), F.col(text_col)))
            ).alias("content_checksum"),
        )
        .collect()
    )
    shards = {}
    root = Path(path)
    for r in rows:
        sdir = root / f"shard_id={r['shard_id']}"
        files = {
            p.name: p.stat().st_size
            for p in sorted(sdir.glob("*.parquet"))
        }
        shards[str(r["shard_id"])] = {
            "n_docs": r["n_docs"],
            "n_bins": r["n_bins"],
            "n_tokens": r["n_tokens"],
            "id_checksum": r["id_checksum"],
            "content_checksum": r["content_checksum"],
            "files": files,
        }
    return {
        "n_shards": len(shards),
        "row_count": sum(s["n_docs"] for s in shards.values()),
        "total_tokens": sum(s["n_tokens"] for s in shards.values()),
        "shards": shards,
    }


def verify_shards(spark: SparkSession, path: str) -> dict:
    """Trainer-side admission gate: recompute every per-shard stat and
    file size from the published tree and diff against the manifest.
    Returns per-check booleans, the list of mismatching shard ids, and
    an overall ``ok``."""
    with open(Path(path) / MANIFEST_NAME) as fh:
        manifest = json.load(fh)
    column_guess = None
    if "id_col" in manifest and "text_col" in manifest:
        # the manifest records which columns its content checksums
        # were computed over — never guess
        orderings = [(manifest["id_col"], manifest["text_col"])]
    elif any(Path(path).rglob("*.parquet")):
        # legacy manifest without column names: recover the two data
        # columns positionally. The writer's column ORDER is not
        # recorded either, so try BOTH orderings (ADVICE r10 — a wrong
        # positional guess used to surface as opaque per-shard
        # checksum mismatches); still refuse outright when the payload
        # shape makes even the column PAIR ambiguous.
        live = spark.read.parquet(path)
        data_cols = [
            c
            for c in live.columns
            if c not in ("n_tokens", "bin_id", "shard_id")
        ]
        if len(data_cols) != 2:
            return {
                "ok": False,
                "error": (
                    "legacy manifest lacks id_col/text_col and the "
                    f"payload has {len(data_cols)} data columns "
                    f"({data_cols}) — cannot attribute checksums"
                ),
                "mismatched_shards": [],
            }
        orderings = [
            (data_cols[0], data_cols[1]),
            (data_cols[1], data_cols[0]),
        ]
    else:
        orderings = [("_none", "_none")]

    attempts: list[tuple[dict, dict | None]] = []
    checks: dict = {}
    for id_col, text_col in orderings:
        fresh = _audit_shards(spark, path, text_col, id_col)
        bad = sorted(
            k
            for k in set(fresh["shards"]) | set(manifest["shards"])
            if fresh["shards"].get(k) != manifest["shards"].get(k)
        )
        checks = {
            "n_shards_match": fresh["n_shards"] == manifest["n_shards"],
            "row_count_match": fresh["row_count"] == manifest["row_count"],
            "total_tokens_match": fresh["total_tokens"]
            == manifest["total_tokens"],
            "shards_match": not bad,
            "mismatched_shards": bad,
        }
        checks["ok"] = all(
            v for k, v in checks.items() if k != "mismatched_shards"
        )
        guess = (
            {"id_col": id_col, "text_col": text_col, "positional": True}
            if len(orderings) > 1
            else None
        )
        attempts.append((checks, guess))
        if checks["ok"]:
            column_guess = guess
            break
    else:
        # No ordering passed. Report the ordering with the FEWEST
        # mismatched shards (ADVICE r11: previously the report
        # reflected whichever guess ran LAST, so a wrong positional
        # guess could masquerade as wholesale corruption) and disclose
        # every attempt so the reader sees the alternative was tried.
        checks, column_guess = min(
            attempts, key=lambda a: len(a[0]["mismatched_shards"])
        )
        if len(attempts) > 1:
            checks["orderings_tried"] = [
                {**g, "n_mismatched": len(c["mismatched_shards"])}
                for c, g in attempts
                if g is not None
            ]
    if column_guess is not None:
        # surface WHICH ordering the report reflects, so a legacy
        # mismatch is attributable instead of opaque
        checks["column_guess"] = column_guess
    return checks
