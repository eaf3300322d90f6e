"""Atomic dataset publish with an audit manifest — the gate a
multi-job pipeline puts between a producer and its consumers (the
reference publishes bare directories a reader may list mid-write,
``StreamProcessor.scala:131-138``; batch outputs here get
all-or-nothing visibility plus a verifiable contract).

``publish_dataset`` stages the write in a sibling directory, re-reads
the STAGED BYTES (not the logical plan — so the manifest describes
what a consumer will actually see, catching writer-side surprises
like timestamp truncation), computes audit stats in ONE distributed
aggregate pass (row count, order-insensitive full-width checksum,
per-column null counts, schema), drops a ``_MANIFEST.json`` beside
the data, and swap-renames the stage into place. Readers either see
the previous dataset or the complete new one with its manifest —
never a partial write.

``verify_manifest`` is the consumer-side gate: recompute the same
stats from the files and diff against the manifest — a cheap "did I
get all of it, unmodified?" check before a downstream job trusts its
input.

Scale: the audit pass is a single partial+final aggregate (map-side
combined; the checksum is a bit_xor fold of xxhash64 over the full
row struct, so it is partition-order-free); the manifest itself is
O(columns). The swap reuses the maintenance-module rename protocol
(timestamped suffixes + ``heal_swap`` self-healing). Manifest IO is
plain local-filesystem JSON — on an object store, swap-by-rename is
not atomic and the right tool is a table format (Delta/Iceberg),
which this module deliberately does not pretend to be.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .maintenance import _swap_suffix, heal_swap

MANIFEST_NAME = "_MANIFEST.json"


def _audit_stats(df: DataFrame) -> dict:
    """One aggregate pass → rows, checksum, per-column null counts."""
    aggs = [
        F.count(F.lit(1)).alias("_rows"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("_checksum"),
    ]
    for c in df.columns:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_n_{c}")
        )
    row = df.agg(*aggs).collect()[0]
    return {
        "row_count": row["_rows"],
        # empty dataset: bit_xor over zero rows is NULL → pin to 0
        "checksum_xor_xxhash64": row["_checksum"] if row["_checksum"] is not None else 0,
        "null_counts": {c: row[f"_n_{c}"] for c in df.columns},
        "schema": df.schema.jsonValue(),
    }


def _read(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    return spark.read.format(fmt).load(path)


def publish_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` to ``path`` atomically and return the manifest.

    Stage → audit the staged bytes → manifest → swap. A crash before
    the final rename leaves ``path`` untouched (stale stage/old
    siblings are reclaimed by :func:`heal_swap`, same protocol as
    compaction); after it, the complete dataset + manifest are live.
    """
    target = Path(path)
    # reclaim __old_/__compact_ strandings (shared swap protocol) and
    # stage dirs abandoned by a crashed earlier publish — safe under
    # the same single-writer contract compaction documents. A fresh
    # target with no siblings is the normal first-publish case, not a
    # healing failure.
    if target.exists() or list(target.parent.glob(f"{target.name}__old_*")):
        heal_swap(str(target))
    for stale in target.parent.glob(f"{target.name}__stage_*"):
        shutil.rmtree(stale, ignore_errors=True)
    spark = df.sparkSession
    stage = target.with_name(f"{target.name}__stage_{_swap_suffix()}")
    df.write.format(fmt).mode("errorifexists").save(str(stage))

    staged = _read(spark, str(stage), fmt)
    manifest = _audit_stats(staged)
    manifest["format"] = fmt
    with open(stage / MANIFEST_NAME, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)

    if target.exists():
        old = target.with_name(f"{target.name}__old_{_swap_suffix()}")
        os.rename(target, old)
        os.rename(stage, target)
        shutil.rmtree(old)
    else:
        os.rename(stage, target)
    return manifest


def verify_manifest(spark: SparkSession, path: str) -> dict:
    """Recompute the audit stats from the published files and diff
    them against ``_MANIFEST.json``. Returns per-check booleans plus
    an overall ``ok`` — the consumer-side admission gate."""
    with open(Path(path) / MANIFEST_NAME) as fh:
        manifest = json.load(fh)
    live = _read(spark, path, manifest["format"])
    # a stray sibling write could add columns; audit the manifest's
    # schema projection so column-level diffs are well-defined
    expected_cols = [f["name"] for f in manifest["schema"]["fields"]]
    schema_ok = live.schema.jsonValue() == manifest["schema"]
    stats = _audit_stats(live.select(*expected_cols)) if schema_ok else None
    checks = {
        "schema_match": schema_ok,
        "row_count_match": bool(
            stats and stats["row_count"] == manifest["row_count"]
        ),
        "checksum_match": bool(
            stats
            and stats["checksum_xor_xxhash64"]
            == manifest["checksum_xor_xxhash64"]
        ),
        "null_counts_match": bool(
            stats and stats["null_counts"] == manifest["null_counts"]
        ),
    }
    checks["ok"] = all(checks.values())
    return checks
