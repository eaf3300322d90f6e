"""Atomic dataset publish with an audit manifest — the gate a
multi-job pipeline puts between a producer and its consumers (the
reference publishes bare directories a reader may list mid-write,
``StreamProcessor.scala:131-138``; batch outputs here get
all-or-nothing visibility plus a verifiable contract).

``publish_dataset`` stages the write in a sibling directory, re-reads
the STAGED BYTES (not the logical plan — so the manifest describes
what a consumer will actually see, catching writer-side surprises
like timestamp truncation), computes audit stats in ONE distributed
aggregate pass (row count, order-insensitive checksum over the
hashable columns, per-column null counts, schema), drops a
``_MANIFEST.json`` beside the data, and swap-renames the stage into
place. Readers see the previous dataset or the complete new one with
its manifest — never a PARTIAL write. As with compaction (same
rename protocol), replacing an existing dataset takes two renames,
so there is a brief window where ``path`` does not exist; a reader
listing in that window sees a missing directory, never mixed
contents. A crash anywhere in the protocol is recovered by the next
``publish_dataset`` (or explicit :func:`heal_publish`): a COMPLETE
stage — its manifest is written strictly after the data commit — is
promoted; an incomplete stage is discarded and the ``__old_`` copy
restored. True single-rename atomicity needs a manifest/table format
(Delta/Iceberg), which this module deliberately does not pretend to
be.

``verify_manifest`` is the consumer-side gate: recompute the same
stats from the files and diff against the manifest — a cheap "did I
get all of it, unmodified?" check before a downstream job trusts its
input.

Scale: the audit pass is a single partial+final aggregate (map-side
combined; the checksum is a bit_xor fold of xxhash64 over the row's
hashable columns, so it is partition-order-free); the manifest
itself is O(columns). Manifest IO is plain local-filesystem JSON —
on an object store, swap-by-rename is not atomic and the right tool
is a table format.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .maintenance import _newest_first, _swap_suffix, heal_swap

MANIFEST_NAME = "_MANIFEST.json"


def _hashable(dt: T.DataType) -> bool:
    """Spark forbids hash expressions over MapType (and the Variant
    type has no stable binary ordering) — such columns are excluded
    from the checksum and listed in the manifest instead of crashing
    the publish of an otherwise-valid dataset."""
    if isinstance(dt, T.MapType) or dt.typeName() == "variant":
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def _audit_stats(df: DataFrame) -> dict:
    """One aggregate pass → rows, checksum, per-column null counts."""
    checksum_cols = [
        f.name for f in df.schema.fields if _hashable(f.dataType)
    ]
    aggs = [F.count(F.lit(1)).alias("_rows")]
    if checksum_cols:
        aggs.append(
            F.bit_xor(F.xxhash64(F.struct(*checksum_cols))).alias("_checksum")
        )
    for c in df.columns:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_n_{c}")
        )
    row = df.agg(*aggs).collect()[0]
    checksum = row["_checksum"] if checksum_cols else 0
    return {
        "row_count": row["_rows"],
        # empty dataset: bit_xor over zero rows is NULL → pin to 0
        "checksum_xor_xxhash64": checksum if checksum is not None else 0,
        "checksum_cols": checksum_cols,
        "null_counts": {c: row[f"_n_{c}"] for c in df.columns},
        "schema": df.schema.jsonValue(),
    }


def _read(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    return spark.read.format(fmt).load(path)


def heal_publish(path: str) -> None:
    """Recover from a publish crashed at any point (single-writer
    contract, like compaction):

    - target missing + a COMPLETE stage exists (manifest present —
      written strictly after the data commit): the newest complete
      stage is promoted. It is strictly newer than any ``__old_``
      sibling, so this also covers a kill between the two swap
      renames WITHOUT losing the finished new dataset.
    - target missing + only ``__old_`` strandings: restore via the
      shared :func:`heal_swap` protocol.
    - finally, all remaining stage/old siblings are stale — drop them.
    """
    target = Path(path)
    stages = list(target.parent.glob(f"{target.name}__stage_*"))
    olds = list(target.parent.glob(f"{target.name}__old_*"))
    if not target.exists():
        complete = _newest_first(
            [s for s in stages if (s / MANIFEST_NAME).exists()]
        )
        if complete:
            os.rename(complete[0], target)
            stages = [s for s in stages if s != complete[0]]
        elif olds:
            heal_swap(str(target))
            olds = list(target.parent.glob(f"{target.name}__old_*"))
    for stale in stages + olds:
        shutil.rmtree(stale, ignore_errors=True)


def publish_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` to ``path`` atomically and return the manifest.

    Stage → audit the staged bytes → manifest → swap. A crash before
    the manifest write leaves ``path`` untouched; after it, the
    complete dataset is promoted by the next publish/heal even if the
    swap itself was interrupted.
    """
    target = Path(path)
    heal_publish(str(target))
    spark = df.sparkSession
    stage = target.with_name(f"{target.name}__stage_{_swap_suffix()}")
    df.write.format(fmt).mode("errorifexists").save(str(stage))

    staged = _read(spark, str(stage), fmt)
    manifest = _audit_stats(staged)
    manifest["format"] = fmt
    commit_stage(stage, target, manifest)
    return manifest


def commit_stage(stage: Path, target: Path, manifest: dict) -> None:
    """Shared publish tail (this module + the shard exporter): write
    ``_MANIFEST.json`` into the stage as its COMMIT MARKER —
    ``heal_publish`` promotes a stage iff the file exists, so it must
    be the LAST write — then promote via the two-rename swap. If the
    second rename fails, the old tree is restored before re-raising
    (heal would recover anyway, but restoring leaves no window where
    neither tree is live — the same guarantee maintenance compaction
    gives)."""
    with open(stage / MANIFEST_NAME, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)

    if target.exists():
        old = target.with_name(f"{target.name}__old_{_swap_suffix()}")
        os.rename(target, old)
        try:
            os.rename(stage, target)
        except OSError:
            os.rename(old, target)
            raise
        shutil.rmtree(old)
    else:
        os.rename(stage, target)


def verify_manifest(spark: SparkSession, path: str) -> dict:
    """Recompute the audit stats from the published files and diff
    them against ``_MANIFEST.json``. Returns per-check booleans plus
    an overall ``ok`` — the consumer-side admission gate."""
    with open(Path(path) / MANIFEST_NAME) as fh:
        manifest = json.load(fh)
    live = _read(spark, path, manifest["format"])
    # a stray sibling write could ADD columns without breaking the
    # published ones: schema_match still fails (exact compare), but
    # the value-level checks stay well-defined by auditing the
    # manifest's column projection whenever it is still present
    expected_cols = [f["name"] for f in manifest["schema"]["fields"]]
    schema_ok = live.schema.jsonValue() == manifest["schema"]
    projectable = set(expected_cols) <= set(live.columns)
    stats = _audit_stats(live.select(*expected_cols)) if projectable else None
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
