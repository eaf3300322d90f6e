"""Atomic publish + manifest verification gate."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.publish import (
    MANIFEST_NAME,
    publish_dataset,
    verify_manifest,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table


def test_publish_writes_manifest_and_verifies(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ds")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    manifest = publish_dataset(ev, out)
    assert manifest["row_count"] == ev.count()
    assert os.path.exists(os.path.join(out, MANIFEST_NAME))
    # Spark hides _-prefixed files: the manifest must not pollute reads
    assert spark.read.parquet(out).count() == manifest["row_count"]
    checks = verify_manifest(spark, out)
    assert checks["ok"], checks


def test_publish_swaps_over_existing_and_cleans_stage(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ds")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    publish_dataset(ev, out)
    # abandoned stage from a "crashed" earlier publish
    os.makedirs(out + "__stage_000_dead")
    half = ev.filter(F.col("event_id") % 2 == 0)
    m2 = publish_dataset(half, out)
    assert m2["row_count"] == half.count()
    assert spark.read.parquet(out).count() == m2["row_count"]
    # no stale siblings survive the swap
    assert glob.glob(out + "__*") == []
    assert verify_manifest(spark, out)["ok"]


def test_verify_catches_missing_part_file(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ds")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    publish_dataset(ev.repartition(4), out)
    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(parts) == 4
    os.remove(parts[0])
    checks = verify_manifest(spark, out)
    assert not checks["ok"]
    assert not checks["row_count_match"]
    assert not checks["checksum_match"]


def test_publish_empty_dataset_roundtrips(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ds")
    ev = load_table(spark, sf_dir, "events").select("event_id").filter(
        F.lit(False)
    )
    manifest = publish_dataset(ev, out)
    assert manifest["row_count"] == 0
    assert manifest["checksum_xor_xxhash64"] == 0
    assert verify_manifest(spark, out)["ok"]
