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


def test_heal_promotes_complete_stage_after_swap_crash(spark, sf_dir, tmp_path):
    """Kill between the two swap renames: target missing, __old_ holds
    the previous data, a COMPLETE stage (manifest present) holds the
    new data. Healing must promote the NEW dataset, not resurrect the
    old one, and leave no siblings."""
    out = str(tmp_path / "ds")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    old_half = ev.filter(F.col("event_id") % 2 == 0)
    new_half = ev.filter(F.col("event_id") % 2 == 1)
    publish_dataset(old_half, out)
    publish_dataset(new_half, out + "_next")
    # simulate the crash window
    os.rename(out, out + "__old_123_dead")
    os.rename(out + "_next", out + "__stage_456_dead")

    m = publish_dataset(ev, out)  # heal runs first, then republishes
    assert m["row_count"] == ev.count()
    assert glob.glob(out + "__*") == []

    # heal alone (no republish) promotes the complete stage
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.publish import (
        heal_publish,
    )

    os.rename(out, out + "__old_123_dead")
    publish_dataset(new_half, out + "_next")
    os.rename(out + "_next", out + "__stage_456_dead")
    heal_publish(out)
    assert spark.read.parquet(out).count() == new_half.count()
    assert verify_manifest(spark, out)["ok"]
    assert glob.glob(out + "__*") == []


def test_heal_restores_old_when_stage_incomplete(spark, sf_dir, tmp_path):
    """Crash BEFORE the manifest write: the stage has data files but
    no commit marker — healing must restore the __old_ copy and drop
    the incomplete stage."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.publish import (
        heal_publish,
    )

    out = str(tmp_path / "ds")
    ev = load_table(spark, sf_dir, "events").select("event_id")
    publish_dataset(ev, out)
    os.rename(out, out + "__old_123_dead")
    incomplete = out + "__stage_456_dead"
    ev.limit(5).write.parquet(incomplete)  # data, but no _MANIFEST.json
    heal_publish(out)
    assert spark.read.parquet(out).count() == ev.count()
    assert glob.glob(out + "__*") == []


def test_publish_map_column_excluded_from_checksum(spark, tmp_path):
    """MapType cannot feed hash expressions — the checksum must skip
    such columns (recording which were covered) instead of crashing
    the publish; verification still passes end to end."""
    out = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(1, {"a": "x"}), (2, {"b": "y"})], "id long, props map<string,string>"
    )
    m = publish_dataset(df, out)
    assert m["checksum_cols"] == ["id"]
    assert verify_manifest(spark, out)["ok"]


def test_verify_reports_value_checks_under_extra_column(spark, sf_dir, tmp_path):
    """A stray sibling write adding a column: schema_match fails, but
    the value-level checks stay well-defined over the manifest's
    column projection."""
    out = str(tmp_path / "ds")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    publish_dataset(ev, out)
    extra = ev.withColumn("extra", F.lit(1))
    extra.limit(0).write.mode("append").option(
        "mergeSchema", "true"
    ).parquet(out)
    spark.conf.set("spark.sql.parquet.mergeSchema", "true")
    try:
        checks = verify_manifest(spark, out)
    finally:
        spark.conf.unset("spark.sql.parquet.mergeSchema")
    assert not checks["schema_match"]
    assert checks["row_count_match"] and checks["checksum_match"]
    assert not checks["ok"]


def test_cli_publish_verify_roundtrip(spark, sf_dir, tmp_path, capsys):
    """python -m <pkg> publish / verify drive the same operators; the
    verify exit code is the shell-level gate (0 ok, 1 failed)."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.cli import main

    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    load_table(spark, sf_dir, "events").select("event_id", "value").repartition(
        4
    ).write.parquet(src)
    assert main(["publish", "--source", src, "--out", out]) == 0
    assert main(["verify", "--input", out]) == 0
    parts = glob.glob(os.path.join(out, "part-*.parquet"))
    os.remove(parts[0])
    assert main(["verify", "--input", out]) == 1
