"""Partition-pruned reads: date-partitioned layout must prune at plan
time (PartitionFilters), not post-scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.bucketing import (
    write_date_partitioned,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_date")
    ev = load_table(spark, sf_dir, "events")
    write_date_partitioned(ev, path, "ts")
    return path, ev


def test_partition_filter_in_plan(spark, partitioned_events):
    path, _ = partitioned_events
    df = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan


def test_pruned_read_correct(spark, partitioned_events):
    path, ev = partitioned_events
    got = (
        spark.read.parquet(path)
        .filter(F.col("event_date") == "2024-01-03")
        .count()
    )
    expected = ev.filter(F.to_date("ts") == "2024-01-03").count()
    assert got == expected > 0


def test_partition_count_matches_days(spark, partitioned_events):
    path, ev = partitioned_events
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    import pathlib

    dirs = [p for p in pathlib.Path(path).iterdir() if p.name.startswith("event_date=")]
    assert len(dirs) == n_days
