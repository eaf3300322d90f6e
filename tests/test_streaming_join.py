"""stream_interval_join (streaming/joins.py): the watermarked
stream-stream interval join. The oracle gate (q_stream_join) pins
drained-inner == batch join on the real corpus; these tests pin the
STREAMING-ONLY semantics a batch comparison can't see — cross-batch
state matching, left-outer null emission after the watermark passes,
and the guard contracts."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.joins import (
    stream_interval_join,
)

T0 = 1_700_000_000 * 1_000_000  # anchor epoch micros
DAY = 86_400 * 1_000_000

VIEW_SCHEMA = StructType(
    [
        StructField("view_id", LongType()),
        StructField("view_us", LongType()),
        StructField("view_user", LongType()),
    ]
)
CLICK_SCHEMA = StructType(
    [
        StructField("click_id", LongType()),
        StructField("click_us", LongType()),
        StructField("click_user", LongType()),
    ]
)


def _write_files(dirpath: str, files: list[list[dict]]) -> None:
    """One NDJSON file per inner list → one micro-batch per file at
    maxFilesPerTrigger=1. The file source orders by MODIFICATION TIME,
    not name — files written within the same clock tick get replayed
    in arbitrary order, which scrambles watermark progression — so
    each file is stamped a strictly increasing mtime."""
    os.makedirs(dirpath, exist_ok=True)
    base = int(time.time()) - 3600
    for i, rows in enumerate(files):
        path = os.path.join(dirpath, f"b{i:03d}.json")
        with open(path, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(path, (base + 10 * i, base + 10 * i))


def _drain(spark, vdir, cdir, how, name, delay="10 seconds", lag=60):
    vs = (
        spark.readStream.schema(VIEW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(vdir)
        .withColumn("view_ts", F.timestamp_micros(F.col("view_us")))
    )
    cs = (
        spark.readStream.schema(CLICK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(cdir)
        .withColumn("click_ts", F.timestamp_micros(F.col("click_us")))
    )
    joined = stream_interval_join(
        vs,
        cs,
        left_key="view_user",
        right_key="click_user",
        left_ts="view_ts",
        right_ts="click_ts",
        max_lag_seconds=lag,
        watermark_delay=delay,
        how=how,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", os.path.join(os.path.dirname(vdir), f"ckpt_{name}")
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not terminate within 600s"
    return spark.table(name).collect()


def _v(i, us, user):
    return {"view_id": i, "view_us": us, "view_user": user}


def _c(i, us, user):
    return {"click_id": i, "click_us": us, "click_user": user}


def test_match_crosses_micro_batches(spark, tmp_path):
    """A view buffered in batch 0 must pair with a click arriving in
    batch 1 — the whole point of stream-stream state (a per-batch
    foreachBatch join would miss it)."""
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    _write_files(
        vdir,
        [
            [_v(1, T0, 100)],  # batch 0: the view
            [_v(2, T0 + 5 * DAY, 900)],  # heartbeat keeps batches aligned
        ],
    )
    _write_files(
        cdir,
        [
            [_c(10, T0 + 5_000_000, 999)],  # batch 0: wrong user
            [_c(11, T0 + 30_000_000, 100)],  # batch 1: the match, +30 s
        ],
    )
    rows = _drain(spark, vdir, cdir, "inner", "ssj_cross")
    pairs = {(r["view_id"], r["click_id"]) for r in rows}
    assert pairs == {(1, 11)}


def test_time_bound_excludes_out_of_window(spark, tmp_path):
    """Same user, click after the lag horizon → no pair; click before
    the view → no pair (the bound is [view_ts, view_ts + lag])."""
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    _write_files(vdir, [[_v(1, T0, 100)]])
    _write_files(
        cdir,
        [
            [
                _c(10, T0 + 61_000_000, 100),  # 61 s > 60 s lag
                _c(11, T0 - 1_000_000, 100),  # 1 s before the view
                _c(12, T0 + 60_000_000, 100),  # exactly on the bound
            ]
        ],
    )
    rows = _drain(spark, vdir, cdir, "inner", "ssj_bound")
    pairs = {(r["view_id"], r["click_id"]) for r in rows}
    assert pairs == {(1, 12)}


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter: an unmatched view emits (click columns NULL) only
    once the GLOBAL watermark (min over both inputs' watermarks —
    multipleWatermarkPolicy default) passes view_ts + lag + delay, so
    BOTH sources need later rows; the emission lands in the batch
    AFTER the one that advanced the watermark (batch N's watermark
    derives from batch N-1's max event time)."""
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    _write_files(
        vdir,
        [
            [_v(1, T0, 100), _v(2, T0, 200)],  # V2 never gets a click
            [_v(3, T0 + 5 * DAY, 900)],  # advance the views watermark
            [_v(4, T0 + 10 * DAY, 901)],  # flush batch
        ],
    )
    _write_files(
        cdir,
        [
            [_c(10, T0 + 10_000_000, 100)],  # matches V1 (+10 s)
            [_c(11, T0 + 5 * DAY, 990)],  # advance the clicks watermark
            [_c(12, T0 + 10 * DAY, 991)],  # flush batch
        ],
    )
    rows = _drain(spark, vdir, cdir, "leftOuter", "ssj_outer")
    by_view = {r["view_id"]: r for r in rows}
    assert by_view[1]["click_id"] == 10
    assert 2 in by_view, "unmatched view never emitted its outer row"
    assert by_view[2]["click_id"] is None
    assert by_view[2]["click_us"] is None


def test_guard_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["user_id", "x"])
    with pytest.raises(ValueError, match="disjoint"):
        stream_interval_join(
            df, df, "user_id", "user_id", "x", "x", 60, "1 minute"
        )


def test_guard_rejects_negative_lag(spark):
    """A sign-error lag makes the bound unsatisfiable — the stream
    would emit zero matches forever with no error; it must raise."""
    l = spark.createDataFrame([(1,)], ["a"])
    r = spark.createDataFrame([(1,)], ["b"])
    with pytest.raises(ValueError, match="max_lag_seconds"):
        stream_interval_join(
            l, r, "a", "b", "a", "b", -60, "1 minute"
        )


def test_guard_rejects_unsupported_how(spark):
    l = spark.createDataFrame([(1,)], ["a"])
    r = spark.createDataFrame([(1,)], ["b"])
    with pytest.raises(ValueError, match="supports how"):
        stream_interval_join(
            l, r, "a", "b", "a", "b", 60, "1 minute", how="fullOuter"
        )
