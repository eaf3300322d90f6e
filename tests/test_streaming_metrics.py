"""Streaming observability: the BatchMetricsListener must capture one
metric row per micro-batch with row counts that reconcile exactly
against the source, and expose them as a stable-schema DataFrame."""

from __future__ import annotations

import time

import pytest

from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table
from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.metrics import (
    METRICS_SCHEMA,
    BatchMetricsListener,
)


@pytest.fixture(scope="module")
def staged_events(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("metrics_stream")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartition(4).write.mode("overwrite").json(str(d / "src"))
    return {"dir": str(d), "n": ev.count(), "schema": ev.schema}


def _drain_listener(spark, listener, min_batches, timeout_s=60):
    """Progress events arrive on the listener bus asynchronously AFTER
    query termination — poll until they land."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if len(listener.buffer) >= min_batches:
            return
        time.sleep(0.2)


def test_listener_captures_per_batch_metrics(spark, staged_events, tmp_path):
    listener = BatchMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(staged_events["schema"])
            .option("maxFilesPerTrigger", 1)
            .json(staged_events["dir"] + "/src")
        )
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not terminate"
        _drain_listener(spark, listener, min_batches=4)
    finally:
        spark.streams.removeListener(listener)

    # maxFilesPerTrigger=1 over 4 staged files → ≥4 micro-batches,
    # and the captured input rows reconcile exactly with the source
    totals = listener.totals()
    assert totals["batches"] >= 4
    assert totals["rows"] == staged_events["n"]
    assert all(m.batch_id >= 0 for m in listener.buffer)

    snap = listener.snapshot_df(spark)
    assert snap.count() == totals["batches"]
    assert [f.name for f in snap.schema.fields] == [
        "query_id", "batch_id", "num_input_rows",
        "process_rate", "trigger_ms", "state_rows",
    ]
    agg = snap.groupBy().sum("num_input_rows").collect()[0][0]
    assert agg == staged_events["n"]


def test_snapshot_df_stable_schema_when_empty(spark):
    snap = BatchMetricsListener().snapshot_df(spark)
    assert snap.count() == 0
    assert snap.schema.simpleString() == (
        spark.createDataFrame([], METRICS_SCHEMA).schema.simpleString()
    )
