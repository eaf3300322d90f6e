"""Streaming validation gate: failing micro-batches quarantine whole
(data + report), passing batches flow to the wrapped body; replayed
quarantines overwrite their own partition."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import validate as V
from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.quality_gate import (
    validated_batch,
)


def _checks():
    return [
        V.min_rows(2),
        V.completeness("v"),
        V.uniqueness("k"),
        V.non_negative("v"),
    ]


def test_gate_routes_clean_and_dirty_batches(spark, tmp_path):
    qdir = str(tmp_path / "quarantine")
    passed = []

    def on_pass(df, bid):
        passed.append((bid, df.count()))

    gate = validated_batch(_checks, on_pass, qdir)
    clean = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"])
    dirty = spark.createDataFrame(
        [(3, 3.0), (3, None), (4, -1.0)], ["k", "v"]
    )
    gate(clean, 0)
    gate(dirty, 1)
    assert passed == [(0, 2)]
    qdata = spark.read.parquet(f"{qdir}/data")
    assert qdata.count() == 3
    assert {r["quarantine_batch"] for r in qdata.collect()} == {"b1"}
    rep = json.load(open(f"{qdir}/reports/b1.json"))
    assert rep["batch_id"] == 1
    assert set(rep["failed"]) == {
        "completeness(v)",
        "uniqueness(k)",
        "non_negative(v)",
    }
    assert len(rep["report"]) == 4


def test_gate_quarantine_replay_idempotent(spark, tmp_path):
    qdir = str(tmp_path / "q2")
    gate = validated_batch(_checks, lambda df, bid: None, qdir)
    dirty = spark.createDataFrame([(1, -5.0), (2, 1.0)], ["k", "v"])
    gate(dirty, 7)
    n1 = spark.read.parquet(f"{qdir}/data").count()
    gate(dirty, 7)  # crash-replay
    assert spark.read.parquet(f"{qdir}/data").count() == n1 == 2


def test_gate_empty_batch_short_circuits(spark, tmp_path):
    called = []
    gate = validated_batch(
        _checks, lambda df, bid: called.append(bid), str(tmp_path / "q3")
    )
    empty = spark.createDataFrame([], "k long, v double")
    gate(empty, 0)
    assert called == []
