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


def _read_report(spark, path):
    """Reports are written through Spark (one-row text file per batch
    dir) so they land on the same filesystem as the quarantined data."""
    [row] = spark.read.text(path).collect()
    return json.loads(row["value"])


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
    rep = _read_report(spark, f"{qdir}/reports/b1")
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


def test_gate_scans_failing_batch_once(spark, tmp_path):
    """VERDICT r7 wrong #3: the validate pass and the quarantine write
    must share ONE evaluation of the input (persist), not re-read it.
    A row-counting accumulator riding the input plan fires once per
    evaluated row — persist makes the second consumer read the cache,
    so the total equals the row count, not double it."""
    acc = spark.sparkContext.accumulator(0)

    def count_rows(k):
        acc.add(1)
        return k

    from pyspark.sql.types import LongType

    counted = F.udf(count_rows, LongType())
    dirty = spark.range(8).select(
        counted(F.col("id")).alias("k"), F.lit(-1.0).alias("v")
    )
    gate = validated_batch(_checks, lambda df, bid: None, str(tmp_path / "q1s"))
    gate(dirty, 0)
    assert spark.read.parquet(f"{tmp_path}/q1s/data").count() == 8
    assert acc.value == 8  # one evaluation, two consumers


def test_gate_empty_batch_short_circuits(spark, tmp_path):
    called = []
    gate = validated_batch(
        _checks, lambda df, bid: called.append(bid), str(tmp_path / "q3")
    )
    empty = spark.createDataFrame([], "k long, v double")
    gate(empty, 0)
    assert called == []


def test_gate_composes_with_dedup_ingest(spark, tmp_path):
    """The gate wraps ANY foreachBatch body — here the full dedup
    ingest loop: a clean batch passes validation and lands in the
    corpus (deduped); a batch with a NULL text quarantines whole and
    never reaches the corpus or the index."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming import ingest

    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    seed = spark.createDataFrame(
        [(0, "seed document text about estuaries and tide charts only")],
        ["doc_id", "text"],
    )
    ingest.bootstrap_dedup_ingest(seed, corpus_path, index_path)

    def checks():
        return [V.min_rows(1), V.completeness("text"), V.uniqueness("doc_id")]

    gated = validated_batch(
        checks,
        ingest.dedup_ingest_batch(corpus_path, index_path, threshold=0.8),
        str(tmp_path / "quarantine"),
    )
    clean = spark.createDataFrame(
        [(10, "a perfectly ordinary new document about telescopes")],
        ["doc_id", "text"],
    )
    dirty = spark.createDataFrame(
        [(20, None), (21, "rides along with the bad row")],
        "doc_id long, text string",
    )
    gated(clean, 0)
    gated(dirty, 1)
    admitted = {
        r["doc_id"]
        for r in spark.read.parquet(corpus_path).select("doc_id").collect()
    }
    assert admitted == {0, 10}  # dirty batch never reached the corpus
    sigs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{index_path}/signatures").collect()
    }
    assert 20 not in sigs and 21 not in sigs
    q = spark.read.parquet(str(tmp_path / "quarantine" / "data"))
    assert q.count() == 2  # the whole batch, preserved for repair
