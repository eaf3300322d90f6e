"""Streaming PSI drift monitor: frozen-reference scoring, per-batch
reports (replay-idempotent), on_shift hook fires without blocking the
batch."""

from __future__ import annotations

import json

import pytest

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
    freeze_reference_bins,
    psi_vs_reference,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.drift import (
    drift_monitored_batch,
)

EDGES = [100.0, 200.0, 300.0, 400.0, 500.0]


def _frame(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["n_chars"])


def test_freeze_reference_bins_hand_check(spark):
    ref = _frame(spark, [50, 150, 150, 250, 350, 450, 550, None])
    counts = freeze_reference_bins(ref, "n_chars", EDGES)
    assert counts == [1, 2, 1, 1, 1, 1]  # NULL excluded


def test_psi_vs_reference_matches_and_shifts(spark):
    import math

    ref_counts = [1, 1, 1, 1, 1, 1]
    same = psi_vs_reference(
        _frame(spark, [50, 150, 250, 350, 450, 550]), "n_chars", EDGES,
        ref_counts,
    ).collect()[0]
    assert same["n"] == 6 and same["psi"] == 0.0 and same["shifted"] is False

    conc = psi_vs_reference(
        _frame(spark, [50] * 6), "n_chars", EDGES, ref_counts
    ).collect()[0]
    expected = 0.0
    for b in range(6):
        c = 6 if b == 0 else 0
        p = (c + 0.5) / (6 + 3.0)
        q = (1 + 0.5) / (6 + 3.0)
        expected += round((p - q) * math.log(p / q), 6)
    assert conc["psi"] == pytest.approx(expected, abs=1e-9)
    assert conc["shifted"] is True


def test_psi_vs_reference_guards(spark):
    with pytest.raises(ValueError, match="entries"):
        psi_vs_reference(_frame(spark, [1]), "n_chars", EDGES, [1, 2])
    with pytest.raises(ValueError, match="empty"):
        psi_vs_reference(_frame(spark, [1]), "n_chars", EDGES, [0] * 6)


def test_drift_monitor_reports_and_hook(spark, tmp_path):
    rdir = str(tmp_path / "drift")
    seen, shifts = [], []
    monitor = drift_monitored_batch(
        lambda df, bid: seen.append((bid, df.count())),
        "n_chars",
        EDGES,
        [1, 1, 1, 1, 1, 1],
        rdir,
        on_shift=lambda bid, psi: shifts.append((bid, psi)),
    )
    monitor(_frame(spark, [50, 150, 250, 350, 450, 550]), 0)  # matches ref
    monitor(_frame(spark, [50] * 6), 1)                        # concentrated
    # both batches flowed through — drift never blocks
    assert seen == [(0, 6), (1, 6)]
    assert len(shifts) == 1 and shifts[0][0] == 1 and shifts[0][1] > 0.2
    r0 = json.loads(spark.read.text(f"{rdir}/b0").collect()[0]["value"])
    r1 = json.loads(spark.read.text(f"{rdir}/b1").collect()[0]["value"])
    assert r0["shifted"] is False and r1["shifted"] is True
    assert r1["batch_id"] == 1 and r1["n"] == 6


def test_drift_monitor_replay_overwrites_report(spark, tmp_path):
    rdir = str(tmp_path / "drift2")
    monitor = drift_monitored_batch(
        lambda df, bid: None, "n_chars", EDGES, [1, 1, 1, 1, 1, 1], rdir
    )
    batch = _frame(spark, [50, 150])
    monitor(batch, 3)
    monitor(batch, 3)  # crash-replay
    rows = spark.read.text(f"{rdir}/b3").collect()
    assert len(rows) == 1  # overwritten, not appended


def test_drift_monitor_failing_alert_hook_never_blocks_batch(spark, tmp_path):
    """The alert hook is exception-isolated and runs AFTER the wrapped
    body: a raising on_shift (Slack 500, network timeout) must not
    fail the micro-batch — blocking drifted-but-valid data is the
    exact failure mode the monitor exists to avoid."""
    rdir = str(tmp_path / "drift3")
    seen = []

    def bad_hook(bid, psi):
        raise RuntimeError("alerting endpoint down")

    monitor = drift_monitored_batch(
        lambda df, bid: seen.append(bid),
        "n_chars",
        EDGES,
        [1, 1, 1, 1, 1, 1],
        rdir,
        on_shift=bad_hook,
    )
    monitor(_frame(spark, [50] * 6), 5)  # shifted batch
    assert seen == [5]  # body ran despite the raising hook
    r = json.loads(spark.read.text(f"{rdir}/b5").collect()[0]["value"])
    assert r["shifted"] is True


def test_drift_monitor_alert_fires_even_when_body_fails(spark, tmp_path):
    """The alert fires BEFORE the wrapped body: a failing sink must
    not suppress the drift alert — the alert matters most exactly
    when downstream is unhealthy."""
    rdir = str(tmp_path / "drift4")
    shifts = []

    def failing_body(df, bid):
        raise RuntimeError("sink outage")

    monitor = drift_monitored_batch(
        failing_body,
        "n_chars",
        EDGES,
        [1, 1, 1, 1, 1, 1],
        rdir,
        on_shift=lambda bid, psi: shifts.append(bid),
    )
    with pytest.raises(RuntimeError, match="sink outage"):
        monitor(_frame(spark, [50] * 6), 9)
    assert shifts == [9]  # the alert escaped before the body failed
