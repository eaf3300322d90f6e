"""Streaming rollup-maintenance loop (streaming/rollup.py): micro-
batches fold into the persisted agg state exactly once; serving reads
state only. Stream == batch is pinned by comparing the streamed state
against a from-scratch build over all events."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import incremental as inc
from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming import rollup

BATCHES = [
    [
        (1, "2024-01-01T00:00:00", "u1", "view", 1.0),
        (2, "2024-01-01T00:00:01", "u2", "view", 2.0),
        (3, "2024-01-01T00:00:02", "u1", "click", 3.0),
    ],
    [
        (4, "2024-01-01T00:01:00", "u3", "view", 4.0),
        (5, "2024-01-01T00:01:01", "u1", "click", None),
    ],
    [
        (6, "2024-01-01T00:02:00", "u2", "purchase", 10.0),
    ],
]

COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _write_batches(src):
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        with open(src / f"batch_{i}.json", "w") as fh:
            for r in rows:
                fh.write(json.dumps(dict(zip(COLS, r))) + "\n")
        time.sleep(0.05)  # distinct mtimes → deterministic file order


def _all_events(spark):
    return spark.createDataFrame(
        [r for b in BATCHES for r in b],
        "event_id long, ts string, user_id string, event_type string, value double",
    )


def test_stream_equals_batch_rollup(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(src)
    state_path = str(tmp_path / "state")
    q = rollup.start_rollup_maintenance(
        spark,
        str(src),
        state_path,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    served = {
        r["event_type"]: r for r in rollup.serve_rollup(spark, state_path).collect()
    }
    direct = {
        r["event_type"]: r
        for r in inc.finalize_agg_state(
            inc.build_agg_state(
                _all_events(spark), ["event_type"], "value", "user_id"
            )
        ).collect()
    }
    assert served.keys() == direct.keys() == {"view", "click", "purchase"}
    for k in direct:
        assert served[k] == direct[k], k
    # the ledger recorded every folded batch
    ledger = spark.read.parquet(os.path.join(state_path, "ledger"))
    assert ledger.count() == 3


def test_checkpoint_restart_does_not_refold(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(src)
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = rollup.start_rollup_maintenance(
        spark, str(src), state_path, ckpt, available_now=True
    )
    q.awaitTermination(120)
    before = {
        r["event_type"]: r for r in rollup.serve_rollup(spark, state_path).collect()
    }
    # restart over the SAME checkpoint: no new files → no new batches;
    # then simulate a lost checkpoint (fresh dir) → every batch
    # replays, and the ledger must veto every re-fold
    q2 = rollup.start_rollup_maintenance(
        spark, str(src), state_path, ckpt, available_now=True
    )
    q2.awaitTermination(120)
    q3 = rollup.start_rollup_maintenance(
        spark, str(src), state_path, str(tmp_path / "ckpt_lost"),
        available_now=True,
    )
    q3.awaitTermination(120)
    after = {
        r["event_type"]: r for r in rollup.serve_rollup(spark, state_path).collect()
    }
    assert before.keys() == after.keys()
    for k in before:
        assert before[k] == after[k], k


def test_replayed_batch_function_is_noop(spark, tmp_path):
    state_path = str(tmp_path / "state")
    fn = rollup.rollup_batch(["event_type"], "value", "user_id", state_path)
    b0 = spark.createDataFrame(
        BATCHES[0],
        "event_id long, ts string, user_id string, event_type string, value double",
    )
    fn(b0, 0)
    once = rollup.serve_rollup(spark, state_path).collect()
    fn(b0, 0)  # at-least-once redelivery of the SAME micro-batch
    twice = rollup.serve_rollup(spark, state_path).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))
    # counts reflect a single fold, not two
    assert {r["event_type"]: r["n_rows"] for r in twice} == {
        "view": 2,
        "click": 1,
    }


def test_hist_stream_equals_batch_quantiles(spark, tmp_path):
    """Streaming histogram rollup: state + served quantiles after the
    availableNow drain equal a from-scratch one-pass build over all
    events, bit-for-bit (the exact-merge property end to end)."""
    src = tmp_path / "hsrc"
    _write_batches(src)
    state_path = str(tmp_path / "hstate")
    q = rollup.start_hist_rollup(
        spark,
        str(src),
        state_path,
        str(tmp_path / "hckpt"),
        lo=0.0,
        hi=16.0,
        n_bins=8,
        available_now=True,
    )
    q.awaitTermination(120)
    served = {
        (r["event_type"], r["q"]): (r["n_used"], r["est_q"])
        for r in rollup.serve_hist_quantiles(
            spark, state_path, [0.5, 1.0], 0.0, 16.0, 8
        ).collect()
    }
    direct = {
        (r["event_type"], r["q"]): (r["n_used"], r["est_q"])
        for r in inc.hist_quantiles(
            inc.build_hist_state(
                _all_events(spark), ["event_type"], "value", 0.0, 16.0, 8
            ),
            [0.5, 1.0],
            0.0,
            16.0,
            8,
        ).collect()
    }
    assert served == direct
    # NULL value (event 5) excluded from every histogram: click n=1
    assert served[("click", 0.5)][0] == 1
    ledger = spark.read.parquet(os.path.join(state_path, "ledger"))
    assert ledger.count() == 3


def test_theta_stream_equals_batch_and_restart(spark, tmp_path):
    """r16 theta rollup: (a) streamed state == from-scratch build over
    all events (k smallest of the union, bit-exact); (b) restart over
    the same checkpoint re-folds nothing (ledger unchanged, state
    unchanged); (c) the overlap serve answers from state only."""
    src = tmp_path / "src"
    _write_batches(src)
    state_path = str(tmp_path / "tstate")
    ckpt = str(tmp_path / "tckpt")
    q = rollup.start_theta_rollup(
        spark, str(src), state_path, ckpt, k=8, available_now=True
    )
    q.awaitTermination(120)
    served = {
        r["event_type"]: r
        for r in rollup.serve_theta_rollup(spark, state_path, 8).collect()
    }
    direct = {
        r["event_type"]: r
        for r in inc.finalize_theta_state(
            inc.build_theta_state(
                _all_events(spark), ["event_type"], "user_id", 8
            ),
            8,
        ).collect()
    }
    assert served.keys() == direct.keys() == {"view", "click", "purchase"}
    for kk in direct:
        assert served[kk] == direct[kk], kk
    # fixture truth: view saw u1,u2,u3; click u1; purchase u2 — all
    # below k=8, so estimates are exact
    assert served["view"]["est_distinct"] == 3.0
    assert served["click"]["est_distinct"] == 1.0
    ledger_before = (
        spark.read.parquet(os.path.join(state_path, "ledger")).count()
    )
    state_before = sorted(
        (r["event_type"], tuple(r["t_sample"]))
        for r in spark.read.parquet(
            os.path.join(state_path, "state")
        ).collect()
    )
    # restart over the same checkpoint: nothing new to fold
    q2 = rollup.start_theta_rollup(
        spark, str(src), state_path, ckpt, k=8, available_now=True
    )
    q2.awaitTermination(120)
    assert (
        spark.read.parquet(os.path.join(state_path, "ledger")).count()
        == ledger_before
    )
    state_after = sorted(
        (r["event_type"], tuple(r["t_sample"]))
        for r in spark.read.parquet(
            os.path.join(state_path, "state")
        ).collect()
    )
    assert state_after == state_before
    # overlap from state only: view∩click = {u1}, view∩purchase = {u2}
    ov = {
        (r["slice_a"], r["slice_b"]): r
        for r in rollup.serve_theta_overlap(spark, state_path, 8).collect()
    }
    assert ov[("click", "view")]["est_intersection"] == 1.0
    assert ov[("purchase", "view")]["est_intersection"] == 1.0
    assert ov[("click", "purchase")]["est_intersection"] == 0.0
