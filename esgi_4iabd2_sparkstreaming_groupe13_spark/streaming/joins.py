"""Watermarked stream-stream interval join (T5/T7 extension — the
reference's streaming surface is single-stream `foreachBatch`
(`StreamProcessing.scala`); joining two live streams is the
capability a reference user grows into next: ad attribution
(impression stream × click stream), order/payment matching,
sensor-pair correlation).

Semantics and scale contract
----------------------------
Structured Streaming buffers BOTH sides in state and emits a pair the
moment the partner arrives, regardless of which micro-batch delivered
which side. Unbounded state is the failure mode at 100 TB — bounding
it needs exactly the two constraints this helper makes mandatory:

* **watermarks on both inputs** (``watermark_delay``): how late either
  side may arrive. Rows older than the watermark are dropped from
  state — the delay is the deployment's real disorder bound, NOT a
  correctness tunable (any pair whose members both arrive within the
  delay is emitted exactly once);
* **a time-range join condition** (``max_lag_seconds``): the right row
  must land inside ``[left_ts, left_ts + max_lag]``. Together with the
  watermark this gives the state store an eviction horizon — a
  buffered left row can be dropped once the watermark passes
  ``left_ts + max_lag``, a right row once it passes ``right_ts``.

State per partition is therefore O(rows arriving within
``watermark_delay + max_lag``), independent of stream lifetime. The
join itself shuffles both streams on their keys once per micro-batch —
the same hash-partitioned exchange a batch equi-join pays, amortized.

``leftOuter`` emits unmatched left rows (right columns NULL) only
after the watermark passes the match horizon — so a drained
``availableNow`` run emits outer results for a left row only if a
LATER micro-batch advanced the watermark beyond ``left_ts + max_lag``
(Spark computes batch N's watermark from batch N-1's max event time;
a trailing heartbeat row is the standard way to flush the tail in
tests and backfills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALLOWED = ("inner", "leftOuter")


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_lag_seconds: int,
    watermark_delay: str,
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on key equality plus the time bound
    ``right_ts ∈ [left_ts, left_ts + max_lag_seconds]`` (inclusive both
    ends), with ``watermark_delay`` (e.g. ``"10 minutes"``) applied to
    both event-time columns.

    Column names of the two inputs must be disjoint (including the key
    columns — rename one side first): the output carries every column
    of both, and a shared name would be ambiguous downstream.
    """
    if how not in _ALLOWED:
        raise ValueError(
            f"stream_interval_join supports how in {_ALLOWED}; got "
            f"{how!r} — rightOuter is the mirrored call, fullOuter "
            "needs a per-side horizon analysis this helper doesn't do"
        )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint; shared: "
            f"{sorted(overlap)} — rename one side before joining"
        )
    lag = int(max_lag_seconds)
    if lag < 0:
        raise ValueError(
            f"max_lag_seconds must be >= 0; got {lag} — a negative lag "
            "makes the bound unsatisfiable and the stream emits zero "
            "matches forever with no error (for 'right BEFORE left' "
            "semantics, swap the sides)"
        )
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {lag} SECOND"))
    )
    return lw.join(rw, cond, how)
