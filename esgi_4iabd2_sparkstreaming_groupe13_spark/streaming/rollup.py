"""Streaming rollup-maintenance loop (new r9) — incremental view
maintenance wired into ``foreachBatch``: each micro-batch of events
folds into the persisted per-key aggregate state of
:mod:`..operators.incremental`, and dashboards read finalized rollups
from state alone, never from raw history.

This is the textbook exactly-once ``foreachBatch`` pattern: the sink
is made IDEMPOTENT with the micro-batch id — ``maintain_agg_state``'s
ledger records folded batch ids, so an at-least-once replay of a
batch is detected and skipped. That matters more here than for any
other loop in this repo: the dedup and vector loops tolerate replays
because their sinks are naturally idempotent (dropDuplicates /
partition overwrite), but FOLDING is not — re-merging a replayed
batch silently doubles its counts and sums, which is why the ledger
veto is load-bearing, not belt-and-braces.

Contrast with the reference consumer
(`/root/reference/src/main/scala` StreamProcessing: per-batch
aggregates recomputed from each micro-batch alone, no cross-batch
state): this loop maintains the ALL-TIME rollup at per-batch cost —
the state table is keys-sized, the batch work is batch-sized, and
raw events are never rescanned.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.incremental import finalize_agg_state, maintain_agg_state
from ..sources.stream import create_file_stream

#: NDJSON event shape for the rollup stream (ts as ISO string — the
#: producer's wire format; the loop's aggregates don't need it typed).
ROLLUP_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def rollup_batch(
    keys: list[str],
    value_col: str,
    distinct_col: str,
    state_path: str,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` body — separated from the stream
    wiring so the SAME function runs on static frames (pytest pins
    stream == batch and replay idempotence on it)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_agg_state(
            batch_df, keys, value_col, distinct_col, state_path, batch_id
        )

    return process


def start_rollup_maintenance(
    spark: SparkSession,
    input_dir: str,
    state_path: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    value_col: str = "value",
    distinct_col: str = "user_id",
    max_files_per_trigger: int | None = 1,
    available_now: bool = False,
) -> StreamingQuery:
    """Wire the loop onto an NDJSON directory stream of events —
    same source contract as every other consumer (schema-applied,
    ``*.json`` glob, ``maxFilesPerTrigger`` throttle, checkpointed
    offsets)."""
    stream = create_file_stream(
        spark, input_dir, ROLLUP_STREAM_SCHEMA, "json", max_files_per_trigger
    )
    writer = stream.writeStream.foreachBatch(
        rollup_batch(
            keys or ["event_type"], value_col, distinct_col, state_path
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def serve_rollup(spark: SparkSession, state_path: str) -> DataFrame:
    """The dashboard read: finalized rollups straight from the
    persisted state — keys-sized scan, zero raw-event IO."""
    import os

    return finalize_agg_state(
        spark.read.parquet(os.path.join(state_path, "state"))
    )


def hist_rollup_batch(
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    state_path: str,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body for the DISTRIBUTION rollup (new r10):
    each micro-batch folds into the persisted per-key histogram state
    of :func:`..operators.incremental.maintain_hist_state` — same
    ledger-vetoed exactly-once contract as :func:`rollup_batch`, and
    the veto is just as load-bearing (a replayed batch would double
    bin counts and silently shift every served quantile)."""
    from ..operators.incremental import maintain_hist_state

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_hist_state(
            batch_df, keys, value_col, lo, hi, n_bins, state_path, batch_id
        )

    return process


def start_hist_rollup(
    spark: SparkSession,
    input_dir: str,
    state_path: str,
    checkpoint_dir: str,
    lo: float,
    hi: float,
    n_bins: int,
    keys: list[str] | None = None,
    value_col: str = "value",
    max_files_per_trigger: int | None = 1,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming quantile maintenance: per-key p50/p95/p99 over the
    stream's whole history at per-batch cost — served from the
    keys × (bins+2)-sized state, never by rescanning events."""
    stream = create_file_stream(
        spark, input_dir, ROLLUP_STREAM_SCHEMA, "json", max_files_per_trigger
    )
    writer = stream.writeStream.foreachBatch(
        hist_rollup_batch(
            keys or ["event_type"], value_col, lo, hi, n_bins, state_path
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def serve_hist_quantiles(
    spark: SparkSession,
    state_path: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Quantile dashboard read straight from the persisted histogram
    state — keys-sized scan, zero raw-event IO."""
    import os

    from ..operators.incremental import hist_quantiles

    return hist_quantiles(
        spark.read.parquet(os.path.join(state_path, "state")),
        qs,
        lo,
        hi,
        n_bins,
    )


def theta_rollup_batch(
    keys: list[str],
    distinct_col: str,
    state_path: str,
    k: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body for the THETA rollup (r16): each
    micro-batch folds its capped-KMV sample into the persisted
    per-key state of
    :func:`..operators.incremental.maintain_theta_state` — same
    ledger-vetoed exactly-once contract as :func:`rollup_batch`.
    (Here the merge is actually idempotent — "k smallest of the
    union" — so the veto guards visibility, not correctness: replays
    surface as False returns instead of silent re-scans.) State is
    O(k) per key over the stream's WHOLE history at any key
    cardinality — the all-time distinct-users rollup, plus the
    direct pairwise overlap :func:`serve_theta_overlap`, at
    per-batch cost."""
    from ..operators.incremental import maintain_theta_state

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_theta_state(
            batch_df, keys, distinct_col, state_path, batch_id, k=k
        )

    return process


def start_theta_rollup(
    spark: SparkSession,
    input_dir: str,
    state_path: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    distinct_col: str = "user_id",
    k: int | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming distinct/overlap maintenance: the all-time
    per-key distinct estimate (and pairwise audience overlap) served
    from keys × k hashes of state — never by rescanning events."""
    stream = create_file_stream(
        spark, input_dir, ROLLUP_STREAM_SCHEMA, "json", max_files_per_trigger
    )
    writer = stream.writeStream.foreachBatch(
        theta_rollup_batch(
            keys or ["event_type"], distinct_col, state_path, k
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def serve_theta_rollup(
    spark: SparkSession, state_path: str, k: int | None = None
) -> DataFrame:
    """Distinct-estimate dashboard read straight from the persisted
    theta state — keys-sized scan, zero raw-event IO."""
    import os

    from ..operators.incremental import finalize_theta_state

    return finalize_theta_state(
        spark.read.parquet(os.path.join(state_path, "state")), k
    )


def serve_theta_overlap(
    spark: SparkSession, state_path: str, k: int | None = None
) -> DataFrame:
    """Pairwise audience-overlap read from the SAME persisted state —
    the question the HLL rollup cannot answer directly; |slices|² × k
    array cells of work."""
    import os

    from ..operators.incremental import theta_state_overlap

    return theta_state_overlap(
        spark.read.parquet(os.path.join(state_path, "state")), k
    )
