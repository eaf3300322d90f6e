"""Streaming vector-ingest loop (new r9) — the embedding-side twin of
the dedup admission loop (``ingest.py``), wiring the persisted IVF
index (``operators/similarity.py``: build / serve / append / drift)
into a Structured Streaming ``foreachBatch`` pipeline:

per micro-batch of ``(vec_id, embedding)`` rows:
  1. DRIFT CHECK the batch against the frozen quantizer
     (:func:`~..operators.similarity.ivf_drift_report`) and durably
     record the one-row report under this batch's own
     ``ingest_batch=b{N}`` partition of the monitor table — dynamic
     partition overwrite, so a crash-replayed batch REPLACES its
     report instead of double-logging;
  2. APPEND the batch's assignments into the cell-partitioned
     inverted lists (:func:`~..operators.similarity.ivf_index_append`
     — work tracks the batch, never the corpus);
  3. if the drift ratio tripped, drop a ``RETRAIN_REQUESTED`` marker
     next to the index. The loop NEVER retrains inline: a refit
     changes cell geometry, which invalidates every existing list —
     that is a scheduled rebuild job
     (:func:`~..operators.similarity.ivf_index_build` from the full
     store), not a micro-batch side effect. The marker is the
     hand-off a pipeline's training scheduler polls.

Delivery semantics, mirrored from the dedup loop: the monitor table
is exactly-once per partition (overwrite of its own batch partition);
index appends are AT-LEAST-ONCE — a replayed batch appends its rows
twice, which never changes serve results (the serve path
``dropDuplicates(vec_id)`` before ranking) and is reclaimed by an
offline ``compact_directory``-style rewrite. Centroids are read from
their persisted model table per batch (foreachBatch runs on the
micro-batch session — closures over outer-session frames are the
documented hazard).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.similarity import (
    ivf_drift_report,
    ivf_index_append,
    ivf_index_build,
)
from ..sources.stream import create_file_stream

EMB_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)

RETRAIN_MARKER = "RETRAIN_REQUESTED"


def bootstrap_vector_ingest(
    seed_embeddings: DataFrame,
    centroids: DataFrame,
    centroids_path: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One-time setup: persist the quantizer model table the loop
    serves from, then build the inverted lists + drift baseline from
    the seed corpus."""
    spark = seed_embeddings.sparkSession
    centroids.write.mode("overwrite").parquet(centroids_path)
    durable_cents = spark.read.parquet(centroids_path)
    ivf_index_build(
        spark, seed_embeddings, durable_cents, index_path, id_col, vec_col
    )


def vector_ingest_batch(
    centroids_path: str,
    index_path: str,
    monitor_path: str,
    retrain_ratio: float = 1.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` body — separated from the stream
    wiring so the SAME function runs on static frames (the batch form
    is the streaming oracle; pytest pins stream == batch)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cents = spark.read.parquet(centroids_path)
        part = f"b{batch_id}"
        report = ivf_drift_report(
            spark,
            batch_df,
            cents,
            index_path,
            retrain_ratio,
            id_col,
            vec_col,
        ).withColumn("ingest_batch", F.lit(part))
        (
            report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(monitor_path)
        )
        ivf_index_append(
            spark, batch_df, cents, index_path, id_col, vec_col
        )
        # read the DURABLE report back (partition-pruned to this
        # batch) for the retrain decision — the decision must reflect
        # what was recorded, and the lazy frame would re-run the
        # assignment
        tripped = (
            spark.read.parquet(monitor_path)
            .filter(F.col("ingest_batch") == part)
            .filter(F.col("retrain"))
            .limit(1)
            .count()
            > 0
        )
        if tripped:
            # idempotent marker create: the training scheduler owns
            # deletion (after the rebuild), the loop only raises it
            with open(
                os.path.join(os.path.dirname(index_path) or ".", RETRAIN_MARKER),
                "a",
            ):
                pass

    return process


def start_vector_ingest(
    spark: SparkSession,
    input_dir: str,
    centroids_path: str,
    index_path: str,
    monitor_path: str,
    checkpoint_dir: str,
    retrain_ratio: float = 1.5,
    max_files_per_trigger: int | None = 1,
    available_now: bool = False,
) -> StreamingQuery:
    """Wire the loop onto an NDJSON directory stream of
    ``(vec_id, embedding)`` rows — same source contract as every
    other consumer (schema-applied, ``*.json`` glob,
    ``maxFilesPerTrigger`` throttle, checkpointed offsets)."""
    stream = create_file_stream(
        spark, input_dir, EMB_STREAM_SCHEMA, "json", max_files_per_trigger
    )
    writer = stream.writeStream.foreachBatch(
        vector_ingest_batch(
            centroids_path, index_path, monitor_path, retrain_ratio
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rebuild_on_drift(
    spark: SparkSession,
    centroids_path: str,
    index_path: str,
    k: int,
    max_iterations: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """The scheduled job on the other side of the marker hand-off:
    if ``RETRAIN_REQUESTED`` is raised, refit the quantizer on the
    CURRENT index contents (dedup'd — appends are at-least-once),
    atomically replace the centroid model, rebuild the inverted lists
    + drift baseline against the new geometry, and lower the marker.
    Returns whether a rebuild ran.

    Ordering matters: the marker comes down LAST, after both tables
    are durably rewritten — a crash mid-rebuild leaves the marker up,
    so the next scheduled run redoes the (idempotent, overwrite-mode)
    rebuild instead of silently serving a half-replaced model. Run it
    from the maintenance scheduler, never inside the ingest loop —
    Structured Streaming serializes foreachBatch calls, so a stream
    restart between batches is the natural quiesce point."""
    from ..operators.similarity import kmeans_fit

    marker = os.path.join(
        os.path.dirname(index_path) or ".", RETRAIN_MARKER
    )
    if not os.path.exists(marker):
        return False
    corpus = (
        spark.read.parquet(index_path)
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
    )
    cents, _, _ = kmeans_fit(
        corpus, k, max_iterations, id_col=id_col, vec_col=vec_col
    )
    cents.write.mode("overwrite").parquet(centroids_path)
    durable_cents = spark.read.parquet(centroids_path)
    ivf_index_build(
        spark, corpus, durable_cents, index_path, id_col, vec_col
    )
    os.remove(marker)
    return True
