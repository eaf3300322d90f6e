"""Streaming near-dup admission loop — the full nightly-ingest cycle
(VERDICT r6 item 4), wiring the persisted dedup index
(``operators/dedup.py``: build / serve / append) into a Structured
Streaming ``foreachBatch`` pipeline:

per micro-batch:
  1. classify arriving docs against the PERSISTED index with
     :func:`~..operators.dedup.incremental_dedup_indexed`
     (exact sha256 tier + LSH-banded near tier — work tracks the
     INCOMING batch, never the corpus);
  2. durably admit the ``new`` survivors into the corpus store —
     dynamic partition overwrite of this batch's own
     ``ingest_batch=b{N}`` partition, so a crash-replayed micro-batch
     REPLACES its partition instead of double-appending
     (exactly-once per partition without a transactional format);
  3. fold the durably-written survivors' fingerprints + MinHash
     signatures into the index with
     :func:`~..operators.dedup.append_to_dedup_index` — so batch N+1
     deduplicates against batch N's admissions, which the
     exact-tier-only streaming admission filter
     (:func:`~..operators.dedup.admit_new_documents`) cannot do.

Step 3 reads the admitted docs BACK from the corpus store (partition-
pruned to this batch) rather than re-using the lazy classified frame —
the read-write hazard documented on ``append_to_dedup_index``: a lazy
frame derived from the index would re-read the index during the very
job that appends to it.

Delivery semantics: corpus-store writes are idempotent under replay —
partition overwrite plus the serve path's REPLAY-BATCH EXCLUSION
(index rows whose id appears in the incoming batch are dropped before
matching, so a replayed batch whose signatures already reached the
index still re-admits ALL its own docs — including mutually-near-dup
siblings within the batch, which a mere same-id inequality would
reject against each other's index entries). Index appends
are at-least-once — a replayed batch appends its signatures twice.
Duplicate index rows never change DECISIONS (the exact tier is a
semi-join on fingerprints, the near tier distincts its candidate
pairs), they only grow the index until the compaction pass
(``operators/maintenance.py``) rewrites it — scheduled from this loop
every ``compact_every`` micro-batches, so a long-running stream's
index stays bounded without manual maintenance. That is the same
at-least-once-per-sink contract as the reference's four-sink consumer
(``StreamProcessor.scala:148-192``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    DEFAULT_SHINGLE_N,
    append_to_dedup_index,
    build_dedup_index,
    incremental_dedup_indexed,
)
from ..sources.stream import create_file_stream

#: NDJSON wire schema for the document ingest stream.
DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def bootstrap_dedup_ingest(
    seed_corpus: DataFrame,
    corpus_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    n: int = DEFAULT_SHINGLE_N,
    max_chars: int = 512,
    seed: int = 42,
) -> None:
    """One-time setup: persist the seed corpus into the partitioned
    store layout the ingest loop appends to, then build the dedup
    index FROM THE DURABLE STORE (not the lazy input — the index must
    describe exactly what was written)."""
    spark = seed_corpus.sparkSession
    seed_corpus.select(id_col, text_col).withColumn(
        "ingest_batch", F.lit("seed")
    ).write.mode("overwrite").partitionBy("ingest_batch").parquet(corpus_path)
    durable = spark.read.parquet(corpus_path).select(id_col, text_col)
    build_dedup_index(
        durable, text_col, id_col, index_path, n_hashes, bands, n, max_chars, seed
    )


def dedup_ingest_batch(
    corpus_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    n_hashes: int = 32,
    bands: int = 8,
    n: int = DEFAULT_SHINGLE_N,
    max_chars: int = 512,
    seed: int = 42,
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` body. Separated from the stream
    wiring so the SAME function can run on static frames — the batch
    form IS the streaming oracle (pytest pins stream == batch over a
    multi-batch fixture where batch N near-dups batch N−1's
    admissions).

    ``compact_every`` (VERDICT r7 item 7): run
    :func:`~..operators.maintenance.compact_dedup_index` after every
    N-th micro-batch, bounding the index growth that at-least-once
    appends cause under replays — without it a long-running stream
    compacts only when an operator remembers to. Scheduling the pass
    INSIDE ``foreachBatch`` keeps the single-writer contract for free:
    Structured Streaming serializes micro-batches, so compaction never
    races an append. Keyed on ``batch_id`` (not a local counter), so a
    crash-replayed trigger batch re-runs its compaction — idempotent
    (the pass is a dedup rewrite; the swap crash-window is covered by
    ``heal_swap``, which both compaction entry points run first)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        corpus = spark.read.parquet(corpus_path).select(id_col, text_col)
        decisions = incremental_dedup_indexed(
            index_path,
            corpus,
            batch_df,
            text_col,
            id_col,
            threshold,
            n_hashes,
            bands,
            n,
            max_chars,
            seed,
        )
        admitted = batch_df.join(
            decisions.filter(F.col("decision") == "new").select(id_col),
            id_col,
            "left_semi",
        )
        part = f"b{batch_id}"
        # 1+2: durable, replay-idempotent admission (overwrite ONLY
        # this batch's partition)
        (
            admitted.select(id_col, text_col)
            .withColumn("ingest_batch", F.lit(part))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(corpus_path)
        )
        # 3: fold the DURABLE survivors into the index (re-read from
        # the store, partition-pruned to this batch — never the lazy
        # index-derived frame; see module docstring)
        durable = (
            spark.read.parquet(corpus_path)
            .filter(F.col("ingest_batch") == part)
            .select(id_col, text_col)
        )
        append_to_dedup_index(durable, text_col, id_col, index_path)
        # 4 (optional): scheduled index maintenance — see docstring
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            from ..operators.maintenance import compact_dedup_index

            compact_dedup_index(spark, index_path)

    return process


def start_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    corpus_path: str,
    index_path: str,
    checkpoint_dir: str,
    schema: T.StructType = DOC_STREAM_SCHEMA,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    max_files_per_trigger: int | None = 1,
    available_now: bool = False,
    n_hashes: int = 32,
    bands: int = 8,
    n: int = DEFAULT_SHINGLE_N,
    max_chars: int = 512,
    seed: int = 42,
    compact_every: int | None = 32,
) -> StreamingQuery:
    """Wire the ingest loop onto an NDJSON directory stream (same
    source contract as the trip consumer: schema-applied, ``*.json``
    glob, ``maxFilesPerTrigger`` throttle, checkpointed offsets).
    ``compact_every`` defaults ON for the long-running stream form
    (every 32 micro-batches) — see :func:`dedup_ingest_batch`."""
    stream = create_file_stream(
        spark, input_dir, schema, "json", max_files_per_trigger
    )
    writer = stream.writeStream.foreachBatch(
        dedup_ingest_batch(
            corpus_path,
            index_path,
            text_col,
            id_col,
            threshold,
            n_hashes,
            bands,
            n,
            max_chars,
            seed,
            compact_every,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
