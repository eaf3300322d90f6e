"""Streaming dedup-ingest loop (VERDICT r6 item 4): the persisted
index serves every micro-batch AND absorbs its admissions, so batch N
rejects near-dups of documents first seen in batch N−1 — the
cross-batch memory the exact-tier-only admission filter lacks.
Stream == batch is pinned by running the identical per-batch function
on static frames against a second store."""

from __future__ import annotations

import json
import time

import pytest

from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming import ingest

TEXT_A = (
    "the reference corpus opens with a long meditation on tide charts "
    "and the slow clockwork of estuaries where salt and river water trade "
    "places twice a day under the patient supervision of wading birds"
)
TEXT_B = (
    "meanwhile the second document concerns itself entirely with the "
    "maintenance of antique telescopes the polishing of their brass tubes "
    "and the careful collimation of mirrors on cold and cloudless nights"
)
# near-dup of TEXT_B: one word changed
TEXT_B_NEAR = TEXT_B.replace("brass", "copper")
TEXT_C = (
    "a third text unrelated to either describes the fermentation of "
    "sourdough bread the feeding schedule of the starter culture and the "
    "long slow rise that rewards patience with an open and glossy crumb"
)

#: batch N contains (exact dup of seed, new B); batch N+1 contains
#: (near dup of B — only rejectable because b0's admissions reached
#: the index, plus new C)
BATCHES = [
    [(10, TEXT_B), (11, TEXT_A)],
    [(20, TEXT_B_NEAR), (21, TEXT_C)],
]
EXPECT_ADMITTED = {0, 10, 21}  # seed + B + C


def _setup_store(spark, root):
    corpus_path = str(root / "corpus")
    index_path = str(root / "index")
    seed = spark.createDataFrame([(0, TEXT_A)], ["doc_id", "text"])
    ingest.bootstrap_dedup_ingest(seed, corpus_path, index_path)
    return corpus_path, index_path


def _admitted_ids(spark, corpus_path):
    return {
        r["doc_id"]
        for r in spark.read.parquet(corpus_path).select("doc_id").collect()
    }


def test_streaming_ingest_dedups_across_batches(spark, tmp_path):
    corpus_path, index_path = _setup_store(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        with open(src / f"batch_{i}.json", "w") as fh:
            for doc_id, text in rows:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        time.sleep(0.05)  # distinct mtimes → deterministic file order
    q = ingest.start_dedup_ingest(
        spark,
        str(src),
        corpus_path,
        index_path,
        str(tmp_path / "ckpt"),
        threshold=0.8,
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination()
    assert _admitted_ids(spark, corpus_path) == EXPECT_ADMITTED
    # the index absorbed exactly the admissions (3 docs, one row each)
    sigs = spark.read.parquet(f"{index_path}/signatures")
    assert {r["doc_id"] for r in sigs.collect()} == EXPECT_ADMITTED
    fps = spark.read.parquet(f"{index_path}/fingerprints")
    assert {r["doc_id"] for r in fps.collect()} == EXPECT_ADMITTED


def test_stream_equals_batch(spark, tmp_path):
    """The foreachBatch body run on STATIC frames must produce the
    identical corpus — the batch form is the streaming oracle."""
    corpus_path, index_path = _setup_store(spark, tmp_path / "stream_store")
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        with open(src / f"batch_{i}.json", "w") as fh:
            for doc_id, text in rows:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        time.sleep(0.05)
    q = ingest.start_dedup_ingest(
        spark,
        str(src),
        corpus_path,
        index_path,
        str(tmp_path / "ckpt"),
        threshold=0.8,
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination()

    b_corpus, b_index = _setup_store(spark, tmp_path / "batch_store")
    process = ingest.dedup_ingest_batch(b_corpus, b_index, threshold=0.8)
    for i, rows in enumerate(BATCHES):
        process(spark.createDataFrame(rows, ["doc_id", "text"]), i)

    assert _admitted_ids(spark, b_corpus) == _admitted_ids(
        spark, corpus_path
    ) == EXPECT_ADMITTED


def test_replayed_batch_is_corpus_idempotent(spark, tmp_path):
    """A crash-replayed micro-batch overwrites its OWN partition:
    running the same batch body twice must not duplicate corpus rows
    (index appends are at-least-once by contract — decisions stay
    unchanged because the serve tiers semi-join / distinct)."""
    corpus_path, index_path = _setup_store(spark, tmp_path)
    process = ingest.dedup_ingest_batch(corpus_path, index_path, threshold=0.8)
    batch = spark.createDataFrame(BATCHES[0], ["doc_id", "text"])
    process(batch, 0)
    first = spark.read.parquet(corpus_path).count()
    process(batch, 0)  # replay
    assert spark.read.parquet(corpus_path).count() == first
    assert _admitted_ids(spark, corpus_path) == {0, 10}


def test_replayed_batch_with_intra_batch_near_dups_loses_nothing(
    spark, tmp_path
):
    """ADVICE r7 (high): a replayed batch holding two MUTUALLY
    near-dup docs must re-admit both. A pairwise same-id exclusion is
    not enough — each sibling matches the OTHER's index entry
    (different id), gets classified dup_near, and the partition
    overwrite silently drops both. The serve path must exclude every
    index row whose id appears in the incoming batch."""
    corpus_path, index_path = _setup_store(spark, tmp_path)
    process = ingest.dedup_ingest_batch(corpus_path, index_path, threshold=0.8)
    # intra-batch pair (30, 31) are near-dups of each other; 32 unique
    batch = spark.createDataFrame(
        [(30, TEXT_B), (31, TEXT_B_NEAR), (32, TEXT_C)],
        ["doc_id", "text"],
    )
    process(batch, 0)
    # first ingest admits all three: intra-batch dedup is by contract
    # deferred to the compaction pass (candidates come from the index)
    assert _admitted_ids(spark, corpus_path) == {0, 30, 31, 32}
    process(batch, 0)  # crash replay: index already has 30/31/32
    assert _admitted_ids(spark, corpus_path) == {0, 30, 31, 32}
    # and the replay stayed idempotent row-wise too
    assert spark.read.parquet(corpus_path).count() == 4


def test_index_compaction_removes_replay_duplicates(spark, tmp_path):
    """Index appends are at-least-once; the maintenance pass must
    collapse replay-duplicated rows back to one per doc, and serve
    decisions must be identical before and after."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.maintenance import (
        compact_dedup_index,
    )

    corpus_path, index_path = _setup_store(spark, tmp_path)
    process = ingest.dedup_ingest_batch(corpus_path, index_path, threshold=0.8)
    batch = spark.createDataFrame(BATCHES[0], ["doc_id", "text"])
    process(batch, 0)
    process(batch, 0)  # replay: signatures appended twice
    sigs = spark.read.parquet(f"{index_path}/signatures")
    assert sigs.count() > sigs.select("doc_id").distinct().count()

    probe = spark.createDataFrame(BATCHES[1], ["doc_id", "text"])
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.dedup import (
        incremental_dedup_indexed,
    )

    corpus = spark.read.parquet(corpus_path).select("doc_id", "text")
    before = {
        (r["doc_id"], r["decision"])
        for r in incremental_dedup_indexed(
            index_path, corpus, probe, "text", "doc_id", 0.8
        ).collect()
    }
    stats = compact_dedup_index(spark, index_path)
    assert stats["signatures_rows_after"] < stats["signatures_rows_before"]
    sigs2 = spark.read.parquet(f"{index_path}/signatures")
    assert sigs2.count() == sigs2.select("doc_id").distinct().count()
    after = {
        (r["doc_id"], r["decision"])
        for r in incremental_dedup_indexed(
            index_path, corpus, probe, "text", "doc_id", 0.8
        ).collect()
    }
    assert before == after


def test_boilerplate_scrub_stream_equals_batch(spark, tmp_path):
    """Line-boilerplate index lifecycle: build the frequent-line set
    from a corpus, then scrub a stream of arriving docs per
    micro-batch — stream output must equal the batch form, and the
    scrub must equal line_dedup's verdict for the same corpus+docs."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.dedup import (
        build_line_boilerplate_index,
        scrub_boilerplate_lines,
    )

    footer = "subscribe to our newsletter"
    corpus = spark.createDataFrame(
        [
            (0, f"alpha one\n{footer}"),
            (1, f"bravo two\n{footer}"),
            (2, f"charlie three\n{footer}"),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "lineidx")
    build_line_boilerplate_index(corpus, "text", "doc_id", idx, max_line_df=2)

    arriving = spark.createDataFrame(
        [
            (10, f"delta four\n{footer}\necho five"),
            (11, "unique only\nno chrome here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in scrub_boilerplate_lines(
        arriving, "text", "doc_id", idx
    ).collect()}
    assert out[10]["text_clean"] == "delta four\necho five"
    assert out[10]["n_lines"] == 3 and out[10]["kept_lines"] == 2
    assert out[11]["text_clean"] == "unique only\nno chrome here"

    # stream form: same function inside foreachBatch
    import json as _json
    import time as _time

    src = tmp_path / "bsrc"
    src.mkdir()
    for i, rows in enumerate([[(10, f"delta four\n{footer}\necho five")],
                              [(11, "unique only\nno chrome here")]]):
        with open(src / f"b{i}.json", "w") as fh:
            for d, t in rows:
                fh.write(_json.dumps({"doc_id": d, "text": t}) + "\n")
        _time.sleep(0.05)
    outdir = str(tmp_path / "bout")

    def body(batch_df, batch_id):
        scrub_boilerplate_lines(
            batch_df, "text", "doc_id", idx
        ).withColumn("b", ingest.F.lit(f"b{batch_id}")).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "b"
        ).parquet(outdir)

    stream = ingest.create_file_stream(
        spark, str(src), ingest.DOC_STREAM_SCHEMA, "json", 1
    )
    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "bckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r["doc_id"]: r["text_clean"]
        for r in spark.read.parquet(outdir).collect()
    }
    assert streamed == {k: v["text_clean"] for k, v in out.items()}


def test_scheduled_compaction_bounds_index_under_replays(spark, tmp_path):
    """VERDICT r7 item 7: with compact_every=N wired into the ingest
    loop, running >= 2N batches WITH forced replays must keep the
    index row count bounded (== docs whose signatures ever reached the
    index — no replay-duplicate rows survive past a compaction tick)
    and leave serve decisions unchanged."""
    from pyspark.sql import functions as F

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.dedup import (
        incremental_dedup_indexed,
    )

    corpus_path, index_path = _setup_store(spark, tmp_path)
    N = 2
    process = ingest.dedup_ingest_batch(
        corpus_path, index_path, threshold=0.8, compact_every=N
    )
    texts = [TEXT_B, TEXT_B_NEAR, TEXT_C, TEXT_A + " extra tail tokens",
             TEXT_C + " with a different ending clause"]
    for b in range(2 * N + 1):  # 5 batches > 2N
        batch = spark.createDataFrame(
            [(100 + b, texts[b])], ["doc_id", "text"]
        )
        process(batch, b)
        process(batch, b)  # forced replay: double-append every batch
    # batches 1 and 3 ticked compaction (batch_id+1 % 2 == 0); batch 4
    # replayed after the last tick, so only ITS duplicates may remain
    admitted = _admitted_ids(spark, corpus_path)
    sigs = spark.read.parquet(f"{index_path}/signatures")
    n_rows = sigs.count()
    n_docs = sigs.select("doc_id").distinct().count()
    # bounded: at most one un-compacted replay batch of slack, never
    # 2× growth (without scheduling, 10 appends → ~2 rows per doc)
    assert n_rows <= n_docs + 2
    # decisions unchanged: a fresh serve pass classifies a known
    # near-dup and a known-new doc exactly as before compaction
    corpus = spark.read.parquet(corpus_path).select("doc_id", "text")
    probe = spark.createDataFrame(
        [(900, TEXT_B.replace("cold", "cool")), (901, "wholly novel words "
          "about glaciers calving into quiet fjords at dawn")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["decision"] for r in incremental_dedup_indexed(
        index_path, corpus, probe, "text", "doc_id", threshold=0.8
    ).collect()}
    assert got[900] == "dup_near"
    assert got[901] == "new"
    assert 100 in admitted and 102 in admitted
