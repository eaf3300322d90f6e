"""Streaming vector-ingest loop (new r9): micro-batches of embeddings
append into the persisted cell-partitioned IVF index with a durable
per-batch drift report against the frozen quantizer; stream == batch
is pinned by running the identical per-batch function on static
frames against a second store."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import similarity
from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming import vector_ingest

DIM = 8


def _axis_vec(axis, perturb_axis, eps=0.1):
    v = [0.0] * DIM
    v[axis] = 1.0
    v[perturb_axis] = eps
    return v


def _seed_rows():
    return [(i, _axis_vec(i % 2, 2 + (i % 6))) for i in range(40)]


#: two in-distribution batches (cluster axes e0/e1)
BATCHES = [
    [(100 + i, _axis_vec(i % 2, 2 + (i % 6))) for i in range(10)],
    [(200 + i, _axis_vec((i + 1) % 2, 2 + (i % 6))) for i in range(10)],
]
DRIFTED = [(900 + i, _axis_vec(7, 2)) for i in range(10)]


def _setup_store(spark, root):
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (DIM - 1)),
         (1, [0.0, 1.0] + [0.0] * (DIM - 2))],
        "cell_id long, cvec array<double>",
    )
    paths = {
        "cents": str(root / "cents"),
        "index": str(root / "index"),
        "monitor": str(root / "monitor"),
    }
    seed = spark.createDataFrame(
        _seed_rows(), "vec_id long, embedding array<double>"
    )
    vector_ingest.bootstrap_vector_ingest(
        seed, cents, paths["cents"], paths["index"]
    )
    return paths


def _write_batches(src, batches):
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"batch_{i}.json", "w") as fh:
            for vec_id, emb in rows:
                fh.write(
                    json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n"
                )
        time.sleep(0.05)  # distinct mtimes → deterministic file order


def _served(spark, paths, qids):
    # the index is at-least-once under replays — dedup before using
    # it as a QUERY source (the serve path dedups its own list side)
    emb = (
        spark.read.parquet(paths["index"])
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    cents = spark.read.parquet(paths["cents"])
    return sorted(
        map(
            tuple,
            similarity.ivf_index_topk(
                spark, paths["index"], cents, queries, 3, 2
            ).collect(),
        )
    )


def test_vector_stream_appends_and_monitors(spark, tmp_path):
    paths = _setup_store(spark, tmp_path)
    src = tmp_path / "src"
    _write_batches(src, BATCHES)
    q = vector_ingest.start_vector_ingest(
        spark,
        str(src),
        paths["cents"],
        paths["index"],
        paths["monitor"],
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(paths["index"])
        .select("vec_id")
        .collect()
    }
    assert ids == {i for i, _ in _seed_rows()} | {
        i for b in BATCHES for i, _ in b
    }
    mon = spark.read.parquet(paths["monitor"]).collect()
    assert {r["ingest_batch"] for r in mon} == {"b0", "b1"}
    assert all(r["retrain"] is False for r in mon)
    assert all(abs(r["drift_ratio"] - 1.0) < 0.2 for r in mon)
    marker = os.path.join(
        os.path.dirname(paths["index"]), vector_ingest.RETRAIN_MARKER
    )
    assert not os.path.exists(marker)


def test_vector_stream_equals_batch(spark, tmp_path):
    """The foreachBatch body on static frames must build the identical
    index — same served neighbors, same monitor verdicts."""
    s_paths = _setup_store(spark, tmp_path / "stream_store")
    src = tmp_path / "src"
    _write_batches(src, BATCHES)
    q = vector_ingest.start_vector_ingest(
        spark,
        str(src),
        s_paths["cents"],
        s_paths["index"],
        s_paths["monitor"],
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination()

    b_paths = _setup_store(spark, tmp_path / "batch_store")
    process = vector_ingest.vector_ingest_batch(
        b_paths["cents"], b_paths["index"], b_paths["monitor"]
    )
    for i, rows in enumerate(BATCHES):
        process(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ),
            i,
        )
    qids = [0, 100, 205]
    assert _served(spark, s_paths, qids) == _served(spark, b_paths, qids)


def test_drifted_batch_raises_retrain_marker(spark, tmp_path):
    paths = _setup_store(spark, tmp_path)
    process = vector_ingest.vector_ingest_batch(
        paths["cents"], paths["index"], paths["monitor"]
    )
    process(
        spark.createDataFrame(
            DRIFTED, "vec_id long, embedding array<double>"
        ),
        0,
    )
    mon = spark.read.parquet(paths["monitor"]).collect()
    assert len(mon) == 1 and mon[0]["retrain"] is True
    assert mon[0]["drift_ratio"] > 1.5
    marker = os.path.join(
        os.path.dirname(paths["index"]), vector_ingest.RETRAIN_MARKER
    )
    assert os.path.exists(marker)


def test_replayed_vector_batch_is_serve_idempotent(spark, tmp_path):
    """Index appends are at-least-once: a replayed batch double-
    appends rows, but served neighbors and the monitor table must not
    change (the monitor partition overwrites itself; the serve path
    dropDuplicates before ranking)."""
    paths = _setup_store(spark, tmp_path)
    process = vector_ingest.vector_ingest_batch(
        paths["cents"], paths["index"], paths["monitor"]
    )
    batch = spark.createDataFrame(
        BATCHES[0], "vec_id long, embedding array<double>"
    )
    process(batch, 0)
    first = _served(spark, paths, [0, 100])
    n_mon = spark.read.parquet(paths["monitor"]).count()
    process(batch, 0)  # replay
    assert _served(spark, paths, [0, 100]) == first
    assert spark.read.parquet(paths["monitor"]).count() == n_mon == 1


def test_drift_retrain_serve_loop_end_to_end(spark, tmp_path):
    """VERDICT r9 #7 — the FULL loop with no manual intervention
    between stages: a planted distribution shift arrives MID-STREAM
    (batch 0 in-distribution, batches 1-2 along a direction the
    frozen quantizer has never seen) → the stream itself raises the
    RETRAIN_REQUESTED marker while still appending every row → the
    scheduled ``rebuild_on_drift`` job consumes the marker, refits,
    atomically replaces model + lists → the SAME store paths serve
    both the old and the shifted distribution, with recall against
    exact brute force re-gated on the new model."""
    paths = _setup_store(spark, tmp_path)
    src = tmp_path / "src"
    drifted2 = [(950 + i, _axis_vec(7, 3)) for i in range(10)]
    _write_batches(src, [BATCHES[0], DRIFTED, drifted2])
    q = vector_ingest.start_vector_ingest(
        spark,
        str(src),
        paths["cents"],
        paths["index"],
        paths["monitor"],
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination()

    # the stream raised the marker on its own, and ingest never
    # stopped: every row of every batch is in the index
    marker = os.path.join(
        os.path.dirname(paths["index"]), vector_ingest.RETRAIN_MARKER
    )
    assert os.path.exists(marker)
    mon = {
        r["ingest_batch"]: r["retrain"]
        for r in spark.read.parquet(paths["monitor"]).collect()
    }
    assert mon == {"b0": False, "b1": True, "b2": True}
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(paths["index"]).select("vec_id").collect()
    }
    expected_ids = (
        {i for i, _ in _seed_rows()}
        | {i for i, _ in BATCHES[0]}
        | {i for i, _ in DRIFTED}
        | {i for i, _ in drifted2}
    )
    assert ids == expected_ids

    # the scheduled job picks the marker up — no arguments derived
    # from the drift event, it reacts purely to the hand-off file
    assert vector_ingest.rebuild_on_drift(
        spark, paths["cents"], paths["index"], k=3
    ) is True
    assert not os.path.exists(marker)

    # serve continuity: the same store paths answer queries from BOTH
    # distributions, and recall@k vs exact brute force clears the gate
    # on the new model (the drifted direction is now a centroid)
    cents2 = spark.read.parquet(paths["cents"])
    corpus = (
        spark.read.parquet(paths["index"])
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
        .localCheckpoint()
    )
    k = 3
    qids = [0, 100, 900, 955]  # seed, in-dist batch, both shift batches
    queries = corpus.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    served = similarity.ivf_index_topk(
        spark, paths["index"], cents2, queries, k, nprobe=2
    )
    exact = similarity.brute_force_topk(corpus, qids, k)
    hits = exact.join(
        served.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    recall = {
        r["query_id"]: r["n"] / k
        for r in hits.groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(recall) == set(qids)
    assert all(v >= 2 / 3 for v in recall.values()), recall
    # post-rebuild drift check on the shifted distribution is clean —
    # the loop would not immediately re-raise the marker
    drifted_df = spark.createDataFrame(
        DRIFTED, "vec_id long, embedding array<double>"
    )
    post = similarity.ivf_drift_report(
        spark, drifted_df, cents2, paths["index"]
    ).collect()[0]
    assert post["retrain"] is False


def test_rebuild_on_drift_consumes_marker_and_adapts(spark, tmp_path):
    """The scheduled rebuild: consumes the marker, refits on the
    (dedup'd) index contents, rebuilds lists + baseline — after which
    the formerly-drifted distribution assigns well (its direction is
    now a centroid) and the marker is down. No-op when no marker."""
    paths = _setup_store(spark, tmp_path)
    process = vector_ingest.vector_ingest_batch(
        paths["cents"], paths["index"], paths["monitor"]
    )
    process(
        spark.createDataFrame(
            DRIFTED, "vec_id long, embedding array<double>"
        ),
        0,
    )
    marker = os.path.join(
        os.path.dirname(paths["index"]), vector_ingest.RETRAIN_MARKER
    )
    assert os.path.exists(marker)
    ran = vector_ingest.rebuild_on_drift(
        spark, paths["cents"], paths["index"], k=3
    )
    assert ran is True and not os.path.exists(marker)
    cents2 = spark.read.parquet(paths["cents"])
    assert cents2.count() == 3
    drifted_df = spark.createDataFrame(
        DRIFTED, "vec_id long, embedding array<double>"
    )
    post = similarity.ivf_drift_report(
        spark, drifted_df, cents2, paths["index"]
    ).collect()[0]
    assert post["retrain"] is False
    # idle no-op
    assert vector_ingest.rebuild_on_drift(
        spark, paths["cents"], paths["index"], k=3
    ) is False
