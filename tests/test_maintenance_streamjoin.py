"""Compaction + stream-static join coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.maintenance import (
    compact_directory,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table


def test_compaction_preserves_rows_reduces_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "many_small")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    # simulate micro-batch appends: 12 tiny writes
    for i in range(12):
        ev.filter(F.col("event_id") % 12 == i).coalesce(1).write.mode(
            "append"
        ).json(out)
    before_rows = spark.read.json(out).count()

    stats = compact_directory(spark, out, fmt="json", target_file_bytes=1 << 20)
    assert stats["files_before"] >= 12
    assert stats["files_after"] < stats["files_before"]
    after = spark.read.json(out)
    assert after.count() == before_rows == stats["rows"]


def test_stream_static_broadcast_join(spark, sf_dir, tmp_path):
    """Enrichment join: streaming facts × static dimension. The static
    side is planned per micro-batch (broadcast here) — the standard
    streaming enrichment pattern."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = str(tmp_path / "src")
    ev.repartition(2).write.mode("overwrite").json(src)

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("error", -1.0), ("purchase", 5.0)],
        ["event_type", "weight"],
    )
    stream = spark.readStream.schema(ev.schema).json(src)
    enriched = stream.join(F.broadcast(dim), "event_type", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enriched_mem")
    assert got.count() == ev.count()
    # every known type got its weight; unknown types stay null
    known = got.filter(F.col("event_type").isin("click", "view", "error", "purchase"))
    assert known.filter(F.col("weight").isNull()).count() == 0
