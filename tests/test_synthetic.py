"""Rate-source synthetic trip stream: schema + sustained throughput."""

from __future__ import annotations

import time

from esgi_4iabd2_sparkstreaming_groupe13_spark.schemas import TRIP_SCHEMA
from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.synthetic import (
    synthetic_trip_stream,
)


def test_synthetic_stream_schema_and_rate(spark, tmp_path):
    stream = synthetic_trip_stream(spark, rows_per_second=200)
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in TRIP_SCHEMA.fields
    ]

    q = (
        stream.writeStream.format("memory")
        .queryName("synth_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        time.sleep(6)
        n = spark.table("synth_mem").count()
    finally:
        q.stop()
    # ≫ the reference's 1 row/s design throughput (BASELINE.md);
    # generous lower bound to stay timing-robust
    assert n > 200
    row = spark.table("synth_mem").limit(1).collect()[0]
    assert 1 <= row["PULocationID"] <= 265
    assert row["total_amount"] > 0
