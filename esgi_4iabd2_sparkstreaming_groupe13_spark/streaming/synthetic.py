"""Synthetic load generation (T10 upgrade).

The reference paces replay with ``Thread.sleep`` over a fixed CSV
(``MainProducer.scala:119-122``). For load/soak testing you want an
unbounded, rate-controlled stream with the SAME schema — Spark's
``rate`` source provides exactly that: (timestamp, value) rows at
``rowsPerSecond``, which we map into synthetic trip records with pure
expressions (deterministic given ``value``, no RNG).

``synthetic_trip_batch`` applies the same projection to a bounded
``spark.range`` — the fixture generator for throughput benchmarks
(bench.py streaming metric) and tests, guaranteed schema-identical to
the stream variant because both share ``_trip_projection``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _trip_projection(source: DataFrame) -> DataFrame:
    """Map a (timestamp, value) frame to TRIP_SCHEMA columns — pure
    expressions, deterministic given ``value``."""
    v = F.col("value")
    fare = (v % 80 + 5).cast("double")
    return source.select(
        (v % 2 + 1).cast("int").alias("VendorID"),
        F.col("timestamp").alias("tpep_pickup_datetime"),
        (F.col("timestamp") + F.make_interval(mins=(v % 50).cast("int"))).alias(
            "tpep_dropoff_datetime"
        ),
        (v % 4 + 1).cast("double").alias("passenger_count"),
        ((v % 300) / 10.0).alias("trip_distance"),
        F.lit(1.0).alias("RatecodeID"),
        F.when(v % 97 == 0, F.lit("Y")).otherwise(F.lit("N")).alias(
            "store_and_fwd_flag"
        ),
        (v % 265 + 1).cast("int").alias("PULocationID"),
        ((v * 7) % 265 + 1).cast("int").alias("DOLocationID"),
        (v % 4 + 1).cast("int").alias("payment_type"),
        fare.alias("fare_amount"),
        F.lit(0.5).alias("extra"),
        F.lit(0.5).alias("mta_tax"),
        (fare * 0.15).alias("tip_amount"),
        F.lit(0.0).alias("tolls_amount"),
        F.lit(1.0).alias("improvement_surcharge"),
        (fare * 1.15 + 2.0).alias("total_amount"),
        F.lit(2.5).alias("congestion_surcharge"),
        F.when(v % 11 == 0, F.lit(1.75)).otherwise(F.lit(0.0)).alias("Airport_fee"),
    )


def synthetic_trip_stream(
    spark: SparkSession, rows_per_second: int = 100, partitions: int = 4
) -> DataFrame:
    """Unbounded synthetic trip stream at a controlled rate, matching
    TRIP_SCHEMA's columns (derived deterministically from the rate
    source's ``value`` counter)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", partitions)
        .load()
    )
    return _trip_projection(rate)


def synthetic_trip_batch(
    spark: SparkSession, n_rows: int, partitions: int = 8
) -> DataFrame:
    """Bounded synthetic trips — same schema and per-``value`` content
    as the stream variant, for fixtures/benchmarks."""
    base = spark.range(0, n_rows, 1, partitions).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias(
            "timestamp"
        ),
        F.col("id").alias("value"),
    )
    return _trip_projection(base)
