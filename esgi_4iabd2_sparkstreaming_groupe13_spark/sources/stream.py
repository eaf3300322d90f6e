"""Streaming sources.

S2/T2 — the consumer's schema-applied NDJSON directory tail
(``FileReader.scala:50-67``): Spark's JSON file source is NDJSON-native;
``maxFilesPerTrigger=1`` throttles to one producer batch per trigger
("pour simuler un flux", ``FileReader.scala:60``).

Scale note: a directory-listing file source is O(files) per trigger; at
production scale you bound the listing (``maxFileAge``,
``cleanSource``) or move to a log-backed source (Kafka — the
reference's declared-but-unbuilt K6). The Kafka wiring here is the
same call shape with ``format("kafka")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TRIP_SCHEMA


def create_file_stream(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Generic schema-applied streaming file source.

    JSON dirs are globbed to ``*.json``: the producer drops ``.txt``
    diagnostic markers (empty-batch / no-data signals, mirroring
    ``FileSender.scala:85-109``) into the same directory, and those
    must never be parsed as data."""
    reader = spark.readStream.schema(schema).format(fmt)
    if fmt == "json":
        reader = reader.option("pathGlobFilter", "*.json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def create_trip_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """S2: tail a directory of NDJSON trip-batch files."""
    return create_file_stream(
        spark, input_dir, TRIP_SCHEMA, "json", max_files_per_trigger
    )


def parse_kafka_value(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """The Kafka value contract: binary ``value`` → JSON parsed against
    the explicit schema. Split out from the source builder so the parse
    projection is testable without the kafka connector on the classpath
    (a static frame with the wire columns exercises the same plan)."""
    from pyspark.sql import functions as F

    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("rec")
    ).select("rec.*")


def create_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: T.StructType,
) -> DataFrame:
    """K6 (declared-unused in the reference, ``application.conf:34-41``):
    Kafka source with the same downstream contract — JSON value parsed
    against the explicit schema. Provided for cluster deployments; not
    exercised in local tests (no broker in the container)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
    )
    return parse_kafka_value(raw, schema)
