"""Batch sources.

S1 — trip CSV scan with the reference's exact reader contract
(``ProducerOperations.scala:75-85``): explicit schema (no inference),
PERMISSIVE parse (malformed → nulls, never failures), empty string as
NULL, ``yyyy-MM-dd HH:mm:ss`` timestamps.

S3 / testdata — parquet scans. At 100 TB the parquet reader is the
workhorse: explicit-schema'd, filter-pushdown and column-pruning
friendly; callers must select/filter on the returned DataFrame so
Catalyst prunes the scan (verified in tests via the physical plan's
ReadSchema/PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES, TRIP_SCHEMA

#: Event-time columns whose parquet physical type has varied across
#: driver testdata generations: TIMESTAMP(NANOS) (Spark reads long
#: nanos via ``spark.sql.legacy.parquet.nanosAsLong``; truncated to µs
#: — bit-identical to DuckDB's ns→µs read) and TIMESTAMP(MICROS,
#: isAdjustedToUTC=false) (Spark 4 infers TIMESTAMP_NTZ). Both are
#: normalized to the session-tz TIMESTAMP type so downstream
#: event-time ops (``unix_micros``, watermarks) see one stable type;
#: sessions here run UTC, so the NTZ→LTZ cast is value-preserving and
#: matches DuckDB's naive read.
TS_NANO_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_trip_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: load a trip CSV exactly as the reference producer does."""
    return (
        spark.read.options(
            header=True,
            sep=",",
            quote='"',
            escape='"',
            mode="PERMISSIVE",
            nullValue="",
            dateFormat="yyyy-MM-dd",
            timestampFormat="yyyy-MM-dd HH:mm:ss",
        )
        .schema(TRIP_SCHEMA)
        .csv(path)
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) as a DataFrame.

    ``SPARK_GRAFT_INPUT_PARTITIONS=N`` (env) round-robin-repartitions
    every table after the scan — a real input-parallelism knob for
    split-starved inputs, and the ADVERSARIAL lever of the
    partition-invariance gate (r15,
    ``tests/test_partition_invariance.py``): round-robin scatters
    rows across N partitions in a layout unrelated to the file order,
    so any operator whose result depends on physical row
    placement/arrival order (the r14 float64-phash class of bug)
    diverges under the gate's checksum comparison. Unset = scan
    splits as-is (production default)."""
    if name in TS_NANO_COLUMNS:
        # runtime-settable; needed when the caller's session didn't go
        # through our factory (e.g. the driver's own SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TS_NANO_COLUMNS.get(name, []):
        if c not in df.columns:
            continue
        dtype = dict(df.dtypes)[c]
        if dtype == "bigint":  # TIMESTAMP(NANOS) read as long nanos
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dtype == "timestamp_ntz":  # TIMESTAMP(MICROS, utc=false)
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    n_parts = os.environ.get("SPARK_GRAFT_INPUT_PARTITIONS")
    if n_parts:
        df = df.repartition(int(n_parts))
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table; also registers each as a temp view so
    SQL-form operators can reference them by name."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the columnar alternative where the lake standard is
    ORC (Hive-lineage estates). Same pushdown/pruning behavior as
    parquet from Spark's side; built-in, no extra jars."""
    df.write.mode(mode).orc(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan with predicate pushdown + column pruning, same caller
    contract as the parquet path: select/filter on the result so the
    scan prunes."""
    return spark.read.orc(path)


def load_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Directory-of-media-files batch source via Spark's native
    ``binaryFile`` format — the REAL ingestion path for the multimodal
    tier (``operators/multimodal.py`` synthesizes payloads for its
    oracle gates; a crawl lands as files).

    Returns (media_id, path, mod_time, n_bytes, payload): ``media_id``
    is the md5 integer of the file path — deterministic across runs
    and engines, so downstream joins/dedup key on it exactly like the
    synthetic tier — and the schema feeds
    ``multimodal.media_header_metadata`` unchanged.

    Scale notes: binaryFile caps one file per row (never splits), so
    partition sizing is by-bytes — pipe through
    ``multimodal.repartition_for_payloads`` before wide payload work;
    ``pathGlobFilter`` prunes at LISTING time (no payload read for
    filtered-out files); header parsing downstream reads O(header)
    bytes per row.
    """
    from ..functions.hashing import md5_int

    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        md5_int(F.col("path")).alias("media_id"),
        F.col("path"),
        F.col("modificationTime").alias("mod_time"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )


def load_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read across parquet generations: later writers
    may ADD columns; ``mergeSchema`` unions the schemas and older
    files surface the new columns as nulls — the standard additive-
    evolution contract of a parquet lake (renames/retypes are NOT
    reconciled; that is a rewrite, see operators/maintenance.py).

    Scale note: schema merging reads FOOTERS of all files (driver-side
    metadata pass, no data scan); at very large file counts pin a
    summary schema instead — the option is per-read, not global, for
    exactly that reason.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
