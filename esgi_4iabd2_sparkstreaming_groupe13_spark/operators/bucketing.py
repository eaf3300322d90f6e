"""Bucketed (co-located) joins — the shuffle-free fact-fact join
story at 100 TB (ARCHITECTURE.md §4).

A sort-merge join between two large facts normally shuffles BOTH
sides on the join key every query. Bucketing pays that shuffle once
at ingest: both tables are written ``bucketBy(N, key)`` + sorted, so
every subsequent equi-join on that key reads co-located, pre-sorted
buckets — the physical plan has no Exchange on either side.

This is a table-layout decision, not a code-path change: the same
``join`` call produces the shuffle-free plan when the catalog says
the layout allows it.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) catalog
    table. ``buckets`` should be sized so one bucket of the LARGER
    table fits an executor's task comfortably (at 100 TB: hundreds to
    thousands)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphaned location (table dropped from a previous session's
    # in-memory catalog but files left behind) blocks saveAsTable
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = Path(warehouse.removeprefix("file:")) / table.lower()
    if loc.exists():
        shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, part_col: str = "event_date"
) -> None:
    """Hive-style date partitioning — the data-skipping layout for
    time-series facts: queries filtering on the partition column read
    only matching directories (PartitionFilters in the scan, pruned
    before any I/O). At 100 TB this is the difference between scanning
    a day and scanning a decade."""
    from pyspark.sql import functions as F

    (
        df.withColumn(part_col, F.to_date(ts_col))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(path)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket counts the plan is SortMergeJoin over bucketed
    scans — zero Exchange (verify with ``.explain``)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
