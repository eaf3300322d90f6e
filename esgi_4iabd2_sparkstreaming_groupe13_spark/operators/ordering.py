"""Sorts / limits / top-k (reference O1-O5).

``topk`` is the flagship "busiest locations" shape: orderBy desc +
limit compiles to TakeOrderedAndProject — per-partition heap of k rows
then a k-row merge on the driver. No global sort, no full shuffle;
this is exactly the plan you want at 100 TB. A bare global ``orderBy``
(O1) is a range-partitioned full sort — legitimate only when the total
order itself is the product (replay files, sorted output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def order_by(df: DataFrame, *cols: str | Column) -> DataFrame:
    """O1 (``ProducerOperations.scala:109``): global sort."""
    return df.orderBy(*cols)


def topk(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """O4 (+limit) — TakeOrderedAndProject top-k. Pass a total order
    (tiebreaker column) for deterministic results."""
    return df.orderBy(*order_cols).limit(k)


def busiest_keys(df: DataFrame, key: str, k: int) -> DataFrame:
    """The dashboard's de-facto query (``taxi_dashboard.py:174``):
    count per key, k largest, key-asc tiebreak."""
    return topk(
        df.groupBy(key).agg(F.count("*").alias("trip_count")),
        [F.desc("trip_count"), F.asc(key)],
        k,
    )
