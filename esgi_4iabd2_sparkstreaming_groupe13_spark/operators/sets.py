"""Set operations (reference U1/U2)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_tagged(frames: list[DataFrame], allow_missing: bool = True) -> DataFrame:
    """U1 (``StreamProcessor.scala:76-83``): schema-aligned union by
    name. Union is a zero-shuffle narrow op in Spark — the frames'
    partitions are concatenated, so this costs nothing at any scale."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), frames
    )
