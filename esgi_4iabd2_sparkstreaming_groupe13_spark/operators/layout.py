"""Data-layout optimization — multi-dimensional clustering for scan
pruning (the storage-side half of "fast at 100 TB").

A 100 TB table is only fast to query if most of it is never read.
Parquet gives two pruning levers: partition directories (coarse, one
dimension) and per-row-group min/max statistics (fine, but only
useful if rows are CLUSTERED so each file/row-group covers a narrow
value range). Sorting by a single column clusters that column
perfectly and every other column not at all; interleaving the bits of
several columns' bucket numbers (a Z-order / Morton curve) gives every
interleaved column locality at once, so a box predicate on ANY subset
of them touches a small fraction of files — the same technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, built here from pure column
arithmetic (no engine extension needed).

``z_value`` is deliberately expression-only (shift/and/or over longs,
whole-stage-codegen friendly, engine-portable — the DuckDB oracle
replays the identical arithmetic), and ``zorder_write`` is the
standard two-step: range-partition by the z-value (files = contiguous
curve segments), then sort within partitions (row groups = finer
segments). One full-data shuffle, same cost as any repartition-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each
    bucket column (non-negative ints; callers map raw values to
    bucket ranks first — identity for ids that already fit, datediff
    for dates, quantile rank for skewed doubles). Values are clamped
    to [0, 2^bits - 1] so an out-of-range straggler degrades locality
    instead of corrupting the curve: high clamps sort last within
    their prefix, and negative inputs (e.g. a datediff before the
    epoch anchor) clamp to 0 rather than interleaving two's-complement
    sign bits that would scatter them across the curve.

    Bit i of column j lands at output bit ``i * n_cols + j`` —
    n_cols × bits total (≤ 63 enforced), so the result is one long:
    a plain sort key any engine can range-partition on.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z_value needs >= 2 columns to interleave")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    ceiling = (1 << bits) - 1
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.greatest(
            F.lit(0).cast("long"),
            F.least(c.cast("long"), F.lit(ceiling)),
        )
        for i in range(bits):
            bit = F.shiftright(v.bitwiseAND(F.lit(1 << i)), i)
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def z_value_sql(exprs: list[str], bits: int = 16) -> str:
    """DuckDB mirror of :func:`z_value` — the same clamp + interleave
    arithmetic, so the oracle reproduces the curve key bit-for-bit."""
    n = len(exprs)
    ceiling = (1 << bits) - 1
    terms = []
    for j, e in enumerate(exprs):
        v = f"greatest(CAST(0 AS BIGINT), least(CAST({e} AS BIGINT), {ceiling}))"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    bucket_cols: list[Column],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files clustered along
    the Z-curve of ``bucket_cols``: range-partition on the z-value
    (each file = one contiguous curve segment, so per-file min/max of
    EVERY interleaved dimension is narrow), sort within partitions
    (row-group-level stats get the same treatment), drop the
    transient key on write. One full-data shuffle — the maintenance
    pass a table owner schedules like compaction, paid once to make
    every later box query prune.
    """
    keyed = df.withColumn("_z", z_value(bucket_cols, bits))
    (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_report(
    df_with_file: DataFrame, dims: list[str]
) -> DataFrame:
    """Per-file min/max span of each dimension (input must carry an
    ``_file`` column, e.g. ``input_file_name()``) — the audit a table
    owner runs after a layout rewrite to see what a box predicate
    will prune: narrow disjoint spans ⇒ most files skipped.
    """
    aggs = []
    for d in dims:
        aggs += [
            F.min(d).alias(f"{d}_min"),
            F.max(d).alias(f"{d}_max"),
        ]
    return df_with_file.groupBy("_file").agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )
