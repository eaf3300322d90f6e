"""Declarative data-quality validation — the Deequ-style expectation
suite a pipeline runs on every ingest before data is allowed
downstream (reference parity: the reference validates implicitly via
its defensive projections, ``StreamProcessor.scala:34-41``; this is
the explicit, reportable form a 100 TB pipeline needs).

Design: every check compiles to AGGREGATE EXPRESSIONS over one scan —
``validate`` runs a single global aggregate (partial+final, map-side
combined) no matter how many checks are declared, then explodes the
1-row result into a long (check, metric, passed) report. Adding a
check never adds a pass over the data. Distinct-count checks
(``uniqueness``) ride the same aggregate via Spark's count-distinct
Expand — still one scan.

Metrics are doubles rounded to 6 dp and the pass predicate is applied
to the ROUNDED metric, so the report is bit-stable across engines and
the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import round_half_away


@dataclass(frozen=True)
class Check:
    """One named expectation: an aggregate ``metric`` expression and a
    ``passed`` predicate over the rounded metric value."""

    name: str
    metric: Column
    passed: Callable[[Column], Column]


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-NULL values; passes at ``min_ratio`` or above."""
    m = F.avg(F.when(F.col(col).isNotNull(), 1.0).otherwise(0.0))
    return Check(
        f"completeness({col})", m, lambda v: v >= min_ratio
    )


def uniqueness(*cols: str) -> Check:
    """count_distinct / count over the given key; passes at exactly 1
    (every row has a distinct key). NULL keys count as violations
    (count_distinct skips them, so the ratio drops below 1)."""
    m = F.countDistinct(*[F.col(c) for c in cols]) / F.count(F.lit(1))
    return Check(
        f"uniqueness({','.join(cols)})", m, lambda v: v == 1.0
    )


def bounds(col: str, lo: float, hi: float) -> Check:
    """Number of non-NULL values outside [lo, hi]; passes at 0."""
    m = F.sum(
        F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
    ).cast("double")
    return Check(f"bounds({col},{lo},{hi})", m, lambda v: v == 0.0)


def accepted_values(col: str, values: list[str]) -> Check:
    """Number of non-NULL values outside the accepted set; passes
    at 0."""
    m = F.sum(
        F.when(
            F.col(col).isNotNull() & ~F.col(col).isin(values), 1
        ).otherwise(0)
    ).cast("double")
    return Check(
        f"accepted_values({col})", m, lambda v: v == 0.0
    )


def non_negative(col: str) -> Check:
    """Number of negative values; passes at 0."""
    m = F.sum(F.when(F.col(col) < 0, 1).otherwise(0)).cast("double")
    return Check(f"non_negative({col})", m, lambda v: v == 0.0)


def min_rows(n: int) -> Check:
    """Row count; passes at ``n`` or above (empty-extract guard)."""
    return Check(
        f"min_rows({n})",
        F.count(F.lit(1)).cast("double"),
        lambda v: v >= float(n),
    )


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in ONE aggregate pass; return the long report
    (check, metric, passed) ordered by check name via the caller's
    sort if needed (the report is tiny — one row per check).

    Scale shape: a single partial+final global HashAggregate over one
    scan; the explode runs on the 1-row aggregate result, so report
    size is O(checks), independent of data volume. count-distinct
    checks add an Expand below the aggregate (Spark's standard
    multi-distinct plan), never a second scan of the source.
    """
    if not checks:
        raise ValueError("validate() needs at least one check")
    agg_row = df.agg(
        *[
            round_half_away(c.metric, 6).alias(f"_m{i}")
            for i, c in enumerate(checks)
        ]
    )
    report = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(f"_m{i}").alias("metric"),
                c.passed(F.col(f"_m{i}")).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return agg_row.select(F.explode(report).alias("_r")).select(
        "_r.check", "_r.metric", "_r.passed"
    )
