"""Joins (M4(b) — the reference implements none, SURVEY §2.3; the
rebuild proves the capability with scale-correct strategies).

Strategy notes baked into each helper:
* dimension joins → explicit ``broadcast()`` hint (zero shuffle of the
  fact side; the dim ships to every executor once);
* fact-fact joins → plain equi-join, Catalyst picks sort-merge; AQE
  (enabled in the session factory) converts to broadcast at runtime if
  a side turns out small, and splits skewed partitions;
* semi/anti forms for EXISTS/NOT EXISTS — never a distinct+inner join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact × small-dimension join with an explicit broadcast hint."""
    return fact.join(F.broadcast(dim), on, how)


def fact_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact × fact equi-join; leave strategy choice to Catalyst+AQE."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — ships only join keys of the right side."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, on, "left_anti")
