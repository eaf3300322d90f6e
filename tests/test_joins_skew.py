"""Salted-join correctness + skew distribution test."""

from __future__ import annotations

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.joins import salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows share one hot key — the salting target
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = fact.join(dim, "k").select("k", "v", "dim_val")
    salted = salted_join(fact, dim, "k", salt_buckets=8).select(
        "k", "v", "dim_val"
    )
    assert plain.count() == salted.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """The hot key must land in multiple salt buckets."""
    fact = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    salted = fact.withColumn("_salt", (F.rand(seed=42) * 8).cast("int"))
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets >= 6  # hot key spread over most of the 8 buckets


def test_asof_join_backward_semantics(spark):
    from datetime import datetime

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.joins import (
        asof_join_backward,
    )

    from pyspark.sql import Row

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [Row(k=1, ts=t(5), lid=100),
         Row(k=1, ts=t(10), lid=101),
         Row(k=1, ts=t(2), lid=102),
         Row(k=2, ts=t(7), lid=103)]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=t(3), rid=7),
         Row(k=1, ts=t(5), rid=8),
         Row(k=1, ts=t(9), rid=9),
         Row(k=3, ts=t(1), rid=10)]
    )
    out = {r.lid: r for r in asof_join_backward(left, right, "k", "ts").collect()}
    assert out[100].asof_rid == 8          # equal ts is inclusive
    assert out[101].asof_rid == 9          # latest preceding, not first
    assert out[101].asof_ts == t(9)
    assert out[102].asof_rid is None       # no right row at or before ts
    assert out[103].asof_rid is None       # key has no right rows at all
    assert len(out) == 4                   # left rows preserved exactly


def test_interval_join_semantics(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.joins import (
        interval_join,
    )

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [Row(k=1, ts=t(5), lid=100),
         Row(k=1, ts=t(20), lid=101),
         Row(k=2, ts=t(5), lid=102)]
    )
    right = spark.createDataFrame(
        [Row(k=1, s=t(0), e=t(5), rid=7),    # lid=100 at the inclusive end
         Row(k=1, s=t(4), e=t(10), rid=8),   # lid=100 again (overlap)
         Row(k=2, s=t(6), e=t(9), rid=9)]    # starts after lid=102
    )
    out = interval_join(left, right, "k", "ts", "s", "e").collect()
    matches = sorted((r.lid, r.rid) for r in out)
    assert matches == [(100, 7), (100, 8)]   # inclusive ends; overlap = 2 rows; no match dropped


def test_asof_join_forward_semantics(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.joins import asof_join

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [Row(k=1, ts=t(5), lid=100),
         Row(k=1, ts=t(10), lid=101),
         Row(k=1, ts=t(1), lid=102)]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=t(3), rid=7),
         Row(k=1, ts=t(5), rid=8),
         Row(k=1, ts=t(9), rid=9)]
    )
    out = {
        r.lid: r
        for r in asof_join(left, right, "k", "ts", direction="forward").collect()
    }
    assert out[100].asof_rid == 8       # equal ts is inclusive going forward
    assert out[101].asof_rid is None    # nothing at-or-after
    assert out[102].asof_rid == 7       # earliest following, not latest
