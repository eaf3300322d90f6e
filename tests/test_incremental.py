"""Incremental aggregate-state maintenance (operators/incremental.py)."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import incremental as inc


def _rows(spark):
    # (k, v, u): value NULLs in one slice; one key ('b') whose users
    # are all NULL (no register contribution, still finalizes)
    data = [
        ("a", 1.0, "u1"),
        ("a", 2.0, "u2"),
        ("a", None, "u1"),
        ("a", 4.5, "u3"),
        ("b", 10.0, None),
        ("b", -3.0, None),
        ("c", 0.25, "u9"),
    ]
    return spark.createDataFrame(data, ["k", "v", "u"])


def test_merge_equals_direct_exactly(spark):
    df = _rows(spark)
    # 3-way split by row hash to exercise multi-state merge
    parts = [
        df.filter(F.abs(F.hash("k", "v", "u")) % 3 == i) for i in range(3)
    ]
    merged = inc.merge_agg_states(
        *[inc.build_agg_state(p, ["k"], "v", "u") for p in parts]
    )
    direct = inc.build_agg_state(df, ["k"], "v", "u")
    m = {r["k"]: r for r in merged.collect()}
    d = {r["k"]: r for r in direct.collect()}
    assert set(m) == set(d) == {"a", "b", "c"}
    for k in d:
        for col in ("n_rows", "n_nonnull", "sum_dec", "min_v", "max_v", "regs"):
            assert m[k][col] == d[k][col], (k, col)


def test_finalize_values(spark):
    out = {
        r["k"]: r
        for r in inc.finalize_agg_state(
            inc.build_agg_state(_rows(spark), ["k"], "v", "u")
        ).collect()
    }
    a = out["a"]
    assert a["n_rows"] == 4 and a["n_nonnull"] == 3
    assert a["sum_value"] == 7.5
    assert a["mean_value"] == 2.5
    assert a["min_value"] == 1.0 and a["max_value"] == 4.5
    # 3 distinct users; HLL at b=9 is near-exact for tiny sets
    assert abs(a["est_distinct"] - 3.0) < 0.2
    b = out["b"]
    # all-NULL users: zero registers, small-range est = m·ln(m/m) = 0
    assert b["est_distinct"] == 0.0
    assert b["min_value"] == -3.0 and b["max_value"] == 10.0


def test_hll_estimate_within_rsd(spark):
    n = 2000
    df = spark.range(n).select(
        F.lit("k").alias("k"),
        F.lit(1.0).alias("v"),
        F.concat(F.lit("user_"), F.col("id")).alias("u"),
    )
    est = inc.finalize_agg_state(
        inc.build_agg_state(df, ["k"], "v", "u")
    ).collect()[0]["est_distinct"]
    rsd = 1.04 / math.sqrt(512)
    assert abs(est - n) / n < 3 * rsd


def test_maintain_replay_idempotent(spark, tmp_path):
    path = str(tmp_path / "aggstate")
    df = _rows(spark)
    b1 = df.filter(F.col("k") != "c")
    b2 = df.filter(F.col("k") == "c")
    assert inc.maintain_agg_state(b1, ["k"], "v", "u", path, batch_id=1)
    assert inc.maintain_agg_state(b2, ["k"], "v", "u", path, batch_id=2)
    before = {
        r["k"]: r
        for r in spark.read.parquet(os.path.join(path, "state")).collect()
    }
    # at-least-once replay of batch 1 must be a no-op
    assert inc.maintain_agg_state(b1, ["k"], "v", "u", path, batch_id=1) is False
    after = {
        r["k"]: r
        for r in spark.read.parquet(os.path.join(path, "state")).collect()
    }
    assert before.keys() == after.keys()
    for k in before:
        assert before[k] == after[k]
    # and the folded state equals a from-scratch build of everything
    direct = {
        r["k"]: r for r in inc.build_agg_state(df, ["k"], "v", "u").collect()
    }
    for k in direct:
        assert after[k]["n_rows"] == direct[k]["n_rows"]
        assert after[k]["sum_dec"] == direct[k]["sum_dec"]
        assert after[k]["regs"] == direct[k]["regs"]


def test_maintain_heals_stranded_swap(spark, tmp_path):
    path = str(tmp_path / "aggstate")
    df = _rows(spark)
    assert inc.maintain_agg_state(df, ["k"], "v", "u", path, batch_id=1)
    state_dir = os.path.join(path, "state")
    # simulate a kill between the two renames: live missing, old present
    os.rename(state_dir, state_dir + "__old_00000000000000000001_dead")
    assert inc.maintain_agg_state(
        df.limit(0), ["k"], "v", "u", path, batch_id=2
    )
    healed = spark.read.parquet(state_dir)
    assert healed.count() == 3  # keys a, b, c survived the crash window


def test_state_overlap_inclusion_exclusion(spark):
    # slice X: users 0..999; slice Y: users 500..1499 → true overlap 500
    df = (
        spark.range(1000)
        .select(
            F.lit("X").alias("k"),
            F.lit(1.0).alias("v"),
            F.concat(F.lit("u"), F.col("id")).alias("u"),
        )
        .unionByName(
            spark.range(500, 1500).select(
                F.lit("Y").alias("k"),
                F.lit(1.0).alias("v"),
                F.concat(F.lit("u"), F.col("id")).alias("u"),
            )
        )
    )
    state = inc.build_agg_state(df, ["k"], "v", "u")
    row = inc.state_overlap(state).collect()
    assert len(row) == 1 and (row[0]["slice_a"], row[0]["slice_b"]) == ("X", "Y")
    r = row[0]
    # union sketch == sketch of union: est_union must EQUAL the
    # finalize estimate of a state built over the union of users
    direct_union = inc.finalize_agg_state(
        inc.build_agg_state(
            df.select(F.lit("all").alias("k"), "v", "u"), ["k"], "v", "u"
        )
    ).collect()[0]["est_distinct"]
    assert abs(r["est_union"] - direct_union) < 1e-9
    # inclusion-exclusion identity holds on the rounded outputs
    assert abs((r["est_a"] + r["est_b"] - r["est_union"]) - r["est_overlap"]) < 1e-3
    # three compounded estimates: generous 15% relative envelope
    assert abs(r["est_overlap"] - 500) / 500 < 0.15
