"""Incremental aggregate-state maintenance (operators/incremental.py)."""

from __future__ import annotations

import math
import os

import pytest

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


def test_hist_merge_equals_one_pass_exactly(spark):
    """quantiles(merge(build(A), build(B), build(C))) must equal
    quantiles(build(A∪B∪C)) bit-for-bit: the bin-count merge is exact
    (element-wise long sums), so not even rounding may differ. Also
    guards the fold seam: merging 3 slices where slice 1 is largest
    catches any first-element double-count."""
    rows = [(i % 4, float(i % 97)) for i in range(900)]
    df = spark.createDataFrame(rows, "k long, v double")
    parts = [df.filter(F.col("k") % 3 == r) for r in range(3)]
    states = [
        inc.build_hist_state(p, ["k"], "v", 0.0, 100.0, 20) for p in parts
    ]
    merged = inc.merge_hist_states(*states)
    direct = inc.build_hist_state(df, ["k"], "v", 0.0, 100.0, 20)
    qs = [0.5, 0.9, 1.0]
    got = {
        (r["k"], r["q"]): (r["n_used"], r["est_q"])
        for r in inc.hist_quantiles(merged, qs, 0.0, 100.0, 20).collect()
    }
    want = {
        (r["k"], r["q"]): (r["n_used"], r["est_q"])
        for r in inc.hist_quantiles(direct, qs, 0.0, 100.0, 20).collect()
    }
    assert got == want
    # and the merged STATE itself is identical to the one-pass state
    ms = {r["k"]: (r["h_rows"], r["h_nonnull"], r["hist"]) for r in merged.collect()}
    ds = {r["k"]: (r["h_rows"], r["h_nonnull"], r["hist"]) for r in direct.collect()}
    assert ms == ds


def test_hist_state_null_and_edge_routing(spark):
    df = spark.createDataFrame(
        [(1, None), (1, -3.0), (1, 0.0), (1, 99.99), (1, 100.0), (1, 55.0)],
        "k long, v double",
    )
    st = inc.build_hist_state(df, ["k"], "v", 0.0, 100.0, 10)
    r = st.collect()[0]
    assert r["h_rows"] == 6 and r["h_nonnull"] == 5
    hist = r["hist"]
    assert len(hist) == 12
    assert hist[0] == 1          # -3.0 underflow
    assert hist[11] == 1         # 100.0 overflow (hi is exclusive)
    assert hist[1] == 1          # 0.0 lands in the first in-range bin
    assert hist[10] == 1         # 99.99 in the last in-range bin
    assert hist[6] == 1          # 55.0
    assert sum(hist) == 5


def test_hist_quantiles_values_and_edges(spark):
    """Hand-checked interpolation: 10 values 1..10 in [0,10)x10 bins
    (one value per bin) — p50 target=5 lands in the bin holding 5
    (edges [5,6)), frac=1 → est=6.0; p1 target=1 → est=2.0 (value 1
    sits in bin [1,2)); overflow probe clamps at hi."""
    df = spark.createDataFrame(
        [(1, float(i)) for i in range(1, 11)], "k long, v double"
    )
    st = inc.build_hist_state(df, ["k"], "v", 0.0, 10.0, 10)
    got = {
        r["q"]: r["est_q"]
        for r in inc.hist_quantiles(
            st, [0.01, 0.5, 1.0], 0.0, 10.0, 10
        ).collect()
    }
    assert got[0.01] == 2.0
    assert got[0.5] == 6.0
    # q=1: target=10 → value 10.0 is overflow (hi exclusive) → clamp
    assert got[1.0] == 10.0
    # error-bound property on a denser grid: estimate within one bin
    # width of the exact type-1 quantile
    import random

    rnd = random.Random(7)
    vals = [rnd.uniform(0, 500) for _ in range(5000)]
    df2 = spark.createDataFrame([(1, v) for v in vals], "k long, v double")
    st2 = inc.build_hist_state(df2, ["k"], "v", 0.0, 500.0, 100)
    for r in inc.hist_quantiles(st2, [0.5, 0.95], 0.0, 500.0, 100).collect():
        exact = sorted(vals)[math.ceil(r["q"] * len(vals)) - 1]
        assert abs(r["est_q"] - exact) <= 5.0 + 1e-9, (r["q"], r["est_q"], exact)


def test_hist_all_null_key_dropped(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 3.0)], "k long, v double"
    )
    st = inc.build_hist_state(df, ["k"], "v", 0.0, 10.0, 5)
    out = inc.hist_quantiles(st, [0.5], 0.0, 10.0, 5)
    assert [r["k"] for r in out.collect()] == [2]


def test_maintain_hist_replay_idempotent(spark, tmp_path):
    """Durable histogram fold: batch 0, batch 1, then batch 1 REPLAYED
    — the ledger vetoes the replay (returns False) and the state after
    the replay equals the state after the first fold of batch 1."""
    p = str(tmp_path / "hist_state")
    b0 = spark.createDataFrame(
        [(1, float(v)) for v in (1, 2, 3, 4)], "k long, v double"
    )
    b1 = spark.createDataFrame(
        [(1, float(v)) for v in (5, 6)], "k long, v double"
    )
    assert inc.maintain_hist_state(b0, ["k"], "v", 0.0, 10.0, 10, p, 0)
    assert inc.maintain_hist_state(b1, ["k"], "v", 0.0, 10.0, 10, p, 1)
    after = spark.read.parquet(os.path.join(p, "state")).collect()
    assert inc.maintain_hist_state(b1, ["k"], "v", 0.0, 10.0, 10, p, 1) is False
    replay = spark.read.parquet(os.path.join(p, "state")).collect()
    assert sorted(map(str, after)) == sorted(map(str, replay))
    r = after[0]
    assert r["h_rows"] == 6 and sum(r["hist"]) == 6
    # quantiles read straight off the persisted state
    q = inc.hist_quantiles(
        spark.read.parquet(os.path.join(p, "state")), [0.5], 0.0, 10.0, 10
    ).collect()[0]
    # values 1..6, target ceil(.5*6)=3 → bin [3,4), frac 1 → 4.0
    assert q["est_q"] == 4.0


def test_hist_bin_edge_clamped_in_range(spark):
    """ADVICE r10: with inexact width, a value one ulp below hi used
    to land in the overflow slot (floor((v-lo)/width) == n_bins).
    The clamp files it in bin n_bins on BOTH engines — verified here
    against the mirrored DuckDB CASE."""
    import math

    import duckdb

    lo, hi, n_bins = 0.0, 3.3, 3  # width 1.0999...8: floor hits n_bins
    v = math.nextafter(hi, 0.0)
    assert math.floor((v - lo) / ((hi - lo) / n_bins)) == n_bins  # the trap
    df = spark.createDataFrame([(1, v)], "k long, value double")
    state = inc.build_hist_state(df, ["k"], "value", lo, hi, n_bins)
    hist = state.select("hist").first()[0]
    assert hist[n_bins] == 1 and hist[n_bins + 1] == 0, hist
    width = (hi - lo) / n_bins
    duck = duckdb.connect().execute(
        f"SELECT CASE WHEN CAST({v!r} AS DOUBLE) >= {hi!r} THEN {n_bins + 1} "
        f"ELSE least(CAST(floor((CAST({v!r} AS DOUBLE) - {lo!r}) / {width!r}) "
        f"AS BIGINT) + 1, CAST({n_bins} AS BIGINT)) END"
    ).fetchone()[0]
    assert duck == n_bins


def test_hist_quantiles_rejects_out_of_domain_q(spark):
    df = spark.createDataFrame([(1, 0.5)], "k long, value double")
    state = inc.build_hist_state(df, ["k"], "value", 0.0, 1.0, 4)
    for bad in ([1.5], [0.0], [-0.1], [0.5, 2.0]):
        with pytest.raises(ValueError, match=r"\(0, 1\]"):
            inc.hist_quantiles(state, bad, 0.0, 1.0, 4)


# --- theta state family (r16): bounded-state distinct + direct
# intersection from state ---


def test_theta_state_merge_equals_one_pass_bitexact(spark):
    """finalize(merge(build shards)) == finalize(build(whole)) and the
    raw state arrays agree bit-exactly — "k smallest of the union" is
    the whole merge rule. Small k (8) so saturation actually happens
    on a 300-key planted set."""
    df = spark.range(0, 300).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'x' ELSE 'y' END AS k", "id AS u"
    )
    parts = [df.filter(F.col("u") % 4 == i) for i in range(4)]
    merged = inc.merge_theta_states(
        *[inc.build_theta_state(p, ["k"], "u", 8) for p in parts], k=8
    )
    direct = inc.build_theta_state(df, ["k"], "u", 8)
    m = {r["k"]: r["t_sample"] for r in merged.collect()}
    d = {r["k"]: r["t_sample"] for r in direct.collect()}
    assert m == d
    assert all(len(v) == 8 for v in d.values())  # saturated at k
    fm = {r["k"]: r for r in inc.finalize_theta_state(merged, 8).collect()}
    fd = {r["k"]: r for r in inc.finalize_theta_state(direct, 8).collect()}
    for kk in fd:
        assert fm[kk] == fd[kk]
        assert fm[kk]["theta_k"] == d[kk][7]


def test_theta_state_empty_and_subsaturated_keys(spark):
    """A key whose distinct values are all NULL keeps an EMPTY sample
    (est 0.0); a key below saturation estimates exactly."""
    df = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("a", "u1"), ("b", None)],
        ["k", "u"],
    )
    st = inc.build_theta_state(df, ["k"], "u", 8)
    rows = {r["k"]: r for r in inc.finalize_theta_state(st, 8).collect()}
    assert rows["b"]["n_sampled"] == 0
    assert rows["b"]["est_distinct"] == 0.0
    assert rows["b"]["theta_k"] == 1 << 60
    assert rows["a"]["n_sampled"] == 2
    assert rows["a"]["est_distinct"] == 2.0


def test_theta_state_overlap_direct_intersection(spark):
    """Planted 60k-key universe with known 50% overlap: the direct
    intersection estimate from STATE ONLY lands within 3σ of truth
    (σ ≈ |∩|/√(k−2) for the restricted-sample estimator), and the
    estimate is never negative by construction."""
    df = spark.range(0, 60000).selectExpr("'A' AS s", "id AS u").union(
        spark.range(30000, 90000).selectExpr("'B' AS s", "id AS u")
    )
    k = 256
    state = inc.build_theta_state(df, ["s"], "u", k)
    out = inc.theta_state_overlap(state, k).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["slice_a"], r["slice_b"]) == ("A", "B")
    assert r["est_intersection"] >= 0.0
    assert abs(r["est_intersection"] - 30000) <= 3.0 / (k - 2) ** 0.5 * 30000 + 64


def test_maintain_theta_state_replay_idempotent(spark, tmp_path):
    """Same exactly-once ledger loop as the agg/hist states: a
    replayed batch is a visible no-op (returns False, state
    unchanged), and the folded state equals a from-scratch build."""
    path = str(tmp_path / "thetastate")
    df = spark.range(0, 500).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'p' ELSE 'q' END AS k", "id AS u"
    )
    b1 = df.filter(F.col("u") < 300)
    b2 = df.filter(F.col("u") >= 300)
    assert inc.maintain_theta_state(b1, ["k"], "u", path, batch_id=1, k=16)
    assert inc.maintain_theta_state(b2, ["k"], "u", path, batch_id=2, k=16)
    before = {
        r["k"]: r["t_sample"]
        for r in spark.read.parquet(os.path.join(path, "state")).collect()
    }
    assert (
        inc.maintain_theta_state(b1, ["k"], "u", path, batch_id=1, k=16)
        is False
    )
    after = {
        r["k"]: r["t_sample"]
        for r in spark.read.parquet(os.path.join(path, "state")).collect()
    }
    assert before == after
    direct = {
        r["k"]: r["t_sample"]
        for r in inc.build_theta_state(df, ["k"], "u", 16).collect()
    }
    assert after == direct
