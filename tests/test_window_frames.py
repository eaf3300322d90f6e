"""Unit tests for the analytic-frame window operators (lag/lead,
rolling frame sum), CUBE grouping sets, and exact percentiles —
the §2.5/M4(a) extension surface added on top of the reference
(which has no rank/lag/lead/frame specs, SURVEY §2.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import (
    aggregations as agg,
    windows,
)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        Row(grp="a", seq=1, amount=10.0),
        Row(grp="a", seq=2, amount=20.0),
        Row(grp="a", seq=3, amount=50.0),
        Row(grp="a", seq=4, amount=40.0),
        Row(grp="b", seq=1, amount=5.0),
        Row(grp="b", seq=2, amount=7.0),
    ]
    return spark.createDataFrame(rows)


def test_lag_lead_delta_values(series):
    out = {
        (r.grp, r.seq): r
        for r in windows.lag_lead_delta(
            series, "grp", ["seq"], "amount"
        ).collect()
    }
    assert out[("a", 1)].prev_value is None
    assert out[("a", 1)].next_value == 20.0
    assert out[("a", 1)].delta_prev is None
    assert out[("a", 3)].prev_value == 20.0
    assert out[("a", 3)].delta_prev == 30.0
    # frames never cross the partition boundary
    assert out[("a", 4)].next_value is None
    assert out[("b", 1)].prev_value is None


def test_rolling_sum_frame(series):
    out = {
        (r.grp, r.seq): r
        for r in windows.rolling_sum(
            series, "grp", ["seq"], "amount", preceding=2
        ).collect()
    }
    assert out[("a", 1)].rolling_sum == 10.0 and out[("a", 1)].n_in_frame == 1
    assert out[("a", 2)].rolling_sum == 30.0 and out[("a", 2)].n_in_frame == 2
    assert out[("a", 3)].rolling_sum == 80.0 and out[("a", 3)].n_in_frame == 3
    # frame slides: seq 4 covers rows 2..4 only
    assert out[("a", 4)].rolling_sum == 110.0
    assert out[("b", 2)].rolling_sum == 12.0


def test_cube_has_all_grouping_sets(series):
    out = agg.cube_counts(series, ["grp", "seq"], "amount").collect()
    by_key = {(r.grp, r.seq): (r.n_rows, r.sum_amount) for r in out}
    # 2^2 grouping-set levels: (grp,seq), (grp,·), (·,seq), grand total
    assert by_key[("a", None)] == (4, 120.0)
    assert by_key[(None, None)] == (6, 132.0)
    assert by_key[(None, 1)] == (2, 15.0)
    assert by_key[("b", 2)] == (1, 7.0)


def _frame_rows():
    from hypothesis import strategies as st

    return st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )


def test_frame_properties(spark):
    from hypothesis import HealthCheck, given, settings

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=_frame_rows())
    def inner(rows):
        df = spark.createDataFrame(
            [Row(grp=g, seq=i, amount=round(a, 2)) for i, (g, a) in enumerate(rows)]
        )
        # preceding=0 frame degenerates to the row itself
        solo = windows.rolling_sum(df, "grp", ["seq"], "amount", preceding=0)
        for r in solo.collect():
            assert r.n_in_frame == 1 and abs(r.rolling_sum - r.amount) < 1e-9
        # lag/lead are mutually consistent along each group's sequence
        out = sorted(
            windows.lag_lead_delta(df, "grp", ["seq"], "amount").collect(),
            key=lambda r: (r.grp, r.seq),
        )
        for prev_r, r in zip(out, out[1:]):
            if prev_r.grp == r.grp:
                assert prev_r.next_value == r.amount
                assert r.prev_value == prev_r.amount
                assert abs(r.delta_prev - (r.amount - prev_r.amount)) < 1e-9

    inner()


def test_percentiles_exact_interpolation(spark):
    df = spark.createDataFrame(
        [Row(k="x", v=float(i)) for i in range(1, 5)]  # 1,2,3,4
    )
    row = agg.percentiles_exact(df, "k", "v").collect()[0]
    # type-7: p = lo + (n-1)*q fractional index
    assert row.p25 == 1.75
    assert row.p50 == 2.5
    assert row.p75 == 3.25


def test_percentiles_approx_within_rank_error_of_exact(spark, sf_dir):
    """The mergeable-sketch tier must land within its advertised rank
    error of the exact tier on real data: with accuracy=10k the GK
    summary guarantees rank error ≤ n/10k, so on lineitem's roughly
    uniform price column the VALUE error stays well under 1% of the
    column range per group."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in agg.percentiles_exact(
            li, "l_returnflag", "l_extendedprice"
        ).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in agg.percentiles_approx(
            li, "l_returnflag", "l_extendedprice"
        ).collect()
    }
    assert set(exact) == set(approx) and exact
    lo, hi = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    tol = 0.01 * (float(hi) - float(lo))
    for key, e in exact.items():
        a = approx[key]
        for p in ("p25", "p50", "p75"):
            assert abs(e[p] - a[p]) <= tol, (key, p, e[p], a[p])


def test_rate_anomalies_flags_crafted_spike(spark):
    import datetime as dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        rate_anomalies,
    )

    rows = []
    # 10 baseline days alternating 10/12 events, then a 50-event spike
    for d in range(1, 11):
        for i in range(10 if d % 2 else 12):
            rows.append(("a", dt.datetime(2024, 3, d, 12, i % 60, 0)))
    for i in range(50):
        rows.append(("a", dt.datetime(2024, 3, 11, 12 + i // 60, i % 60, 0)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = {r["bucket_ts"].day: r for r in rate_anomalies(
        df, "ts", "event_type"
    ).collect()}
    spike = out[11]
    assert spike["is_anomaly"] is True and spike["z"] > 2.0
    # the spike is excluded from its own baseline: trailing mean stays
    # at the alternating-baseline level, nowhere near 50
    assert spike["trailing_mean"] < 12.1
    # day 1 has no trailing window at all -> NULL z, false flag
    assert out[1]["z"] is None and out[1]["is_anomaly"] is False
    # ordinary baseline days are not anomalous
    assert not any(out[d]["is_anomaly"] for d in range(1, 11))


def test_funnel_stages_requires_strict_order(spark):
    import datetime as dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        funnel_stages,
    )

    T = lambda m: dt.datetime(2024, 5, 1, 12, m, 0)
    rows = [
        # u1 completes in order
        (1, T(0), "view"), (1, T(1), "click"), (1, T(2), "purchase"),
        # u2: purchase BEFORE any view — must stop at stage 1
        (2, T(0), "purchase"), (2, T(1), "view"),
        # u3: click before view, then view only -> stage 1
        (3, T(0), "click"), (3, T(1), "view"),
        # u4: view, then a purchase with no intervening click -> stage 1
        (4, T(0), "view"), (4, T(1), "purchase"),
        # u5: nothing relevant
        (5, T(0), "error"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in funnel_stages(
        df, "ts", "user_id", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out[1]["stages_completed"] == 3
    assert out[1]["t_purchase"] == T(2)
    assert out[2]["stages_completed"] == 1
    assert out[2]["t_click"] is None
    assert out[3]["stages_completed"] == 1
    assert out[4]["stages_completed"] == 1
    assert out[5]["stages_completed"] == 0
    assert out[5]["t_view"] is None


def test_equi_depth_bins_allocation_and_ranges(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        equi_depth_bins,
    )

    # 7 rows into 3 bins: SQL-standard NTILE puts the remainder in the
    # FIRST buckets -> sizes 3,2,2; ranges must be disjoint ascending
    rows = [("g", i, float(10 * i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, ["grp", "k", "v"])
    out = {r["bin"]: r for r in equi_depth_bins(
        df, "grp", ["v", "k"], "v", n_bins=3
    ).collect()}
    assert [out[b]["n_rows"] for b in (1, 2, 3)] == [3, 2, 2]
    assert (out[1]["bin_min"], out[1]["bin_max"]) == (10.0, 30.0)
    assert (out[2]["bin_min"], out[2]["bin_max"]) == (40.0, 50.0)
    assert (out[3]["bin_min"], out[3]["bin_max"]) == (60.0, 70.0)


def test_equi_depth_matches_literal_ntile(spark):
    """The r7 scale-safe rank arithmetic must replicate NTILE's
    larger-buckets-first allocation EXACTLY — probed on group sizes
    that exercise every branch: n % k != 0, n < k, n == k."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        equi_depth_bins,
    )

    rows = []
    for g, n in [("a", 23), ("b", 7), ("c", 10), ("d", 1)]:
        rows += [(g, i, float(i * 3 % 17)) for i in range(n)]
    df = spark.createDataFrame(rows, ["grp", "uid", "val"])
    got = equi_depth_bins(df, "grp", ["val", "uid"], "val").collect()
    w = W.partitionBy("grp").orderBy("val", "uid")
    want = (
        df.withColumn("_b", F.ntile(10).over(w))
        .groupBy("grp", "_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("val").alias("bin_min"),
            F.max("val").alias("bin_max"),
        )
        .select(
            "grp",
            F.col("_b").cast("long").alias("bin"),
            "n_rows",
            "bin_min",
            "bin_max",
        )
        .collect()
    )
    key = lambda r: (r["grp"], r["bin"])
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, want), key=lambda t: (t[0], t[1])
    )


def test_event_transitions_matrix_and_shares(spark):
    import datetime as dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        event_transitions,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, t0 + dt.timedelta(minutes=i), u, typ)

    rows = [
        ev(0, 1, "view"), ev(1, 1, "click"), ev(2, 1, "view"),
        ev(3, 1, "click"), ev(4, 2, "view"), ev(5, 2, "purchase"),
        ev(6, 3, "view"),  # terminal: no transition
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["share"])
        for r in event_transitions(
            df, "ts", "user_id", "event_type", "event_id"
        ).collect()
    }
    assert out[("view", "click")] == (2, 0.666667)
    assert out[("view", "purchase")] == (1, 0.333333)
    assert out[("click", "view")] == (1, 1.0)
    assert ("purchase", "view") not in out  # cross-user pairs never form


def test_funnel_conversion_window_binds(spark):
    """A click 3 days after the first view is outside a 48h window:
    stages stop at 1; the unbounded funnel reaches 2."""
    import datetime as dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        funnel_stages,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "view"),
        (2, t0 + dt.timedelta(days=3), 7, "click"),
        (3, t0 + dt.timedelta(days=3, hours=1), 7, "purchase"),
        # user 8 converts fast: all inside the window
        (4, t0, 8, "view"),
        (5, t0 + dt.timedelta(hours=1), 8, "click"),
        (6, t0 + dt.timedelta(hours=2), 8, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    steps = ["view", "click", "purchase"]
    unbounded = {r["user_id"]: r["stages_completed"] for r in funnel_stages(
        df, "ts", "user_id", "event_type", steps
    ).collect()}
    bounded = {r["user_id"]: r["stages_completed"] for r in funnel_stages(
        df, "ts", "user_id", "event_type", steps, max_gap_seconds=172_800
    ).collect()}
    assert unbounded == {7: 3, 8: 3}
    assert bounded == {7: 1, 8: 3}


def test_skew_safe_lag_lead_matches_plain(spark):
    """The skew-safe rewrite must be BIT-IDENTICAL to the plain
    partitioned window on every row — probed with forced partition
    splits so seam patching actually fires (num_partitions far above
    rows-per-group), including null values in the value column (the
    rn==1/rn==cnt guards must not confuse 'previous value is null'
    with 'no previous row')."""
    rows = []
    for g, n in [("a", 37), ("b", 3), ("c", 1), ("d", 12)]:
        for i in range(n):
            amount = None if (g == "a" and i % 5 == 0) else float(i * 7 % 23)
            rows.append((g, i, amount))
    df = spark.createDataFrame(rows, "grp string, seq int, amount double")
    plain = windows.lag_lead_delta(df, "grp", ["seq"], "amount")
    safe = windows.lag_lead_delta_skew_safe(
        df, "grp", ["seq"], "amount", num_partitions=9
    )
    key = lambda r: (r["grp"], r["seq"])
    assert sorted(map(tuple, plain.collect()), key=lambda t: (t[0], t[1])) \
        == sorted(map(tuple, safe.collect()), key=lambda t: (t[0], t[1]))


def test_skew_safe_lag_lead_hot_group(spark):
    """One group holding every row (the whale-user shape the operator
    exists for): seams between EVERY pair of adjacent partitions must
    chain correctly end to end."""
    df = spark.createDataFrame(
        [("u", i, float(i)) for i in range(200)],
        "grp string, seq int, amount double",
    )
    out = sorted(
        windows.lag_lead_delta_skew_safe(
            df, "grp", ["seq"], "amount", num_partitions=16
        ).collect(),
        key=lambda r: r["seq"],
    )
    assert len(out) == 200
    assert out[0].prev_value is None and out[-1].next_value is None
    for prev_r, r in zip(out, out[1:]):
        assert r.prev_value == prev_r.amount
        assert prev_r.next_value == r.amount
        assert r.delta_prev == 1.0


def test_skew_safe_lag_lead_plan_shape(spark, sf_dir):
    """Plan contract: the data-sized path goes through ONE range
    partitioning (no hash exchange keyed on the group alone — that is
    the skew trap) and the seam frame comes back via a broadcast hash
    join, so no stage's task count is bounded by group cardinality."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import (
        q_skew_lag,
    )

    plan = q_skew_lag(spark, sf_dir)._jdf.queryExecution().toString()
    assert "rangepartitioning" in plan
    assert "BroadcastHashJoin" in plan or "broadcast" in plan
    # the plain-window shape this operator replaces must NOT appear:
    # an exchange hash-partitioned on o_custkey ALONE (the seam-frame
    # window hashes on it, but over metadata rows; the data-sized
    # window hashes on (_pid, o_custkey))
    import re

    data_hash = re.findall(r"hashpartitioning\(o_custkey[^,]*, 32\)", plan)
    # every o_custkey-only hash exchange must sit above the tiny
    # bounds aggregate, never above the full scan; the window over
    # data rows must carry _pid in its key
    assert "hashpartitioning(_pid" in plan


def test_skew_safe_running_sum_matches_plain(spark):
    """Chunked decimal accumulation + null-aware base merge must equal
    the plain cumulative window bit-for-bit — including a group whose
    FIRST chunk is entirely null (running sum stays null until the
    first non-null value, exactly like SQL SUM)."""
    from pyspark.sql import Window as W

    rows = []
    for g, n in [("a", 40), ("b", 5), ("c", 1)]:
        for i in range(n):
            v = None if (g == "a" and i < 12) else float((i * 13) % 97) / 4
            rows.append((g, i, v))
    df = spark.createDataFrame(rows, "grp string, seq int, amount double")
    w = (
        W.partitionBy("grp")
        .orderBy("seq")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    plain = df.select(
        "grp",
        "seq",
        "amount",
        F.sum(F.col("amount").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_sum"),
    )
    safe = windows.grouped_running_sum_skew_safe(
        df, "grp", ["seq"], "amount", num_partitions=11
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, safe.collect())
    )
    # leading all-null chunk: rows 0..11 of group a must be null
    out = {(r.grp, r.seq): r.running_sum for r in safe.collect()}
    assert all(out[("a", i)] is None for i in range(12))
    assert out[("a", 12)] is not None


def test_gap_fill_forward_semantics(spark):
    from datetime import datetime as dt

    rows = [
        # key "a": observed hours 01 and 04 -> gaps at 02, 03, 05
        ("a", dt(2024, 1, 1, 1, 15), 10.0),
        ("a", dt(2024, 1, 1, 1, 45), 20.0),
        ("a", dt(2024, 1, 1, 4, 5), 7.0),
        # key "b": first observation at hour 03 -> leading nulls 01, 02
        ("b", dt(2024, 1, 1, 3, 30), 5.0),
        # key "c" fixes the global grid span [01:00 .. 05:00]
        ("c", dt(2024, 1, 1, 5, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = windows.gap_fill_forward(df, "ts", "k", "v")
    got = {
        (r.k, r.bucket_ts.hour): (r.n_obs, r.filled_sum, r.is_gap)
        for r in out.collect()
    }
    # dense grid: 3 keys x 5 hours
    assert len(got) == 15
    assert got[("a", 1)] == (2, 30.0, False)
    assert got[("a", 2)] == (0, 30.0, True)      # carried forward
    assert got[("a", 3)] == (0, 30.0, True)
    assert got[("a", 4)] == (1, 7.0, False)      # new observation wins
    assert got[("a", 5)] == (0, 7.0, True)
    # leading gaps before a key's first observation stay null
    assert got[("b", 1)] == (0, None, True)
    assert got[("b", 2)] == (0, None, True)
    assert got[("b", 3)] == (1, 5.0, False)
    assert got[("c", 5)] == (1, 1.0, False)


def test_gap_fill_forward_rejects_misaligned_step(spark):
    import pytest

    from datetime import datetime as dt

    df = spark.createDataFrame(
        [("a", dt(2024, 1, 1, 1), 1.0)], ["k", "ts", "v"]
    )
    # 30-minute grid points never match hour-truncated buckets
    with pytest.raises(ValueError, match="multiple"):
        windows.gap_fill_forward(
            df, "ts", "k", "v", step="30 minutes", bucket_unit="hour"
        )
    # free-form SQL can't reach F.expr through `step`
    with pytest.raises(ValueError, match="must look like"):
        windows.gap_fill_forward(
            df, "ts", "k", "v", step="1 hour); DROP TABLE x"
        )
    # a coarser-but-aligned step is fine: 2-hour grid on hour buckets
    out = windows.gap_fill_forward(
        df, "ts", "k", "v", step="2 hours", bucket_unit="hour"
    )
    assert out.count() == 1


def test_winsorize_stats_hand_computed(spark):
    # group "a": values 1..20 -> lo rank ceil(.05*20)=1 -> cut 1;
    # hi rank ceil(.95*20)=19 -> cut 19; one value (20) above.
    rows = [("a", float(v), v) for v in range(1, 21)]
    rows += [("b", 100.0, 1), ("b", 200.0, 2)]  # tiny group
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    out = {
        r.g: r
        for r in windows.winsorize_stats(df, "g", "v", ["id"]).collect()
    }
    a = out["a"]
    assert (a.n_rows, a.lo_cut, a.hi_cut) == (20, 1.0, 19.0)
    assert (a.n_below, a.n_above) == (0, 1)
    # clamped sum = sum(1..19) + 19 = 209
    assert abs(a.winsor_mean - 209 / 20) < 1e-9
    b = out["b"]
    # n=2: lo rank 1, hi rank 2 -> cuts are min/max, nothing clipped
    assert (b.lo_cut, b.hi_cut, b.n_below, b.n_above) == (
        100.0, 200.0, 0, 0,
    )


def test_winsorize_stats_excludes_null_values(spark):
    # NULL values must not enter the rank order (a cut rank landing on
    # a NULL row) nor the winsor_mean denominator
    rows = [("a", float(v), v) for v in range(1, 21)]
    rows += [("a", None, 100 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, v double, id int")
    out = windows.winsorize_stats(df, "g", "v", ["id"]).first()
    assert (out.n_rows, out.lo_cut, out.hi_cut) == (20, 1.0, 19.0)
    assert abs(out.winsor_mean - 209 / 20) < 1e-9
