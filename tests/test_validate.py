"""Declarative validation-suite tests: exact metrics, verdicts, and
the one-scan plan contract."""

from __future__ import annotations

import pytest

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import validate as V
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans import queries as Q


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", 250.0),   # duplicate key with row 4
        (2, "b", -5.0),    # negative + out of bounds
        (3, None, 99.0),   # null category
        (4, "zz", 401.0),  # bad category + out of bounds
    ]
    return spark.createDataFrame(rows, ["k", "cat", "v"])


def test_validate_exact_metrics_and_verdicts(dirty):
    out = {r["check"]: (r["metric"], r["passed"]) for r in V.validate(
        dirty,
        [
            V.min_rows(5),
            V.completeness("cat"),
            V.uniqueness("k"),
            V.bounds("v", 0.0, 400.0),
            V.accepted_values("cat", ["a", "b"]),
            V.non_negative("v"),
        ],
    ).collect()}
    assert out["min_rows(5)"] == (5.0, True)
    assert out["completeness(cat)"] == (0.8, False)
    assert out["uniqueness(k)"] == (0.8, False)  # 4 distinct / 5 rows
    assert out["bounds(v,0.0,400.0)"] == (2.0, False)
    assert out["accepted_values(cat)"] == (1.0, False)  # NULL is not a violation
    assert out["non_negative(v)"] == (1.0, False)


def test_validate_passing_suite(dirty):
    out = {r["check"]: r["passed"] for r in V.validate(
        dirty, [V.min_rows(2), V.completeness("cat", min_ratio=0.5)]
    ).collect()}
    assert all(out.values())


def test_validate_rejects_empty_suite(dirty):
    with pytest.raises(ValueError):
        V.validate(dirty, [])


def test_validation_single_scan_plan(spark, sf_dir):
    """The suite's contract: N checks, ONE scan, ONE global aggregate
    pass (count-distinct rides the same aggregate via Expand)."""
    df = Q.q_validation(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 1


def test_q_validation_mixes_verdicts(spark, sf_dir):
    out = {r["check"]: r["passed"] for r in Q.q_validation(
        spark, sf_dir
    ).collect()}
    assert len(out) == 6
    # 'error' events exist at every sf — the accepted-values check is
    # the stable deliberate failure (the [0,400] bound only trips at
    # sf >= 0.01, where max(value) ≈ 490)
    assert out["accepted_values(event_type)"] is False
    assert out["completeness(ts)"] is True
    assert out["uniqueness(event_id)"] is True
    assert out["min_rows(1000)"] is True


def test_rare_violation_not_masked_by_rounding(spark):
    """ADVICE r6: one duplicate key / one NULL among millions rounds
    the ratio metric to 1.0 — the verdict must still FAIL because it
    is computed from exact counts, not the rounded ratio. 2e6 rows
    keeps the test fast while putting the violation at 5e-7 < half of
    the 6dp rounding quantum."""
    from pyspark.sql import functions as F

    df = spark.range(2_000_000).select(
        # id 0 duplicates id 1's key; id 0 carries a NULL payload
        F.when(F.col("id") == 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.when(F.col("id") == 0, F.lit(None)).otherwise(F.col("id")).alias("v"),
    )
    out = {r["check"]: (r["metric"], r["passed"]) for r in V.validate(
        df, [V.uniqueness("k"), V.completeness("v")]
    ).collect()}
    assert out["uniqueness(k)"] == (1.0, False)
    assert out["completeness(v)"] == (1.0, False)


def test_profile_table_stats(spark):
    """Per-column stats: null/distinct counts exact, mean over
    non-null values only, temporal min/max in the fixed-width
    microsecond format, non-profiled slots null."""
    import datetime as dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
        profile_table,
    )

    rows = [
        (1, 10.0, "b", dt.datetime(2024, 3, 1, 12, 0, 0)),
        (2, None, "a", dt.datetime(2024, 3, 2, 12, 30, 15, 250000)),
        (3, 20.0, "a", None),
        (4, 30.0, None, dt.datetime(2024, 3, 1, 12, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "id long, v double, s string, ts timestamp"
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"id", "v", "s", "ts"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 3
    assert out["v"]["mean"] == 20.0  # mean over the 3 non-null values
    assert (out["v"]["min_num"], out["v"]["max_num"]) == (10.0, 30.0)
    assert out["v"]["min_str"] is None
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert (out["s"]["min_str"], out["s"]["max_str"]) == ("a", "b")
    assert out["s"]["mean"] is None and out["s"]["min_num"] is None
    assert out["ts"]["n_nulls"] == 1 and out["ts"]["n_distinct"] == 2
    assert out["ts"]["min_str"] == "2024-03-01 12:00:00.000000"
    assert out["ts"]["max_str"] == "2024-03-02 12:30:15.250000"
    assert out["id"]["n_distinct"] == 4 and out["id"]["n_nulls"] == 0


def test_profile_table_split_aggregate_plan(spark):
    """The profiler's r16 plan contract (optimization round, guide
    §7.2): the count-distinct Expand path and the string-buffered
    min/max live in SEPARATE sibling aggregates. A fused aggregate
    planned the whole ×(N+1)-expanded table as a SortAggregate chain
    (string buffers disqualify HashAggregate) — two full sorts of the
    expanded data. The split keeps every aggregate over the Expand a
    HashAggregate and gives the string pass its own expand-free,
    sort-free aggregate; the two 1-row results recombine via a cross
    join. Cost: one extra column-pruned scan of the source — pinned
    here as exactly two source relations."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
        profile_table,
    )

    df = spark.range(100).selectExpr(
        "id", "id * 2 AS a", "CAST(id AS STRING) AS s"
    )
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # two pruned scans: the distinct+numeric pass and the string pass
    assert plan.count("Range (0, 100") == 2
    assert "Expand" in plan  # multi-distinct rides the standard Expand
    # the expensive (expanded) path must never fall back to
    # SortAggregate: everything between the Expand and its final
    # 1-row result is hash-aggregable
    assert "HashAggregate" in plan
    # string min/max no longer ride the Expand: no Sort anywhere in
    # the plan (the string aggregate has no grouping keys, so even its
    # SortAggregate plans without a physical Sort)
    assert "+- Sort " not in plan, plan


def test_benford_audit_digits_and_shares(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
        BENFORD_SHARES,
        benford_audit,
    )

    df = spark.createDataFrame(
        [(1.0,), (19.5,), (0.002,), (-345.0,), (912.0,), (0.0,), (None,)],
        ["x"],
    )
    rows = {r.digit: r for r in benford_audit(df, ["x"]).collect()}
    # digits: 1 (1.0), 1 (19.5), 2 (0.002), 3 (-345 via abs), 9 (912);
    # zero and null excluded
    assert {d: r.n_obs for d, r in rows.items()} == {1: 2, 2: 1, 3: 1, 9: 1}
    assert abs(rows[1].obs_share - 0.4) < 1e-9
    assert abs(rows[1].benford_share - round(BENFORD_SHARES[1], 6)) < 1e-12


def test_fk_audit_counts_planted_orphans(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
        fk_audit,
    )

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    child = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 99), (4, 98), (5, None)], "id long, fk long"
    )
    out = {
        r["edge"]: (r["orphan_count"], r["passed"])
        for r in fk_audit([(child, "fk", parent, "pk", "child->parent")]).collect()
    }
    # two orphans (99, 98); the NULL fk is completeness's job, not ours
    assert out == {"child->parent": (2, False)}


def test_psi_identical_distributions_not_shifted(spark):
    """Same distribution in both slices → every (p−q) term is 0 →
    PSI exactly 0.0 and not shifted."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
        psi_report,
    )

    rows = [("ref", v) for v in (50, 150, 250, 350, 450, 550)] + [
        ("cur", v) for v in (50, 150, 250, 350, 450, 550)
    ]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = psi_report(
        df, "val", "grp", "ref", [100.0, 200.0, 300.0, 400.0, 500.0]
    ).collect()
    assert len(out) == 1
    assert out[0]["slice"] == "cur"
    assert out[0]["psi"] == 0.0 and out[0]["shifted"] is False


def test_psi_shifted_slice_flags(spark):
    """Reference spread across bins, current slice concentrated in
    ONE bin → PSI far above 0.2; hand-check against the same add-half
    smoothed formula."""
    import math

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
        psi_report,
    )

    ref_vals = [50, 150, 250, 350, 450, 550]          # one per bin
    cur_vals = [50] * 6                                # all in bin 0
    rows = [("ref", v) for v in ref_vals] + [("cur", v) for v in cur_vals]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = psi_report(
        df, "val", "grp", "ref", [100.0, 200.0, 300.0, 400.0, 500.0]
    ).collect()[0]
    assert out["shifted"] is True
    nbins, smooth = 6, 3.0
    expected = 0.0
    for b in range(nbins):
        c = 6 if b == 0 else 0
        p = (c + 0.5) / (6 + smooth)
        q = (1 + 0.5) / (6 + smooth)
        expected += round((p - q) * math.log(p / q), 6)
    assert out["psi"] == pytest.approx(expected, abs=1e-9)


def test_psi_rejects_unsorted_edges_and_skips_nulls(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.validate import (
        psi_report,
    )

    with pytest.raises(ValueError, match="ascending"):
        psi_report(
            spark.createDataFrame([("a", 1)], ["grp", "val"]),
            "val", "grp", "a", [5.0, 1.0],
        )
    rows = [("ref", 50), ("ref", 150), ("cur", 50), ("cur", 150),
            ("cur", None)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = psi_report(df, "val", "grp", "ref", [100.0]).collect()[0]
    # the NULL row is excluded: cur matches ref exactly → PSI 0
    assert out["psi"] == 0.0


def test_psi_missing_reference_slice_fails_loudly(spark):
    """An absent reference slice must raise at execution, not return
    an empty (monitor-gone-dark) report."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [("cur", 50), ("cur", 150)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = V.psi_report(df, "val", "grp", "missing_ref", [100.0])
    with pytest.raises(SparkRuntimeException, match="missing_ref"):
        out.collect()
