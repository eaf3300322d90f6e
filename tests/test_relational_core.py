"""Unit tests for the parity relational core (SURVEY §2 operator IDs),
on tiny in-memory frames + the testdata tables."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import (
    aggregations as agg,
    ordering,
    projections as proj,
    sets,
    windows,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.schemas import TRIP_SCHEMA
from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def trips(spark):
    rows = []
    for i in range(20):
        rows.append(
            Row(
                VendorID=1 + i % 2,
                tpep_pickup_datetime=(
                    None if i % 7 == 3 else datetime(2024, 1, 1, 8, i)
                ),
                tpep_dropoff_datetime=datetime(2024, 1, 1, 9, i),
                passenger_count=float(1 + i % 3),
                trip_distance=1.5 * i,
                RatecodeID=1.0,
                store_and_fwd_flag="N",
                PULocationID=100 + i % 3,
                DOLocationID=200 + i % 2,
                payment_type=1,
                fare_amount=10.0 + i,
                extra=0.5,
                mta_tax=0.5,
                tip_amount=2.0,
                tolls_amount=0.0,
                improvement_surcharge=1.0,
                total_amount=14.0 + i,
                congestion_surcharge=2.5,
                Airport_fee=0.0,
            )
        )
    return spark.createDataFrame(rows, TRIP_SCHEMA)


def test_trip_schema_shape(trips):
    assert len(trips.schema.fields) == 19
    assert trips.schema.fields[-1].name == "Airport_fee"


def test_p3_null_repair(trips):
    repaired = proj.repair_null_timestamps(trips)
    assert (
        repaired.filter(F.col("tpep_pickup_datetime").isNull()).count() == 0
    )
    # untouched rows keep their original value
    kept = repaired.filter(F.col("tpep_pickup_datetime") < datetime(2025, 1, 1))
    assert kept.count() >= 17


def test_p2_metadata_and_p1_projection(spark, trips):
    enriched = proj.repair_null_timestamps(
        proj.add_processing_metadata(trips, 7)
    )
    enriched.createOrReplaceTempView("taxi_trips")
    out = spark.sql(proj.TRIP_PROJECTION_SQL)
    assert out.columns[0] == "batch_id"
    assert len(out.columns) == 11
    assert out.select("batch_id").distinct().collect()[0][0] == "7"


def test_a1_count_by_key_sums_to_input(trips):
    counted = agg.count_by_key(trips, "PULocationID", tag_value="pickup_location")
    total = counted.agg(F.sum("trip_count")).collect()[0][0]
    assert total == trips.count()
    tags = counted.select("aggregation_type").distinct().collect()
    assert [t[0] for t in tags] == ["pickup_location"]


def test_u1_union_tagged_schema_stable(trips):
    p = agg.count_by_key(trips, "PULocationID", tag_value="pickup_location")
    d = agg.count_by_key(trips, "DOLocationID", tag_value="dropoff_location")
    u = sets.union_tagged(
        [
            p.withColumnRenamed("PULocationID", "location_id"),
            d.withColumnRenamed("DOLocationID", "location_id"),
        ]
    )
    assert set(u.columns) == {"location_id", "trip_count", "aggregation_type"}
    assert u.count() == p.count() + d.count()


def test_w1_row_number_slice(trips):
    s = windows.row_number_slice(
        trips, ["tpep_dropoff_datetime"], start=5, batch_size=5
    )
    assert s.count() == 5
    assert "row_num" not in s.columns


def test_global_row_index_matches_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    fast = windows.global_row_index(ev, ["ts", "event_id"])
    from pyspark.sql import Window

    slow = ev.withColumn(
        "row_idx_ref",
        F.row_number().over(Window.orderBy("ts", "event_id")).cast("long"),
    )
    joined = fast.join(slow, ["event_id", "ts"])
    assert joined.filter(F.col("row_idx") != F.col("row_idx_ref")).count() == 0


def test_o4_topk_deterministic(trips):
    top = ordering.busiest_keys(trips, "PULocationID", 2).collect()
    assert len(top) == 2
    assert top[0]["trip_count"] >= top[1]["trip_count"]


def test_decimal_sum_exactness(spark):
    # 0.1 + 0.2 style accumulation: decimal path must be exact
    df = spark.createDataFrame([(0.1,)] * 1000, ["x"])
    out = df.agg(agg.decimal_sum("x").alias("s")).collect()[0]["s"]
    assert out == 100.0


def test_rollup_has_grand_total(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    r = agg.rollup_counts(li, ["l_returnflag", "l_linestatus"], "l_extendedprice")
    grand = r.filter(
        F.col("l_returnflag").isNull() & F.col("l_linestatus").isNull()
    ).collect()
    assert len(grand) == 1
    assert grand[0]["n_rows"] == li.count()


def test_global_running_sum_fractional_dtype(spark):
    """ADVICE r4: a double value column must accumulate natively —
    no 1e-6 decimal rounding, no silent NULL overflow past decimal
    range, and the output keeps its fractional dtype instead of being
    truncated to long."""
    rows = [(i, 0.001 * i) for i in range(1, 201)] + [(201, 1e25)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = windows.global_running_sum(df, ["k"], "v", num_partitions=4)
    assert dict(out.dtypes)["running_sum"] == "double"
    got = {r.k: r.running_sum for r in out.collect()}
    # fractional precision survives (0.001*1 + ... exact to double ulp)
    expect = 0.0
    for i in range(1, 201):
        expect += 0.001 * i
        assert abs(got[i] - expect) < 1e-9
    # magnitude beyond decimal(28,6) range doesn't overflow to NULL
    assert got[201] is not None and got[201] > 1e24


def test_global_running_sum_integral_stays_long(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 51)], ["k", "v"]
    )
    out = windows.global_running_sum(df, ["k"], "v", num_partitions=4)
    assert dict(out.dtypes)["running_sum"] == "bigint"
    got = {r.k: r.running_sum for r in out.collect()}
    assert got[50] == 50 * 51 // 2


def test_global_running_sum_decimal_stays_exact(spark):
    from decimal import Decimal

    big = Decimal("90071992547409.91")  # cents lost if routed via double
    rows = [(i, big) for i in range(4)]
    df = spark.createDataFrame(rows, "k long, v decimal(18,2)")
    out = windows.global_running_sum(df, ["k"], "v", num_partitions=2)
    got = {r.k: r.running_sum for r in out.collect()}
    assert dict(out.dtypes)["running_sum"] == "decimal(38,2)"
    assert got[3] == big * 4  # exact — 360287970189639.64


def test_percentiles_approx_checked_ignores_nulls(spark):
    rows = [("g", float(i)) for i in range(1, 101)]
    rows += [("g", None)] * 100
    df = spark.createDataFrame(rows, "k string, v double")
    out = agg.percentiles_approx_checked(df, "k", "v").collect()[0]
    # n counts the 100 non-null sketch inputs, and the rank-bound
    # booleans hold — NULLs must not shift the exact-rank target
    assert out.n_rows == 100
    assert out.p25_in_bounds and out.p50_in_bounds and out.p75_in_bounds


def test_grouped_correlation_exact_and_degenerate(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.aggregations import (
        grouped_correlation,
    )

    rows = [
        ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),   # r = +1
        ("d", 1.0, 3.0), ("d", 2.0, 2.0), ("d", 3.0, 1.0),   # r = -1
        ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0),   # zero y-var
        ("c", 5.0, 7.0),                                      # single row
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in grouped_correlation(df, "g", "x", "y").collect()}
    assert out["a"]["pearson_r"] == 1.0
    assert out["a"]["sample_cov"] == 2.0
    assert out["d"]["pearson_r"] == -1.0
    assert out["b"]["pearson_r"] is None   # zero variance -> NULL, never NaN
    assert out["b"]["sample_cov"] == 0.0
    assert out["c"]["pearson_r"] is None and out["c"]["sample_cov"] is None
    assert out["a"]["n_rows"] == 3


def test_cohort_retention_staggered_cohorts(spark):
    import datetime as dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.aggregations import (
        cohort_retention,
    )

    D = lambda day, h=9: dt.datetime(2024, 1, day, h, 0, 0)
    rows = [
        # u1: first seen week of Jan 1 (Mon), returns weeks +1 and +2
        (1, D(2)), (1, D(9)), (1, D(16)),
        # u2: same cohort as u1, returns only week +2 (skips +1)
        (2, D(3)), (2, D(17)),
        # u3: cohort of Jan 8, never returns
        (3, D(10)),
        # u1 twice in one week must count once (distinct users)
        (1, D(4)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(r["cohort_week"].day, r["period_offset"]): r["n_active"]
           for r in cohort_retention(df, "ts", "user_id").collect()}
    assert out == {
        (1, 0): 2,  # u1+u2 in their own week (u1's two visits count once)
        (1, 1): 1,  # only u1 returned the next week
        (1, 2): 2,  # both returned two weeks out
        (8, 0): 1,  # u3's own cohort
    }


def test_time_decayed_agg_weights(spark):
    """Half-life semantics: an event exactly one half-life old weighs
    0.5; at the reference instant it weighs 1.0; sums accumulate
    exactly."""
    import datetime as dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.aggregations import (
        time_decayed_agg,
    )

    ref = "2024-02-01 00:00:00"
    r = dt.datetime(2024, 2, 1)
    rows = [
        (r, "a", 10.0),                          # age 0 -> w 1.0
        (r - dt.timedelta(days=7), "a", 10.0),   # one half-life -> 0.5
        (r - dt.timedelta(days=14), "b", 4.0),   # two -> 0.25
    ]
    df = spark.createDataFrame(rows, ["ts", "k", "value"])
    out = {
        x["k"]: x
        for x in time_decayed_agg(df, "ts", "k", "value", 7.0, ref).collect()
    }
    assert out["a"]["n_events"] == 2
    assert out["a"]["decayed_count"] == 1.5
    assert out["a"]["decayed_value"] == 15.0
    assert out["b"]["decayed_count"] == 0.25
    assert out["b"]["decayed_value"] == 1.0


def test_unpivot_long_melts_and_casts(spark):
    df = spark.createDataFrame(
        [(1, "x", 10, 1.5), (2, "y", 20, 2.5)],
        ["id", "tag", "a", "b"],
    )
    out = proj.unpivot_long(df, ["id"], ["a", "b"])
    rows = {(r.id, r.measure): r.value for r in out.collect()}
    # int column 'a' unified to double alongside 'b'; tag dropped
    assert rows == {
        (1, "a"): 10.0, (1, "b"): 1.5, (2, "a"): 20.0, (2, "b"): 2.5,
    }
    assert out.columns == ["id", "measure", "value"]
    assert dict(out.dtypes)["value"] == "double"


def test_unpivot_expand_is_narrow(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], ["id", "a", "b"])
    plan = proj.unpivot_long(
        df, ["id"], ["a", "b"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # Expand only — zero shuffle


def test_global_index_layout_is_pinned_once(spark, sf_dir):
    """The (_pid, local-rank) frame must be MATERIALIZED before its
    two consumers read it: under AQE, two executions of the same
    un-materialized range exchange can coalesce to different partition
    layouts, and the offsets-vs-rejoin mismatch silently DROPS rows
    (observed: a composed pipeline at 20x lost 97% of its output,
    nondeterministically). The pin shows up as an InMemoryTableScan in
    the executed plan."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.caching import (
        release_cached,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        global_row_index,
        global_running_sum,
        scale_safe_group_ranks,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    for out in (
        global_row_index(docs.select("doc_id"), ["doc_id"]),
        global_running_sum(
            docs.select("doc_id", "n_chars"), ["doc_id"], "n_chars"
        ),
        scale_safe_group_ranks(
            docs.select("doc_id", "lang"), "lang", ["doc_id"]
        ),
    ):
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in p, p[:2000]
        assert out.count() == docs.count()
    release_cached()
