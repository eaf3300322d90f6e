"""Property-based tests (SURVEY §5.5): hypothesis-generated trip rows
— nulls allowed everywhere §1.2's nullability permits — through the
P3/A1/U1 invariants: count preservation, aggregate-sum equality,
union schema stability. One Spark job per example is slow, so
hypothesis drives the ROW GENERATOR and a handful of examples drive
Spark."""

from __future__ import annotations

from datetime import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import (
    aggregations as agg,
    projections as proj,
    sets,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.schemas import TRIP_SCHEMA

_ts = st.one_of(
    st.none(),
    st.datetimes(min_value=datetime(2024, 1, 1), max_value=datetime(2024, 2, 1)),
)
_double = st.one_of(
    st.none(), st.floats(min_value=0.0, max_value=500.0, allow_nan=False)
)
_loc = st.one_of(st.none(), st.integers(min_value=1, max_value=265))

trip_rows = st.lists(
    st.builds(
        lambda ts1, ts2, loc1, loc2, dist, fare: Row(
            VendorID=1,
            tpep_pickup_datetime=ts1,
            tpep_dropoff_datetime=ts2,
            passenger_count=1.0,
            trip_distance=dist,
            RatecodeID=1.0,
            store_and_fwd_flag=None,
            PULocationID=loc1,
            DOLocationID=loc2,
            payment_type=1,
            fare_amount=fare,
            extra=0.0,
            mta_tax=0.5,
            tip_amount=0.0,
            tolls_amount=0.0,
            improvement_surcharge=1.0,
            total_amount=fare,
            congestion_surcharge=0.0,
            Airport_fee=0.0,
        ),
        _ts,
        _ts,
        _loc,
        _loc,
        _double,
        _double,
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=trip_rows)
def test_pipeline_invariants(spark, rows):
    df = spark.createDataFrame(rows, TRIP_SCHEMA)
    n = len(rows)

    # P3: null repair never changes row count and kills all ts nulls
    repaired = proj.repair_null_timestamps(df)
    assert repaired.count() == n
    assert (
        repaired.filter(
            F.col("tpep_pickup_datetime").isNull()
            | F.col("tpep_dropoff_datetime").isNull()
        ).count()
        == 0
    )

    # A1: counts partition the input (null keys form their own group)
    pickup = agg.count_by_key(repaired, "PULocationID", tag_value="pickup_location")
    assert pickup.agg(F.sum("trip_count")).collect()[0][0] == n

    # U1: tagged union is schema-stable and length-additive
    dropoff = agg.count_by_key(repaired, "DOLocationID", tag_value="dropoff_location")
    u = sets.union_tagged(
        [
            pickup.withColumnRenamed("PULocationID", "location_id"),
            dropoff.withColumnRenamed("DOLocationID", "location_id"),
        ]
    )
    assert u.columns == ["location_id", "trip_count", "aggregation_type"]
    assert u.count() == pickup.count() + dropoff.count()
    assert (
        u.filter(F.col("aggregation_type") == "pickup_location")
        .agg(F.sum("trip_count"))
        .collect()[0][0]
        == n
    )
