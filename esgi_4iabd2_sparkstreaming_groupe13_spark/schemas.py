"""Explicit schemas — the engine never relies on inference.

The 19-column trip record is the contract shared by producer and
consumer in the reference, defined twice identically
(``ProducerOperations.scala:23-43`` == ``FileReader.scala:25-45``,
all fields nullable; comment at ``FileReader.scala:22-24`` demands the
copies match). Here it is defined ONCE and imported everywhere.

Output-directory contracts follow ``StreamProcessor.scala:107-121``
(raw 11-col projection) and ``:44-83`` (the three aggregate shapes);
see FIXTURES.md §F2.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The yellow-taxi trip record (SURVEY.md §1.2). Exact names — note the
#: capital ``A`` in ``Airport_fee`` (``FileReader.scala:44``).
TRIP_SCHEMA = T.StructType(
    [
        T.StructField("VendorID", T.IntegerType(), True),
        T.StructField("tpep_pickup_datetime", T.TimestampType(), True),
        T.StructField("tpep_dropoff_datetime", T.TimestampType(), True),
        T.StructField("passenger_count", T.DoubleType(), True),
        T.StructField("trip_distance", T.DoubleType(), True),
        T.StructField("RatecodeID", T.DoubleType(), True),
        T.StructField("store_and_fwd_flag", T.StringType(), True),
        T.StructField("PULocationID", T.IntegerType(), True),
        T.StructField("DOLocationID", T.IntegerType(), True),
        T.StructField("payment_type", T.IntegerType(), True),
        T.StructField("fare_amount", T.DoubleType(), True),
        T.StructField("extra", T.DoubleType(), True),
        T.StructField("mta_tax", T.DoubleType(), True),
        T.StructField("tip_amount", T.DoubleType(), True),
        T.StructField("tolls_amount", T.DoubleType(), True),
        T.StructField("improvement_surcharge", T.DoubleType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
        T.StructField("congestion_surcharge", T.DoubleType(), True),
        T.StructField("Airport_fee", T.DoubleType(), True),
    ]
)

#: Columns kept by the consumer's SQL projection
#: (``StreamProcessor.scala:107-121``), metadata first.
RAW_OUTPUT_COLUMNS = [
    "batch_id",
    "VendorID",
    "tpep_pickup_datetime",
    "tpep_dropoff_datetime",
    "PULocationID",
    "DOLocationID",
    "passenger_count",
    "trip_distance",
    "fare_amount",
    "total_amount",
    "payment_type",
]

def _trip_field(name: str) -> T.StructField:
    return next(f for f in TRIP_SCHEMA.fields if f.name == name)


#: Contract schemas for the consumer's four NDJSON sink directories
#: (VERDICT r6 "what's wrong" #2) — what each sink's files CONTAIN, so
#: maintenance passes (``operators/maintenance.compact_directory``) can
#: read them schema-applied instead of paying an inference pre-scan
#: that also drifts types (inferred JSON reads timestamps back as
#: strings). Derived from the one trip contract above, never copied.
def _agg_sink_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            key_field,
            T.StructField("batch_id", T.StringType(), True),
            T.StructField("trip_count", T.LongType(), True),
            T.StructField("aggregation_type", T.StringType(), True),
        ]
    )


SINK_SCHEMAS: dict[str, T.StructType] = {
    "raw": T.StructType(
        [T.StructField("batch_id", T.StringType(), True)]
        + [_trip_field(c) for c in [
            "VendorID",
            "tpep_pickup_datetime",
            "tpep_dropoff_datetime",
            "PULocationID",
            "DOLocationID",
            "passenger_count",
            "trip_distance",
            "fare_amount",
            "total_amount",
            "payment_type",
        ]]
    ),
    "pickup_agg": _agg_sink_schema(_trip_field("PULocationID")),
    "dropoff_agg": _agg_sink_schema(_trip_field("DOLocationID")),
    "combined_agg": _agg_sink_schema(
        T.StructField("location_id", T.IntegerType(), True)
    ),
}

#: Multimodal document record (engine extension, SURVEY.md §7/M4):
#: opaque binary payload + typed metadata. The decode step is stubbed
#: (no image/audio libs in the test container) but the schema,
#: partitioning and UDF plumbing are real.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Driver testdata tables (TESTDATA.md) — parquet files carry their own
#: schema; this list is the catalog surface.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
