"""Data-layout operator tests (operators/layout.py): Morton key
arithmetic, curve-segment file layout, and the box-query pruning win
the rewrite exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import layout


def _interleave2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (65535, 65535), (123, 45678)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.select(
        "x", "y", layout.z_value([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    for r in out:
        assert r.z == _interleave2(r.x, r.y), (r.x, r.y)


def test_z_value_clamps_overflow(spark):
    df = spark.createDataFrame([(1 << 20, 7)], ["x", "y"])
    z = df.select(layout.z_value([F.col("x"), F.col("y")]).alias("z"))
    assert z.first().z == _interleave2(65535, 7)


def test_z_value_clamps_negative_to_zero(spark):
    # a pre-epoch datediff bucket must clamp to 0, not interleave
    # two's-complement sign bits that scatter it across the curve
    df = spark.createDataFrame([(-5, 7), (-1, -1)], ["x", "y"])
    got = sorted(
        r.z
        for r in df.select(
            layout.z_value([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    )
    assert got == sorted([_interleave2(0, 7), _interleave2(0, 0)])
    # the SQL mirror replays the identical clamp
    import duckdb

    expr = layout.z_value_sql(["-5", "7"])
    assert duckdb.sql(f"SELECT {expr} AS z").fetchone()[0] == _interleave2(
        0, 7
    )


def test_z_value_locality(spark):
    # points near each other in (x, y) get nearby z-values: the
    # max z-gap within a 2x2 cell is far below the global range
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], ["x", "y"]
    )
    z = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", layout.z_value([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    # each aligned 2x2 cell occupies 4 CONSECUTIVE z-values
    for cx in range(0, 8, 2):
        for cy in range(0, 8, 2):
            cell = sorted(
                z[(cx + dx, cy + dy)] for dx in (0, 1) for dy in (0, 1)
            )
            assert cell[3] - cell[0] == 3, (cx, cy, cell)


def test_zorder_write_prunes_box_queries(spark, tmp_path):
    # sf0.01 so the (custkey, day) grid is densely populated — at
    # sf0.001's 150 rows curve segments are statistically sparse and
    # the locality signal drowns. Buckets are ALIGNED to the same bit
    # width (the docstring contract: unaligned widths let the wider
    # dimension's high bits dominate the curve and kill cross-dim
    # locality — observed: raw 11-bit custkey vs 12-bit day left
    # every file spanning the full custkey range).
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    dims = [
        F.floor(F.col("o_custkey") / 6),
        F.floor(
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")) / 10
        ),
    ]
    zpath = str(tmp_path / "zorder")
    layout.zorder_write(orders, zpath, dims, bits=8, num_files=8)
    # baseline: the same table in 8 arbitrary (hash-scattered) files
    rpath = str(tmp_path / "roundrobin")
    orders.repartition(8).write.parquet(rpath)

    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert "_z" not in back.columns  # transient key dropped on write

    # per-file custkey spans: z-ordered files each cover a narrow
    # slice; scattered files all cover ~the full range
    def spans(path):
        df = spark.read.parquet(path).withColumn(
            "_file", F.input_file_name()
        )
        return layout.file_span_report(df, ["o_custkey"]).collect()

    lo, hi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    full = hi - lo
    z_spans = [r.o_custkey_max - r.o_custkey_min for r in spans(zpath)]
    r_spans = [r.o_custkey_max - r.o_custkey_min for r in spans(rpath)]
    # curve segments cover narrow custkey slices (observed ~0.6×full
    # avg); hash-scattered files all cover essentially the full range
    assert sum(z_spans) / len(z_spans) < 0.75 * full
    assert min(r_spans) > 0.95 * full

    # the operational win: a box predicate on the interleaved dims
    # touches a fraction of the z-ordered files (observed: 1 of 8)
    # but every scattered file
    def files_touched(path):
        df = spark.read.parquet(path).filter(
            (F.col("o_custkey") < 200)
            & (F.col("o_orderdate") < F.lit("1996-01-01"))
        )
        return df.select(F.input_file_name()).distinct().count()

    assert files_touched(rpath) == 8
    assert files_touched(zpath) <= 2
