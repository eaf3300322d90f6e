"""Format coverage beyond the reference's CSV/NDJSON/parquet: the
engine must round-trip every Spark-native columnar/row format so a
user can point it at existing lake data (S1/S3 extension)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table


def _checksum(df):
    return df.agg(
        F.bit_xor(F.xxhash64(F.struct(*sorted(df.columns)))).alias("c")
    ).first()["c"]


@pytest.mark.parametrize("fmt", ["orc", "parquet", "json", "csv"])
def test_format_roundtrip_preserves_rows(spark, sf_dir, tmp_path, fmt):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / f"docs_{fmt}")
    writer = docs.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True).option("escape", '"')
    writer.format(fmt).save(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True).schema(docs.schema)
    if fmt == "json":
        reader = reader.schema(docs.schema)
    back = reader.format(fmt).load(path)
    assert back.count() == docs.count()
    assert _checksum(back) == _checksum(docs)


def test_orc_filter_pushdown(spark, sf_dir, tmp_path):
    """ORC scans must push predicates like parquet ones do."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    path = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(path)
    q = spark.read.orc(path).filter(F.col("l_quantity") >= 30.0)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,30" in plan
    assert q.count() == li.filter(F.col("l_quantity") >= 30.0).count()


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_orc,
        load_table,
        write_orc,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = load_orc(spark, path)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)
    # predicate reaches the ORC scan (pushdown, not post-filter only)
    plan = (
        back.filter(F.col("o_custkey") == 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "o_custkey" in plan.split("Scan orc")[1].split("\n")[0]


def test_parquet_merge_schema_evolution(spark, tmp_path):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_parquet_evolving,
    )

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(v1)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.parquet(v2)
    df = load_parquet_evolving(spark, v1, v2)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    # the old generation surfaces the added column as null
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_load_media_dir_binaryfile_roundtrip(spark, tmp_path):
    """binaryFile ingestion: real files on disk → (media_id, path,
    n_bytes, payload) → the header parser — the non-synthetic media
    path end to end, with glob pruning at listing time."""
    import struct

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import multimodal
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_media_dir,
    )

    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
           + b"\x00\x00\x00\x00")
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100,
                                   176400, 4, 16))
    d = tmp_path / "media"
    (d / "sub").mkdir(parents=True)
    (d / "a.png").write_bytes(png)
    (d / "sub" / "b.wav").write_bytes(wav)
    (d / "notes.txt").write_text("not media")

    media = load_media_dir(spark, str(d), glob="*.{png,wav}")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    # glob pruned the .txt at listing time; recursion found sub/b.wav
    assert set(rows) == {"a.png", "b.wav"}
    assert rows["a.png"]["n_bytes"] == len(png)
    assert bytes(rows["b.wav"]["payload"]) == wav
    # ids deterministic across a second read
    again = {r["path"].rsplit("/", 1)[-1]: r["media_id"]
             for r in load_media_dir(spark, str(d), glob="*.{png,wav}").collect()}
    assert {k: v["media_id"] for k, v in rows.items()} == again

    parsed = {
        r["path"].rsplit("/", 1)[-1]: r
        for r in multimodal.media_header_metadata(
            media.select("media_id", "payload")
        ).join(media.select("media_id", "path"), "media_id").collect()
    }
    assert (parsed["a.png"]["format"], parsed["a.png"]["width"]) == ("png", 640)
    assert (parsed["b.wav"]["format"], parsed["b.wav"]["sample_rate"]) == ("wav", 44100)
