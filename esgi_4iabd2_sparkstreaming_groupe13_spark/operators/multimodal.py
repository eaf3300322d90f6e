"""Multimodal column plumbing (engine extension, SURVEY §7 north star).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side machinery — schema,
partition sizing, Arrow-batched ``mapInPandas`` signatures, batch
shapes — is real and tested; the actual codec work is STUBBED because
the test container ships no image/audio libraries. Each stub either
raises ``NotImplementedError`` (real-decode mode) or produces a
deterministic fake feature so the pipeline shape can be exercised end
to end.

Scale notes: binary payloads make rows wide — the helpers repartition
by a target partition-byte budget, not row count, and the pandas
transforms stream Arrow batches (bounded memory) rather than
collecting.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import MEDIA_SCHEMA

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload = repeated md5 bytes of
    the id (pure expressions — reproducible, no RNG)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.to_binary(F.repeat(F.md5(F.col("id").cast("string")), 4), F.lit("hex")).alias(
                "payload"
            ),
            F.lit("application/octet-stream").alias("mime"),
            F.struct(
                F.lit(64).alias("width"),
                F.lit(64).alias("height"),
                (F.col("id") * 1000).alias("duration_ms"),
                F.lit(16000).alias("sample_rate"),
            ).alias("meta"),
        )
        .select(*[f.name for f in MEDIA_SCHEMA.fields])
    )


def repartition_for_payloads(
    df: DataFrame, approx_row_bytes: int, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Size partitions by bytes, not rows — binary columns break the
    usual rows-per-partition heuristics."""
    n_rows = df.count()
    parts = max(1, (n_rows * approx_row_bytes) // target_partition_bytes)
    return df.repartition(int(parts))


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    ``real_decode=True`` raises ``NotImplementedError`` (no codec libs
    in this container — wire Pillow/torchaudio here in deployment).
    The fake path emits a deterministic 8-dim byte-histogram feature,
    so batch shape, schema, and partition behavior are fully testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "media decode requires codec libraries (Pillow/librosa/"
                    "pyav) not present in this container; deterministic "
                    "fake-feature mode is the testable path"
                )
            # vectorized byte-histogram — this stub is also the template
            # for real codecs, so it models the numpy-batch shape a
            # production decode would use (never per-byte Python loops)
            feats, n_bytes = [], []
            for payload in pdf["payload"]:
                buf = np.frombuffer(
                    payload if payload is not None else b"", dtype=np.uint8
                )
                hist = np.bincount(buf & 7, minlength=8).astype(np.float64)
                feats.append((hist / (hist.sum() or 1.0)).tolist())
                n_bytes.append(len(buf))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: computes the frame
    timestamps to extract (pure expressions); the decode of each frame
    is the stubbed step above. Demonstrates the explode-to-frames
    partition shape real video pipelines need."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
