"""Perceptual-hash media dedup (r12): content-level grouping must
survive re-encoding that defeats byte-level dedup, and the hash
itself must be decode-derived (pixel/sample content), not byte-derived.
"""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import multimodal


def test_phash_invariant_under_reencode():
    """Same pixels under every PNG row-filter type -> one hash; same
    samples under different declared WAV sample rates -> one hash."""
    px = multimodal.synth_variant_pixels(4)
    hashes = {
        multimodal._phash(multimodal._encode_png(px, filters=(f,)))
        for f in range(5)
    }
    assert len(hashes) == 1
    frames = multimodal.synth_variant_frames(7)
    whashes = {
        multimodal._phash(multimodal._encode_wav(frames, sample_rate=sr))
        for sr in (8000, 16000, 44100)
    }
    assert len(whashes) == 1


def test_phash_distinct_across_contents():
    """The scrambled fixture contents hash distinctly (the gradient
    formulas of synth_media_pixels do NOT — that is why the variants
    fixture has its own content generator)."""
    img = {
        multimodal.phash_from_pixels(multimodal.synth_variant_pixels(cid))
        for cid in range(0, 40, 2)
    }
    aud = {
        multimodal.phash_from_frames(multimodal.synth_variant_frames(cid))
        for cid in range(1, 40, 2)
    }
    assert len(img) == 20
    assert len(aud) == 20


def test_phash_robust_to_small_pixel_noise():
    """aHash tolerance: a single +1 pixel perturbs at most a few of
    the 64 bits (deterministic fixture — the exact distance is pinned
    loosely so a grid/threshold regression still trips it)."""
    px = multimodal.synth_variant_pixels(6)
    noisy = px.copy()
    noisy[0, 0, 0] = (int(noisy[0, 0, 0]) + 1) % 256
    a = multimodal.phash_from_pixels(px)
    b = multimodal.phash_from_pixels(noisy)
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 4


def test_phash_dedup_catches_what_byte_dedup_misses(spark):
    media = multimodal.synth_real_media_variants(spark, n_contents=10, variants=3)
    # byte level: every payload unique
    n_byte_dups = (
        media.select(F.sha2(F.col("payload"), 256).alias("fp"))
        .groupBy("fp")
        .count()
        .filter("count > 1")
        .count()
    )
    assert n_byte_dups == 0
    out = multimodal.media_phash_dedup(media).toPandas()
    assert len(out) == 30
    assert (out["group_size"] == 3).all()
    assert int(out["is_dup"].sum()) == 20
    # representative = min media_id of each content triple
    reps = sorted(out["group_rep"].unique().tolist())
    assert reps == [i * 3 for i in range(10)]


def test_phash_audit_mode_degrades_corrupt_payload(spark):
    good = multimodal._encode_png(multimodal.synth_variant_pixels(0))
    rows = [(0, "image", good), (1, "image", b"\x89PNG\r\n\x1a\n garbage")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception):
        multimodal.media_phash(df).collect()
    pdf = (
        multimodal.media_phash_dedup(df, on_unsupported="null")
        .orderBy("media_id")
        .toPandas()
    )
    assert pdf["phash"].isna().tolist() == [False, True]
    assert pdf["is_dup"].tolist() == [0, 0]
    assert pdf["group_size"].tolist() == [1, 1]


def test_phash_engine_matches_oracle_mirror():
    """The independent oracle-side hash (numpy bit-pack, spec-derived
    grid) agrees with the engine hash on every fixture content."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.plans import py_oracles as po

    for cid in range(0, 10, 2):
        lum = (
            multimodal.synth_variant_pixels(cid)[:, :, :3]
            .astype(np.float64)
            .mean(axis=2)
        )
        cells = np.array(
            [
                [
                    lum[r0:r1, c0:c1].mean()
                    for (c0, c1) in po._mirror_bounds(lum.shape[1], 8)
                ]
                for (r0, r1) in po._mirror_bounds(lum.shape[0], 8)
            ]
        )
        assert po._mirror_phash_bits(cells) == multimodal.phash_from_pixels(
            multimodal.synth_variant_pixels(cid)
        )


def test_neardup_pairs_recall_and_precision(spark):
    media = multimodal.synth_real_media_neardups(spark, n_contents=12)
    pdf = multimodal.media_phash_neardup_pairs(media, max_hamming=3).toPandas()
    got = set(zip(pdf["id_a"], pdf["id_b"]))
    planted = {(2 * c, 2 * c + 1) for c in range(12)}
    # every planted edit flips <= 3 bits at these fixture params ->
    # recall 1 by pigeonhole; nothing else is within distance 3
    assert got == planted
    assert (pdf["hamming"] <= 3).all()


def test_neardup_tier_catches_what_exact_phash_misses(spark):
    media = multimodal.synth_real_media_neardups(spark, n_contents=12)
    exact = multimodal.media_phash_dedup(media).toPandas()
    # at least one planted pair has hamming > 0 -> exact grouping
    # splits it (group_size 1), while the near-dup tier pairs it
    singles = set(exact[exact["group_size"] == 1]["media_id"])
    pairs = multimodal.media_phash_neardup_pairs(media, max_hamming=3).toPandas()
    recovered = set(pairs["id_a"]) | set(pairs["id_b"])
    assert singles, "fixture should contain non-identical hash pairs"
    assert singles <= recovered


def test_neardup_parameter_validation(spark):
    media = multimodal.synth_real_media_neardups(spark, n_contents=2)
    with pytest.raises(ValueError):
        multimodal.media_phash_neardup_pairs(media, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError):
        multimodal.media_phash_neardup_pairs(media, n_bands=5)
