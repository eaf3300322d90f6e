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
    with pytest.raises(ValueError, match="max_bucket_size"):
        multimodal.media_phash_neardup_pairs(media, max_bucket_size=1)


def test_neardup_hot_bucket_cap(spark):
    """The r13 hot-bucket guard: with a generous cap the planted pair
    set is unchanged (parity with uncapped); a cap below the planted
    cluster size excludes that cluster's pairs while keeping small
    groups — the minhash_lsh_pairs r11 semantics on the media tier."""
    media = multimodal.synth_real_media_neardups(spark, n_contents=12)
    base = multimodal.media_phash_neardup_pairs(media, max_hamming=3)
    capped = multimodal.media_phash_neardup_pairs(
        media, max_hamming=3, max_bucket_size=1000
    )
    key = lambda df: {
        (r.kind, r.id_a, r.id_b, r.hamming) for r in df.collect()
    }
    pairs = key(base)
    assert pairs and key(capped) == pairs
    # a giant near-identical cluster: 40 re-encodes of ONE content all
    # share every band value -> one 40-deep bucket per band; cap 8
    # excludes the cluster entirely (its B^2 ~ 1600 candidate pairs
    # belong in the exact digest tier)
    px = multimodal.synth_variant_pixels(3)
    cluster = spark.createDataFrame(
        [
            (i, "image", multimodal._encode_png(px, filters=(i % 5,)))
            for i in range(40)
        ],
        "media_id long, kind string, payload binary",
    )
    big = multimodal.media_phash_neardup_pairs(cluster, max_hamming=3)
    small = multimodal.media_phash_neardup_pairs(
        cluster, max_hamming=3, max_bucket_size=8
    )
    assert big.count() == 40 * 39 // 2
    assert small.count() == 0


def test_media_dedup_within_watermark_streaming(spark, tmp_path):
    """Streaming twin: re-encoded copies arriving in LATER micro-batches
    (different bytes, same decoded content) must be dropped by the
    (kind, digest) watermark dedup — one surviving row per content.
    The planted aHash-collision pair (contents 106/1730: distinct
    pixels, identical phash) must BOTH survive — the r13 digest rekey
    that the r12 phash-keyed stream measurably got wrong."""
    import datetime

    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_dedup_within_watermark,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    n = 8
    # contents 0..n-1 arrive as 3 re-encodes each; the collision pair
    # arrives once each (same phash, different content digest)
    collision_cids = [106, 1730]

    def batch(variant: int, id_base: int):
        rows = []
        cids = list(range(n)) + (collision_cids if variant == 0 else [])
        for slot, cid in enumerate(cids):
            if cid % 2 == 0:
                payload = multimodal._encode_png(
                    multimodal.synth_variant_pixels(cid),
                    filters=(variant % 5,),
                )
                kind = "image"
            else:
                payload = multimodal._encode_wav(
                    multimodal.synth_variant_frames(cid),
                    sample_rate=16000 + 1000 * variant,
                )
                kind = "audio"
            rows.append(
                (
                    id_base + slot,
                    kind,
                    payload,
                    t0 + datetime.timedelta(seconds=60 * variant + slot),
                )
            )
        return spark.createDataFrame(
            rows, "media_id long, kind string, payload binary, ts timestamp"
        )

    src = str(tmp_path / "src")
    batch(0, 0).coalesce(1).write.mode("overwrite").parquet(src)
    batch(1, 1000).coalesce(1).write.mode("append").parquet(src)
    batch(2, 2000).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "media_id long, kind string, payload binary, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermark >> fixture time span: parquet part files dispatch in
    # racy mtime order, a tight watermark would drop "late" originals
    deduped = media_dedup_within_watermark(
        stream, ts_col="ts", watermark="30 days"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("media_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not terminate within 600s"
    out = spark.table("media_dedup_stream").toPandas()
    # 3 encodings x n contents + 2 collision singletons in ->
    # n + 2 rows out: one per DISTINCT content, zero content loss
    assert len(out) == n + len(collision_cids)
    assert out.groupby(["kind", "digest"]).size().max() == 1
    # the collision pair shares a phash yet both rows survive —
    # exactly what the phash-keyed r12 stream dropped
    img = out[out["kind"] == "image"]
    assert img.groupby("phash").size().max() == 2


def _enc_cid(cid, variant=0, perturb=False):
    if cid % 2 == 0:
        px = multimodal.synth_variant_pixels(cid)
        if perturb:
            e = px.astype(np.int64).copy()
            e[0, :, :] = np.minimum(e[0, :, :] + 8, 255)
            px = e.astype(np.uint8)
        return "image", multimodal._encode_png(px, filters=(variant % 5,))
    fr = multimodal.synth_variant_frames(cid)
    if perturb:
        e = fr.astype(np.int64).copy()
        e[:10, :] = np.clip(e[:10, :] + 3000, -32768, 32767)
        fr = e.astype(np.int16)
    return "audio", multimodal._encode_wav(fr, sample_rate=16000 + 1000 * variant)


def _inc_fixture(spark):
    schema = "media_id long, kind string, payload binary"
    corpus = spark.createDataFrame(
        [(cid, *_enc_cid(cid)) for cid in range(12)], schema
    )
    inc = (
        [(1000 + i, *_enc_cid(cid, variant=1)) for i, cid in enumerate(range(4))]
        + [(2000 + i, *_enc_cid(cid, perturb=True)) for i, cid in enumerate(range(4, 8))]
        + [(3000 + i, *_enc_cid(cid)) for i, cid in enumerate(range(100, 104))]
        + [(4000, "image", b"\x89PNG\r\n\x1a\n junk")]
    )
    return corpus, spark.createDataFrame(inc, schema)


def test_incremental_media_dedup_decisions(spark):
    corpus, incoming = _inc_fixture(spark)
    dec = {
        r["media_id"]: r["decision"]
        for r in multimodal.incremental_media_dedup(corpus, incoming).collect()
    }
    assert all(dec[1000 + i] == "dup_exact" for i in range(4))
    # perturbed copies: the content CHANGED, so the digest-keyed exact
    # tier must never claim dup_exact — even when the edit flips zero
    # aHash bits (the r12 precision-audit fix); all land dup_near
    assert all(dec[2000 + i] == "dup_near" for i in range(4))
    assert all(dec[3000 + i] == "new" for i in range(4))
    assert dec[4000] == "corrupt"


def test_incremental_media_index_roundtrip(spark, tmp_path):
    """build -> serve (decision-equal to the self-contained form) ->
    append survivors -> re-serve (formerly-new now dup_exact)."""
    corpus, incoming = _inc_fixture(spark)
    idx = str(tmp_path / "media_index")
    multimodal.build_media_index(corpus, idx)
    self_contained = {
        r["media_id"]: r["decision"]
        for r in multimodal.incremental_media_dedup(corpus, incoming).collect()
    }
    served = {
        r["media_id"]: r["decision"]
        for r in multimodal.incremental_media_dedup_indexed(incoming, idx).collect()
    }
    assert served == self_contained
    new_ids = [m for m, d in served.items() if d == "new"]
    admitted = incoming.filter(F.col("media_id").isin(new_ids))
    multimodal.append_to_media_index(admitted, idx)
    after = {
        r["media_id"]: r["decision"]
        for r in multimodal.incremental_media_dedup_indexed(incoming, idx).collect()
    }
    assert all(after[m] == "dup_exact" for m in new_ids)
    assert after[4000] == "corrupt"


def test_media_phash_rejects_colliding_extra_cols(spark):
    media = multimodal.synth_real_media_variants(spark, n_contents=2)
    with pytest.raises(ValueError, match="collide"):
        multimodal.media_phash(media, extra_cols=["kind"])


def test_media_contamination_names_the_leaks(spark):
    """Planted benchmark leaks (re-encoded + edited) must be named
    with the RIGHT bench_id and confidence tier; clean contents must
    produce no pairs. The aHash-collision plant (corpus content 1730
    vs bench content 106 — Hamming 0, DIFFERENT content) must come
    back 'candidate', never 'exact' (r13 confidence column)."""
    bench = spark.createDataFrame(
        [(i, *_enc_cid(200 + i)) for i in range(6)]
        + [(6, "image", multimodal._encode_png(multimodal.synth_variant_pixels(106)))],
        "media_id long, kind string, payload binary",
    )
    corpus = spark.createDataFrame(
        [(5000 + i, *_enc_cid(300 + i)) for i in range(8)]
        + [(6000, *_enc_cid(200, variant=2))]       # re-encode of bench 0
        + [(7000, *_enc_cid(201, perturb=True))]    # edited copy of bench 1
        + [(8000, "image", multimodal._encode_png(multimodal.synth_variant_pixels(1730)))],
        "media_id long, kind string, payload binary",
    )
    pairs = multimodal.media_contamination(corpus, bench).toPandas()
    got = {
        (r.media_id, r.bench_id): (r.hamming, r.confidence)
        for r in pairs.itertuples()
    }
    assert got[(6000, 0)] == (0, "exact")           # digest-confirmed leak
    ham, conf = got[(7000, 1)]
    assert ham <= 3 and conf == "candidate"         # edited copy: near tier
    assert got[(8000, 6)] == (0, "candidate")       # phash collision: NOT exact
    assert all(mid >= 6000 for (mid, _) in got)


def test_content_digest_invariant_under_reencode():
    px = multimodal.synth_variant_pixels(4)
    ds = {
        multimodal.content_digest(multimodal._encode_png(px, filters=(f,)))
        for f in range(5)
    }
    assert len(ds) == 1
    fr = multimodal.synth_variant_frames(7)
    da = {
        multimodal.content_digest(multimodal._encode_wav(fr, sample_rate=sr))
        for sr in (8000, 16000, 44100)
    }
    assert len(da) == 1


def test_content_digest_separates_phash_collision(spark):
    """The precision-tier claim, demonstrated on a REAL collision:
    contents 106 and 1730 of the variants fixture share the exact
    64-bit aHash (found by scan — aHash concentrates on the
    32-set-bits shell, so collisions are far more likely than 2^-64),
    so phash dedup WRONGLY merges them; the decoded-content digest
    keeps them apart."""
    a = multimodal.synth_variant_pixels(106)
    b = multimodal.synth_variant_pixels(1730)
    assert multimodal.phash_from_pixels(a) == multimodal.phash_from_pixels(b)
    media = spark.createDataFrame(
        [
            (0, "image", multimodal._encode_png(a)),
            (1, "image", multimodal._encode_png(b)),
        ],
        "media_id long, kind string, payload binary",
    )
    merged = multimodal.media_phash_dedup(media).toPandas()
    assert (merged["group_size"] == 2).all()  # the FP merge
    exact = multimodal.media_content_dedup(media).toPandas()
    assert (exact["group_size"] == 1).all()   # digest tier: no merge
    assert exact["digest"].nunique() == 2


def test_media_content_dedup_groups_reencodes(spark):
    media = multimodal.synth_real_media_variants(spark, n_contents=8, variants=3)
    out = multimodal.media_content_dedup(media).toPandas()
    assert len(out) == 24
    assert (out["group_size"] == 3).all()
    assert sorted(out["group_rep"].unique()) == [i * 3 for i in range(8)]


def test_incremental_exact_tier_is_digest_keyed(spark):
    """The zero-FP exact-tier claim, on a REAL phash collision:
    corpus content 106 and incoming content 1730 share the exact
    64-bit aHash but differ in pixels — the digest-keyed exact tier
    must classify the incoming row dup_near (phash distance 0 makes
    it a candidate), NEVER dup_exact."""
    schema = "media_id long, kind string, payload binary"
    corpus = spark.createDataFrame(
        [(0, "image", multimodal._encode_png(multimodal.synth_variant_pixels(106)))],
        schema,
    )
    incoming = spark.createDataFrame(
        [(1, "image", multimodal._encode_png(multimodal.synth_variant_pixels(1730)))],
        schema,
    )
    row = multimodal.incremental_media_dedup(corpus, incoming).collect()[0]
    assert row["decision"] == "dup_near"


def test_indexed_serve_refuses_pre_digest_index(spark, tmp_path):
    corpus, incoming = _inc_fixture(spark)
    idx = str(tmp_path / "old_index")
    multimodal.build_media_index(corpus, idx)
    # simulate a pre-r12 index: strip the digest column in place
    legacy = spark.read.parquet(f"{idx}/hashes").drop("digest")
    legacy.write.mode("overwrite").parquet(f"{idx}/hashes_legacy")
    import shutil

    shutil.rmtree(f"{idx}/hashes")
    shutil.move(f"{idx}/hashes_legacy", f"{idx}/hashes")
    with pytest.raises(ValueError, match="digest"):
        multimodal.incremental_media_dedup_indexed(incoming, idx).collect()


def test_media_quality_report_verdicts(spark):
    """One planted violation per rule; clean payloads all pass; the
    corrupt payload fails ONLY the corrupt rule (NULL metrics must
    not fire the threshold rules)."""
    fx = multimodal.synth_media_quality_fixture(spark)
    rep = {
        r.media_id: (r.passes, r.failed_rules)
        for r in multimodal.media_quality_report(fx).collect()
    }
    for cid in range(10):
        assert rep[cid] == (True, ""), rep[cid]
    assert rep[100] == (False, "flat_image")
    assert rep[101] == (False, "too_small")
    assert rep[102] == (False, "too_small,extreme_aspect")
    assert rep[110] == (False, "clipped_audio")
    assert rep[111] == (False, "silent_audio")
    assert rep[112] == (False, "too_short_audio")
    assert rep[120] == (False, "corrupt")       # damaged PNG bytes
    assert rep[121] == (False, "unsupported")   # valid MP4, no decoder


def test_media_quality_custom_and_empty_rules(spark):
    """Same rule-list contract as text.gopher_filter_report: an
    explicit empty list means 'no rules — everything passes', and a
    custom rule table replaces (not extends) the defaults."""
    fx = multimodal.synth_media_quality_fixture(spark).filter(
        "media_id IN (0, 100)"
    )
    all_pass = multimodal.media_quality_report(fx, rules=[]).collect()
    assert all(r.passes for r in all_pass)
    custom = {
        r.media_id: r.failed_rules
        for r in multimodal.media_quality_report(
            fx, rules=[("bright", "kind = 'image' AND lum_mean > 100")]
        ).collect()
    }
    assert custom[100] == "bright"  # flat gray card, lum_mean 128


def test_media_quality_features_raise_mode(spark):
    fx = spark.createDataFrame(
        [(0, "image", b"\x89PNG\r\n\x1a\n junk")],
        "media_id long, kind string, payload binary",
    )
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        multimodal.media_quality_features(fx, on_unsupported="raise").collect()
    with pytest.raises(ValueError):
        multimodal.media_quality_features(fx, on_unsupported="bogus")


def test_media_profile_matches_single_purpose_operators(spark):
    """One decode pass, identical semantics: profile columns must be
    row-for-row equal to media_hashes and media_quality_features on
    the same fixture (incl. the corrupt payload's NULL row)."""
    fx = multimodal.synth_media_quality_fixture(spark)
    prof = multimodal.media_profile(fx).toPandas().set_index("media_id")
    hashes = (
        multimodal.media_hashes(fx, on_unsupported="null")
        .toPandas()
        .set_index("media_id")
    )
    qual = (
        multimodal.media_quality_features(fx)
        .toPandas()
        .set_index("media_id")
    )
    assert prof["phash"].equals(hashes["phash"])
    assert prof["digest"].equals(hashes["digest"])
    for col in (
        "decoded", "decode_err", "width", "height", "lum_mean", "lum_std",
        "n_frames", "n_channels", "clip_ratio", "silence_ratio", "dc_offset",
    ):
        assert prof[col].equals(qual[col]), col


def test_prep_media_equals_stage_composition(spark):
    """The fused pipeline (one corpus decode) must return exactly the
    rows of the stage-by-stage composition: quality gate ->
    digest-dedup keep-first -> contamination tags."""
    corpus = multimodal.synth_media_quality_fixture(spark)
    # add a re-encode dup of content 0 and a benchmark leak of content 2
    extra = spark.createDataFrame(
        [
            (
                200,
                "image",
                multimodal._encode_png(
                    multimodal.synth_variant_pixels(0), filters=(2,)
                ),
            )
        ],
        "media_id long, kind string, payload binary",
    )
    corpus = corpus.unionByName(extra)
    bench = spark.createDataFrame(
        [
            (
                0,
                "image",
                multimodal._encode_png(
                    multimodal.synth_variant_pixels(2), filters=(4,)
                ),
            ),
            (
                1,
                "image",
                multimodal._encode_png(multimodal.synth_variant_pixels(1730)),
            ),
        ],
        "media_id long, kind string, payload binary",
    )
    got = multimodal.prep_media(corpus, bench).toPandas()
    # stage-by-stage reference
    rep = multimodal.media_quality_report(corpus)
    gated = corpus.join(
        rep.filter("passes").select("media_id"), "media_id"
    )
    ded = multimodal.media_content_dedup(gated, on_unsupported="null")
    keep = set(
        ded.filter("is_dup = 0").toPandas()["media_id"].tolist()
    )
    flags = {
        r.media_id: r.confidence
        for r in multimodal.media_contamination(gated, bench).collect()
    }
    assert set(got["media_id"]) == keep
    for r in got.itertuples():
        assert flags.get(r.media_id) == (
            None if r.contamination is None else r.contamination
        )
    # the planted semantics themselves:
    ids = set(got["media_id"])
    assert 200 not in ids and 0 in ids          # re-encode dup dropped
    assert not ids & {100, 101, 102, 110, 111, 112, 120}  # gate fails out
    by_id = got.set_index("media_id")["contamination"]
    assert by_id[2] == "exact"                  # digest-confirmed leak


def test_media_quality_gate_stream_matches_batch(spark, tmp_path):
    """The streaming gate (stateless decode + rule projection) must
    emit exactly the batch verdicts when the planted-violation fixture
    arrives split across micro-batches."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_quality_gate_stream,
    )

    fx = multimodal.synth_media_quality_fixture(spark)
    src = str(tmp_path / "src")
    fx.filter("media_id < 10").coalesce(1).write.mode("overwrite").parquet(src)
    fx.filter("media_id >= 10").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("media_id long, kind string, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        media_quality_gate_stream(stream)
        .writeStream.format("memory")
        .queryName("media_gate_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = (
        spark.table("media_gate_stream")
        .toPandas()
        .sort_values("media_id", ignore_index=True)
    )
    want = (
        multimodal.media_quality_report(fx)
        .toPandas()
        .sort_values("media_id", ignore_index=True)
    )
    assert got.equals(want)


def test_prep_media_incremental_decisions(spark, tmp_path):
    """Nightly-ingest shape: gate + classify-vs-persisted-index +
    contamination tags, one incoming decode. Planted: a re-encode of
    an indexed content (dup_exact), an edited copy (dup_near), a clean
    unseen content (new, untagged), an unseen content that re-encodes
    a benchmark item (new + exact), a flat image (quality_fail), and
    a corrupt payload (corrupt beats quality_fail)."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.multimodal import (
        build_media_index,
        prep_media_incremental,
    )

    schema = "media_id long, kind string, payload binary"
    corpus = spark.createDataFrame(
        [(cid, *_enc_cid(cid)) for cid in range(8)], schema
    )
    idx = str(tmp_path / "idx")
    build_media_index(corpus, idx)
    incoming = spark.createDataFrame(
        [
            (1000, *_enc_cid(0, variant=1)),           # re-encode -> dup_exact
            (1001, *_enc_cid(4, perturb=True)),        # edited -> dup_near
            (1002, *_enc_cid(300)),                    # unseen clean -> new
            (1003, *_enc_cid(501, variant=2)),         # unseen, = bench item
            (
                1004,
                "image",
                multimodal._encode_png(
                    np.full((16, 16, 3), 99, dtype=np.uint8)
                ),
            ),                                          # flat -> quality_fail
            (1005, "image", b"\x89PNG\r\n\x1a\n junk"),  # corrupt
        ],
        schema,
    )
    bench = spark.createDataFrame(
        [(0, *_enc_cid(501))], schema
    )
    got = {
        r.media_id: (r.decision, r.contamination)
        for r in prep_media_incremental(incoming, idx, bench).collect()
    }
    assert got[1000] == ("dup_exact", None)
    assert got[1001] == ("dup_near", None)
    assert got[1002] == ("new", None)
    assert got[1003] == ("new", "exact")
    assert got[1004] == ("quality_fail", None)
    assert got[1005] == ("corrupt", None)


# ---------------------------------------------------------------------
# property-based parity: engine pure functions vs oracle mirrors on
# RANDOM content (no Spark round-trip — these run in milliseconds and
# cover shapes the deterministic fixtures never reach)
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp


@st.composite
def _pixel_arrays(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    ch = draw(st.integers(1, 4))
    return draw(
        hnp.arrays(np.uint8, (h, w, ch), elements=st.integers(0, 255))
    )


@st.composite
def _frame_arrays(draw):
    n = draw(st.integers(1, 400))
    ch = draw(st.integers(1, 2))
    return draw(
        hnp.arrays(
            np.int16, (n, ch), elements=st.integers(-32768, 32767)
        )
    )


@settings(max_examples=60, deadline=None)
@given(_pixel_arrays())
def test_phash_engine_equals_mirror_on_random_pixels(px):
    """phash_from_pixels vs the oracle's independent bit-pack/grid
    mirror must agree on ARBITRARY uint8 arrays — every channel count,
    non-divisible grid shapes, constant images."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.plans import py_oracles as po

    ch = px.shape[2]
    lum = px[:, :, : (1 if ch <= 2 else 3)].astype(np.float64).mean(axis=2)
    cells = np.array(
        [
            [
                lum[r0:r1, c0:c1].mean()
                for (c0, c1) in po._mirror_bounds(lum.shape[1], 8)
            ]
            for (r0, r1) in po._mirror_bounds(lum.shape[0], 8)
        ]
    )
    assert po._mirror_phash_bits(cells) == multimodal.phash_from_pixels(px)


@settings(max_examples=60, deadline=None)
@given(_pixel_arrays())
def test_digest_roundtrips_png_encode_on_random_pixels(px):
    """content_digest(encode(px)) must equal the digest of the raw
    array under EVERY PNG filter type — decode correctness and digest
    canonicalization on arbitrary content."""
    want = multimodal._digest_of("img", px)
    for f in range(5):
        got = multimodal.content_digest(multimodal._encode_png(px, filters=(f,)))
        assert got == want


@settings(max_examples=60, deadline=None)
@given(_frame_arrays())
def test_audio_metrics_match_definition_on_random_frames(fr):
    """_metrics_of audio signals vs their plain-numpy definitions on
    arbitrary PCM, including all-clipped and all-silent extremes."""
    m = multimodal._metrics_of("aud", fr)
    s = fr.astype(np.float64)
    assert m["n_frames"] == fr.shape[0]
    assert m["clip_ratio"] == float((np.abs(s) >= multimodal.CLIP_MAG).mean())
    assert m["silence_ratio"] == float(
        (np.abs(s) <= multimodal.SILENCE_MAG).mean()
    )
    assert m["dc_offset"] == float(s.mean() / 32768.0)
    # WAV round-trip: digest of encode(fr) equals digest of fr
    assert multimodal.content_digest(
        multimodal._encode_wav(fr)
    ) == multimodal._digest_of("aud", fr)


def test_prep_media_from_persisted_profile(spark, tmp_path):
    """build_media_profile -> prep_media_from_profile(path) must be
    row-equal to prep_media on the same corpus (decode paid once per
    corpus version; a threshold re-tune re-reads metadata only), and
    a pre-profile table is refused by name."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.multimodal import (
        build_media_profile,
        prep_media,
        prep_media_from_profile,
    )

    corpus = multimodal.synth_media_quality_fixture(spark)
    bench = spark.createDataFrame(
        [
            (
                0,
                "image",
                multimodal._encode_png(
                    multimodal.synth_variant_pixels(2), filters=(4,)
                ),
            )
        ],
        "media_id long, kind string, payload binary",
    )
    path = str(tmp_path / "profile")
    build_media_profile(corpus, path)
    key = lambda df: sorted(
        (r.media_id, r.kind, r.phash, r.digest, r.contamination)
        for r in df.collect()
    )
    assert key(prep_media_from_profile(path, bench)) == key(
        prep_media(corpus, bench)
    )
    # re-tuned rules re-read the profile only (no payload column even
    # exists there): under a rule table that fires on nothing in this
    # fixture, the formerly gate-failed decodable rows are admitted
    relaxed = prep_media_from_profile(
        path, None, rules=[("dark", "kind = 'image' AND lum_mean < 50")]
    )
    ids = {r.media_id for r in relaxed.collect()}
    assert {100, 110, 111} <= ids and 120 not in ids
    # refuse a non-profile table
    corpus.select("media_id", "kind").write.parquet(str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="missing media_profile columns"):
        prep_media_from_profile(str(tmp_path / "bad"))


def test_media_neardup_pairs_from_profile(spark, tmp_path):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.multimodal import (
        build_media_profile,
        media_neardup_pairs_from_profile,
    )

    media = multimodal.synth_real_media_neardups(spark, n_contents=12)
    path = str(tmp_path / "profile")
    build_media_profile(media, path)
    key = lambda df: sorted(
        (r.kind, r.id_a, r.id_b, r.hamming) for r in df.collect()
    )
    assert key(media_neardup_pairs_from_profile(path)) == key(
        multimodal.media_phash_neardup_pairs(media, max_hamming=3)
    )
    with pytest.raises(ValueError, match="missing media_profile columns"):
        media.select("media_id").write.parquet(str(tmp_path / "bad"))
        media_neardup_pairs_from_profile(str(tmp_path / "bad"))


def test_jpeg_pillow_gate_in_digest_paths(spark):
    """ADVICE r12 #1 closure: the shared _decode_content entry point
    means the DIGEST tiers treat JPEG exactly like the phash tier —
    NotImplementedError (actionable Pillow message) in strict mode,
    audit-mode NULLs in media_hashes / corrupt in the profile —
    never a silent wrong digest."""
    import struct

    jpeg = (
        b"\xff\xd8\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 4, 4)
        + b"\x01\x11\x00"
    )
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.content_digest(jpeg)
    df = spark.createDataFrame(
        [(0, "image", jpeg)], "media_id long, kind string, payload binary"
    )
    hashed = multimodal.media_hashes(df, on_unsupported="null").collect()[0]
    assert hashed.phash is None and hashed.digest is None
    prof = multimodal.media_profile(df).collect()[0]
    assert prof.decoded == 0 and prof.digest is None


def _mk_mp4(w, h, version=0):
    import struct

    be32 = lambda v: struct.pack(">I", v)
    matrix = (
        be32(0x00010000) + be32(0) * 3 + be32(0x00010000) + be32(0) * 3
        + be32(0x40000000)
    )
    if version == 0:
        payload = (
            b"\x00\x00\x00\x00" + b"\x00" * 8 + be32(1) + be32(0)
            + b"\x00" * 4 + b"\x00" * 8 + b"\x00" * 8 + matrix
            + be32(w << 16) + be32(h << 16)
        )
    else:
        payload = (
            b"\x01\x00\x00\x00" + b"\x00" * 16 + be32(1) + be32(0)
            + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 8 + matrix
            + be32(w << 16) + be32(h << 16)
        )
    tkhd = be32(8 + len(payload)) + b"tkhd" + payload
    trak = be32(8 + len(tkhd)) + b"trak" + tkhd
    moov = be32(8 + len(trak)) + b"moov" + trak
    return be32(16) + b"ftyp" + b"isom" + be32(0) + moov


def _mk_avi(w, h):
    import struct

    le32 = lambda v: struct.pack("<I", v)
    avih = b"avih" + le32(56) + b"\x00" * 32 + le32(w) + le32(h) + b"\x00" * 16
    lst = b"LIST" + le32(4 + len(avih)) + b"hdrl" + avih
    return b"RIFF" + le32(4 + len(lst)) + b"AVI " + lst


def test_video_header_parsing():
    """MP4 (tkhd v0 AND v1 — the 64-bit-times layout shifts the dims
    by 12 bytes) and AVI (nested LIST walk to avih) parse real
    hand-built containers; truncation degrades to NULL dims, never
    throws; video decode stays env-stubbed (NotImplementedError)."""
    assert multimodal._sniff_header(_mk_mp4(640, 360)) == (
        "mp4", 640, 360, None, None,
    )
    assert multimodal._sniff_header(_mk_mp4(1920, 1080, version=1)) == (
        "mp4", 1920, 1080, None, None,
    )
    assert multimodal._sniff_header(_mk_avi(320, 240)) == (
        "avi", 320, 240, None, None,
    )
    assert multimodal._sniff_header(_mk_mp4(640, 360)[:40])[0] == "mp4"
    assert multimodal._sniff_header(_mk_mp4(640, 360)[:40])[1] is None
    assert multimodal._sniff_header(_mk_avi(320, 240)[:30]) == (
        "avi", None, None, None, None,
    )
    # a malformed zero box size must not loop forever
    import struct
    evil = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    evil += struct.pack(">I", 0) + b"moov"
    assert multimodal._sniff_header(evil)[1] is None
    with pytest.raises(NotImplementedError):
        multimodal.content_digest(_mk_mp4(640, 360))


def test_media_mislabel_audit(spark):
    """Declared-vs-sniffed audit: a wav declared 'image' and an mp4
    declared 'audio' are flagged; correct labels are not; an unknown
    container mismatches EVERY declared kind."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.multimodal import (
        media_mislabel_audit,
    )

    rows = [
        (0, "image", multimodal._encode_png(multimodal.synth_variant_pixels(0))),
        (1, "image", multimodal._encode_wav(multimodal.synth_variant_frames(1))),
        (2, "audio", _mk_mp4(640, 360)),
        (3, "video", _mk_avi(320, 240)),
        (4, "image", b"\x00\x01\x02 not a container"),
    ]
    out = {
        r.media_id: (r.format, r.inferred_kind, r.mismatch)
        for r in media_mislabel_audit(
            spark.createDataFrame(
                rows, "media_id long, kind string, payload binary"
            )
        ).collect()
    }
    assert out[0] == ("png", "image", 0)
    assert out[1] == ("wav", "audio", 1)
    assert out[2] == ("mp4", "video", 1)
    assert out[3] == ("avi", "video", 0)
    assert out[4] == ("unknown", "unknown", 1)


def test_media_index_double_append_is_decision_idempotent(spark, tmp_path):
    """append_to_media_index is a plain parquet append — NOT
    physically idempotent under a retried job. This pins why that is
    SAFE: classification is membership (exact digest) + banded
    distinct (near), so duplicate index rows can never flip any
    decision — the crash-replay contract for the media index is
    set-semantics, not a ledger."""
    corpus, incoming = _inc_fixture(spark)
    idx = str(tmp_path / "idx")
    multimodal.build_media_index(corpus, idx)
    before = {
        r.media_id: r.decision
        for r in multimodal.incremental_media_dedup_indexed(
            incoming, idx
        ).collect()
    }
    new_ids = [m for m, d in before.items() if d == "new"]
    admitted = incoming.filter(F.col("media_id").isin(new_ids))
    # the "crashed after append, job retried" scenario: same admitted
    # batch appended TWICE
    multimodal.append_to_media_index(admitted, idx)
    multimodal.append_to_media_index(admitted, idx)
    hashes = spark.read.parquet(f"{idx}/hashes")
    assert hashes.count() > hashes.dropDuplicates(["kind", "digest"]).count()
    after = {
        r.media_id: r.decision
        for r in multimodal.incremental_media_dedup_indexed(
            incoming, idx
        ).collect()
    }
    assert all(after[m] == "dup_exact" for m in new_ids)
    assert all(
        after[m] == before[m] for m in before if m not in new_ids
    )


def test_avi_deeply_nested_lists_never_throw():
    """ADVICE r13 (medium): a crafted ~12KB payload of ~1200 nested
    LIST headers used to blow Python's recursion limit in the avih
    walk — RecursionError is in no audit path's caught-exception list,
    so ONE adversarial file would kill a whole 100TB header scan even
    in on_unsupported='null' mode. The walk is now an explicit-stack
    DFS (same traversal order); the deepest-nested avih is still
    found, and pure nesting with no avih degrades to NULL dims."""
    import struct

    le32 = lambda v: struct.pack("<I", v)
    avih = (
        b"avih" + le32(56) + b"\x00" * 32 + le32(320) + le32(240)
        + b"\x00" * 16
    )
    body = avih
    for _ in range(1200):
        body = b"LIST" + le32(4 + len(body)) + b"hdrl" + body
    buf = b"RIFF" + le32(4 + len(body)) + b"AVI " + body
    assert multimodal._sniff_header(buf) == ("avi", 320, 240, None, None)
    # no avih anywhere: the walk must exhaust every level and NULL out
    body = b"JUNK" + le32(4) + b"\x00" * 4
    for _ in range(1200):
        body = b"LIST" + le32(4 + len(body)) + b"hdrl" + body
    buf = b"RIFF" + le32(4 + len(body)) + b"AVI " + body
    assert multimodal._sniff_header(buf) == ("avi", None, None, None, None)
    # deferred-continuation case: avih is a SIBLING after an exhausted
    # nested LIST — the explicit stack must resume the outer span
    junk = b"JUNK" + le32(4) + b"\x00" * 4
    nested = b"LIST" + le32(4 + len(junk)) + b"strl" + junk
    hdrl_body = nested + avih
    hdrl = b"LIST" + le32(4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    buf = b"RIFF" + le32(4 + len(hdrl)) + b"AVI " + hdrl
    assert multimodal._sniff_header(buf) == ("avi", 320, 240, None, None)


def test_neardup_default_cap_in_production_entry_points(spark):
    """VERDICT r13 item 2: the production entry points default to the
    documented hot-bucket cap (DEFAULT_PHASH_BUCKET_CAP); None is the
    explicit uncapped escape and what the oracle registry entry
    passes. Planted-pair parity holds under the default — true
    near-dup clusters are tiny — while a >cap near-identical cluster
    is excluded by default (it belongs in the exact digest tier) and
    returned in full by the escape."""
    media = multimodal.synth_real_media_neardups(spark, n_contents=8)
    key = lambda df: {
        (r.kind, r.id_a, r.id_b, r.hamming) for r in df.collect()
    }
    dflt = key(multimodal.media_phash_neardup_pairs(media, max_hamming=3))
    uncapped = key(
        multimodal.media_phash_neardup_pairs(
            media, max_hamming=3, max_bucket_size=None
        )
    )
    assert dflt and dflt == uncapped
    n = multimodal.DEFAULT_PHASH_BUCKET_CAP + 6
    px = multimodal.synth_variant_pixels(5)
    cluster = spark.createDataFrame(
        [
            (i, "image", multimodal._encode_png(px, filters=(i % 5,)))
            for i in range(n)
        ],
        "media_id long, kind string, payload binary",
    )
    assert (
        multimodal.media_phash_neardup_pairs(cluster, max_hamming=3).count()
        == 0
    )
    assert multimodal.media_phash_neardup_pairs(
        cluster, max_hamming=3, max_bucket_size=None
    ).count() == n * (n - 1) // 2
    # the from_profile twin (LIVE frame path) shares the default
    assert multimodal.media_neardup_pairs_from_profile(
        multimodal.media_profile(cluster)
    ).count() == 0


def test_neardup_from_live_profile_matches_payload_form(spark):
    """ADVICE r13 (low): the LIVE-frame form of
    media_neardup_pairs_from_profile now localCheckpoints the hash
    frame (the parquet form never needed it) so the self-join cannot
    re-plan the mapInPandas decode per side — and the result is
    pair-identical to the payload form."""
    media = multimodal.synth_real_media_neardups(spark, n_contents=10)
    key = lambda df: sorted(
        (r.kind, r.id_a, r.id_b, r.hamming) for r in df.collect()
    )
    live = multimodal.media_neardup_pairs_from_profile(
        multimodal.media_profile(media, on_unsupported="null")
    )
    assert key(live) == key(
        multimodal.media_phash_neardup_pairs(
            media, max_hamming=3, on_unsupported="null"
        )
    )


def test_index_phash_version_guard(spark, tmp_path):
    """ADVICE r13 (low): persisted hash artifacts pin PHASH_VERSION —
    an index built under other `_lum_planes` semantics mixed with
    current-version incoming hashes silently loses near-dup recall on
    alpha-carrying images (dup_exact is digest-keyed and masks it).
    Serve AND append refuse pre-versioning and mismatched indexes,
    mirroring the r12 digest-column rebuild guard."""
    import shutil

    corpus, incoming = _inc_fixture(spark)
    idx = str(tmp_path / "idx")
    multimodal.build_media_index(corpus, idx)
    assert (
        spark.read.parquet(f"{idx}/meta").head().phash_version
        == multimodal.PHASH_VERSION
    )
    multimodal.incremental_media_dedup_indexed(incoming, idx).collect()
    # pre-r14 index: meta row without the version column
    legacy = spark.read.parquet(f"{idx}/meta").drop("phash_version")
    legacy.write.mode("overwrite").parquet(f"{idx}/meta_legacy")
    shutil.rmtree(f"{idx}/meta")
    shutil.move(f"{idx}/meta_legacy", f"{idx}/meta")
    with pytest.raises(ValueError, match="predates phash versioning"):
        multimodal.incremental_media_dedup_indexed(incoming, idx).collect()
    # version number from a different algorithm generation
    spark.createDataFrame(
        [(3, 4, multimodal.PHASH_VERSION + 1)],
        "max_hamming int, n_bands int, phash_version int",
    ).write.mode("overwrite").parquet(f"{idx}/meta")
    with pytest.raises(ValueError, match="phash_version"):
        multimodal.incremental_media_dedup_indexed(incoming, idx).collect()
    with pytest.raises(ValueError, match="phash_version"):
        multimodal.append_to_media_index(incoming, idx)
    with pytest.raises(ValueError, match="phash_version"):
        multimodal.prep_media_incremental(incoming, idx).collect()


def test_profile_phash_version_guard(spark, tmp_path):
    """Profile twin of the index version guard: build_media_profile
    persists `_phash_meta` (underscore prefix = invisible to the
    profile's own parquet scan); path-based readers refuse a missing
    or mismatched version table. LIVE frames skip the check — their
    hashes are current-version by construction."""
    import shutil

    media = multimodal.synth_real_media_neardups(spark, n_contents=4)
    path = str(tmp_path / "prof")
    multimodal.build_media_profile(media, path)
    # the side table must not leak into the profile scan itself
    assert "phash_version" not in spark.read.parquet(path).columns
    multimodal.media_neardup_pairs_from_profile(path).collect()
    multimodal.prep_media_from_profile(path).collect()
    spark.createDataFrame(
        [(multimodal.PHASH_VERSION + 1,)], "phash_version int"
    ).write.mode("overwrite").parquet(f"{path}/_phash_meta")
    with pytest.raises(ValueError, match="phash_version"):
        multimodal.media_neardup_pairs_from_profile(path)
    with pytest.raises(ValueError, match="phash_version"):
        multimodal.prep_media_from_profile(path)
    shutil.rmtree(f"{path}/_phash_meta")
    with pytest.raises(ValueError, match="_phash_meta"):
        multimodal.media_neardup_pairs_from_profile(path)
    with pytest.raises(ValueError, match="_phash_meta"):
        multimodal.prep_media_from_profile(path)
    # ADVICE r14: only the MISSING-table case means "predates
    # versioning" — a corrupt/unreadable meta table (stand-in for
    # transient IO trouble on a perfectly valid profile) must
    # propagate the original error, NOT misdiagnose as stale and
    # invite discarding an expensive-to-recompute profile
    import os

    os.makedirs(f"{path}/_phash_meta", exist_ok=True)
    with open(f"{path}/_phash_meta/part-00000.parquet", "wb") as fh:
        fh.write(b"not a parquet file")
    with pytest.raises(Exception) as exc_info:
        multimodal.media_neardup_pairs_from_profile(path)
    assert not isinstance(exc_info.value, ValueError)
    assert "predates" not in str(exc_info.value)


def test_media_prep_stream_fused_matches_batch(spark, tmp_path):
    """VERDICT r13 item 3: the FUSED streaming media prep (one decode
    per micro-batch feeding gate + watermark dedup + contamination
    tag) is content-equivalent to batch prep_media on the same corpus
    — same admitted (kind, phash, digest, contamination) set; the
    representative differs only by contract (first arrival vs min
    media_id). Planted: re-encoded cross-batch duplicates (dedup),
    every quality-violation row of the gate fixture (gate), one
    benchmark re-encode ('exact' tag) and one benchmark edited copy
    ('candidate' tag)."""
    import datetime

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.multimodal import (
        prep_media,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_prep_stream,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    fixture = [
        (r.media_id, r.kind, bytes(r.payload))
        for r in multimodal.synth_media_quality_fixture(spark).collect()
    ]
    # batch 0: the quality fixture; batch 1: re-encodes of the clean
    # contents (same decoded content, different bytes, higher ids)
    b0 = [
        (mid, kind, payload, t0 + datetime.timedelta(seconds=i))
        for i, (mid, kind, payload) in enumerate(fixture)
    ]
    b1 = [
        (
            1000 + cid,
            *_enc_cid(cid, variant=1),
            t0 + datetime.timedelta(seconds=120 + cid),
        )
        for cid in range(10)
    ]
    sschema = "media_id long, kind string, payload binary, ts timestamp"
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, sschema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(b1, sschema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    bench = spark.createDataFrame(
        [
            (0, *_enc_cid(2, variant=3)),        # same content as cid 2
            (1, *_enc_cid(4, perturb=True)),     # edited copy of cid 4
        ],
        "media_id long, kind string, payload binary",
    )

    stream = (
        spark.readStream.schema(sschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        media_prep_stream(stream, bench, watermark="30 days")
        .writeStream.format("memory")
        .queryName("media_prep_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not terminate within 600s"
    got = spark.table("media_prep_stream_t").toPandas()

    corpus = spark.createDataFrame(
        [(mid, kind, payload) for (mid, kind, payload, _) in b0]
        + [(mid, kind, payload) for (mid, kind, payload, _) in b1],
        "media_id long, kind string, payload binary",
    )
    want = prep_media(corpus, bench).toPandas()

    key = lambda pdf: sorted(
        (r.kind, int(r.phash), r.digest, r.contamination or "")
        for r in pdf.itertuples()
    )
    assert key(got) == key(want)
    # one admitted row per distinct content, despite the re-encodes
    assert got.groupby(["kind", "digest"]).size().max() == 1
    tag_of = {
        d: (c or None)
        for d, c in zip(want["digest"], want["contamination"])
    }
    exact_digest = multimodal.content_digest(_enc_cid(2)[1])
    assert tag_of[exact_digest] == "exact"
    cand_digest = multimodal.content_digest(_enc_cid(4)[1])
    assert tag_of[cand_digest] == "candidate"


def test_media_profile_phash_exact_with_nulls_in_batch(spark):
    """r14 regression pin (found by the fused-stream equivalence
    test): a corrupt payload sharing ONE Arrow batch with clean
    payloads must not perturb the clean rows' phash.
    pd.DataFrame's dtype inference turned the None-carrying phash
    column float64 and silently rounded every 64-bit hash to its
    53-bit mantissa (multiples of 1024 at phash magnitudes) before
    the Int64 cast. Partitioning-dependent before the fix — batch
    jobs dodged it whenever corrupt rows landed in their own
    partition, which is why 192 oracles never saw it."""
    clean = multimodal._encode_wav(multimodal.synth_variant_frames(3))
    df = spark.createDataFrame(
        [(3, "audio", clean), (99, "image", b"\x89PNG\r\n\x1a\n junk")],
        "media_id long, kind string, payload binary",
    ).coalesce(1)
    got = {r.media_id: r.phash for r in multimodal.media_profile(df).collect()}
    assert got[3] == multimodal._phash(clean)  # bit-exact, not ±512
    assert got[99] is None


def test_media_prep_stream_restart_resumes_without_dups(spark, tmp_path):
    """Crash-replay contract for the fused stream: drain two files,
    'crash' (stop), land two more files, restart over the SAME
    checkpoint — the final admitted set must equal a one-shot drain
    (no re-emitted rows from replayed batches, dedup state recovered
    from the state store, cross-crash duplicates still dropped)."""
    import datetime

    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_prep_stream,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    sschema = "media_id long, kind string, payload binary, ts timestamp"
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")

    def wave(variant, id_base):
        rows = [
            (
                id_base + cid,
                *_enc_cid(cid, variant=variant),
                t0 + datetime.timedelta(seconds=60 * variant + cid),
            )
            for cid in range(6)
        ]
        spark.createDataFrame(rows, sschema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "out")

    def drain():
        stream = (
            spark.readStream.schema(sschema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            media_prep_stream(stream, watermark="30 days")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        return spark.read.parquet(out).toPandas()

    wave(0, 0)
    wave(1, 1000)  # re-encodes of wave-0 contents -> dups
    drain()
    wave(2, 2000)  # more re-encodes: dups ACROSS the crash boundary
    wave(0, 3000)  # byte-identical replicas of wave 0
    total = drain()
    assert len(total) == 6
    assert total.groupby(["kind", "digest"]).size().max() == 1
    # recovered state, not post-crash arrivals, must own the contents:
    # every representative is a PRE-crash id (wave 0 or 1 — parquet
    # part files dispatch in racy mtime order within a drain, so the
    # winner between those two waves is not pinned; see the watermark
    # comment in test_media_dedup_within_watermark_streaming)
    assert set(total["media_id"]) <= set(range(6)) | set(range(1000, 1006))


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_sniff_header_never_throws_on_random_bytes(buf):
    """_sniff_header's never-throws contract, fuzzed on raw random
    bytes (the r13 AVI RecursionError showed crafted containers can
    break it even when random bytes don't — this pins the base
    contract; test_avi_deeply_nested_lists_never_throw pins the
    adversarial-structure case)."""
    out = multimodal._sniff_header(buf)
    assert isinstance(out, tuple) and len(out) == 5


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=256), st.sampled_from(
    [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8", b"RIFF", b"LIST",
     b"RIFFxxxxWAVE", b"RIFFxxxxAVI ", b"\x00\x00\x00\x10ftyp"]
))
def test_sniff_header_never_throws_on_magic_prefixed_garbage(tail, magic):
    """Same contract with every recognized magic prefix stapled onto
    random garbage — forces the format-specific walkers (JPEG marker
    stream, RIFF chunk list, ISO-BMFF box walk, AVI LIST descent)
    down their parse loops on inputs that lie about their lengths."""
    out = multimodal._sniff_header(magic + tail)
    assert isinstance(out, tuple) and len(out) == 5
    for v in out[1:]:
        assert v is None or (isinstance(v, int) and 0 <= v <= 2**31 - 1)


def test_media_prep_stream_broadcast_bench_matches_literal(spark, tmp_path):
    """VERDICT r14 item 3 / ADVICE r14: above ``bench_literal_max``
    the contamination tag switches from a plan-literal array to a
    broadcast stream-static join carrying the same array in broadcast
    data. Forcing the broadcast path (``bench_literal_max=0``) on the
    planted-contamination corpus must produce the identical admitted
    (kind, phash, digest, contamination) set as batch prep_media —
    and therefore as the literal path, which the fused-equivalence
    test pins against the same batch oracle."""
    import datetime

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.multimodal import (
        prep_media,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_prep_stream,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    sschema = "media_id long, kind string, payload binary, ts timestamp"
    rows = [
        (cid, *_enc_cid(cid), t0 + datetime.timedelta(seconds=cid))
        for cid in range(8)
    ] + [
        (1000 + cid, *_enc_cid(cid, variant=2),
         t0 + datetime.timedelta(seconds=120 + cid))
        for cid in range(4)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, sschema).coalesce(1).write.parquet(src)
    bench = spark.createDataFrame(
        [
            (0, *_enc_cid(1, variant=3)),     # re-encode of cid 1 -> exact
            (1, *_enc_cid(2, perturb=True)),  # edited copy of cid 2 -> candidate
        ],
        "media_id long, kind string, payload binary",
    )

    stream = (
        spark.readStream.schema(sschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        media_prep_stream(
            stream, bench, watermark="30 days", bench_literal_max=0
        )
        .writeStream.format("memory")
        .queryName("media_prep_bcast_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = spark.table("media_prep_bcast_t").toPandas()
    corpus = spark.createDataFrame(
        [(mid, kind, payload) for (mid, kind, payload, _) in rows],
        "media_id long, kind string, payload binary",
    )
    want = prep_media(corpus, bench).toPandas()
    key = lambda pdf: sorted(
        (r.kind, int(r.phash), r.digest, r.contamination or "")
        for r in pdf.itertuples()
    )
    assert key(got) == key(want)
    tags = set(got["contamination"].dropna())
    assert tags == {"exact", "candidate"}


def test_media_prep_stream_first_arrival_diverges_from_min_id(spark, tmp_path):
    """VERDICT r14 item 5: the fused stream's representative is FIRST
    ARRIVAL while batch prep_media elects min media_id. On a fixture
    where a HIGH id arrives strictly before a low-id re-encode of the
    same content (two drains over one checkpoint pin the order), the
    documented contract is: (kind, phash, digest, contamination)-set
    equality with batch, while the representative id column DIVERGES
    (stream keeps the early high id, batch elects the low id)."""
    import datetime

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.multimodal import (
        prep_media,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_prep_stream,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    sschema = "media_id long, kind string, payload binary, ts timestamp"
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def drain():
        stream = (
            spark.readStream.schema(sschema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            media_prep_stream(stream, watermark="30 days")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        return spark.read.parquet(out).toPandas()

    # wave A: HIGH ids 500..503 arrive first (separate drain pins order)
    wave_a = [
        (500 + cid, *_enc_cid(cid), t0 + datetime.timedelta(seconds=cid))
        for cid in range(4)
    ]
    spark.createDataFrame(wave_a, sschema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    # wave B: LOW-id re-encodes of the same contents arrive later
    wave_b = [
        (cid, *_enc_cid(cid, variant=1),
         t0 + datetime.timedelta(seconds=60 + cid))
        for cid in range(4)
    ]
    spark.createDataFrame(wave_b, sschema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = drain()

    corpus = spark.createDataFrame(
        [(m, k, p) for (m, k, p, _) in wave_a + wave_b],
        "media_id long, kind string, payload binary",
    )
    want = prep_media(corpus).toPandas()
    key = lambda pdf: sorted(
        (r.kind, int(r.phash), r.digest, r.contamination or "")
        for r in pdf.itertuples()
    )
    assert key(got) == key(want)                      # content contract holds
    assert set(got["media_id"]) == set(range(500, 504))  # first arrival wins
    assert set(want["media_id"]) == set(range(4))        # batch: min id wins
    assert set(got["media_id"]).isdisjoint(set(want["media_id"]))


def test_media_prep_stream_decode_partitions_modes(spark, tmp_path):
    """decode_partitions contract (VERDICT r14 item 1): 'auto'
    (default) repartitions the micro-batch to defaultParallelism
    before the decode, None keeps the source's split count, an int
    pins the width, anything else raises. Checked on the analyzed
    plan — no stream execution needed."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_prep_stream,
    )

    sschema = "media_id long, kind string, payload binary, ts timestamp"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, *_enc_cid(0), None)], sschema
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(sschema).parquet(src)

    def n_repart(df):
        plan = df._jdf.queryExecution().analyzed().toString()
        return plan.count("Repartition")

    auto = media_prep_stream(stream)
    assert n_repart(auto) == 1
    assert (
        f"Repartition {spark.sparkContext.defaultParallelism}"
        in auto._jdf.queryExecution().analyzed().toString()
    )
    off = media_prep_stream(stream, decode_partitions=None)
    assert n_repart(off) == 0
    pinned = media_prep_stream(stream, decode_partitions=7)
    assert "Repartition 7" in pinned._jdf.queryExecution().analyzed().toString()
    with pytest.raises(ValueError, match="decode_partitions"):
        media_prep_stream(stream, decode_partitions="all")


def test_media_prep_stream_broadcast_bench_survives_restart(spark, tmp_path):
    """r15: the broadcast contamination path adds a localCheckpointed
    one-row static frame to the streaming plan — prove checkpoint
    recovery still works through it: drain, stop, land new files
    (including a benchmark re-encode), restart on the SAME checkpoint
    with a RE-BUILT plan (fresh collect + localCheckpoint, the
    documented restart shape). Admitted set must stay dup-free across
    the crash and the late benchmark hit must carry its tag."""
    import datetime

    from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
        media_prep_stream,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    sschema = "media_id long, kind string, payload binary, ts timestamp"
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    out = str(tmp_path / "out")
    bench = spark.createDataFrame(
        [(0, *_enc_cid(2, variant=3))],  # same content as cid 2
        "media_id long, kind string, payload binary",
    )

    def drain():
        stream = (
            spark.readStream.schema(sschema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            media_prep_stream(
                stream, bench, watermark="30 days", bench_literal_max=0
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        return spark.read.parquet(out).toPandas()

    wave0 = [
        (cid, *_enc_cid(cid), t0 + datetime.timedelta(seconds=cid))
        for cid in range(4)  # cids 0..3: includes bench content cid 2
    ]
    spark.createDataFrame(wave0, sschema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    first = drain()
    assert set(first["media_id"]) == set(range(4))
    # 'crash'; then re-encodes of cids 0..3 (dups across the boundary)
    # plus two genuinely new contents, one of them the bench content
    # re-encoded again (stays deduped: digest matches admitted cid 2)
    wave1 = [
        (100 + cid, *_enc_cid(cid, variant=1),
         t0 + datetime.timedelta(seconds=60 + cid))
        for cid in range(4)
    ] + [
        (200 + cid, *_enc_cid(10 + cid),
         t0 + datetime.timedelta(seconds=120 + cid))
        for cid in range(2)
    ]
    spark.createDataFrame(wave1, sschema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    total = drain()
    assert len(total) == 6  # 4 originals + 2 new contents, zero dups
    assert total.groupby(["kind", "digest"]).size().max() == 1
    tag_of = dict(zip(total["media_id"], total["contamination"]))
    assert tag_of[2] == "exact"  # pre-crash hit kept its tag
    assert set(total["media_id"]) == set(range(4)) | {200, 201}
