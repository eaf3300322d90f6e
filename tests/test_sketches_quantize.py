"""Gates for the r4 approximate-tier additions: Count-Min sketch,
MinHash estimator accuracy, int8 embedding quantization. The registry
oracles assert the same contracts cross-engine; these tests pin the
operator-level properties (CMS one-sided error, estimator envelope,
quantizer round-trip incl. the degenerate constant vector)."""

from __future__ import annotations

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import (
    dedup,
    sketches,
    similarity,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.functions.hashing import (
    token_array,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table


def test_cms_never_underestimates(spark, sf_dir):
    """The defining CMS property: estimate ≥ exact for EVERY token
    (collisions only add). Checked for all distinct tokens, not just
    heavy hitters."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(token_array(F.col("text"))).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    counters = sketches.cms_build(docs, "text")
    est = sketches.cms_estimate(counters, exact, "token")
    bad = (
        exact.join(est, "token")
        .filter(F.col("cms_estimate") < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_cms_unseen_token_estimates_zero_ish(spark, sf_dir):
    """A query token never seen in the corpus must get a row (not
    vanish in the cell join) and a near-zero estimate: min over its
    depth cells, with absent cells counting as 0."""
    docs = load_table(spark, sf_dir, "documents")
    counters = sketches.cms_build(docs, "text")
    probe = spark.createDataFrame(
        [("zzqqxyzzy-not-a-real-token",)], "token string"
    )
    rows = sketches.cms_estimate(counters, probe, "token").collect()
    assert len(rows) == 1
    assert rows[0]["cms_estimate"] >= 0


def test_cms_counter_table_is_sketch_sized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counters = sketches.cms_build(docs, "text")
    assert counters.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH


def test_cms_heavy_hitters_gate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = sketches.cms_heavy_hitters_check(docs, "text", k=20).collect()
    assert len(rows) == 20
    assert all(r["within_bound"] for r in rows)


def test_cms_merge_across_splits_equals_batch(spark, sf_dir):
    """Mergeability — the property that makes a sketch a STREAMING
    summary: building per-split counter tables and summing them
    cell-wise must equal the one-shot batch sketch exactly (counters
    are plain sums; bit-identical, not approximately equal)."""
    docs = load_table(spark, sf_dir, "documents")
    whole = sketches.cms_build(docs, "text")
    parts = [
        sketches.cms_build(docs.filter(F.col("doc_id") % 3 == i), "text")
        for i in range(3)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("row", "cell")
        .agg(F.sum("counter").alias("counter"))
    )
    a = {(r["row"], r["cell"]): r["counter"] for r in whole.collect()}
    b = {(r["row"], r["cell"]): r["counter"] for r in merged.collect()}
    assert a == b


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_dir):
    """Both Bloom guarantees on real data: every member gram probes
    TRUE (structural — zero false negatives), and non-member false
    positives stay under 2% at the configured geometry."""
    docs = load_table(spark, sf_dir, "documents")
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        word_ngrams_from_tokens,
    )

    grams = docs.select(
        F.explode(
            word_ngrams_from_tokens(token_array(F.col("text")), 5)
        ).alias("gram")
    ).distinct()
    members = grams.limit(2000)
    bits = sketches.bloom_build(members, "gram")
    probed_members = sketches.bloom_might_contain(
        bits, members.withColumn("_k", F.lit(1)), "gram", ["_k"]
    )
    assert probed_members.filter(~F.col("might_contain")).count() == 0
    # non-members: synthetic gram strings not in the corpus
    non = spark.range(2000).select(
        F.concat(F.lit("zz-bloom-probe-"), F.col("id")).alias("gram"),
        F.lit(1).alias("_k"),
    )
    fp = (
        sketches.bloom_might_contain(bits, non, "gram", ["_k"])
        .filter(F.col("might_contain"))
        .count()
    )
    assert fp <= 0.02 * 2000, fp


def test_minhash_estimate_envelope(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = dedup.minhash_estimate_check(docs, "text", "doc_id").collect()
    assert len(rows) == 50
    assert all(0.0 <= r["exact_jaccard"] <= 1.0 for r in rows)
    assert all(r["within_bound"] for r in rows)


def test_quantize_round_trip_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.quantize_embeddings_check(emb)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(r["within_bound"] for r in rows)
    dim = len(emb.select("embedding").first()[0])
    assert all(0 <= r["code_sum"] <= 255 * dim for r in rows)


def test_quantized_ann_recall_gate(spark, sf_dir):
    """The combined compression + probing loss stays above the serving
    bar: IVF search over int8-dequantized vectors (trained quantizer)
    recalls ≥ 0.8 of the exact full-precision top-5 on average."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents, _, _ = similarity.kmeans_fit(emb, k=8, max_iterations=8)
    dq = similarity.dequantized_embeddings(emb)
    exact = similarity.brute_force_topk(emb, [0, 1, 2, 3, 4], k=5)
    approx = similarity.ivf_topk(
        dq, [0, 1, 2, 3, 4], k=5, nprobe=4, centroids=cents
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.8


def test_quantize_degenerate_constant_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 0.5, 0.5]), (2, [0.0, 1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r
        for r in similarity.quantize_embeddings_check(df).collect()
    }
    assert rows[1]["within_bound"] and rows[1]["code_sum"] == 0
    assert rows[2]["within_bound"]
    # codes for [0,1,2] over scale (2-0)/255: 0 + round(127.5)=128 + 255
    assert rows[2]["code_sum"] == 0 + 128 + 255


def test_embed_standardize_zscores(spark):
    """Per-dimension z-scores: mean 0 / unit population variance on a
    known fixture; zero-variance dims standardize to 0.0."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.similarity import (
        embed_standardize,
    )

    rows = [
        (1, [1.0, 5.0, 7.0]),
        (2, [3.0, 5.0, 9.0]),
        (3, [5.0, 5.0, 11.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r["zvec"] for r in embed_standardize(df).collect()}
    # dim0: mean 3, pop std sqrt(8/3); dim1 constant -> 0; dim2: mean 9
    import math

    s0 = math.sqrt(8.0 / 3.0)
    assert out[1][0] == round((1.0 - 3.0) / s0, 6)
    assert out[3][0] == round((5.0 - 3.0) / s0, 6)
    assert all(out[i][1] == 0.0 for i in (1, 2, 3))
    assert out[2][2] == 0.0  # (9-9)/std
    # z-scores sum to ~0 per dim
    assert abs(sum(out[i][0] for i in (1, 2, 3))) < 1e-9


def test_rolling_hll_accuracy_vs_exact(spark, sf_dir):
    """The rolling estimate must land within ~3x the theoretical rsd
    (1.04/sqrt(512) ~ 4.6%) of the EXACT trailing-7-day distinct count
    for every day — computed here brute-force per day."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.sketches import (
        rolling_distinct_hll,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    est = {
        r["day"]: r["est_distinct"]
        for r in rolling_distinct_hll(ev, "ts", "user_id").collect()
    }
    rows = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).collect()
    from collections import defaultdict
    import datetime as dt

    by_day = defaultdict(set)
    for r in rows:
        by_day[r["d"]].add(r["user_id"])
    for day_s, e in est.items():
        d = dt.date.fromisoformat(day_s)
        exact = len(
            set().union(
                *[
                    by_day.get(d - dt.timedelta(days=k), set())
                    for k in range(7)
                ]
            )
        )
        assert abs(e - exact) <= max(0.15 * exact, 3.0), (day_s, e, exact)


def test_theta_sketch_estimates_and_algebra(spark):
    """r15 theta sketch: on a PLANTED universe large enough to sample
    (80k keys split into two groups with a known 50% overlap), the
    distinct and intersection estimates land inside their 3σ
    envelopes, the envelope booleans say so, and the sketch obeys its
    definition (est = DENOM · |sample| exactly; sample = keys whose
    md5 falls under θ — verified on a hand-computed row)."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.sketches import (
        THETA_DENOM,
        theta_distinct,
        theta_distinct_checked,
        theta_overlap_checked,
    )

    # group A: keys 0..59999; group B: 30000..89999 -> |∩| = 30000,
    # |A| = |B| = 60000, jaccard = 1/3
    df = spark.range(0, 60000).selectExpr("'A' AS grp", "id AS k").union(
        spark.range(30000, 90000).selectExpr("'B' AS grp", "id AS k")
    )
    got = {
        r.grp: r
        for r in theta_distinct_checked(df, "grp", "k").collect()
    }
    for g in ("A", "B"):
        r = got[g]
        assert r.exact_distinct == 60000
        assert r.est_distinct == r.n_sampled * THETA_DENOM
        assert r.within_envelope
        assert abs(r.est_distinct - 60000) <= 3 * (63 * 60000) ** 0.5 + 64
    # production (no-exact) form agrees with the checked estimates
    prod = {r.grp: r for r in theta_distinct(df, "grp", "k").collect()}
    for g in ("A", "B"):
        assert prod[g].est_distinct == got[g].est_distinct
    ov = theta_overlap_checked(df, "grp", "k").collect()
    assert len(ov) == 1
    o = ov[0]
    assert (o.type_a, o.type_b) == ("A", "B")
    assert o.exact_intersection == 30000
    assert o.within_envelope
    assert abs(o.est_intersection - 30000) <= 3 * (63 * 30000) ** 0.5 + 64
    # jaccard estimate within a loose band around the true 1/3
    assert 0.25 <= float(o.est_jaccard) <= 0.42


def test_theta_sketch_is_mergeable(spark):
    """The sketch state (sub-θ hash sample) of a union equals the
    union of the states — shard sketches fold with a plain DISTINCT,
    no re-scan of the shards."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.sketches import (
        theta_sample,
    )

    shard1 = spark.range(0, 20000).selectExpr("'A' AS grp", "id AS k")
    shard2 = spark.range(15000, 40000).selectExpr("'A' AS grp", "id AS k")
    whole = shard1.union(shard2)
    merged = theta_sample(shard1, "grp", "k").union(
        theta_sample(shard2, "grp", "k")
    ).distinct()
    direct = theta_sample(whole, "grp", "k")
    a = {(r.grp, r.h) for r in merged.collect()}
    b = {(r.grp, r.h) for r in direct.collect()}
    assert a == b and a


def test_theta_capped_estimate_both_branches(spark):
    """r16 capped-KMV theta: below saturation the sketch IS the
    distinct set (estimate exact); at saturation the KMV estimator
    (k−1)·2^60/h_k lands inside its 3σ envelope on a planted 60k-key
    group; θ equals the k-th smallest hash by definition."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.sketches import (
        THETA_K,
        theta_distinct_capped,
        theta_distinct_capped_checked,
        theta_sample_capped,
    )

    # group S: 50 keys (< k, exact branch); group L: 60k keys
    df = spark.range(0, 50).selectExpr("'S' AS grp", "id AS k").union(
        spark.range(0, 60000).selectExpr("'L' AS grp", "id + 1000000 AS k")
    )
    got = {
        r.grp: r
        for r in theta_distinct_capped_checked(df, "grp", "k").collect()
    }
    s = got["S"]
    assert s.n_sampled == 50
    assert s.theta_k == 1 << 60
    assert s.est_distinct == 50.0
    assert s.within_envelope
    lg = got["L"]
    assert lg.n_sampled == THETA_K
    assert lg.theta_k < 1 << 60
    assert lg.within_envelope
    assert abs(lg.est_distinct - 60000) <= 3.0 / (THETA_K - 2) ** 0.5 * 60000 + 2.0
    # theta IS the k-th smallest sampled hash
    ks = (
        theta_sample_capped(df, "grp", "k")
        .filter("grp = 'L'")
        .orderBy("rk")
        .collect()
    )
    assert len(ks) == THETA_K
    assert ks[-1].h == lg.theta_k
    assert [r.rk for r in ks] == list(range(1, THETA_K + 1))
    # production form agrees with the checked estimates
    prod = {r.grp: r for r in theta_distinct_capped(df, "grp", "k").collect()}
    for g in ("S", "L"):
        assert prod[g].est_distinct == got[g].est_distinct
        assert prod[g].theta_k == got[g].theta_k


def test_theta_capped_state_is_bounded_and_mergeable(spark):
    """The r16 done-bar properties: (a) sketch-of-shards merged with
    "k smallest of the union" equals sketch-of-whole BIT-EXACTLY;
    (b) state stays frozen at k rows per group however many distinct
    keys stream in (the fixed-θ sample grows as n/64 on the same
    data — measured side by side)."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.sketches import (
        theta_capped_merge,
        theta_sample,
        theta_sample_capped,
    )

    k = 64
    shard1 = spark.range(0, 30000).selectExpr("'A' AS grp", "id AS k")
    shard2 = spark.range(20000, 70000).selectExpr("'A' AS grp", "id AS k")
    whole = shard1.union(shard2)
    merged = theta_capped_merge(
        k,
        theta_sample_capped(shard1, "grp", "k", k),
        theta_sample_capped(shard2, "grp", "k", k),
    )
    direct = theta_sample_capped(whole, "grp", "k", k)
    a = sorted((r.grp, r.h, r.rk) for r in merged.collect())
    b = sorted((r.grp, r.h, r.rk) for r in direct.collect())
    assert a == b and len(a) == k
    # bounded vs growing: same 70k-key group, capped state = k rows,
    # fixed-θ state ~ 70000/64 ≈ 1094 rows
    fixed_n = theta_sample(whole, "grp", "k").count()
    assert fixed_n > 10 * k


def test_theta_overlap_refuses_unbounded_group_columns(spark):
    """ADVICE r15: the overlap forms build O(G²) broadcast pairs —
    a group column above max_groups must refuse loudly at plan time,
    and the escape hatch (None) must still work."""
    import pytest

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.sketches import (
        theta_overlap,
    )

    df = spark.range(0, 40).selectExpr(
        "CAST(id % 20 AS STRING) AS grp", "id AS k"
    )
    with pytest.raises(ValueError, match="max_groups"):
        theta_overlap(df, "grp", "k", max_groups=10)
    # at or under the cap (and with the cap waived) the plan builds
    assert theta_overlap(df, "grp", "k", max_groups=20).count() == 190
    assert theta_overlap(df, "grp", "k", max_groups=None).count() == 190
