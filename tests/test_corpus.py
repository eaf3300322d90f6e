"""Corpus-construction operator tests (operators/corpus.py +
similarity.embedding_dedup_clusters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import corpus


def _docs(spark):
    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha alpha beta", "en"),
        (3, "delta delta delta epsilon", "fr"),
        (4, "zeta eta theta iota kappa", "fr"),
        (5, "alpha beta gamma delta epsilon zeta", "zh"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_hash_sample_deterministic_and_stratified(spark):
    df = _docs(spark)
    kept1 = {r.doc_id for r in corpus.hash_sample(
        df, "doc_id", {"en": 100, "fr": 0}, "lang", default_rate_pct=50
    ).collect()}
    kept2 = {r.doc_id for r in corpus.hash_sample(
        df.repartition(7), "doc_id", {"en": 100, "fr": 0}, "lang",
        default_rate_pct=50,
    ).collect()}
    assert kept1 == kept2  # partitioning-independent
    assert {1, 2} <= kept1  # en rate 100 keeps all en
    assert not ({3, 4} & kept1)  # fr rate 0 drops all fr


def test_tfidf_scores_and_ranks(spark):
    out = corpus.tfidf_top_terms(_docs(spark), "text", "doc_id", k=2)
    rows = {(r.doc_id, r.rank): (r.term, r.score) for r in out.collect()}
    # doc 3: 'delta' tf=3, df=2 (docs 3,5) -> 3*ln(5/2);
    #        'epsilon' tf=1, df=2 (docs 3,5) -> ln(5/2)
    import math

    term, score = rows[(3, 1)]
    assert term == "delta"
    assert abs(score - round(3 * math.log(5 / 2), 6)) < 1e-9
    term2, score2 = rows[(3, 2)]
    assert term2 == "epsilon"
    assert abs(score2 - round(math.log(5 / 2), 6)) < 1e-9
    # every doc contributes at most k rows
    counts = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 2 for r in counts)


def test_pack_sequences_bins(spark):
    # budget 5: doc1 starts at 0 (bin 0), doc2 at 3 (bin 0), doc3 at 6
    # (bin 1), doc4 at 10 (bin 2), doc5 at 15 (bin 3)
    out = corpus.pack_sequences(_docs(spark), "text", "doc_id", budget_tokens=5)
    got = {r.doc_id: (r.n_tokens, r.bin_id) for r in out.collect()}
    assert got == {1: (3, 0), 2: (3, 0), 3: (4, 1), 4: (5, 2), 5: (6, 3)}


def test_pack_sequences_no_single_partition_data_window(spark):
    """The data-bearing cumsum window must be partitioned by _pid;
    only the per-partition offsets frame (one row per partition) may
    use a global window."""
    df = _docs(spark)
    plan = corpus.pack_sequences(df, "text", "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    # the offsets window runs over a tiny aggregate; the local cumsum
    # window must carry a partition spec
    assert "windowspecdefinition(_pid" in plan.replace(" ", "").lower() or (
        "_pid" in plan
    )


def test_embedding_dedup_clusters_planted(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
         for i in range(20)],
        ["vec_id", "embedding"],
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    planted = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.2 + 0.001).alias("embedding"),
    )
    out = similarity.embedding_dedup_clusters(
        emb.unionByName(planted), threshold=0.95, dim=8
    )
    got = {r.vec_id: r.cluster_rep for r in out.collect()}
    assert len(got) == 23  # every vector labeled
    for i in range(3):
        assert got[i + 100] == got[i]  # planted copy clusters with base
        assert got[i] == i  # min-id representative


def test_benchmark_contamination_counts(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    cands = spark.createDataFrame(
        [
            # trigrams: "alpha beta gamma", "beta gamma delta",
            # "gamma delta zeta" — first two appear in the benchmark
            (1, "alpha beta gamma delta zeta"),
            (2, "nothing shared here at all"),
            (3, "xy"),  # shorter than n -> 0/0/0.0
        ],
        ["doc_id", "text"],
    )
    out = corpus.benchmark_contamination(cands, bench, "text", "doc_id", n=3)
    got = {r.doc_id: (r.n_grams, r.n_shared, r.contamination) for r in out.collect()}
    assert got == {1: (3, 2, round(2 / 3, 6)), 2: (3, 0, 0.0), 3: (0, 0, 0.0)}


def test_unigram_logprob_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], ["doc_id", "text"]
    )
    out = {r.doc_id: (r.n_tokens, r.avg_logprob) for r in
           corpus.unigram_logprob(df, "text", "doc_id").collect()}
    # corpus: a:2 b:2 c:1, total 5
    la, lb, lc = (round(math.log(2 / 5), 6), round(math.log(2 / 5), 6),
                  round(math.log(1 / 5), 6))
    assert out[1] == (3, round((la + la + lb) / 3, 6))
    assert out[2] == (2, round((lb + lc) / 2, 6))


def test_kmeans_recovers_planted_clusters(spark):
    """Spherical Lloyd's on 3 well-separated planted directions must
    converge, recover the clusters with perfect purity, and be
    deterministic under repartitioning."""
    import math

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.similarity import (
        ivf_topk,
        kmeans_fit,
    )

    dims = 8
    centers = [[0.0] * dims for _ in range(3)]
    centers[0][0] = 1.0
    centers[1][3] = 1.0
    centers[2][6] = 1.0
    rows = []
    for i in range(90):
        c = centers[i % 3]
        # deterministic small perturbation, far inside the cluster gap
        noise = [((i * 31 + d * 7) % 13 - 6) / 100.0 for d in range(dims)]
        rows.append((i, [c[d] + noise[d] for d in range(dims)]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    cents, iters, shift = kmeans_fit(emb, k=3, max_iterations=10)
    got = cents.collect()
    assert len(got) == 3 and iters <= 10 and shift < 1e-4
    # each planted direction has exactly one centroid pointing at it
    matched = set()
    for r in got:
        best = max(range(3), key=lambda j: sum(
            a * b for a, b in zip(r.cvec, centers[j])
        ))
        sim = sum(a * b for a, b in zip(r.cvec, centers[best])) / math.sqrt(
            sum(a * a for a in r.cvec)
        )
        assert sim > 0.98
        matched.add(best)
    assert matched == {0, 1, 2}

    # determinism under repartitioning (decimal means, hash seeds)
    cents2, _, _ = kmeans_fit(emb.repartition(7), k=3, max_iterations=10)
    a = sorted((r.cell_id, tuple(r.cvec)) for r in got)
    b = sorted((r.cell_id, tuple(r.cvec)) for r in cents2.collect())
    assert a == b

    # trained quantizer slots into the IVF search path
    out = ivf_topk(emb, [0, 1], k=3, nprobe=1, centroids=cents)
    per_q = {r.query_id for r in out.collect()}
    assert per_q == {0, 1}


def test_cap_per_stratum_deterministic(spark):
    rows = [(i, f"s{i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept1 = {r.doc_id for r in corpus.cap_per_stratum(
        df, "doc_id", "source", 5
    ).collect()}
    kept2 = {r.doc_id for r in corpus.cap_per_stratum(
        df.repartition(7), "doc_id", "source", 5
    ).collect()}
    assert kept1 == kept2 and len(kept1) == 10
    per_src = corpus.cap_per_stratum(df, "doc_id", "source", 5) \
        .groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in per_src)


def test_cap_per_stratum_plan_uses_window_group_limit(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], ["doc_id", "source"]
    )
    p = corpus.cap_per_stratum(df, "doc_id", "source", 3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p


def test_chunk_documents_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6"), (2, "only"), (3, "  .,  ")],
        ["doc_id", "text"],
    )
    out = corpus.chunk_documents(df, "text", "doc_id", chunk_size=4, stride=3)
    rows = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
            for r in out.collect()}
    # doc 1: 7 tokens -> starts 0, 3, 6
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")   # overlap of 1 token
    assert rows[(1, 2)] == (1, "t6")            # short final chunk
    assert rows[(2, 0)] == (1, "only")
    # doc 3 has zero tokens -> no rows
    assert {k[0] for k in rows} == {1, 2}


def test_bigram_logprob_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "solo")], ["doc_id", "text"]
    )
    out = {r.doc_id: (r.n_bigrams, r.avg_bigram_logprob) for r in
           corpus.bigram_logprob(df, "text", "doc_id").collect()}
    # bigram instances: doc1 (a,b) (b,a) (a,b); doc2 (b,a)
    # c2: (a,b)=2 (b,a)=2 ; c1 (left contexts): a=2 b=2
    lab = round(math.log(2 / 2), 6)   # 0.0
    lba = round(math.log(2 / 2), 6)
    assert out[1] == (3, round((lab + lba + lab) / 3, 6))
    assert out[2] == (1, lba)
    assert 3 not in out  # <2 tokens: no bigram mass


def test_bigram_logprob_conditionals_sum_to_one_per_context(spark):
    """Per left-context w1, sum over w2 of c2/c1 must be exactly 1 —
    the property that makes each term a proper conditional."""
    df = spark.createDataFrame(
        [(1, "x y x z x y"), (2, "y z")], ["doc_id", "text"]
    )
    toks = corpus.token_array(F.col("text"))
    pairs = (
        df.select(toks.alias("a"), F.size(toks).alias("n"))
        .where(F.col("n") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("a", 1, F.col("n") - 1).alias("w1"),
                    F.slice("a", 2, F.col("n") - 1).alias("w2"),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    c2 = pairs.groupBy("w1", "w2").count()
    c1 = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    per_ctx = (
        c2.join(c1, "w1")
        .groupBy("w1")
        .agg(F.sum(F.col("count") / F.col("c1")).alias("mass"))
        .collect()
    )
    assert per_ctx and all(abs(r.mass - 1.0) < 1e-12 for r in per_ctx)


def test_weighted_sample_deterministic_and_proportional(spark):
    df = spark.createDataFrame(
        [(i, float(i % 11) / 10.0) for i in range(2000)], ["doc_id", "w"]
    )
    kept = corpus.weighted_sample(df, "doc_id", F.col("w"))
    ids = {r.doc_id for r in kept.collect()}
    # weight 0 rows can never survive; weight 1 rows always do
    assert not any(i % 11 == 0 for i in ids)
    assert all(i in ids for i in range(2000) if i % 11 == 10)
    # keep-rate tracks the mean weight (0.5) within sampling noise
    assert abs(len(ids) / 2000 - 0.5) < 0.05
    # deterministic under repartitioning
    ids2 = {r.doc_id for r in
            corpus.weighted_sample(df.repartition(13), "doc_id", F.col("w"))
            .collect()}
    assert ids == ids2


def test_weighted_sample_clamps_out_of_range_weights(spark):
    df = spark.createDataFrame(
        [(1, 7.5), (2, -3.0)], ["doc_id", "w"]
    )
    kept = {r.doc_id for r in
            corpus.weighted_sample(df, "doc_id", F.col("w")).collect()}
    assert kept == {1}  # >1 clamps to always-keep, <0 to never-keep


def test_vocab_stats_exact_counts_and_tiebreak(spark):
    # en: a:2 b:2 c:1 -> vocab 3, total 5, hapax 1; top_k=1 must pick
    # 'a' (count tie broken by term ASC) -> coverage 2/5
    df = spark.createDataFrame(
        [(0, "a a b", "en"), (1, "b c", "en"), (2, "z z z", "fr")],
        ["doc_id", "text", "lang"],
    )
    out = {r["lang"]: r for r in
           corpus.vocab_stats(df, "text", "lang", top_k=1).collect()}
    en = out["en"]
    assert (en["vocab_size"], en["total_tokens"], en["hapax_count"]) == (3, 5, 1)
    assert en["top1_coverage"] == 0.4
    fr = out["fr"]
    assert (fr["vocab_size"], fr["total_tokens"], fr["hapax_count"]) == (1, 3, 0)
    assert fr["top1_coverage"] == 1.0


def test_leakage_safe_split_keeps_duplicates_together(spark):
    """Exact and reformatted duplicates MUST land in the same split
    regardless of their ids — the whole point of content-keyed
    bucketing (id-keyed split_assign can and does separate them)."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        leakage_safe_split,
    )

    base = "some document text that appears more than once in the corpus"
    rows = [(i, base) for i in range(40)] + [
        (100, "  Some   DOCUMENT text that appears more than once in the corpus  "),
        (200, "a completely different text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = leakage_safe_split(df, "text", "doc_id").collect()
    dup_splits = {r["split"] for r in out if r["doc_id"] <= 100}
    assert len(dup_splits) == 1  # all 41 copies (incl. reformatted) together
    fps = {r["sha256_fp"] for r in out if r["doc_id"] <= 100}
    assert len(fps) == 1


def test_term_divergence_zero_for_identical_and_positive_for_disjoint(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        term_divergence,
    )

    a = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "beta gamma delta")],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(3, "zeta eta theta"), (4, "theta iota kappa")], ["doc_id", "text"]
    )
    same = term_divergence(a, a, "text").collect()[0]
    assert same["kl_ab"] == 0.0 and same["kl_ba"] == 0.0 and same["jsd"] == 0.0
    diff = term_divergence(a, b, "text").collect()[0]
    assert diff["kl_ab"] > 0.3 and diff["kl_ba"] > 0.3
    assert 0.0 < diff["jsd"] <= 0.6931472  # JSD bounded by ln 2
    # symmetry of JSD
    rev = term_divergence(b, a, "text").collect()[0]
    assert abs(diff["jsd"] - rev["jsd"]) < 1e-9


def test_mix_to_proportions_quotas_and_clamp(spark):
    """Quota = min(available, floor(target * total)); strata absent
    from the targets contribute nothing; selection is a deterministic
    pure function of the id (same survivors on re-run)."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        mix_to_proportions,
    )

    rows = (
        [(i, "en") for i in range(100)]
        + [(200 + i, "fr") for i in range(10)]
        + [(300 + i, "xx") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mix_to_proportions(
        df, "doc_id", "lang", {"en": 0.5, "fr": 0.3}, 100
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # en: floor(.5*100)=50 of 100; fr: floor(.3*100)=30 clamped to 10
    assert by_lang == {"en": 50, "fr": 10}
    # deterministic survivors
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in mix_to_proportions(
        df, "doc_id", "lang", {"en": 0.5, "fr": 0.3}, 100
    ).collect())
    assert ids1 == ids2
    # schema passes through unchanged (internals dropped)
    assert out.columns == ["doc_id", "lang"]


def test_temperature_mix_quotas_and_determinism(spark):
    """quota_b = min(n_b, floor(total * n_b^alpha / sum n_c^alpha)) —
    alpha=0.5 flattens the head stratum relative to its natural share;
    alpha=1.0 reproduces proportional-to-size quotas; survivors are a
    deterministic pure function of the id."""
    import math

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        temperature_mix,
    )

    sizes = {"en": 400, "fr": 100, "xx": 25}
    rows = []
    base = 0
    for lang, n in sizes.items():
        rows += [(base + i, lang) for i in range(n)]
        base += 1000
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    out = temperature_mix(df, "doc_id", "lang", 100, alpha=0.5)
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    denom = sum(
        math.floor(math.sqrt(n) * 1e6 + 0.5) / 1e6 for n in sizes.values()
    )
    want = {
        lang: min(n, int(100.0 * math.sqrt(n) / denom))
        for lang, n in sizes.items()
    }
    assert by_lang == want
    # natural share of en is 400/525 = 76%; sqrt smoothing gives
    # 20/(20+10+5) = 57% — the head stratum is demoted
    assert by_lang["en"] / sum(by_lang.values()) < sizes["en"] / sum(
        sizes.values()
    )

    # alpha=1 → proportional to size
    out1 = temperature_mix(df, "doc_id", "lang", 105, alpha=1.0)
    by1 = {
        r["lang"]: r["n"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by1 == {"en": 80, "fr": 20, "xx": 5}

    # deterministic survivors under repartitioning
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in temperature_mix(
            df.repartition(13), "doc_id", "lang", 100, alpha=0.5
        ).collect()
    )
    assert ids1 == ids2
    assert out.columns == ["doc_id", "lang"]


def test_bm25_scores_hand_computed(spark):
    import math

    out = corpus.bm25_scores(
        _docs(spark), "text", "doc_id", ["alpha", "delta"], k=5
    )
    rows = {r.doc_id: (r.score, r.rank) for r in out.collect()}
    # corpus: N=5, dl = {1:3, 2:3, 3:4, 4:5, 5:6}, avgdl = 21/5
    # df(alpha)=3 (docs 1,2,5), df(delta)=2 (docs 3,5)
    n, avgdl, k1, b = 5, 21 / 5, 1.2, 0.75

    def part(tf, df, dl):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    expected = {
        1: part(1, 3, 3),
        2: part(2, 3, 3),
        3: part(3, 2, 4),
        5: round(part(1, 3, 6) + part(1, 2, 6), 6),
    }
    assert set(rows) == set(expected)  # doc 4 matches no term
    for d, exp in expected.items():
        assert abs(rows[d][0] - exp) < 1e-9, (d, rows[d][0], exp)
    # rank ordering: score desc, doc_id asc
    ordered = sorted(rows.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert [kv[1][1] for kv in ordered] == [1, 2, 3, 4]


def test_bm25_top_k_truncates(spark):
    out = corpus.bm25_scores(_docs(spark), "text", "doc_id", ["alpha"], k=2)
    assert out.count() == 2
    assert [r.rank for r in out.orderBy("rank").collect()] == [1, 2]


def test_global_shuffle_is_bijective_and_deterministic(spark):
    n = 500
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out1 = corpus.global_shuffle(df, "doc_id")
    pos1 = {r["doc_id"]: r["shuffle_pos"] for r in out1.collect()}
    # a permutation: every position 1..n exactly once
    assert sorted(pos1.values()) == list(range(1, n + 1))
    # deterministic under a different partition layout
    pos2 = {
        r["doc_id"]: r["shuffle_pos"]
        for r in corpus.global_shuffle(df.repartition(13), "doc_id").collect()
    }
    assert pos1 == pos2
    # actually shuffled: not the identity order
    assert pos1 != {i: i + 1 for i in range(n)}


def test_global_shuffle_preserves_caller_shuffle_key_column(spark):
    df = (
        spark.range(50)
        .withColumnRenamed("id", "doc_id")
        .withColumn("_shuffle_key", F.col("doc_id") * 2)
    )
    out = corpus.global_shuffle(df, "doc_id")
    assert "_shuffle_key" in out.columns
    assert {r["doc_id"]: r["_shuffle_key"] for r in out.collect()} == {
        i: i * 2 for i in range(50)
    }


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """A raw doc written in the target slice's vocabulary must score a
    higher log importance weight than a raw doc written in the raw
    remainder's vocabulary — the defining property of the likelihood
    ratio (target vocab ⇒ p_t ≫ p_r per feature)."""
    rows = [
        # target slice: distinctive vocab
        (1, "wiki wiki article article reference", "en"),
        (2, "article wiki reference wiki article", "en"),
        # raw remainder: mostly spam vocab
        (3, "spam casino casino pills spam", "fr"),
        (4, "casino pills spam casino pills", "fr"),
        # raw docs to score: one target-like, one raw-like
        (5, "wiki article reference", "fr"),
        (6, "spam casino pills", "de"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r
        for r in corpus.dsir_importance(
            df, "text", "doc_id", target=F.col("lang") == "en"
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert out[5]["log_weight"] > out[6]["log_weight"]
    assert out[5]["log_weight"] > 0 > out[6]["log_weight"]
    # features = unigrams + bigrams: n tokens -> 2n - 1
    assert out[5]["n_features"] == 5


def test_dsir_importance_zero_token_doc_gets_zero_weight(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "", "fr"), (3, "alpha", "fr")],
        ["doc_id", "text", "lang"],
    )
    out = {
        r["doc_id"]: r
        for r in corpus.dsir_importance(
            df, "text", "doc_id", target=F.col("lang") == "en"
        ).collect()
    }
    assert out[2]["n_features"] == 0
    assert out[2]["log_weight"] == 0.0
    # single-token doc: unigram only, no bigram
    assert out[3]["n_features"] == 1


def test_dsir_importance_deterministic_under_repartition(spark):
    df = _docs(spark)
    a = corpus.dsir_importance(
        df, "text", "doc_id", target=F.col("lang") == "en"
    ).collect()
    b = corpus.dsir_importance(
        df.repartition(7), "text", "doc_id", target=F.col("lang") == "en"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_perplexity_buckets_tiers_and_allocation(spark):
    """9 docs in one language split 3/3/3; the head tier must hold the
    highest mean log-prob (most 'common-token' text), tail the lowest,
    and every max(avg_logprob) of a lower tier <= min of the next."""
    common = "the the the the"          # high corpus frequency tokens
    rows = [(i, common, "en") for i in range(6)]
    rows += [(6, "the rare1", "en"), (7, "the rare2", "en"),
             (8, "rare3 rare4", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = corpus.perplexity_buckets(df, "text", "doc_id", "lang").collect()
    assert len(out) == 9
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["avg_logprob"])
    assert {len(v) for v in by_bucket.values()} == {3}
    assert max(by_bucket["tail"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["head"])
    # the all-common docs are the most probable -> head is all-common
    assert min(by_bucket["head"]) == max(r["avg_logprob"] for r in out)


def test_perplexity_buckets_per_group_independent(spark):
    """Tiers are cut WITHIN each language: a 'bad' doc in a language of
    its own still lands in that language's head tier."""
    rows = [(i, "a a a a", "en") for i in range(3)]
    rows += [(3, "b c", "en"), (4, "d e", "en"), (5, "f g", "en")]
    rows += [(6, "zz yy xx", "fr")]  # sole fr doc
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in
           corpus.perplexity_buckets(df, "text", "doc_id", "lang").collect()}
    # degenerate group: ranking descends from the head, so the single
    # doc of a 1-doc language is RETAINED (head), never drop-tiered
    assert out[6]["ppl_bucket"] == "head"
    assert out[6]["bucket"] == 1
    en_buckets = {out[i]["ppl_bucket"] for i in range(6)}
    assert en_buckets == {"head", "middle", "tail"}


def test_perplexity_buckets_sub_tertile_groups_favor_retention(spark):
    """A 2-doc language fills head+middle — the drop tier must stay
    empty for every language smaller than n_buckets."""
    rows = [(0, "a common", "de"), (1, "zz qq", "de")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in
           corpus.perplexity_buckets(df, "text", "doc_id", "lang").collect()}
    assert {out[0]["ppl_bucket"], out[1]["ppl_bucket"]} == {"head", "middle"}


def test_dsir_importance_null_text_is_zero_token(spark):
    """NULL text follows the zero-token contract: (0, 0.0), matching
    the oracle's coalesce — not (-1, NULL) from size(NULL)."""
    df = spark.createDataFrame(
        [(0, "the data pipeline", "en"), (1, None, "en")],
        ["doc_id", "text", "lang"],
    )
    out = {r["doc_id"]: r for r in corpus.dsir_importance(
        df, "text", "doc_id", target=F.col("lang") == "en"
    ).collect()}
    assert out[1]["n_features"] == 0
    assert out[1]["log_weight"] == 0.0


def test_rrf_fusion_hand_computed(spark):
    """RRF = Σ round(1/(k+rank), 6): doc 10 appears rank 1 in both
    lists (2·1/61), doc 20 only sparse rank 2 (1/62), doc 30 only
    dense rank 2 — fused order and exact scores are hand-checkable."""
    sparse = spark.createDataFrame([(10, 1), (20, 2)], ["doc_id", "rank"])
    dense = spark.createDataFrame([(10, 1), (30, 2)], ["doc_id", "rank"])
    out = corpus.rrf_fusion([sparse, dense], "doc_id", k_rrf=60, k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    r61 = round(1.0 / 61, 6)
    r62 = round(1.0 / 62, 6)
    assert rows[10]["rrf_score"] == pytest.approx(2 * r61, abs=1e-12)
    assert rows[20]["rrf_score"] == pytest.approx(r62, abs=1e-12)
    assert rows[30]["rrf_score"] == pytest.approx(r62, abs=1e-12)
    assert rows[10]["rank"] == 1
    # equal scores tie-break on id ascending
    assert rows[20]["rank"] == 2 and rows[30]["rank"] == 3


def test_rrf_fusion_requires_a_list(spark):
    with pytest.raises(ValueError, match="at least one"):
        corpus.rrf_fusion([], "doc_id")


def test_rrf_fusion_top_k_truncates_and_single_list_is_identityish(spark):
    lst = spark.createDataFrame(
        [(i, i) for i in range(1, 8)], ["doc_id", "rank"]
    )
    out = corpus.rrf_fusion([lst], "doc_id", k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]  # rank order preserved
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_backoff_logprob_hand_computed(spark):
    """Train LM: 'a b a b c' (bigrams ab,ba,ab,bc → c2(a,b)=2,
    c2(b,a)=1, c2(b,c)=1; c1(a)=2, c1(b)=2; unigrams a:2 b:2 c:1,
    N=5, V=3). Score doc 'a b x': (a,b) seen → ln(2/2)=0;
    (b,x) unseen, x unseen → ln(0.4 * (0+1)/(5+3)) = ln(0.05);
    backoff_rate = 1/2."""
    import math

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        backoff_logprob,
    )

    train = spark.createDataFrame(
        [(100, "a b a b c")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "a b x"), (2, "a b"), (3, "z")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in backoff_logprob(score, train, "text", "doc_id").collect()
    }
    # doc 3 has one token → no bigrams → dropped
    assert set(out) == {1, 2}
    r1 = out[1]
    lp_seen = round(math.log(2 / 2), 6)
    lp_back = round(math.log(0.4 * ((0 + 1) / (5 + 3))), 6)
    want_avg = math.floor(-(lp_seen + lp_back) / 2 * 1e6 + 0.5) / -1e6
    assert r1["n_bigrams"] == 2
    assert abs(r1["avg_backoff_logprob"] - (lp_seen + lp_back) / 2) < 1e-6
    assert r1["backoff_rate"] == 0.5
    r2 = out[2]
    assert r2["n_bigrams"] == 1
    assert r2["avg_backoff_logprob"] == 0.0  # ln(2/2) = 0
    assert r2["backoff_rate"] == 0.0


def test_backoff_seen_unigram_backoff_branch(spark):
    """Unseen bigram over SEEN words backs off to the smoothed train
    unigram of w2: score 'c a' against 'a b a b c' — (c,a) unseen,
    a seen twice → ln(0.4 * (2+1)/(5+3))."""
    import math

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        backoff_logprob,
    )

    train = spark.createDataFrame(
        [(100, "a b a b c")], "doc_id long, text string"
    )
    score = spark.createDataFrame([(1, "c a")], "doc_id long, text string")
    r = backoff_logprob(score, train, "text", "doc_id").collect()[0]
    assert r["backoff_rate"] == 1.0
    assert abs(
        r["avg_backoff_logprob"] - math.log(0.4 * (3 / 8))
    ) < 1e-6


def test_materialize_bins_order_and_budget_bound(spark):
    """Member order inside a bin is id order; every doc appears exactly
    once across bins; the EOD join reassembles the exact texts."""
    rows = [(i, f"tok{i} " * (i % 4 + 1)) for i in range(1, 13)]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = corpus.materialize_bins(df, "text", "doc_id", budget_tokens=6)
    got = {r["bin_id"]: r for r in out.collect()}
    # replay the packing arithmetic in python
    cum, bins = 0, {}
    for i, t in rows:
        n = len(t.split())
        bins.setdefault(cum // 6, []).append((i, t.strip(), n))
        cum += n
    assert set(got) == set(bins)
    for b, members in bins.items():
        r = got[b]
        assert r["n_docs"] == len(members)
        assert r["bin_tokens"] == sum(n for _, _, n in members)
        assert r["seq_text"] == corpus.EOD_SEP.join(t for _, t, _ in members)


def test_curriculum_order_tiers_and_determinism(spark):
    """Equi-depth tiers over the score rank (tier 0 = best); every
    position 1..N used exactly once; within-tier order follows the
    salted hash; identical output under repartitioning; a different
    salt re-permutes within tiers but never changes tier membership."""
    rows = [(i, (i * 37) % 100) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, score long")
    out = corpus.curriculum_order(df, "doc_id", "score", n_tiers=4)
    got = {r["doc_id"]: (r["tier"], r["curriculum_pos"]) for r in out.collect()}
    # python replay
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    tiers = {doc: (rk * 4) // 40 for rk, (doc, _) in enumerate(ranked)}
    assert {d: t for d, (t, _) in got.items()} == tiers
    assert sorted(p for _, p in got.values()) == list(range(1, 41))
    # positions ascend with tier
    by_pos = sorted(got.values(), key=lambda tp: tp[1])
    assert [t for t, _ in by_pos] == sorted(t for t, _ in by_pos)
    # deterministic under repartitioning
    got2 = {
        r["doc_id"]: (r["tier"], r["curriculum_pos"])
        for r in corpus.curriculum_order(
            df.repartition(7), "doc_id", "score", n_tiers=4
        ).collect()
    }
    assert got2 == got
    # fresh salt: same tiers, different within-tier permutation
    got3 = {
        r["doc_id"]: (r["tier"], r["curriculum_pos"])
        for r in corpus.curriculum_order(
            df, "doc_id", "score", n_tiers=4, salt="curr2:"
        ).collect()
    }
    assert {d: t for d, (t, _) in got3.items()} == tiers
    assert got3 != got


def test_ngram_lambda_binding_tokenizes_once(spark):
    """Regression pin for the r2 contamination fix (19.5 s -> 1.6 s,
    BASELINE.md): word_ngrams_from_tokens must re-bind the token array
    as a LAMBDA VARIABLE. If the tokenization is ever re-inlined (the
    gram lambda referencing token_array(text) directly), Catalyst's
    CollapseProject duplicates the split() per reference and the plan
    re-tokenizes per gram index — O(tokens^2) per doc. The optimized
    plan must contain EXACTLY ONE split() call; the broken shape shows
    3+ (one per reference)."""
    df = spark.createDataFrame([(1, "a b c d e f g")], "id long, text string")
    plan = (
        df.select(corpus.word_ngrams(F.col("text"), 5).alias("g"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1, plan


def test_contamination_plan_tokenizes_each_side_once(spark):
    """Same pin at the operator level. Since the r16 one-pass rewrite
    (explode_outer + broadcast-left-join + conditional sum) the
    candidate side is tokenized in ONE branch and the benchmark side
    in one branch, so the printed logical plan (a TREE — shared
    subtrees repeat per consumer branch) shows exactly 2 split()
    occurrences. The pre-r16 two-pass shape showed 5 (candidates
    tokenized twice + join-back); the re-inlined lambda regression
    multiplies each by the in-lambda references (measured 15). Pin the
    good count exactly so either regression trips this."""
    cand = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "quick brown fox jumps over")], "doc_id long, text string"
    )
    out = corpus.benchmark_contamination(cand, bench, "text", "doc_id", n=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 2, plan


def test_data_card_composition(spark):
    """data_card (new r11): per-stratum volumes, exact-dup rate, and
    quality profile — verified against hand-computed values on a
    corpus with a planted duplicate."""
    rows = [
        (1, "alpha beta gamma", "web", "en"),
        (2, "alpha beta gamma", "web", "en"),  # exact dup of 1
        (3, "delta epsilon", "web", "en"),
        (4, "zeta eta theta iota", "books", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    card = {
        (r["source"], r["lang"]): r
        for r in corpus.data_card(df, "text", "doc_id", ["source", "lang"]).collect()
    }
    web = card[("web", "en")]
    assert web["n_docs"] == 3
    assert web["total_tokens"] == 8  # 3 + 3 + 2
    assert web["dup_rate"] == round(1 / 3, 6)
    books = card[("books", "fr")]
    assert books["n_docs"] == 1 and books["dup_rate"] == 0.0
    assert books["total_tokens"] == 4
    for r in card.values():
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert 0.0 <= r["keep_rate"] <= 1.0


def test_data_card_null_text_counts_zero_tokens(spark):
    """ADVICE r11: a NULL text must contribute 0 tokens — unguarded
    size(token_array(NULL)) is -1 (legacy sizeOfNull), which silently
    DEDUCTS from total_tokens and diverges from the DuckDB oracle's
    NULL-skipping sum."""
    rows = [
        (1, "alpha beta", "web", "en"),
        (2, None, "web", "en"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )
    card = corpus.data_card(df, "text", "doc_id", ["source", "lang"]).collect()
    assert len(card) == 1
    r = card[0]
    assert r["n_docs"] == 2
    assert r["total_tokens"] == 2  # NOT 1 (2 + -1)
    assert r["mean_tokens"] == 1.0
    assert r["dup_rate"] == 0.0


def test_purge_corpus_and_audit(spark):
    """purge (new r12): direct takedown by id, exact-content
    propagation to verbatim copies, non-empty-text guard (a NULL/empty
    doc must never be swept because another empty doc was taken
    down), and audit/kept-corpus consistency."""
    rows = [
        (1, "the infringing page", "web"),
        (2, "the infringing page", "web"),   # verbatim copy -> propagated
        (3, "an unrelated page", "web"),
        (4, None, "web"),                     # empty, taken down directly
        (5, None, "web"),                     # empty, must SURVIVE
        (6, "livre francais", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    removals = spark.createDataFrame([(1,), (4,)], "rid long")

    kept = corpus.purge_corpus(df, removals, "text", "doc_id")
    assert {r.doc_id for r in kept.collect()} == {3, 5, 6}

    audit = {
        r["source"]: r
        for r in corpus.purge_audit(
            df, removals, "text", "doc_id", ["source"]
        ).collect()
    }
    web = audit["web"]
    assert web["n_docs"] == 5
    assert web["n_direct"] == 2      # ids 1, 4
    assert web["n_propagated"] == 1  # id 2 (verbatim copy of 1)
    assert web["n_kept"] == 2        # ids 3, 5
    assert web["purge_rate"] == 0.6
    books = audit["books"]
    assert books["n_direct"] == 0 and books["n_kept"] == 1

    # kept corpus and audit must agree
    total_kept = sum(r["n_kept"] for r in audit.values())
    assert total_kept == kept.count()

    # propagate_exact=False: only the named ids leave
    kept_direct = corpus.purge_corpus(
        df, removals, "text", "doc_id", propagate_exact=False
    )
    assert {r.doc_id for r in kept_direct.collect()} == {2, 3, 5, 6}


def test_kmeans_assignment_tie_prefers_min_cell(spark):
    """r16 literal-centroid rewrite: when two centroids score the SAME
    similarity for a vector, assignment must pick the SMALLER cell_id
    (the old Window row_number(desc sim, asc cell_id) semantics, now
    an array_max over (sim, -cell_id) structs). Two planted duplicate
    centroids force exact ties for every member of their cluster."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.similarity import (
        ivf_assign,
        kmeans_fit,
    )
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)]
        + [(10 + i, [0.0, 1.0]) for i in range(5)],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        ["cell_id", "cvec"],
    )
    _, assigned = ivf_assign(emb, 0, centroids=cents)
    got = {r["vec_id"]: r["cell_id"] for r in assigned.collect()}
    # [0,1] vectors tie between cells 0 and 2 → must take 0
    for i in range(5):
        assert got[10 + i] == 0, got
        assert got[i] == 1, got
    # and a fit over duplicate-heavy data still converges
    cents2, iters, shift = kmeans_fit(emb, 2, max_iterations=4)
    assert cents2.count() == 2 and iters >= 1
