"""Record-linkage / entity-resolution operators (operators/linkage.py)."""

from __future__ import annotations

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import linkage


def _people(spark):
    # (id, name, city, balance): rows 1/2 are a typo pair in the same
    # block; 3 is same block, different name; 4 is a near-identical
    # name in ANOTHER block (must never pair — blocking contract);
    # 5/6 share a block with NULL fields on one side.
    rows = [
        (1, "jonathan smith", "paris", 100.0),
        (2, "jonathan smyth", "paris", 120.0),
        (3, "amelie dupont", "paris", 95.0),
        (4, "jonathan smith", "lyon", 100.0),
        (5, None, "nice", 50.0),
        (6, "claire martin", "nice", None),
    ]
    return spark.createDataFrame(rows, ["id", "name", "city", "bal"])


def test_blocking_bounds_candidates(spark):
    df = _people(spark)
    cand = linkage.blocked_candidate_pairs(df, "id", ["city"]).collect()
    got = {(r["id_a"], r["id_b"]) for r in cand}
    # paris block: (1,2),(1,3),(2,3); nice block: (5,6); lyon: none.
    assert got == {(1, 2), (1, 3), (2, 3), (5, 6)}


def test_whale_block_guard_and_report(spark):
    df = _people(spark)
    cand = linkage.blocked_candidate_pairs(
        df, "id", ["city"], max_block_size=2
    ).collect()
    # the 3-row paris block is excluded entirely; nice (2 rows) stays
    assert {(r["id_a"], r["id_b"]) for r in cand} == {(5, 6)}
    rep = linkage.oversized_blocks(df, ["city"], max_block_size=2).collect()
    assert [(r["city"], r["n_rows"]) for r in rep] == [("paris", 3)]


def test_match_scores_and_null_fields(spark):
    df = _people(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in linkage.entity_match_pairs(
            df,
            "id",
            ["city"],
            string_fields=[("name", 0.8)],
            numeric_fields=[("bal", 0.2, 1000.0)],
            threshold=0.0,
        ).collect()
    }
    # typo pair: lev("jonathan smith","jonathan smyth")=1, len 14
    # sim = 1 - 1/14; prox = 1 - 20/1000
    expected = 0.8 * (1 - 1 / 14) + 0.2 * (1 - 20 / 1000)
    assert abs(pairs[(1, 2)] - expected) < 1e-6
    # cross-block near-identical names never pair
    assert not any(4 in p for p in pairs)
    # NULL name on one side: string term contributes 0, numeric term
    # still scores (5,6) — NULL bal likewise zeroes only its term
    assert pairs[(5, 6)] == 0.0  # name NULL (0) + bal NULL (0)


def test_match_threshold_applied_to_rounded_score(spark):
    df = _people(spark)
    out = linkage.entity_match_pairs(
        df,
        "id",
        ["city"],
        string_fields=[("name", 1.0)],
        threshold=0.93,
    ).collect()
    # only the typo pair survives: sim = 13/14 ≈ 0.928571 < 0.93?
    # 13/14 rounds to 0.928571 — below 0.93, so NO pairs at 0.93...
    assert out == []
    out2 = linkage.entity_match_pairs(
        df,
        "id",
        ["city"],
        string_fields=[("name", 1.0)],
        threshold=0.92,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out2} == {(1, 2)}


def test_entity_clusters_transitive_and_singletons(spark):
    # a-b and b-c match but a-c alone would not (transitivity through
    # the component): names drift one char per step.
    rows = [
        (1, "abcdefghij", "x", 0.0),
        (2, "abcdefghiX", "x", 0.0),
        (3, "abcdefghXX", "x", 0.0),
        (9, "zzzzzzzzzz", "x", 0.0),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "city", "bal"])
    labels = {
        r["id"]: r["entity_id"]
        for r in linkage.entity_match_clusters(
            df,
            "id",
            ["city"],
            string_fields=[("name", 1.0)],
            threshold=0.85,  # lev 1 (0.9) matches, lev 2 (0.8) doesn't
        ).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 9: 9}


def test_multi_column_block_key_no_concat_ambiguity(spark):
    # ('1','2x') vs ('12','x') must be DIFFERENT blocks even though a
    # naive separator-free concat would equate them.
    rows = [(1, "same name", "1", "2x"), (2, "same name", "12", "x")]
    df = spark.createDataFrame(rows, ["id", "name", "k1", "k2"])
    cand = linkage.blocked_candidate_pairs(df, "id", ["k1", "k2"]).collect()
    assert cand == []
