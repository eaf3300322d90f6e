"""BPE tokenizer training/encoding vs a pure-Python reference.

The reference implementation below is the textbook algorithm
(Sennrich et al. 2016): count symbol pairs weighted by word frequency,
merge the most frequent pair everywhere (leftmost non-overlapping),
repeat. Training parity is EXACT (same merge table, same order, same
counts) because both sides use the same total tie-break: highest
count, then lexicographically smallest (left, right).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import bpe


# ------------------------------------------------------------------
# Pure-Python reference (independent of the Spark implementation)
# ------------------------------------------------------------------

def _ref_merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_train(word_counts: dict[str, int], num_merges: int):
    words = {w: list(w) + [bpe.WORD_END] for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        words = {w: _ref_merge_word(s, a, b) for w, s in words.items()}
    return merges, words


def ref_encode(word: str, merges: list[tuple[str, str]]):
    syms = list(word) + [bpe.WORD_END]
    for a, b in merges:
        while (a, b) in zip(syms, syms[1:]):
            syms = _ref_merge_word(syms, a, b)
    return syms


CORPUS = {
    "low": 5,
    "lower": 2,
    "lowest": 3,
    "newer": 6,
    "new": 4,
    "wider": 3,
    "widest": 1,
    "aaaa": 2,  # adjacent-repeat merge semantics
    "a": 1,  # single-char word (symbols = [a, </w>])
}


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame(
        [(w, c) for w, c in CORPUS.items()], "word string, cnt long"
    )


def test_train_matches_reference_exactly(spark, words_df):
    got_df, vocab_words = bpe.bpe_train(words_df, num_merges=12)
    got = [
        (r["rank"], r["sym_left"], r["sym_right"], r["pair_count"])
        for r in got_df.orderBy("rank").collect()
    ]
    want, ref_words = ref_train(CORPUS, 12)
    assert got == want
    # final segmentation matches per word
    seg = {
        r["word"]: r["syms"]
        for r in vocab_words.select("word", "syms").collect()
    }
    assert seg == ref_words


def test_encode_matches_reference_per_word(spark, words_df):
    merges_df, _ = bpe.bpe_train(words_df, num_merges=10)
    merges = [
        (r["sym_left"], r["sym_right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    # encode UNSEEN words too — generalization is the point of BPE
    probe = list(CORPUS) + ["lowering", "newest", "aaaaaaa", "zz"]
    enc_df = bpe.encode_words(
        spark.createDataFrame([(w,) for w in probe], "word string"), merges
    )
    got = {r["word"]: r["toks"] for r in enc_df.collect()}
    for w in probe:
        assert got[w] == ref_encode(w, merges), w
        assert len(got[w]) >= 1


def test_merge_pair_expr_scan_semantics(spark):
    df = spark.createDataFrame(
        [(["a", "b", "a", "b"],), (["a", "a", "a"],), (["x", "a"],)],
        "syms array<string>",
    )
    ab = df.select(bpe.merge_pair_expr(F.col("syms"), "a", "b").alias("m"))
    assert [r["m"] for r in ab.collect()] == [
        ["ab", "ab"],
        ["a", "a", "a"],
        ["x", "a"],
    ]
    aa = df.select(bpe.merge_pair_expr(F.col("syms"), "a", "a").alias("m"))
    assert [r["m"] for r in aa.collect()] == [
        ["a", "b", "a", "b"],
        ["aa", "a"],
        ["x", "a"],
    ]


def test_encode_counts_per_doc(spark, words_df):
    merges_df, _ = bpe.bpe_train(words_df, num_merges=8)
    merges = [
        (r["sym_left"], r["sym_right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    docs = spark.createDataFrame(
        [
            (1, "en", "low lower newest"),
            (2, "en", "  "),  # no tokens → no output row
            (3, "fr", "aaaa aaaa new"),
        ],
        "doc_id long, lang string, text string",
    )
    out = bpe.bpe_encode_counts(
        docs, "doc_id", "text", merges, extra_cols=["lang"]
    )
    got = {r["doc_id"]: (r["lang"], r["n_words"], r["n_tokens"]) for r in out.collect()}
    exp = {}
    for did, lang, txt in [(1, "en", "low lower newest"), (3, "fr", "aaaa aaaa new")]:
        toks = txt.split()
        exp[did] = (
            lang,
            len(toks),
            sum(len(ref_encode(w, merges)) for w in toks),
        )
    assert got == exp


def test_creation_order_guard():
    with pytest.raises(ValueError, match="creation-ordered"):
        bpe.encode_word_fn([("th", "e"), ("t", "h")])
    # valid orders pass, including WORD_END composites
    bpe.encode_word_fn([("t", "h"), ("th", "e"), ("e", bpe.WORD_END)])


def test_min_count_prunes_tail(spark, words_df):
    merges_df, _ = bpe.bpe_train(words_df, num_merges=5, min_count=3)
    pruned = {w: c for w, c in CORPUS.items() if c >= 3}
    want, _ = ref_train(pruned, 5)
    got = [
        (r["rank"], r["sym_left"], r["sym_right"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == want


def test_vocab_frequencies(spark, words_df):
    merges_df, vocab_words = bpe.bpe_train(words_df, num_merges=6)
    vocab = {
        r["symbol"]: r["freq"] for r in bpe.bpe_vocab(vocab_words).collect()
    }
    _, ref_words = ref_train(CORPUS, 6)
    want: Counter = Counter()
    for w, syms in ref_words.items():
        for s in syms:
            want[s] += CORPUS[w]
    assert vocab == dict(want)


@settings(max_examples=12, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_train_property_parity(spark_global, corpus, k):
    words_df = spark_global.createDataFrame(
        [(w, c) for w, c in corpus.items()], "word string, cnt long"
    )
    got_df, _ = bpe.bpe_train(words_df, num_merges=k)
    got = [
        (r["rank"], r["sym_left"], r["sym_right"], r["pair_count"])
        for r in got_df.orderBy("rank").collect()
    ]
    want, _ = ref_train(corpus, k)
    assert got == want


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_fit_or_load_persists_and_reloads(spark, words_df, tmp_path):
    import os

    path = str(tmp_path / "bpe_model")
    m1 = bpe.bpe_fit_or_load(spark, words_df, path, num_merges=6)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    want, _ = ref_train(CORPUS, 6)
    assert m1 == [(a, b) for _, a, b, _ in want]
    # second call loads (corrupting the words frame proves no refit)
    empty = spark.createDataFrame([], "word string, cnt long")
    m2 = bpe.bpe_fit_or_load(spark, empty, path, num_merges=6)
    assert m2 == m1
    # a DIFFERENT requested config must refit, not serve the smaller
    # model (the under-trained-tokenizer trap): asking for 10 merges
    # over a 6-merge model retrains
    m10 = bpe.bpe_fit_or_load(spark, words_df, path, num_merges=10)
    want10, _ = ref_train(CORPUS, 10)
    assert m10 == [(a, b) for _, a, b, _ in want10]
    assert len(m10) > len(m1)
    # malformed model (bad creation order) triggers a refit
    bad = spark.createDataFrame(
        [(0, "th", "e", 5), (1, "t", "h", 9)], bpe.MERGES_SCHEMA
    )
    bad.write.mode("overwrite").parquet(path)
    m3 = bpe.bpe_fit_or_load(spark, words_df, path, num_merges=6)
    assert m3 == m1


def test_oracle_recursion_matches_engine_for_self_pairs():
    """The DuckDB replay must use leftmost-SINGLE replacement:
    replace()-all diverges for self-adjacent pairs ((a,a) over
    'aaaaa' gives [aa, a, aa] instead of the engine's [aa, aa, a]).
    Pin the recursive transition against encode_word_fn on a merge
    table that contains a self-pair and a composite self-pair."""
    import duckdb

    merges = [("a", "a"), ("aa", "aa"), ("b", "a")]
    words = ["aaaaa", "aaaa", "aabaa", "bababa", "a", "baaab"]
    vals = ",\n  ".join(
        f"({i + 1}, ' {a} {b} ', ' {a}{b} ')"
        for i, (a, b) in enumerate(merges)
    )
    wvals = ", ".join(f"('{w}')" for w in words)
    sql = f"""
WITH RECURSIVE dw(word) AS (VALUES {wvals}),
merges(i, pat, rep) AS (VALUES {vals}),
enc(word, s, i) AS (
  SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ', 1
  FROM dw
  UNION ALL
  SELECT e.word,
         CASE WHEN contains(e.s, m.pat)
              THEN regexp_replace(e.s, m.pat, m.rep) ELSE e.s END,
         CASE WHEN contains(e.s, m.pat) THEN e.i ELSE e.i + 1 END
  FROM enc e JOIN merges m ON m.i = e.i
)
SELECT word, trim(s) FROM enc WHERE i = {len(merges) + 1}
"""
    got = {w: s.split(" ") for w, s in duckdb.connect().execute(sql).fetchall()}
    enc = bpe.encode_word_fn(merges)
    for w in words:
        assert got[w] == enc(w), w


def test_fit_or_load_refuses_remote_model_path(spark, words_df):
    """ADVICE r10: the _SUCCESS/_bpe_meta.json probes are os.path-based;
    a remote scheme would silently refit on every call — refuse loudly."""
    with pytest.raises(ValueError, match="local-filesystem"):
        bpe.bpe_fit_or_load(spark, words_df, "s3://bucket/model", 4)


def test_decode_tokens_roundtrip_all_words(spark, sf_dir):
    """decode(encode(w)) == w for every distinct corpus word — and the
    decode is a pure expression, so a symbol dropped/duplicated by the
    encoder is the only way to fail."""
    from pyspark.sql import functions as F

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import bpe
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = bpe.word_frequencies(docs, "text").select("word")
    merges, _ = bpe.bpe_train(bpe.word_frequencies(docs, "text"), 12)
    table = [
        (r["sym_left"], r["sym_right"])
        for r in merges.orderBy("rank").collect()
    ]
    enc = bpe.encode_words(words, table)
    bad = enc.filter(
        bpe.decode_tokens(F.col("toks")) != F.col("word")
    ).count()
    assert bad == 0


def test_decode_tokens_detects_symbol_loss(spark):
    """A corrupted token sequence (symbol dropped) must NOT round-trip."""
    from pyspark.sql import functions as F

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import bpe

    df = spark.createDataFrame(
        [("hello", ["he", "llo</w>"]), ("world", ["w", "rld</w>"])],
        "word string, toks array<string>",
    )
    got = {
        r["word"]: r["ok"]
        for r in df.select(
            "word",
            (bpe.decode_tokens(F.col("toks")) == F.col("word")).alias("ok"),
        ).collect()
    }
    assert got == {"hello": True, "world": False}
