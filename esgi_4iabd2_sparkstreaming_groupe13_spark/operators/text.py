"""Text analysis for training-data pipelines (M4(f); cf. PAPERS.md
Twitter-sentiment EDBT'16 for the lexicon-scoring pattern).

Everything is built-in string/array expressions — per-row narrow work
that scales embarrassingly (no shuffle, no UDF, stays in codegen).
Scores are integer counts or single double divisions so results are
bit-identical across engines (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import round_half_away, token_array

#: Tiny per-language stopword lexicons for the n-gram/stopword
#: language-ID heuristic. Deliberately small and frozen: the driver's
#: synthetic corpus is English-ish word soup; what matters is that the
#:  classifier is deterministic and identically computable in SQL.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "que", "por", "en"],
    "de": ["der", "die", "das", "und", "ein", "eine", "zu", "mit", "von", "ist"],
}

#: BPE-ish tokenizer regex: word pieces, numbers, or single
#: non-space symbols — a public-domain approximation of byte-pair
#: pretokenization (split BEFORE merges). No backslash classes: the
#: pattern is embedded in BOTH Spark SQL and DuckDB string literals,
#: whose escaping rules differ ('\s' survives in DuckDB, becomes 's'
#: in Spark SQL).
BPE_TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r]"


def stopword_hits(tokens: Column, words: list[str]) -> Column:
    """How many tokens are in the lexicon (multiset count, integer)."""
    lex = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lex, t)))


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits,
    deterministic tie-break by language code; 'und' when nothing hits."""
    toks = token_array(F.col(text_col))
    out = df.select(F.col(id_col), toks.alias("_toks"))
    for lang, words in LANG_STOPWORDS.items():
        out = out.withColumn(f"score_{lang}", stopword_hits(F.col("_toks"), words))
    langs = sorted(LANG_STOPWORDS)  # asc code order = tiebreak order
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred: Column = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(
            (best > 0) & (F.col(f"score_{lg}") == best), F.lit(lg)
        ).otherwise(pred)
    return out.select(
        id_col, *[f"score_{lg}" for lg in langs], pred.alias("pred_lang")
    )


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document quality features: length, token counts, punctuation /
    stopword / alpha ratios, mean token length — the classic cheap
    quality filters for LLM corpus curation. All ratios are a single
    int/int division in double → bit-stable."""
    t = F.col(text_col)
    toks = token_array(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_alpha = n_chars - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    # punct = chars that are neither alphanumeric nor space (portable)
    n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9 ]", ""))
    sw = stopword_hits(toks, LANG_STOPWORDS["en"])
    token_chars = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    nz = F.greatest(n_tokens, F.lit(1))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        round_half_away(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        round_half_away(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        round_half_away(sw.cast("double") / nz, 6).alias("stopword_ratio"),
        round_half_away(token_chars.cast("double") / nz, 6).alias("mean_token_len"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: F.length(x) > 0))
    bpe = F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_TOKEN_REGEX}', 0)"))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


#: Tiny frozen sentiment lexicon (the EDBT'16 Twitter-sentiment
#: pattern — PAPERS.md: lexicon join over tokenized text). Words drawn
#: from the synthetic corpus vocabulary so scores are non-trivial.
SENTIMENT_LEXICON: dict[str, int] = {
    "fast": 1,
    "small": 1,
    "big": 1,
    "value": 1,
    "slow": -1,
    "error": -1,
    "spill": -1,
    "skew": -1,
}


def sentiment_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Lexicon-based sentiment: explode tokens → broadcast-join the
    lexicon → per-doc signed sum. The explode+join form (vs an array
    filter) is deliberate: with a large lexicon the broadcast hash
    join beats per-row array scans, and the aggregation is the same
    partial+final shape as any count."""
    spark = df.sparkSession
    lex = spark.createDataFrame(
        list(SENTIMENT_LEXICON.items()), ["token", "polarity"]
    )
    toks = df.select(
        F.col(id_col), F.explode(token_array(F.col(text_col))).alias("token")
    )
    scored = toks.join(F.broadcast(lex), "token", "left").na.fill(
        {"polarity": 0}
    )
    return scored.groupBy(id_col).agg(
        F.sum(F.when(F.col("polarity") > 0, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("polarity") < 0, 1).otherwise(0)).alias("n_neg"),
        F.sum("polarity").alias("net_sentiment"),
    )


def repetition_features(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Intra-document repetition ratios — the Gopher-style filters
    (Rae et al. 2021 §A1.1) that catch boilerplate and degenerate
    generations: fraction of DUPLICATE word n-grams per document for
    n = 1, 2, 3. ``dup_ratio(n) = (total_n − distinct_n) / total_n``
    (0 for documents with no n-grams).

    Scale shape: per-row narrow array expressions, zero shuffle,
    embarrassingly parallel. Each ratio binds the token array as a
    lambda variable (see ``corpus.word_ngrams_from_tokens`` for why a
    raw expression would be re-evaluated per reference); tokenization
    runs once per ratio column — a deliberate 3× constant over the
    theoretical minimum in exchange for columns that are independent,
    CSE-safe expressions.
    """
    t = F.col(text_col)

    def dup_ratio(n: int) -> Column:
        def over_tokens(tk: Column) -> Column:
            if n == 1:
                grams = tk
            else:

                def gram(i: Column) -> Column:
                    return F.concat_ws(" ", F.slice(tk, i, n))

                grams = F.when(
                    F.size(tk) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)), gram
                    ),
                ).otherwise(F.array().cast("array<string>"))

            def over_grams(g: Column) -> Column:
                total = F.size(g)
                dup = total - F.size(F.array_distinct(g))
                return round_half_away(
                    F.when(
                        total > 0, dup.cast("double") / total
                    ).otherwise(F.lit(0.0)),
                    6,
                )

            return F.element_at(F.transform(F.array(grams), over_grams), 1)

        return F.element_at(
            F.transform(F.array(token_array(t)), over_tokens), 1
        )

    return df.select(
        F.col(id_col),
        dup_ratio(1).alias("dup_token_ratio"),
        dup_ratio(2).alias("dup_2gram_ratio"),
        dup_ratio(3).alias("dup_3gram_ratio"),
    )


def top_ngram_char_fraction(
    df: DataFrame, text_col: str, id_col: str, ns: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """The second Gopher repetition family (Rae et al. 2021 §A1.1):
    for each n, the fraction of the document's characters covered by
    occurrences of its single MOST FREQUENT word n-gram —
    ``count(top) · len(top) / len(space-joined tokens)``. Degenerate
    docs repeat one phrase; this catches them even when
    :func:`repetition_features`' duplicate-gram ratio stays moderate.

    Determinism contract (cross-engine): the top gram is chosen by
    (count DESC, gram ASC) — implemented as an ascending sort of
    (−count, gram) structs, identical field-order comparison semantics
    in Spark and DuckDB. Fractions rounded to 6 dp; docs with fewer
    than n tokens score 0.0.

    Scale shape: per-row narrow array expressions, zero shuffle —
    bounded by document length, not corpus size, so it parallelizes
    embarrassingly; the corpus-level alternative (explode + window)
    would shuffle every gram instance for a per-document answer. The
    per-row cost is O(G log G): sort the gram array, then ONE
    ``aggregate`` fold finds the longest equal-run (= most frequent
    gram; the first max run in ascending order is the smallest gram,
    which IS the tie-break). The naive per-distinct-gram filter-count
    is O(G²) and measured ≈2.6× slower on real 60-token documents
    (5.37 → 2.1 s checksum-forced at sf0.1); the fold RESULT is bound
    as a lambda variable because two fields of it feed the fraction —
    a raw reference would run the fold twice per row.
    """
    t = F.col(text_col)

    def frac(n: int) -> Column:
        def over_tokens(tk: Column) -> Column:
            def gram(i: Column) -> Column:
                return F.concat_ws(" ", F.slice(tk, i, n))

            grams = F.when(
                F.size(tk) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)), gram
                ),
            ).otherwise(F.array().cast("array<string>"))

            def over_grams(g: Column) -> Column:
                init = F.struct(
                    F.lit("").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0).alias("bc"),
                    F.lit("").alias("bg"),
                )

                def step(acc: Column, x: Column) -> Column:
                    run = F.when(
                        x == acc["prev"], acc["run"] + 1
                    ).otherwise(F.lit(1))
                    better = run > acc["bc"]
                    return F.struct(
                        x.alias("prev"),
                        run.alias("run"),
                        F.when(better, run).otherwise(acc["bc"]).alias("bc"),
                        F.when(better, x).otherwise(acc["bg"]).alias("bg"),
                    )

                # bind the fold RESULT once — covered references two
                # fields of it, and a raw aggregate expression there
                # would run the whole sorted-array fold twice per row
                def over_top(t: Column) -> Column:
                    covered = t["bc"] * F.length(t["bg"])
                    return round_half_away(
                        covered.cast("double")
                        / F.greatest(
                            F.length(F.concat_ws(" ", tk)), F.lit(1)
                        ),
                        6,
                    )

                top = F.aggregate(F.array_sort(g), init, step)
                return F.when(
                    F.size(g) > 0,
                    F.element_at(
                        F.transform(F.array(top), over_top), 1
                    ),
                ).otherwise(F.lit(0.0))

            return F.element_at(F.transform(F.array(grams), over_grams), 1)

        return F.element_at(
            F.transform(F.array(token_array(t)), over_tokens), 1
        )

    return df.select(
        F.col(id_col),
        *[frac(n).alias(f"top{n}gram_char_frac") for n in ns],
    )


def content_norm(text: Column) -> Column:
    """THE content-normalization expression (trim → lower → collapse
    whitespace runs to one space) every exact-dedup key in the engine
    derives from. Single definition on purpose: :func:`fingerprints`,
    the incremental-dedup exact tier, and the streaming admission
    filter (operators/dedup.py) all hash this expression — if the two
    sides of an anti-join normalized differently, every duplicate
    would silently pass as new (ADVICE r5)."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def content_sha256(text: Column) -> Column:
    """64-hex SHA-2 over :func:`content_norm` — the collision-averse
    exact-dedup key shared by batch and streaming admission paths."""
    return F.sha2(content_norm(text), 256)


def fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text (stable under reformatting), plus a 64-hex SHA-2 for
    collision-averse exact dedup keys at corpus scale."""
    norm = content_norm(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("md5_fp"),
        F.sha2(norm, 256).alias("sha256_fp"),
    )


#: PII patterns shared (as literals) with the DuckDB oracle — both
#: engines' regex dialects accept these forms: no backslash classes
#: (Spark SQL literals eat backslashes), no lookaround. Order matters:
#: emails are redacted before phones so the digits in a mailbox name
#: can't be half-eaten by the phone pattern.
PII_PATTERNS: list[tuple[str, str]] = [
    ("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+", "<EMAIL>"),
    ("([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>"),
    ("[+]?[0-9][0-9 ().-]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Scrub emails / IPv4 addresses / phone-shaped digit runs from
    ``text_col`` — the redaction pass training pipelines run before
    releasing a corpus. Pure ``regexp_replace`` chain: per-row narrow
    JVM work, no shuffle, embarrassingly parallel at any scale.

    Returns ``(id, redacted, n_redactions)`` where ``n_redactions``
    counts replaced spans (length-delta-free: counted by re-scanning
    for the placeholder tokens, so overlapping rewrites can't
    double-count).
    """
    out = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    n_red = (
        F.size(F.split(out, "<EMAIL>")) - 1
        + F.size(F.split(out, "<IP>")) - 1
        + F.size(F.split(out, "<PHONE>")) - 1
    )
    return df.select(
        F.col(id_col),
        out.alias("redacted"),
        n_red.cast("long").alias("n_redactions"),
    )


#: Gopher-style rule thresholds (Rae et al. 2021 Appendix A), adapted
#: to the cheap single-pass signal set quality_features computes.
#: These are the DOCUMENTED real-corpus values — 50–100,000 words,
#: mean word length 3–10, ≤10 % symbols, alphabetic-content floor —
#: because a library default must describe real corpora, not a test
#: fixture (ADVICE r7). Corpus-specific tuning passes a custom rule
#: list to :func:`gopher_filter_report`; the synthetic sf-scale
#: thresholds live next to the registry entry ``q_gopher``
#: (``plans/queries.py``), not here.
GOPHER_RULES: list[tuple[str, str]] = [
    ("too_few_words", "n_tokens < 50"),
    ("too_many_words", "n_tokens > 100000"),
    ("mean_word_len_out", "mean_token_len < 3.0 OR mean_token_len > 10.0"),
    ("symbol_heavy", "punct_ratio > 0.1"),
    ("stopword_poor", "stopword_ratio < 0.03"),
    ("alpha_poor", "alpha_ratio < 0.6"),
]


def gopher_filter_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Gopher-style rule-based quality FILTER REPORT (new r7): each
    document gets a pass/fail verdict per named rule over the cheap
    single-pass signals (:func:`quality_features`), the production
    form of corpus filtering — a pipeline keeps the verdict table, not
    just the final filter, so every dropped document is explainable
    and thresholds can be re-tuned without re-scanning text.

    Zero additional passes: the rules are boolean projections chained
    onto the quality_features expressions (one narrow scan). Returns
    ``(id, passes, n_failed, failed_rules)`` with failed_rules a
    comma-joined string in fixed rule order (engine-neutral — the
    gate's comparator cannot sort array cells).

    ``rules`` is a ``(name, sql_condition)`` list over the
    quality_features signal columns; defaults to :data:`GOPHER_RULES`
    (the published real-corpus thresholds).
    """
    q = quality_features(df, text_col, id_col)
    # `is None` (not falsy-or): an explicitly-passed empty rule list
    # means "no rules — everything passes", not "use the defaults"
    # (ADVICE r8).
    rule_list = GOPHER_RULES if rules is None else rules
    conds = [(name, F.expr(sql)) for name, sql in rule_list]
    n_failed = sum(
        (c.cast("int") for _, c in conds), F.lit(0)
    )
    failed = F.concat_ws(
        ",", *[F.when(c, F.lit(name)) for name, c in conds]
    )
    return q.select(
        F.col(id_col),
        (n_failed == 0).alias("passes"),
        n_failed.cast("long").alias("n_failed"),
        failed.alias("failed_rules"),
    )


def hashed_uni_bigram_buckets(toks: Column, dim: int) -> Column:
    """Hashed bag-of-ngrams feature buckets in ``[0, dim)``: every word
    UNIGRAM plus every adjacent BIGRAM (tokens joined on ``\\x1f``)
    hashed with the shared md5 family — the feature map under both the
    fastText-style quality scorer and the DSIR importance weigher, so
    the two layers score the SAME representation of a document.

    Pure per-row expression (no shuffle, no UDF). The bigram build is
    guarded: ``sequence(1, 0)`` is DESCENDING in Spark, so single-token
    docs need the explicit empty branch.

    Single-evaluation: the bigram lambda dereferences the token array
    per gram (``element_at(t, i)`` / ``element_at(t, i+1)``), so this
    function OWNS the binding obligation — ``toks`` is re-bound as a
    lambda variable internally, and a caller passing a raw
    ``token_array(text)`` expression still tokenizes once per row
    (unbound, the re-tokenization is O(tokens²) chars per doc — the
    trap :func:`word_ngrams_from_tokens` documents, measured 120 s vs
    9.6 s on dsir's 100× probe)."""
    from ..functions.hashing import md5_int

    def bucket(col: Column) -> Column:
        return F.pmod(md5_int(col), F.lit(dim))

    def over_tokens(t: Column) -> Column:
        uni = F.transform(t, bucket)
        bi = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: bucket(
                    F.concat_ws(
                        "\x1f",
                        F.element_at(t, i),
                        F.element_at(t, i + 1),
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.concat(uni, bi)

    return F.element_at(F.transform(F.array(toks), over_tokens), 1)


# ---------------------------------------------------------------------------
# Linear quality classifier (fastText-style scoring, new r9)
# ---------------------------------------------------------------------------

#: Hashed feature dimension for the linear quality scorer. 128 buckets
#: over word uni+bigrams — the deployment shape of a fastText-style
#: quality classifier (hash features, average-pool, one linear unit).
QUALITY_CLF_DIM = 128

#: Fixed-point scale for the weight integers: weights live in
#: [-2.0, 2.0] as ints in [-2000, 2000]. INTEGER accumulation makes
#: the dot product order-independent and bit-exact across engines —
#: the one double division + sigmoid happens once per document.
QUALITY_CLF_SCALE = 1000


def quality_clf_weights(
    dim: int = QUALITY_CLF_DIM, seed: int = 7
) -> list[int]:
    """Deterministic stand-in for a TRAINED weight vector: the same
    frozen LCG as the MinHash permutation family (Numerical Recipes
    constants — interpreter-independent forever). A production
    pipeline drops its fastText/logistic weights in here; every
    consumer (Spark expression, DuckDB oracle, tests) reads THIS list,
    so the literals cannot drift between engines."""
    state = seed & 0xFFFFFFFF
    out = []
    for _ in range(dim):
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        out.append(int(state % (2 * QUALITY_CLF_SCALE + 1)) - QUALITY_CLF_SCALE)
    return out


def quality_classifier_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: list[int] | None = None,
    bias: int = 0,
    dim: int = QUALITY_CLF_DIM,
) -> DataFrame:
    """fastText-style linear quality score — the trained-scorer layer
    production corpus pipelines put ABOVE the Gopher rule filter
    (rules catch pathologies; a learned scorer ranks the remainder).

    Model: hashed bag of word UNIGRAMS + BIGRAMS (md5 → ``dim``
    buckets), average-pooled, one linear unit + sigmoid:

        score = σ(bias/S + mean_over_features(w[bucket]/S))

    Scale shape: ZERO shuffles — per-row higher-order expressions
    only (tokenize → hash → integer fold over a literal weight
    array). The dot product accumulates in INTEGERS (fixed-point
    weights), so the fold is order-independent and the oracle can
    reproduce it bit-exactly; the division and sigmoid are one
    double op per document (transcendental → plain 6dp round is
    cross-engine safe). Weight lookup is ``element_at`` into a
    128-literal array column — constant-folded to one array literal,
    no join, no broadcast.

    Single-evaluation contract: the token array and the hashed
    feature array are each bound as LAMBDA VARIABLES (the
    ``element_at(transform(array(x), λ), 1)`` idiom — see
    :func:`top_ngram_char_fraction`), and the three outputs that
    depend on them come out of ONE bound struct; ``keep`` derives
    from the ``quality_score`` column in a second projection that
    Catalyst keeps separate (SPARK-36718: projects are not collapsed
    when that would duplicate expensive expressions). A naive
    per-column expression re-hashes every token 3–6× per row —
    measured 27 s vs 4.5 s cold / 1.4 s steady (checksum-forced,
    sf0.1).

    Returns ``(id, n_features, quality_score, keep)`` with
    ``keep = score >= 0.5``.
    """
    w = weights if weights is not None else quality_clf_weights(dim)
    if len(w) != dim:
        raise ValueError(f"weights length {len(w)} != dim {dim}")
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])

    s = float(QUALITY_CLF_SCALE)

    def over_feats(feats: Column) -> Column:
        n_feat = F.size(feats)
        acc = F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda a, b: a + F.element_at(warr, b.cast("int") + 1),
        )
        z = F.lit(bias / s) + (acc.cast("double") / s) / n_feat.cast("double")
        score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        return F.struct(
            n_feat.cast("long").alias("n_features"),
            F.when(n_feat > 0, score)
            .otherwise(F.lit(0.5))
            .alias("quality_score"),
        )

    def over_tokens(toks: Column) -> Column:
        feats = hashed_uni_bigram_buckets(toks, dim)
        return F.element_at(F.transform(F.array(feats), over_feats), 1)

    # NULL text follows the zero-token contract (0 features, neutral
    # 0.5) — size/aggregate over a NULL array would yield (-1, 0.5),
    # diverging from the oracle's LEFT JOIN coalesce
    txt = F.coalesce(F.col(text_col), F.lit(""))
    qs = F.element_at(
        F.transform(F.array(token_array(txt)), over_tokens), 1
    )
    scored = df.select(F.col(id_col), qs.alias("_qs"))
    return scored.select(
        F.col(id_col),
        F.col("_qs.n_features").alias("n_features"),
        F.col("_qs.quality_score").alias("quality_score"),
        (F.col("_qs.quality_score") >= 0.5).alias("keep"),
    )
