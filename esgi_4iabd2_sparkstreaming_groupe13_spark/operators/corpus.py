"""Corpus-construction operators — the selection/weighting steps a
training-data pipeline runs AFTER dedup/quality (SURVEY §2 extension
set, alongside operators/dedup.py and operators/text.py):

* :func:`hash_sample` — deterministic hash-based stratified sampling.
  ``sample()``/``sampleBy()`` draw from an RNG seeded per-partition, so
  the kept set changes with partitioning and Spark version; pipelines
  that must be re-runnable (and auditable — "why is this doc in the
  corpus?") key the decision on a salted content-independent hash
  instead. Engine-portable: the same md5 arithmetic reproduces the
  exact kept set in DuckDB.
* :func:`tfidf_top_terms` — per-document top-k TF-IDF terms (corpus
  keyword extraction / topic hints). Explode → two hash aggregates →
  broadcast scalar N → partitioned window top-k (WindowGroupLimit, no
  global sort).
* :func:`pack_sequences` — next-fit-by-order sequence packing: assign
  documents to fixed token-budget bins by their starting offset in the
  global running token total. The running total uses the two-pass
  scale-safe cumulative sum (operators/windows.global_running_sum),
  NOT a single-partition window.

No Python UDFs; everything is built-in expressions + joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_int, round_half_away, token_array
from .windows import global_running_sum

#: Salt so the sampling hash is independent of any other md5-keyed
#: decision (dedup fingerprints etc.) made on the same ids.
SAMPLE_SALT = "sample:"


def hash_sample(
    df: DataFrame,
    id_col: str,
    rates_pct: dict[str, int],
    stratum_col: str,
    default_rate_pct: int = 0,
) -> DataFrame:
    """Keep rows whose salted id-hash lands under the stratum's rate.

    ``rates_pct``: stratum value → percentage (0-100). The decision is
    ``md5_int('sample:' || id) % 100 < rate`` — stable under
    repartitioning, re-runs, and engine swaps; per-stratum rates give
    exact-in-expectation stratified sampling with no shuffle at all
    (a pure filter that pushes nothing to the driver).
    """
    bucket = md5_int(
        F.concat(F.lit(SAMPLE_SALT), F.col(id_col).cast("string"))
    ) % 100
    rate = F.lit(default_rate_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, score).

    score = tf · ln(N / df), rounded to 6 decimals; ties broken by
    term ascending so the result is total-ordered. N rides as a
    1-row broadcast (scalar crossJoin), never a driver collect.
    """
    toks = df.select(
        F.col(id_col), F.explode(token_array(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("_n").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term", "score", F.col("rank").cast("long").alias("rank")
        )
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget_tokens: int = 4096,
) -> DataFrame:
    """Assign each doc to a training-batch bin by token budget:
    (id, n_tokens, bin_id) with bin_id = floor(start_offset / budget),
    start_offset = running token total BEFORE the doc in id order.

    This is next-fit packing by a deterministic document order — the
    streaming-friendly packing real pipelines use (first-fit-decreasing
    needs global sort + sequential state). Docs longer than the budget
    get a bin of their own (still deterministic).
    """
    sized = df.select(
        F.col(id_col),
        F.size(token_array(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return pack_by_counts(sized, id_col, "n_tokens", budget_tokens)


def pack_by_counts(
    counts: DataFrame,
    id_col: str,
    tokens_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Next-fit bin assignment over a PRE-COUNTED (id, n_tokens) frame
    — the packing arithmetic of :func:`pack_sequences` factored out so
    any tokenizer can supply the counts (whitespace words there;
    learned-BPE subword counts in ``q_bpe_packing`` — a trainer's bins
    are measured in MODEL tokens, not words). Same two-pass scale-safe
    global running sum, no single-partition window."""
    running = global_running_sum(
        counts.select(F.col(id_col), F.col(tokens_col).alias("n_tokens")),
        [id_col],
        "n_tokens",
        sum_col="_cum",
    )
    return running.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor((F.col("_cum") - F.col("n_tokens")) / budget_tokens)
        .cast("long")
        .alias("bin_id"),
    )


#: Document separator for materialized training sequences (GPT-style
#: end-of-document sentinel; spaces keep word tokenization stable).
EOD_SEP = " <|eod|> "


def materialize_bins(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget_tokens: int = 4096,
    eod: str = EOD_SEP,
) -> DataFrame:
    """Turn :func:`pack_sequences` bin IDs into the SEQUENCES a trainer
    consumes: per bin, member docs concatenated in id order with an
    end-of-document sentinel — (bin_id, n_docs, bin_tokens, seq_text).

    Determinism (and hence the DuckDB oracle): member order inside a
    bin is the same id order the packing ran on — Spark sorts the
    collected (id, text) structs (``array_sort`` orders by the leading
    field), the oracle uses ``string_agg(... ORDER BY id)``. NULL
    texts are not part of the contract (the prep pipeline scrubs
    before packing): Spark's array_join and DuckDB's string_agg skip
    NULLs differently, so feed non-null text.

    Scale shape: one id-key join (packing output back to text) and one
    bin-key hash aggregate. The collected payload per group — and
    therefore the output ROW size — is bounded by the token budget
    (bins hold ≈ budget tokens by construction), so the aggregate
    cannot produce a whale row however large the corpus; row count
    shrinks ≈ budget× from the input.
    """
    packed = pack_sequences(df, text_col, id_col, budget_tokens)
    joined = df.select(F.col(id_col), F.col(text_col)).join(
        packed, id_col
    )
    members = F.array_sort(
        F.collect_list(
            F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t"))
        )
    )
    return joined.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
        F.array_join(
            F.transform(members, lambda s: s["t"]), eod
        ).alias("seq_text"),
    )


def word_ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Distinct word-level n-grams (space-joined) of a token array.

    The token array is re-bound as a LAMBDA VARIABLE (a 1-element
    ``transform``) before the gram loop. This is load-bearing: the
    gram lambda references the array three ways (slice source, size
    guard, sequence bound), and a raw expression there is re-evaluated
    PER REFERENCE PER GRAM — with ``token_array(text)`` inlined that
    re-tokenizes the document for every gram index, O(tokens²) per doc
    (observed: 19 s for a 5k-doc contamination scan vs ~2 s bound).
    Materializing via a prior select does NOT survive Catalyst —
    CollapseProject / constraint inference inline the alias right back
    (10 copies of split() counted in the executed plan). A lambda
    variable is evaluated exactly once per row by construction and no
    rule can substitute through it.

    Guarded against short docs: Spark's ``sequence(1, 0)`` DESCENDS
    (yields ``[1, 0]``), so a doc with fewer than ``n`` tokens must
    short-circuit to an empty array rather than feed the transform.
    """

    def over_tokens(tk: Column) -> Column:
        def gram(i: Column) -> Column:
            # closure, not a default arg — PySpark introspects lambda
            # arity and would silently bind the array index to an
            # extra parameter
            return F.concat_ws(" ", F.slice(tk, i, n))

        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)), gram
            )
        )
        return F.when(F.size(tk) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return F.flatten(F.transform(F.array(toks), over_tokens))


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of a text column (tokenization fused —
    evaluated once thanks to the lambda binding above)."""
    return word_ngrams_from_tokens(token_array(text), n)


def benchmark_contamination(
    candidates: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination scan: for every candidate document, how
    much of its word-``n``-gram set appears anywhere in the benchmark
    corpus — the decontamination step training pipelines run before a
    dataset ships (drop/flag docs that leak eval data).

    Returns ``(id, n_grams, n_shared, contamination)`` with
    ``contamination = n_shared / n_grams`` rounded to 6 decimals; docs
    shorter than ``n`` tokens report 0/0/0.0.

    Scale shape: the benchmark gram set is DISTINCT-aggregated and
    broadcast (eval suites are small — thousands of docs — versus a
    100 TB candidate corpus); candidates then run one narrow explode →
    broadcast semi-probe → partial-agg count, no all-pairs join and no
    shuffle of candidate text. If the benchmark ever outgrows
    broadcast size, drop the hint and the same plan shuffle-joins on
    the gram key.
    """
    # Single-file local inputs arrive as one partition; the per-doc
    # gram work is embarrassingly parallel, so fan it out (no-op on a
    # real multi-file table, same pattern as dedup.py).
    para = candidates.sparkSession.sparkContext.defaultParallelism
    if candidates.rdd.getNumPartitions() < para:
        candidates = candidates.repartition(para)
    cand_grams = candidates.select(
        F.col(id_col),
        word_ngrams_from_tokens(token_array(F.col(text_col)), n).alias(
            "_grams"
        ),
    )
    bench_set = (
        benchmark.select(
            F.explode(
                word_ngrams_from_tokens(token_array(F.col(text_col)), n)
            ).alias("_gram")
        )
        .distinct()
    )
    # ONE candidate pass (r16 optimization round, guide §2.4): the
    # gram-set size rides the explode as a carried column and the
    # semi-probe becomes a broadcast LEFT join counted conditionally,
    # so totals + shared collapse into one aggregate — the previous
    # shape tokenized every candidate TWICE (once for the probe
    # explode, once for the totals projection) and joined the two
    # back. explode_outer keeps sub-n-token docs as a NULL-gram row
    # (NULL never matches the broadcast set → n_shared 0, n_grams 0 —
    # the same 0/0/0.0 report as before); bench_set is distinct, so
    # the left join preserves row counts and the conditional sum
    # equals the old semi-join count exactly.
    ex = cand_grams.select(
        F.col(id_col),
        F.size(F.col("_grams")).cast("long").alias("n_grams"),
        F.explode_outer(F.col("_grams")).alias("_gram"),
    )
    probed = ex.join(
        F.broadcast(bench_set.withColumn("_hit", F.lit(1))), "_gram", "left"
    )
    return (
        probed.groupBy(F.col(id_col), F.col("n_grams"))
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_shared")
        )
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("n_shared"),
            round_half_away(
                F.when(
                    F.col("n_grams") > 0,
                    F.col("n_shared").cast("double") / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination"),
        )
    )


def unigram_logprob(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document mean unigram corpus log-probability — the cheap
    language-model quality proxy (a perplexity stand-in) pipelines use
    to rank documents before an expensive model-based filter.

    Two passes over the token stream: global term frequencies + total
    count (the "language model"), then per-doc mean of ln(tf/total)
    over token INSTANCES (not distinct terms). Docs with zero tokens
    drop out (no probability mass to average).

    Engine parity: each token's log is rounded to 6 decimals FIRST and
    accumulated as DECIMAL(18,6) — an order-independent exact sum — so
    the mean never depends on float reduction order.

    Scale shape: term frequencies shuffle once on the term key (AQE
    broadcasts the vocab when it is small); the total-count scalar
    rides as a 1-row broadcast crossJoin. Everything else is narrow.
    """
    toks = df.select(
        F.col(id_col), F.explode(token_array(F.col(text_col))).alias("_t")
    )
    freq = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    logp = F.round(
        F.log(F.col("_c").cast("double") / F.col("_n")), 6
    ).cast("decimal(18,6)")
    return (
        toks.join(freq, "_t")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            round_half_away(
                F.sum(logp).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
    )


def vocab_stats(
    df: DataFrame, text_col: str, group_col: str, top_k: int = 100
) -> DataFrame:
    """Per-group corpus vocabulary statistics — the Zipf-curve health
    check a training pipeline runs per language/source slice before
    tokenizer training: vocabulary size, total token instances, hapax
    legomena count (terms appearing exactly once — OCR noise and
    mojibake inflate it), and the share of the token stream covered by
    the ``top_k`` most frequent terms (boilerplate-heavy slices skew
    high).

    Determinism contract: the top-``top_k`` cut ranks by
    (count DESC, term ASC) so ties never make coverage engine-
    dependent; coverage rounded to 6 dp.

    Scale shape: explode → (group, term) hash aggregate (map-side
    combined, so the shuffle carries per-partition distinct terms, not
    instances); the rank window then runs over the VOCAB-sized count
    table — orders of magnitude smaller than the token stream — with
    per-group top-rank heaps, and the final per-group aggregate is a
    rollup of that same small table. No collects, no full sorts.
    """
    toks = df.select(
        F.col(group_col), F.explode(token_array(F.col(text_col))).alias("_t")
    )
    counts = toks.groupBy(group_col, "_t").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("_c").desc(), F.col("_t").asc()
    )
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum("_c").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("_c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax_count"),
            round_half_away(
                F.sum(
                    F.when(F.col("_rk") <= top_k, F.col("_c")).otherwise(0)
                ).cast("double")
                / F.sum("_c"),
                6,
            ).alias(f"top{top_k}_coverage"),
        )
    )


def cap_per_stratum(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    cap: int,
    salt: str = "cap:",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum (source/domain capping —
    the anti-overrepresentation step corpus pipelines run so one giant
    domain can't dominate training data).

    Selection is by salted id-hash rank inside each stratum:
    deterministic under repartitioning/re-runs (auditable — "why did
    this doc survive the cap?"), uncorrelated with [[hash_sample]]'s
    sampling decision (different salt), and engine-portable. Compiles
    to one shuffle on the stratum key with WindowGroupLimit rank
    pushdown — per-group top-``cap`` heaps, no full per-group sort
    materialization.
    """
    h = md5_int(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


#: Salt for mixture-quota selection — independent of the sampling,
#: capping and splitting salts for the same non-correlation reason.
MIX_SALT = "mix:"


def mix_to_proportions(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    targets: dict[str, float],
    total_rows: int,
) -> DataFrame:
    """Compose a training MIXTURE (new r9): from each stratum
    (language, domain, quality tier) keep
    ``quota_b = min(available_b, floor(targets[b] * total_rows))``
    rows — the static data-mixing stage pipelines run to hit target
    proportions (e.g. rebalancing languages before tokenization).
    Strata absent from ``targets`` contribute nothing; under-supplied
    strata are clamped to availability (the caller compares the output
    histogram to the request to see the shortfall).

    Selection inside a stratum is by salted id-hash rank — the same
    auditable determinism contract as :func:`cap_per_stratum` (a doc's
    survival is a pure function of its id, stable under re-runs and
    repartitioning), on an independent salt.

    Scale shape: ranks come from
    :func:`~.windows.scale_safe_group_ranks` (range-partition + local
    offsets + metadata broadcast), NOT ``row_number().over(
    partitionBy(stratum))`` — the quota bound is a per-stratum COLUMN,
    so Catalyst's WindowGroupLimit cannot prune the window form and a
    whale stratum would serialize into one task's sort. Quotas are
    pure expressions over the targets literal and the ``_grp_n``
    metadata that rides the rank join — no extra aggregate, no second
    shuffle.
    """
    from .windows import scale_safe_group_ranks

    h = md5_int(
        F.concat(F.lit(MIX_SALT), F.col(id_col).cast("string"))
    ).alias("_mix_h")
    ranked = scale_safe_group_ranks(
        df.select("*", h), stratum_col, ["_mix_h", id_col]
    )
    target_map = F.create_map(
        *[
            F.lit(x)
            for key in sorted(targets)
            for x in (key, float(targets[key]))
        ]
    )
    quota = F.least(
        F.col("_grp_n"),
        F.floor(
            F.coalesce(
                target_map[F.col(stratum_col)], F.lit(0.0)
            )
            * F.lit(float(total_rows))
        ).cast("long"),
    )
    return ranked.filter(F.col("_rank") <= quota).select(*df.columns)


#: Salt for temperature-sampled mixing — independent of MIX_SALT so a
#: doc's survival under q_mix and q_temperature_mix never correlates.
TMIX_SALT = "tmix:"


def temperature_mix(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    total_rows: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-smoothed mixture sampling (the UNIMAX / mT5-style
    multilingual rebalance): instead of caller-fixed targets
    (:func:`mix_to_proportions`), quotas derive from the OBSERVED
    stratum distribution raised to ``alpha`` ∈ (0, 1] —

        quota_b = min(n_b, floor(total_rows · n_b^alpha / Σ_c n_c^alpha))

    alpha=1 reproduces the natural distribution; alpha→0 approaches
    uniform; 0.5 is the common multilingual-pretraining setting.
    Selection inside a stratum is by salted id-hash rank (same
    auditable determinism contract as the other mixing stages: a doc's
    survival is a pure function of its id and the corpus histogram).

    Scale shape: ranks ride :func:`~.windows.scale_safe_group_ranks`
    (no per-stratum single-task window sort); the smoothing denominator
    is one map-side-combining count agg reduced to a 1-row broadcast.

    Engine-parity note (why alpha=0.5 is the oracle-checked point):
    sqrt is correctly rounded in IEEE 754 on every engine, so
    floor(total · sqrt(n) / Σ) is bit-identical in Spark and DuckDB
    when composed in this exact operation order; pow(x, alpha) for
    general alpha carries no such guarantee (quota boundaries could
    flip a row in the last ulp). The denominator sums per-stratum
    doubles rounded half-away at 6 dp in DECIMAL(38,6) — order-
    independent, mirroring the oracle recipe used throughout.
    """
    from .windows import scale_safe_group_ranks

    def smooth(c):
        c = c.cast("double")
        if alpha == 0.5:
            return F.sqrt(c)
        return F.pow(c, F.lit(float(alpha)))

    h = md5_int(
        F.concat(F.lit(TMIX_SALT), F.col(id_col).cast("string"))
    ).alias("_tmix_h")
    ranked = scale_safe_group_ranks(
        df.select("*", h), stratum_col, ["_tmix_h", id_col]
    )
    denom = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.sum(
                round_half_away(smooth(F.col("_n")), 6).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("_denom")
        )
    )
    quota = F.least(
        F.col("_grp_n"),
        F.floor(
            F.lit(float(total_rows))
            * smooth(F.col("_grp_n"))
            / F.col("_denom")
        ).cast("long"),
    )
    return (
        ranked.crossJoin(F.broadcast(denom))
        .filter(F.col("_rank") <= quota)
        .select(*df.columns)
    )


#: Salt for train/val/test assignment — independent of the sampling
#: and capping hashes so split membership never correlates with them.
SPLIT_SALT = "split:"


def split_expr(id_col: str, train_pct: int = 80, val_pct: int = 10):
    """The split-assignment EXPRESSIONS (bucket, split) as columns —
    exposed separately from :func:`split_assign` so consumers that
    already hold the full row (audit reports, downstream writers) can
    ``withColumn`` the assignment inline instead of joining the corpus
    back to a projection of itself. The split is a pure per-row hash
    of the id: joining to recompute it is a same-cardinality self-join
    the optimizer cannot elide (VERDICT r5 "what's wrong" #1)."""
    bucket = md5_int(
        F.concat(F.lit(SPLIT_SALT), F.col(id_col).cast("string"))
    ) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return bucket.cast("long"), split


def split_assign(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    full_row: bool = False,
) -> DataFrame:
    """Deterministic train/val/test assignment by salted id-hash:
    ``bucket = md5_int('split:' || id) % 100`` → train below
    ``train_pct``, val below ``train_pct + val_pct``, test otherwise.

    The property that matters at corpus scale: assignment is a pure
    per-row expression — stable under repartitioning, incremental
    re-runs, and engine swaps (auditable: any engine can recompute
    which split a document landed in from its id alone), with no
    shuffle and no stored split table to keep in sync.

    ``full_row=True`` appends (bucket, split) to EVERY input column —
    use this (never a join back on the id) when downstream work needs
    the document payload alongside its assignment.
    """
    bucket, split = split_expr(id_col, train_pct, val_pct)
    if full_row:
        return df.withColumn("bucket", bucket).withColumn("split", split)
    return df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        split.alias("split"),
    )


def term_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
) -> DataFrame:
    """Corpus-slice distribution drift (new r7): KL divergence both
    ways plus Jensen-Shannon divergence between two slices' unigram
    term distributions (add-one smoothed over the JOINT vocabulary) —
    the audit a pipeline runs to confirm its train/test split (or
    yesterday's crawl vs today's) draws from the same language before
    blaming the model.

    Scale shape: one term-keyed count aggregate per side (map-side
    combined, vocab-sized output), one full-outer vocab join, three
    1-row broadcast scalars (totals + vocab size); the divergence sum
    is a global decimal aggregate over VOCAB rows, never token
    instances.

    Engine parity: each term's contribution p·ln(p/q) is rounded to
    12 dp (ln is transcendental — .5-boundary probability ~0, the
    unigram_logprob precedent) then accumulated as DECIMAL(28,12),
    an order-independent exact sum; outputs are the exact decimal
    sums cast to double.

    Returns one row: (kl_ab, kl_ba, jsd) in nats.
    """
    ta = df_a.select(F.explode(token_array(F.col(text_col))).alias("_t"))
    tb = df_b.select(F.explode(token_array(F.col(text_col))).alias("_t"))
    ca = ta.groupBy("_t").agg(F.count(F.lit(1)).alias("_ca"))
    cb = tb.groupBy("_t").agg(F.count(F.lit(1)).alias("_cb"))
    joint = (
        ca.join(cb, "_t", "full_outer")
        .select(
            F.coalesce(F.col("_ca"), F.lit(0)).alias("_ca"),
            F.coalesce(F.col("_cb"), F.lit(0)).alias("_cb"),
        )
    )
    na = ta.agg(F.count(F.lit(1)).alias("_na"))
    nb = tb.agg(F.count(F.lit(1)).alias("_nb"))
    vocab = joint.agg(F.count(F.lit(1)).alias("_v"))
    p = (F.col("_ca") + 1).cast("double") / (F.col("_na") + F.col("_v")).cast("double")
    q = (F.col("_cb") + 1).cast("double") / (F.col("_nb") + F.col("_v")).cast("double")
    m = (p + q) / F.lit(2.0)

    def contrib(expr):
        return F.round(expr, 12).cast("decimal(28,12)")

    agg = (
        joint.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(vocab))
        .select(
            contrib(p * F.log(p / q)).alias("_kab"),
            contrib(q * F.log(q / p)).alias("_kba"),
            contrib(
                F.lit(0.5) * (p * F.log(p / m) + q * F.log(q / m))
            ).alias("_jsd"),
        )
        .agg(
            F.sum("_kab").cast("double").alias("kl_ab"),
            F.sum("_kba").cast("double").alias("kl_ba"),
            F.sum("_jsd").cast("double").alias("jsd"),
        )
    )
    return agg


def leakage_safe_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Leakage-safe train/val/test assignment (new r7): the bucket
    hash keys on the CONTENT fingerprint — sha256 of the shared
    ``content_norm`` — instead of the doc id, so exact and
    reformatted duplicates land in the SAME split by construction. An
    id-keyed split can put a test document's byte-identical twin in
    train (the classic eval-contamination failure); this one cannot.

    Still a pure per-row expression: no shuffle, no split table,
    auditable from the text alone. Near-duplicate leakage needs the
    cluster pass on top (``dedup_clusters`` → assign by the cluster
    representative's id); this tier is the zero-extra-cost
    content-exact guarantee every split should carry.

    Returns (id, sha256_fp, bucket, split).
    """
    from .text import content_sha256

    fp = content_sha256(F.col(text_col))
    bucket = (md5_int(F.concat(F.lit(SPLIT_SALT), fp)) % 100).cast("long")
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        F.col(id_col),
        fp.alias("sha256_fp"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


def token_length_histogram(
    df: DataFrame, text_col: str, bucket_width: int = 10
) -> DataFrame:
    """Token-length histogram — the length-distribution audit run
    before choosing packing budgets and truncation limits:
    ``bucket = floor(n_tokens / width)``, one row per occupied bucket
    with doc and token totals.

    One partial+final hash aggregate over a narrow derived key; at any
    scale this is a map-side-combined count on ~max_len/width keys.
    """
    n = F.size(token_array(F.col(text_col)))
    bucket = F.floor(n / F.lit(bucket_width))
    return (
        df.select(bucket.alias("length_bucket"), n.alias("_n"))
        .groupBy("length_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").cast("long").alias("total_tokens"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the context-length split a
    training pipeline runs before tokenizer packing: each document's
    word tokens become windows of ``chunk_size`` tokens starting every
    ``stride`` tokens (``stride < chunk_size`` ⇒ overlap, preserving
    cross-boundary context).

    Contract (engine-portable, so the DuckDB oracle reproduces it
    bit-for-bit): chunks start at token offsets 0, stride, 2·stride, …
    strictly below ``n_tokens``; the final chunk may be short; docs
    with zero tokens emit nothing. ``chunk_id = start / stride``.

    Scale shape: zero shuffle — tokenize, ``sequence`` over starts,
    ``explode``, ``slice`` are all narrow per-row expressions; output
    grows ×(1 + overlap) like any chunker. The explode sits AFTER the
    parquet scan's column pruning, so only (id, text) is read.
    """
    if not (0 < stride and 0 < chunk_size):
        raise ValueError("chunk_size and stride must be positive")
    toks = token_array(F.col(text_col))
    with_toks = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).where(F.col("_n") > 0)
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size)
    return (
        with_toks.select(
            id_col, "_toks", F.explode(starts).alias("_start")
        )
        .select(
            F.col(id_col),
            (F.col("_start") / stride).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


def bigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean bigram conditional log-probability — the
    next-quality-tier LM proxy after :func:`unigram_logprob`: average
    of ln(c(w₁,w₂) / c(w₁·)) over the doc's bigram instances, where
    c(w₁·) counts w₁ as a LEFT context (doc-final tokens excluded), so
    each term is a proper conditional ≤ 0. Docs with < 2 tokens drop
    (no bigram mass to average).

    Engine parity mirrors [[unigram_logprob]]: each log is rounded to
    6 decimals FIRST, accumulated as DECIMAL(18,6) — an
    order-independent exact sum — then the mean is rounded to 6.

    Scale shape (r6 rewrite, VERDICT r5 item 6): the raw bigram
    INSTANCE stream is pre-aggregated to (doc, w₁, w₂, count) before
    anything else — one extra map-side-combined hash aggregate that
    shrinks every downstream join and shuffle from token-instance
    volume to per-doc DISTINCT-bigram volume (repetition-heavy corpora
    compress hardest, exactly where instance volume explodes). The two
    frequency tables then derive from the pre-aggregated stream by
    summing counts (identical totals, cheaper input), the joins back
    are plain equi-joins AQE can broadcast when the vocab is small,
    and the per-doc mean weights each distinct bigram's rounded log by
    its count — DECIMAL × BIGINT stays exact, so the result is
    bit-identical to the instance-level sum. No windows, no collects.
    """
    arr = token_array(F.col(text_col))
    pairs = (
        df.select(F.col(id_col), arr.alias("_a"), F.size(arr).alias("_n"))
        .where(F.col("_n") >= 2)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_a"), 1, F.col("_n") - 1).alias("w1"),
                    F.slice(F.col("_a"), 2, F.col("_n") - 1).alias("w2"),
                )
            ).alias("_bg"),
        )
        .select(id_col, F.col("_bg.w1").alias("_w1"), F.col("_bg.w2").alias("_w2"))
        .groupBy(id_col, "_w1", "_w2")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    freq2 = pairs.groupBy("_w1", "_w2").agg(F.sum("_cnt").alias("_c2"))
    freq1 = pairs.groupBy("_w1").agg(F.sum("_cnt").alias("_c1"))
    logp = F.round(
        F.log(F.col("_c2").cast("double") / F.col("_c1")), 6
    ).cast("decimal(18,6)")
    return (
        pairs.join(freq2, ["_w1", "_w2"])
        .join(freq1, "_w1")
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").cast("long").alias("n_bigrams"),
            round_half_away(
                (F.sum(logp * F.col("_cnt"))).cast("double")
                / F.sum("_cnt"),
                6,
            ).alias("avg_bigram_logprob"),
        )
    )


#: Salt for curriculum within-tier shuffling — independent of every
#: other md5-keyed decision on the same ids.
CURRICULUM_SALT = "curr:"


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_tiers: int = 4,
    salt: str = CURRICULUM_SALT,
) -> DataFrame:
    """Deterministic curriculum ordering: equi-depth quality tiers
    (tier 0 = highest score) with a salted-hash shuffle INSIDE each
    tier — the "easy/clean first, shuffled within difficulty band"
    epoch order curriculum-training pipelines feed the trainer, as a
    pure function of (id, score distribution): re-runs, task retries,
    and repartitioning reproduce the identical sequence, and a new
    salt gives a fresh within-tier permutation without touching tier
    membership.

    (id, tier, curriculum_pos): tier = exact integral
    ``((rank-1)·T) div N`` over the global score rank (total order:
    score DESC, id) — integer arithmetic, never a double division;
    curriculum_pos = the contiguous global index in
    (tier, shuffle-hash, id) order. ``score_col`` must be non-null.

    Scale shape: two scale-safe global indexes (one range exchange
    each, no single-partition window — `global_row_index`) plus a
    1-row broadcast count. Nothing else moves.
    """
    from .windows import global_row_index

    scored = df.select(
        F.col(id_col),
        F.col(score_col).alias("_score"),
    ).withColumn("_negs", -F.col("_score"))
    ranked = global_row_index(scored, ["_negs", id_col], index_col="_rk")
    n = scored.agg(F.count(F.lit(1)).alias("_n"))
    tiered = ranked.crossJoin(F.broadcast(n)).select(
        F.col(id_col),
        F.call_function(
            "div",
            (F.col("_rk") - 1) * F.lit(int(n_tiers)),
            F.col("_n"),
        ).alias("tier"),
        md5_int(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ).alias("_shuf"),
    )
    out = global_row_index(
        tiered, ["tier", "_shuf", id_col], index_col="curriculum_pos"
    )
    return out.select(
        F.col(id_col),
        F.col("tier").cast("long").alias("tier"),
        F.col("curriculum_pos").cast("long").alias("curriculum_pos"),
    )


#: Stupid-backoff discount (Brants et al. 2007's empirical constant).
BACKOFF_ALPHA = 0.4


def backoff_logprob(
    score_df: DataFrame,
    train_df: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = BACKOFF_ALPHA,
) -> DataFrame:
    """Stupid-backoff bigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation") of one corpus against an
    LM trained on ANOTHER — the held-out perplexity-filter shape
    [[bigram_logprob]] cannot express (scoring the training corpus
    never backs off: every observed bigram has count ≥ 1). Per scored
    bigram instance::

        S(w2|w1) = c(w1,w2) / c(w1·)                 if seen in train
                 = alpha · (c(w2)+1) / (N + V)        otherwise

    (add-one-smoothed train unigram under the backoff — the unseen-
    word floor stupid backoff leaves unspecified). Returns per-doc
    (n_bigrams, avg_backoff_logprob, backoff_rate); docs with < 2
    tokens drop. The backoff RATE is the quality signal pipelines
    threshold on alongside the mean: high rate = vocabulary/domain
    shift from the reference corpus, independent of the probability
    mass itself.

    Engine parity mirrors [[bigram_logprob]]: each instance log is
    rounded to 6 dp FIRST, accumulated in DECIMAL(18,6) (exact,
    order-independent), means/rates rounded engine-exactly
    (``backoff_rate`` is a ratio of integers — rationals go through
    ``round_half_away``).

    Scale shape: both corpora reduce to (w1, w2, count) / (w, count)
    tables via map-side-combined hash aggregates BEFORE any join, so
    the three LEFT joins carry per-doc DISTINCT-bigram volume probed
    against train-vocab-sized builds; the (N, V) scalars ride a 1-row
    broadcast. Nothing quadratic, nothing instance-volume past the
    first aggregate.
    """

    def bigrams(df: DataFrame, *cols: str) -> DataFrame:
        a = token_array(F.col(text_col))
        return (
            df.select(
                *[F.col(c) for c in cols],
                a.alias("_a"),
                F.size(a).alias("_n"),
            )
            .where(F.col("_n") >= 2)
            .select(
                *cols,
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("_a"), 1, F.col("_n") - 1).alias("w1"),
                        F.slice(F.col("_a"), 2, F.col("_n") - 1).alias("w2"),
                    )
                ).alias("_bg"),
            )
            .select(
                *cols,
                F.col("_bg.w1").alias("_w1"),
                F.col("_bg.w2").alias("_w2"),
            )
        )

    f2 = (
        bigrams(train_df)
        .groupBy("_w1", "_w2")
        .agg(F.count(F.lit(1)).alias("_c2"))
    )
    f1 = f2.groupBy("_w1").agg(F.sum("_c2").alias("_c1"))
    tu = (
        train_df.select(
            F.explode(token_array(F.col(text_col))).alias("_w2")
        )
        .groupBy("_w2")
        .agg(F.count(F.lit(1)).alias("_cu"))
    )
    scal = tu.agg(
        F.sum("_cu").cast("long").alias("_nn"),
        F.count(F.lit(1)).alias("_vv"),
    )

    pairs = (
        bigrams(score_df, id_col)
        .groupBy(id_col, "_w1", "_w2")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    j = (
        pairs.join(f2, ["_w1", "_w2"], "left")
        .join(f1, "_w1", "left")
        .join(tu, "_w2", "left")
        .crossJoin(F.broadcast(scal))
    )
    seen = F.col("_c2").isNotNull()
    s_seen = F.col("_c2").cast("double") / F.col("_c1")
    s_back = F.lit(float(alpha)) * (
        (F.coalesce(F.col("_cu"), F.lit(0)) + 1).cast("double")
        / (F.col("_nn") + F.col("_vv")).cast("double")
    )
    logp = F.round(
        F.log(F.when(seen, s_seen).otherwise(s_back)), 6
    ).cast("decimal(18,6)")
    backed = F.when(seen, F.lit(0)).otherwise(F.col("_cnt"))
    return j.groupBy(id_col).agg(
        F.sum("_cnt").cast("long").alias("n_bigrams"),
        round_half_away(
            F.sum(logp * F.col("_cnt")).cast("double") / F.sum("_cnt"),
            6,
        ).alias("avg_backoff_logprob"),
        round_half_away(
            F.sum(backed).cast("double") / F.sum("_cnt").cast("double"),
            6,
        ).alias("backoff_rate"),
    )


#: Salt for weighted sampling — independent of every other md5-keyed
#: decision on the same ids (uniform sampling, capping, splits).
WEIGHTED_SALT = "wsample:"


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    resolution: int = 1_000_000,
    salt: str = WEIGHTED_SALT,
) -> DataFrame:
    """Deterministic WEIGHTED sampling: keep each row with probability
    equal to its per-row ``weight_col`` (clamped to [0, 1]) — the
    quality-proportional downsampling step corpus pipelines run so
    higher-quality documents survive at higher rates than a flat
    uniform rate, while staying re-runnable and auditable.

    Decision rule (engine-portable, like [[hash_sample]]):
    ``md5_int(salt || id) % resolution < round(weight × resolution)``.
    The hash is uniform on [0, resolution), so P(keep) = weight to
    1/resolution precision; keyed on the id alone, the kept set is
    independent of partitioning, engine, and run order. Callers who
    need EXACT cross-engine parity should pass weights whose
    ``weight × resolution`` is integral (no float-rounding boundary).

    Scale shape: a pure per-row filter under the scan — zero shuffle,
    no RNG state, prunes before any downstream shuffle.
    """
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight_col))
    bucket = md5_int(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ) % resolution
    return df.filter(bucket < F.round(w * resolution).cast("long"))


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents by BM25 against a literal query-term set:
    (id, score, rank) — the keyword-retrieval tier a corpus pipeline
    runs for targeted slice extraction ("pull the docs about X") and
    as the sparse half of hybrid sparse+dense retrieval next to the
    cosine/ANN operators (operators/similarity.py).

    Scoring is the Lucene/Robertson variant with the +1 IDF floor
    (idf = ln(1 + (N − df + 0.5)/(df + 0.5)), always positive):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Determinism contract (same rules as tfidf_top_terms): each
    per-term partial is rounded to 6 dp (transcendental output —
    boundary probability ~0) and accumulated as DECIMAL(18,6), so the
    per-document sum is reduction-order-independent and hash-matches
    any engine; ranking ties break on id ascending.

    Scale shape: one explode → two hash aggregates (doc lengths over
    ALL tokens, tf over QUERY tokens only — the isin filter prunes the
    tf shuffle to |terms| keys' worth of rows); df and the (N, avgdl)
    scalars ride as broadcasts (|terms| rows and 1 row); the final
    top-k is a rank over doc-level rows. Nothing quadratic, no state
    proportional to vocabulary.
    """
    terms = sorted(set(query_terms))
    toks = df.select(
        F.col(id_col), F.explode(token_array(F.col(text_col))).alias("term")
    )
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    )
    partial = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_part",
            F.round(
                F.col("_idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b
                        * F.col("dl")
                        / (F.col("_sumdl").cast("double") / F.col("_n"))
                    )
                ),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    scored = partial.groupBy(id_col).agg(
        F.sum("_part").cast("double").alias("score")
    )
    # Total-ordered limit compiles to TakeOrderedAndProject (per-
    # partition top-k + k-row merge), NOT a single-partition global
    # sort; the ordinal window then runs over k rows only.
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return topk.select(
        id_col, "score", F.row_number().over(w).cast("long").alias("rank")
    )


SHUFFLE_SALT = "shuffle:"


def global_shuffle(
    df: DataFrame,
    id_col: str,
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global permutation — the training-data shuffle
    that breaks source/temporal locality before examples are packed
    into a fixed epoch order (documents arrive grouped by crawl/domain;
    a model trained in that order sees non-stationary batches).

    Each row's sort key is the salted id-hash ``md5('shuffle:'||id)``;
    the contiguous 1-based position comes from the two-pass
    ``global_row_index`` machinery (range-repartition on the hash +
    partition-local sort + broadcast per-partition offsets), so the
    permutation costs ONE range exchange at any scale — never a
    single-partition window. Deterministic by construction: same ids →
    same permutation across re-runs, engines, and partition layouts
    (id appended as the tiebreaker makes the order total even under
    hash collisions).
    """
    from .windows import global_row_index

    # collision-proof temp name: withColumn would silently overwrite
    # (and drop would then destroy) a caller column of the same name
    key = "_shuffle_key"
    while key in df.columns:
        key += "_"
    keyed = df.withColumn(
        key,
        md5_int(F.concat(F.lit(SHUFFLE_SALT), F.col(id_col).cast("string"))),
    )
    return global_row_index(keyed, [key, id_col], index_col=pos_col).drop(key)


# ---------------------------------------------------------------------------
# DSIR importance weighting + CCNet perplexity buckets (new r9, 4th batch)
# ---------------------------------------------------------------------------

#: Hashed feature dimension for DSIR importance weights. 256 buckets of
#: word uni+bigrams — small enough that the per-bucket log-ratio table
#: collapses to ONE broadcast array row, large enough that the
#: likelihood ratio is informative (DSIR's published configs use 1e4;
#: the bucket count is a quality knob, not a correctness one).
DSIR_DIM = 256

#: Fixed-point scale for per-feature log-ratio contributions: micros.
#: Integer accumulation makes the per-document sum order-independent
#: and bit-exact across engines (same idiom as the quality classifier's
#: fixed-point weights).
DSIR_SCALE = 1_000_000


def dsir_importance(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target,
    dim: int = DSIR_DIM,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much it resembles a TARGET slice under two hashed
    bag-of-ngram "language models" — the data-selection layer a
    pipeline runs when it wants "more data that looks like Wikipedia"
    out of a web crawl, without training a classifier.

    Model: features are the shared hashed uni+bigram buckets
    (:func:`..operators.text.hashed_uni_bigram_buckets`, md5 → ``dim``).
    Bucket distributions for the target slice (rows where ``target``
    is true) and the raw remainder get add-one smoothing:
    ``p[b] = (count_b + 1) / (total + dim)``. A document's log
    importance weight is the sum over its FEATURE INSTANCES of
    ``ln p_target(b) − ln p_raw(b)``.

    Engine parity: each bucket's log-ratio is rounded ONCE to integer
    micros (``round((ln pt − ln pr) · 1e6)`` as BIGINT); per-document
    accumulation is an integer fold — order-independent, exact — and
    the single division back to a double happens once per document.

    Scale shape: two corpus scans (the same contract as
    :func:`unigram_logprob` — distributions first, scoring second) and
    the corpus itself NEVER shuffles. Scan 1 explodes features into a
    ``groupBy(bucket)`` hash aggregate: map-side combine means the
    shuffle carries at most ``dim`` partial rows per task, not token
    volume. The bucket→log-ratio table (``dim`` rows) folds into a
    one-row array via ``array_sort(collect_list(struct))`` and rides a
    broadcast crossJoin; scan 2 scores each document with a zero-
    shuffle integer fold over that literal-like array (``element_at``
    lookup, no join). Output is narrow per-doc rows.

    Returns ``(id, n_features, log_weight)``; docs with zero tokens
    (including NULL text — coalesced to empty, like NULL targets) get
    ``n_features = 0, log_weight = 0.0``.
    """
    from .text import hashed_uni_bigram_buckets

    # Bind the token array as a lambda variable (the
    # element_at(transform(array(x), λ), 1) idiom): the bigram builder
    # reads element_at(toks, i) and element_at(toks, i+1) per bigram,
    # and HOF lambdas get no common-subexpression elimination — an
    # unbound token_array expression re-tokenizes the document per
    # element access, O(n²) chars per doc (the measured 27 s vs 4.5 s
    # trap on quality_classifier_score's docstring).
    def over_tokens(toks):
        return hashed_uni_bigram_buckets(toks, dim)

    txt = F.coalesce(F.col(text_col), F.lit(""))
    feats = F.element_at(
        F.transform(F.array(token_array(txt)), over_tokens), 1
    )
    is_t = F.coalesce(target, F.lit(False))

    # scan 1: per-bucket instance counts, target vs raw
    inst = df.select(is_t.alias("_is_t"), F.explode(feats).alias("_b"))
    counts = inst.groupBy("_b").agg(
        F.sum(F.col("_is_t").cast("long")).alias("_ct"),
        F.sum((~F.col("_is_t")).cast("long")).alias("_cr"),
    )
    # totals derive from the 256-row count table — no third corpus scan
    totals = counts.agg(
        F.coalesce(F.sum("_ct"), F.lit(0)).alias("_tt"),
        F.coalesce(F.sum("_cr"), F.lit(0)).alias("_tr"),
    )
    grid = df.sparkSession.range(dim).select(F.col("id").alias("_b"))
    d = float(dim)
    pt = (F.coalesce(F.col("_ct"), F.lit(0)) + 1).cast("double") / (
        F.col("_tt") + d
    )
    pr = (F.coalesce(F.col("_cr"), F.lit(0)) + 1).cast("double") / (
        F.col("_tr") + d
    )
    ratio = (
        grid.join(counts, "_b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.round((F.log(pt) - F.log(pr)) * DSIR_SCALE)
            .cast("long")
            .alias("_r"),
        )
    )
    rarr = ratio.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_b").alias("b"), F.col("_r").alias("r"))
                )
            ),
            lambda s: s["r"],
        ).alias("_rarr")
    )

    # scan 2: zero-shuffle scoring fold. The feature array is bound as
    # a lambda variable so size + fold share ONE evaluation per row
    # (the element_at(transform(array(x), λ), 1) idiom).
    def over_feats(f):
        acc = F.aggregate(
            f,
            F.lit(0).cast("long"),
            lambda a, b: a + F.element_at(F.col("_rarr"), b.cast("int") + 1),
        )
        return F.struct(
            F.size(f).cast("long").alias("n_features"),
            round_half_away(
                acc.cast("double") / F.lit(float(DSIR_SCALE)), 6
            ).alias("log_weight"),
        )

    st = F.element_at(F.transform(F.array(feats), over_feats), 1)
    return (
        df.crossJoin(F.broadcast(rarr))
        .select(F.col(id_col), st.alias("_s"))
        .select(
            F.col(id_col),
            F.col("_s.n_features").alias("n_features"),
            F.col("_s.log_weight").alias("log_weight"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020): rank every document WITHIN its language by the cheap LM
    quality proxy (:func:`unigram_logprob`'s mean token corpus
    log-probability) and cut each language into ``n_buckets``
    equal-frequency tiers — ``head`` (most probable text, lowest
    perplexity), ``middle``, ``tail``. Production pipelines keep
    head+middle and drop or down-weight tail, per language, so
    low-resource languages are not graded on the high-resource
    languages' curve.

    Bucket allocation is the SQL-standard NTILE over the total order
    ``(avg_logprob DESC, id)`` — bucket 1 holds the highest log-prob
    (head) documents. Ranking DESCENDS from the head so a language
    with FEWER than ``n_buckets`` documents lands entirely in the
    RETENTION tiers (1 doc → head; 2 docs → head, middle): tiny
    languages must never be classed into the drop tier by the
    degenerate allocation, or the per-language cut defeats exactly
    the low-resource protection it exists for. Computed
    ARITHMETICALLY from scale-safe per-group ranks
    (:func:`..operators.windows.scale_safe_group_ranks` —
    range-partitioned, never a per-language single-task sort) via
    :func:`..operators.windows.ntile_from_rank`, bit-identical to
    ``ntile()`` by the derivation
    :func:`..operators.windows.equi_depth_bins` pins against its
    oracle.

    Scale shape: the unigram LM costs its two token-stream passes;
    ranking then operates on ONE ROW PER DOCUMENT (id, lang, score) —
    the range exchange and metadata broadcast of the rank machinery
    never touch token volume. Zero-token documents drop out with the
    LM contract.

    Returns ``(id, group, n_tokens, avg_logprob, bucket, ppl_bucket)``
    with ``bucket`` 1-based from the head.
    """
    from .windows import ntile_from_rank, scale_safe_group_ranks

    lp = unigram_logprob(df, text_col, id_col)
    labeled = df.select(F.col(id_col), F.col(group_col)).join(lp, id_col)
    # rank 1 = highest avg_logprob: scale_safe_group_ranks orders
    # ascending, so feed it the negated score (exact for doubles)
    ranked = scale_safe_group_ranks(
        labeled.withColumn("_neg_lp", -F.col("avg_logprob")),
        group_col,
        ["_neg_lp", id_col],
    )
    bucket = ntile_from_rank(
        F.col("_rank"), F.col("_grp_n"), F.lit(n_buckets)
    )
    return ranked.select(
        F.col(id_col),
        F.col(group_col),
        F.col("n_tokens"),
        F.col("avg_logprob"),
        bucket.cast("long").alias("bucket"),
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("ppl_bucket"),
    )


def rrf_fusion(
    ranked_lists: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): merge
    N ranked retrieval lists into one by ``Σ_lists 1/(k_rrf + rank)``
    — the standard glue for hybrid sparse+dense retrieval (a BM25
    list from :func:`bm25_scores` fused with a cosine list from
    ``similarity.brute_force_topk``). Rank-based fusion needs no
    score calibration between retrievers, which is exactly why
    production hybrid search defaults to it; ``k_rrf = 60`` is the
    paper's constant. Items missing from a list simply contribute
    nothing (no imputation).

    Determinism contract (the bm25/tfidf idiom): each list's
    reciprocal-rank partial is rounded to 6 dp and accumulated as
    DECIMAL(18,6), so the fused score is reduction-order-independent
    and engine-portable; final ties break on id ascending.

    Scale shape: the inputs are already top-depth lists (k·queries
    rows each), so fusion is metadata-sized at any corpus scale — one
    union, one hash aggregate over ≤ Σ|lists| rows, and a
    TakeOrderedAndProject top-k. The corpus-scale work lives in the
    retrievers, not here.

    Returns ``(id, rrf_score, rank)`` for the fused top-``k``.
    """
    if not ranked_lists:
        raise ValueError("rrf_fusion needs at least one ranked list")
    part = F.round(
        F.lit(1.0) / (F.lit(k_rrf) + F.col(rank_col).cast("double")), 6
    ).cast("decimal(18,6)")
    contribs = None
    for lst in ranked_lists:
        c = lst.select(F.col(id_col), part.alias("_part"))
        contribs = c if contribs is None else contribs.unionByName(c)
    scored = contribs.groupBy(id_col).agg(
        F.sum("_part").cast("double").alias("rrf_score")
    )
    topk = scored.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return topk.select(
        id_col,
        "rrf_score",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def data_card(
    df: DataFrame,
    text_col: str,
    id_col: str,
    domain_cols: list[str],
) -> DataFrame:
    """Release DATA CARD (new r11): the per-domain composition report a
    dataset release ships next to its shards — document/token volume,
    exact-duplicate rate, and the quality-classifier profile, grouped
    by the ``domain_cols`` strata (e.g. ``[source, lang]``).

    One corpus pass builds the per-doc row (token count via the shared
    tokenizer, min-id-over-identical-content duplicate flag, the
    zero-shuffle :func:`~.text.quality_classifier_score`); one hash
    aggregate folds it to |strata| rows. Ratios follow the repo's
    cross-engine rules: integer or decimal-accumulated numerators,
    single division, 6 dp half-away rounding.

    Scale shape: the duplicate-flag window partitions by ``md5(text)``
    — the exchange carries a 32-char key plus the tiny projected row,
    never the document body (the same content-hash keying as
    :func:`~.dedup.dedup_exact_content`); the oracle partitions by the
    identical md5 expression, so the grouping is mirrored, not merely
    equivalent-modulo-collisions.
    """
    from .text import quality_classifier_score

    scored = quality_classifier_score(df, text_col, id_col).select(
        F.col(id_col), F.col("quality_score"), F.col("keep")
    )
    w = Window.partitionBy(F.md5(F.col(text_col)))
    per_doc = (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in domain_cols],
            # coalesce BEFORE tokenizing (same as
            # quality_classifier_score): size() on a NULL array is -1
            # (legacy sizeOfNull) while the DuckDB oracle's len() is
            # NULL — a NULL-text doc must count 0 tokens in both
            F.size(token_array(F.coalesce(F.col(text_col), F.lit(""))))
            .cast("long")
            .alias("_nt"),
            (F.col(id_col) != F.min(id_col).over(w))
            .cast("long")
            .alias("_is_dup"),
        )
        .join(scored, id_col)
    )
    cnt = F.count(F.lit(1))
    return per_doc.groupBy(*domain_cols).agg(
        cnt.cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        round_half_away(
            F.sum("_nt").cast("double") / cnt.cast("double"), 6
        ).alias("mean_tokens"),
        round_half_away(
            F.sum("_is_dup").cast("double") / cnt.cast("double"), 6
        ).alias("dup_rate"),
        round_half_away(
            F.sum(F.col("quality_score").cast("decimal(38,12)"))
            .cast("double")
            / cnt.cast("double"),
            6,
        ).alias("mean_quality"),
        round_half_away(
            F.sum(F.col("keep").cast("long")).cast("double")
            / cnt.cast("double"),
            6,
        ).alias("keep_rate"),
    )


def purge_corpus(
    df: DataFrame,
    removals: DataFrame,
    text_col: str,
    id_col: str,
    propagate_exact: bool = True,
) -> DataFrame:
    """Takedown/opt-out PURGE (new r12): remove every document named in
    ``removals`` (one column, matching ``id_col``), and — with
    ``propagate_exact`` — every OTHER document whose exact content
    (md5 of the text) matches a directly-removed document. A rights
    holder's takedown names one URL/id; the verbatim mirror copies the
    crawler also picked up must leave with it, or the release still
    ships the content (the reason a purge pairs with the exact-dedup
    tier, not a bare anti-join). Returns the kept corpus with the
    original schema.

    Propagation is keyed on NON-EMPTY text only: every NULL/empty doc
    sharing the degenerate hash would otherwise vanish because one of
    them was taken down.

    Scale shape: takedown lists are tiny next to the corpus, so both
    probes are broadcast-shaped — a broadcast anti-join on id, and a
    broadcast anti-join on md5(text) against the (distinct) hashes of
    the directly-removed docs. The corpus is never shuffled and the
    text never moves; at 100 TB this is two map-side probes over one
    scan.
    """
    rem_ids = removals.select(
        removals.columns[0]
    ).toDF(id_col).distinct()
    kept = df.join(F.broadcast(rem_ids), id_col, "left_anti")
    if not propagate_exact:
        return kept
    txt = F.coalesce(F.col(text_col), F.lit(""))
    removed_hashes = (
        df.join(F.broadcast(rem_ids), id_col, "left_semi")
        .filter(F.length(txt) > 0)
        .select(F.md5(txt).alias("_purge_h"))
        .distinct()
    )
    return kept.join(
        F.broadcast(removed_hashes),
        F.md5(txt) == F.col("_purge_h"),
        "left_anti",
    )


def purge_audit(
    df: DataFrame,
    removals: DataFrame,
    text_col: str,
    id_col: str,
    domain_cols: list[str],
) -> DataFrame:
    """Per-stratum PURGE AUDIT — the report a release ships to prove a
    takedown was honored: for each ``domain_cols`` stratum, how many
    documents existed, how many were removed directly (named in
    ``removals``), how many were swept by exact-content propagation
    (verbatim copies of a removed doc, :func:`purge_corpus`
    semantics), how many remain, and the purge rate (6 dp half-away,
    the repo's cross-engine ratio rule).

    One corpus pass: each doc is tagged direct / propagated / kept via
    two broadcast probes (id set, removed-content hash set), then one
    hash aggregate folds to |strata| rows.
    """
    rem_ids = removals.select(
        removals.columns[0]
    ).toDF(id_col).distinct()
    txt = F.coalesce(F.col(text_col), F.lit(""))
    removed_hashes = (
        df.join(F.broadcast(rem_ids), id_col, "left_semi")
        .filter(F.length(txt) > 0)
        .select(F.md5(txt).alias("_purge_h"))
        .distinct()
    )
    flagged = (
        df.join(
            F.broadcast(rem_ids.withColumn("_direct", F.lit(1))),
            id_col,
            "left",
        )
        .join(
            F.broadcast(removed_hashes.withColumn("_hmatch", F.lit(1))),
            F.md5(txt) == F.col("_purge_h"),
            "left",
        )
        .select(
            *[F.col(c) for c in domain_cols],
            F.coalesce(F.col("_direct"), F.lit(0)).alias("_d"),
            (
                (F.coalesce(F.col("_hmatch"), F.lit(0)) == 1)
                & F.col("_direct").isNull()
            )
            .cast("int")
            .alias("_p"),
        )
    )
    cnt = F.count(F.lit(1))
    return flagged.groupBy(*domain_cols).agg(
        cnt.cast("long").alias("n_docs"),
        F.sum("_d").cast("long").alias("n_direct"),
        F.sum("_p").cast("long").alias("n_propagated"),
        (cnt - F.sum("_d") - F.sum("_p")).cast("long").alias("n_kept"),
        round_half_away(
            (F.sum("_d") + F.sum("_p")).cast("double") / cnt.cast("double"),
            6,
        ).alias("purge_rate"),
    )
