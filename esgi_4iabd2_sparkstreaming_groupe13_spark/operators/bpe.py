"""Distributed BPE tokenizer training and encoding.

The one LLM-pipeline stage between corpus prep (dedup/filter/mix) and
shard export (`operators/shards.py`) the engine did not yet cover:
LEARNING the tokenizer itself at corpus scale, then encoding documents
with the learned merge table. Classic byte-pair encoding (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") re-expressed Spark-first:

* **Corpus-scale work happens exactly once** — one tokenize → explode →
  hash-agg pass builds the word-frequency table (`word_frequencies`).
  At 100 TB that is the only stage that touches every byte; it is a
  single map-side-combinable shuffle keyed on the word.
* **The merge loop never sees the corpus.** Each of the K merge rounds
  runs on the word-VOCABULARY frame (weighted by word count) — size
  bounded by distinct words, which grows sub-linearly with corpus
  bytes (Heaps' law), not with row count. Pair counting is an
  `explode` + hash agg over that frame; the argmax pair is the ONLY
  thing the driver ever sees (one 2-symbol row per round, O(K) total
  driver traffic). Applying a merge is a pure JVM higher-order-function
  scan (`F.aggregate` with a carry accumulator — no Python, no UDF, no
  shuffle); `localCheckpoint` every `checkpoint_every` rounds truncates
  the K-deep lineage exactly as the connected-components fixpoint in
  `operators/graph.py` does.
* **Encoding factors through DISTINCT words** (`bpe_encode_counts`):
  the corpus side only explodes tokens and joins them back to one
  encoded row per distinct word — the Arrow-batched Python encoder
  (the repo's 4th and only new pandas-UDF entry point) runs on the
  vocabulary frame, so Python cost is bounded by vocab size while all
  per-document work (explode, join, sum) stays JVM-side.

Merge-application semantics (shared by train, encode, and the DuckDB
oracle): one round replaces all LEFTMOST NON-OVERLAPPING occurrences
of the pair, repeated to a fixpoint at encode time. Encoding applies
merges sequentially in rank order with a per-rank fixpoint — provably
identical to the priority-queue ("lowest rank pair anywhere first")
encoder used by GPT-2-style tokenizers whenever the merge table is
*creation-ordered* (each pair's components are single characters or
composites created by an earlier merge): a merge at rank r can only
create new adjacencies involving its own output symbol, and any merge
consuming that symbol must have rank > r, so no lower-rank pair can
ever (re)appear after rank r has been processed. Every table produced
by `bpe_train` is creation-ordered by construction; `encode_word_fn`
asserts the property for caller-supplied tables.

Reference parity: the reference engine has no tokenizer stage — this
is part of the mandated beyond-parity LLM-pipeline surface (training
shards consume token counts from exactly this path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.hashing import token_array

#: End-of-word sentinel appended to every word's symbol sequence so
#: merges never cross word boundaries and suffix units stay distinct
#: from prefix/infix units (Sennrich et al.'s `</w>`).
WORD_END = "</w>"

MERGES_SCHEMA = StructType(
    [
        StructField("rank", LongType(), False),
        StructField("sym_left", StringType(), False),
        StructField("sym_right", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over the corpus — the single corpus-scale pass.

    One explode + one hash agg keyed on the word; partial aggregation
    combines map-side, so the shuffle carries distinct words per
    partition, not token occurrences.
    """
    return (
        df.select(F.explode(token_array(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols + the WORD_END sentinel."""
    chars = F.filter(F.split(word, ""), lambda c: F.length(c) > 0)
    return F.concat(chars, F.array(F.lit(WORD_END)))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<sym_left,sym_right>> of adjacent symbol pairs.

    A fully-merged word has ONE symbol and no pairs — guarded
    explicitly because ``sequence(1, 0)`` is a DESCENDING sequence in
    Spark, not an empty one.
    """
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("sym_left"),
            F.element_at(syms, i + 1).alias("sym_right"),
        ),
    )
    empty = F.array().cast(
        "array<struct<sym_left:string,sym_right:string>>"
    )
    return F.when(F.size(syms) < 2, empty).otherwise(pairs)


def initial_pair_counts(words: DataFrame) -> DataFrame:
    """Round-zero symbol-pair frequencies over a (word, cnt) table —
    the corpus-visible face of the training loop (each later round has
    the identical plan shape, just over evolved segmentations):
    vocab-frame explode + map-side-combining hash agg."""
    w = words.select("cnt", _initial_symbols(F.col("word")).alias("syms"))
    return (
        w.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
        .groupBy("p.sym_left", "p.sym_right")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Replace all leftmost non-overlapping (left, right) adjacencies
    in a symbol array with the concatenated symbol — pure JVM
    higher-order aggregate (carry accumulator), no UDF.

    Scan semantics match the classic BPE merge: `[a,b,a,b]` → `[ab,ab]`
    and `[a,a,a]` → `[aa,a]` for the pair (a,a) (a freshly merged
    symbol never re-participates within the same round).
    """
    merged = left + right
    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, x: Column) -> Column:
        carry, out = acc["carry"], acc["out"]
        take = (carry == F.lit(left)) & (x == F.lit(right))
        return F.struct(
            F.when(carry.isNull(), out)
            .when(take, F.concat(out, F.array(F.lit(merged))))
            .otherwise(F.concat(out, F.array(carry)))
            .alias("out"),
            F.when(carry.isNull() | ~take, x)
            .otherwise(F.lit(None).cast("string"))
            .alias("carry"),
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        )

    return F.aggregate(syms, zero, step, finish)


def bpe_train(
    words: DataFrame,
    num_merges: int,
    min_count: int = 1,
    min_pair_count: int = 1,
    checkpoint_every: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Learn up to ``num_merges`` BPE merges from a (word, cnt)
    frequency table (from :func:`word_frequencies`).

    Returns ``(merges, vocab_words)``: the creation-ordered merge
    table (rank, sym_left, sym_right, pair_count) and the word frame
    with its final ``syms`` segmentation (feed to :func:`bpe_vocab`
    for unit frequencies).

    Argmax tie-break is total and deterministic: highest pair count,
    then lexicographically smallest (sym_left, sym_right) — re-runs
    and repartitioning cannot reorder the merge table.

    Scale: each round is one vocab-frame explode + hash agg (pair
    counts combine map-side) + a LIMIT-1 driver fetch + one narrow
    projection. ``min_count`` prunes the singleton word tail up front
    — at web scale the tail is most of the distinct-word mass but a
    vanishing share of pair weight, so pruning shrinks every round's
    input at bounded bias (the standard practice; set 1 for exact
    small-corpus parity). Lineage is truncated every
    ``checkpoint_every`` rounds (vocab-sized localCheckpoint), so the
    K-round loop never replays from round zero.
    """
    spark = words.sparkSession
    w = words.filter(F.col("cnt") >= F.lit(int(min_count))).select(
        "word", "cnt", _initial_symbols(F.col("word")).alias("syms")
    )
    w = w.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(num_merges)):
        best = (
            w.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
            .groupBy("p.sym_left", "p.sym_right")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "sym_left", "sym_right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        a, b = best[0]["sym_left"], best[0]["sym_right"]
        merges.append((rank, a, b, int(best[0]["pair_count"])))
        w = w.withColumn("syms", merge_pair_expr(F.col("syms"), a, b))
        if (rank + 1) % checkpoint_every == 0:
            w = w.localCheckpoint(eager=True)

    merges_df = spark.createDataFrame(merges, MERGES_SCHEMA)
    return merges_df, w


def bpe_fit_or_load(
    spark: SparkSession,
    words: DataFrame,
    model_path: str,
    num_merges: int,
    **train_kwargs,
) -> list[tuple[str, str]]:
    """Train/serve split for the merge table — the same persisted-model
    contract as the IVF/PQ codebooks (`similarity.kmeans_fit_or_load`):
    a tokenizer is a MODEL with its own lifecycle — trained once per
    corpus version, then reused by every encode/packing/shard-export
    run. Loads the persisted table when present and well-formed
    (schema + creation-order verified via :func:`encode_word_fn`),
    refits-and-overwrites otherwise. ``bpe_train`` is deterministic
    (total argmax tie-break), so load-vs-refit is bit-identical.

    Returns the rank-ordered merge list (the form every encode entry
    point consumes).

    A fewer-than-requested persisted table is only valid when training
    STOPPED EARLY at the same request — indistinguishable from a model
    trained with a smaller ``num_merges`` by looking at rows alone
    (serving that one would silently run every downstream encode on an
    under-trained vocabulary). The sidecar ``_bpe_meta.json`` records
    the config the table was trained under; load requires an exact
    config match.

    LOCAL-FILESYSTEM CONTRACT (ADVICE r10): the ``_SUCCESS`` probe and
    the meta sidecar use ``os.path`` while the merge table goes
    through Spark's Hadoop FS — with an ``s3://``/``hdfs://``
    ``model_path`` the local probes would never see the table and
    every call would silently refit. Same contract as ``publish.py``'s
    rename-based commits (plain local-filesystem JSON + atomic
    renames); a remote model store should front this with a local
    staging dir or a metastore table. Non-local schemes are refused
    loudly rather than degraded to refit-every-call.
    """
    import json as _json
    import os

    if "://" in str(model_path) and not str(model_path).startswith("file://"):
        raise ValueError(
            f"bpe_fit_or_load requires a local-filesystem model_path "
            f"(got {model_path!r}): the _SUCCESS/_bpe_meta.json probes "
            "are os.path-based and would silently refit on every call "
            "against a remote store"
        )
    meta_path = os.path.join(model_path, "_bpe_meta.json")
    want_meta = {
        "num_merges": int(num_merges),
        "min_count": int(train_kwargs.get("min_count", 1)),
        "min_pair_count": int(train_kwargs.get("min_pair_count", 1)),
    }

    def _load() -> list[tuple[str, str]] | None:
        if not os.path.exists(os.path.join(model_path, "_SUCCESS")):
            return None
        try:
            with open(meta_path) as fh:
                meta = _json.load(fh)
        except (OSError, ValueError):
            return None
        if meta != want_meta:
            return None
        m = spark.read.parquet(model_path)
        fields = {f.name: f.dataType.simpleString() for f in m.schema}
        want = {f.name: f.dataType.simpleString() for f in MERGES_SCHEMA}
        if not all(fields.get(k) == v for k, v in want.items()):
            return None
        rows = m.orderBy("rank").collect()
        if len(rows) > num_merges or [r["rank"] for r in rows] != list(
            range(len(rows))
        ):
            return None
        pairs = [(r["sym_left"], r["sym_right"]) for r in rows]
        try:
            _assert_creation_ordered(pairs)
        except ValueError:
            return None
        return pairs

    cached = _load()
    if cached is not None:
        return cached
    merges_df, _ = bpe_train(words, num_merges, **train_kwargs)
    merges_df.write.mode("overwrite").parquet(model_path)
    with open(meta_path, "w") as fh:
        _json.dump(want_meta, fh)
    loaded = _load()
    assert loaded is not None, "freshly written merge table failed to load"
    return loaded


def bpe_vocab(vocab_words: DataFrame) -> DataFrame:
    """(symbol, freq) over the final segmentation — the learned
    subword vocabulary with corpus frequencies."""
    return (
        vocab_words.select(
            F.explode(F.col("syms")).alias("symbol"), F.col("cnt")
        )
        .groupBy("symbol")
        .agg(F.sum("cnt").alias("freq"))
    )


def _assert_creation_ordered(merges: list[tuple[str, str]]) -> None:
    known: set[str] = set()
    for a, b in merges:
        for part in (a, b):
            if len(part) > 1 and part != WORD_END and part not in known:
                raise ValueError(
                    f"merge table is not creation-ordered: component "
                    f"{part!r} of ({a!r}, {b!r}) is composite but was "
                    "never produced by an earlier merge — sequential "
                    "rank-order encoding would diverge from priority "
                    "encoding on such a table"
                )
        known.add(a + b)


def encode_word_fn(merges: list[tuple[str, str]]):
    """Plain-Python single-word encoder for a creation-ordered merge
    table: chars + WORD_END, then each merge in rank order to a
    fixpoint (leftmost non-overlapping scan per pass). Shared by the
    pandas-UDF batch path and the tests' reference comparison."""
    _assert_creation_ordered(merges)

    def encode(word: str) -> list[str]:
        syms = list(word) + [WORD_END]
        for a, b in merges:
            merged = a + b
            while True:
                out: list[str] = []
                i = 0
                changed = False
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(merged)
                        i += 2
                        changed = True
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
                if not changed:
                    break
        return syms

    return encode


def encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Encode a DISTINCT-word frame: adds ``toks`` (array<string>) and
    ``n_toks``. Arrow-batched pandas UDF — Python cost is bounded by
    vocabulary size, never corpus size (callers join the result back
    to token occurrences; see :func:`bpe_encode_counts`)."""
    import pandas as pd  # noqa: F401 — pandas_udf signature

    encode = encode_word_fn(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def enc(col):
        return col.map(encode)

    return words.withColumn("toks", enc(F.col("word"))).withColumn(
        "n_toks", F.size("toks").cast("long")
    )


def bpe_encode_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document subword statistics under a learned merge table:
    (id, *extra_cols, n_words, n_tokens).

    Plan shape: explode word occurrences (JVM) → distinct words →
    Arrow-batched per-word encode (vocab-sized) → shuffle join
    occurrences back on the word key → per-document hash agg. The
    join is keyed on the word — co-partitioned with the distinct()
    that produced the build side, and the probe side carries only
    (id, extras, word). Documents whose token array is empty produce
    no rows (no tokens → nothing to count); callers needing them keep
    an outer join on the id spine.
    """
    extra = list(extra_cols or [])
    occ = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra],
        F.explode(token_array(F.col(text_col))).alias("word"),
    )
    encoded = encode_words(occ.select("word").distinct(), merges).select(
        "word", "n_toks"
    )
    return (
        occ.join(encoded, "word")
        .groupBy(id_col, *extra)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


def decode_tokens(toks: Column) -> Column:
    """Inverse of the subword encoder — pure expression, valid for ANY
    merge table: BPE merges only ever concatenate adjacent symbols, so
    joining a word's subword tokens and stripping the WORD_END
    sentinel must reproduce the word exactly. ``q_bpe_roundtrip``
    stakes that contract on every distinct corpus word (an encoder
    that dropped, duplicated, or reordered a symbol breaks it), and
    the DuckDB oracle states the expected truth without needing the
    merge table at all."""
    return F.regexp_replace(F.array_join(toks, ""), WORD_END + "$", "")
