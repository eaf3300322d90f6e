"""Count-Min sketch over a token stream — the fixed-size mergeable
frequency summary real pipelines keep when exact per-token counts at
100 TB are a full-corpus shuffle they cannot afford.

Reference parity: n/a (the reference has no sketches at all; SURVEY.md
§2.4 stops at count-by-key). This extends the approximate tier the
engine already carries (HLL distinct, GK percentiles) with the same
design rule as both: the sketch's ACCURACY CONTRACT is an output
column an oracle can check, not a rows-only shrug.

Scale shape: the counter table is ``depth × width`` rows NO MATTER the
corpus size (here 4×1024 = 4,096 cells for any input). Counters build
with one hash aggregate whose partial (map-side) combine does almost
all the work — per-executor traffic is bounded by the sketch size,
exactly the property that makes CMS the 100 TB path. Point estimates
broadcast the counter table (KBs).

Hashing is the repo's engine-portable universal family
(``functions/hashing.py``: md5 → affine-mod-prime with frozen LCG
coefficients), so estimates are deterministic and reproducible in any
engine — which is what lets the registry gate assert the CMS
guarantee (``exact ≤ estimate ≤ exact + ε·N`` with ε = e/width) as a
hash-matched boolean.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    affine_hash,
    hash_params,
    md5_int,
    round_half_away,
    token_array,
)

#: default sketch geometry: ε = e/1024 ≈ 0.27% of the stream length,
#: error probability per estimate ≤ e^-4 ≈ 1.8%
CMS_DEPTH = 4
CMS_WIDTH = 1024

#: slack multiplier for the registry gate: the CMS upper bound holds
#: with probability 1−e^−depth PER QUERY; 2× the ε·N term makes the
#: top-k gate deterministic-in-practice while still failing loudly on
#: any real sketch bug (a broken hash row inflates estimates by
#: orders of magnitude, not percents)
CMS_GATE_SLACK = 2.0


def _cell(token_hash, a: int, b: int, width: int):
    return (affine_hash(token_hash, a, b) % width).cast("int")


def _cell_structs(token_hash, depth: int, width: int, seed: int):
    """The sketch's hash placement — the ONE definition of which
    (row, cell) keys a token hashes to, shared by build and estimate:
    if these ever diverged, estimates would min() over unrelated
    counters."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                _cell(token_hash, a, b, width).alias("cell"),
            )
            for d, (a, b) in enumerate(hash_params(depth, seed))
        ]
    )


def cms_build(
    df: DataFrame,
    text_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = 7,
) -> DataFrame:
    """Build the counter table ``(row, cell, counter)`` — depth×width
    rows total. One explode + one hash aggregate; the explode fans each
    token into ``depth`` (row, cell) keys map-side, and partial
    aggregation collapses them to ≤ depth×width rows per task before
    the (tiny) shuffle. Cells no token hashed into are simply absent
    (implicitly zero); consumers must treat missing as 0."""
    toks = df.select(
        F.explode(token_array(F.col(text_col))).alias("_tok")
    ).select(md5_int(F.col("_tok")).alias("_h"))
    return (
        toks.select(
            F.explode(_cell_structs(F.col("_h"), depth, width, seed)).alias(
                "_c"
            )
        )
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_total(counters: DataFrame) -> DataFrame:
    """Stream length N recovered FROM the sketch (one-row frame):
    every token increments exactly one cell in each row, so the column
    sum of any single row is N. Sketch-sized work — no corpus pass."""
    return (
        counters.filter(F.col("row") == 0)
        .groupBy()
        .agg(F.coalesce(F.sum("counter"), F.lit(0)).alias("_n"))
    )


def cms_estimate(
    counters: DataFrame,
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = 7,
) -> DataFrame:
    """Point estimates for a token frame: min over the depth counter
    rows each token hashes into. The counter table is sketch-sized, so
    it broadcasts; the lookup is a broadcast join, never a shuffle of
    the query side.

    LEFT join + coalesce-to-0: a cell absent from the counter table
    means no token ever hashed there (count 0), so a never-seen query
    token correctly estimates 0 instead of vanishing from the output
    (an inner join would both drop unseen tokens and min() over a
    subset of rows when only some cells collide)."""
    hashed = tokens.withColumn("_h", md5_int(F.col(token_col)))
    keyed = hashed.select(
        "*",
        F.explode(_cell_structs(F.col("_h"), depth, width, seed)).alias("_c"),
    ).select(
        token_col, F.col("_c.row").alias("row"), F.col("_c.cell").alias("cell")
    )
    joined = keyed.join(F.broadcast(counters), ["row", "cell"], "left")
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0).cast("long"))).alias(
            "cms_estimate"
        )
    )


#: Bloom geometry: 2^20 bits, 3 hashes. The bits table materializes
#: only SET bits (≤ k·n rows), so its size tracks the ITEM count, not
#: m. False-positive rate is the analytic (1 − e^{−k·n/m})^k: ≤ ~2e-2
#: up to n ≈ 100k member grams at this geometry, ~0.8 by n = 1M —
#: callers whose member sets outgrow ~m/10 must raise ``m`` (cost is
#: still only set-bit rows) or accept the analytic rate, which the
#: contamination gate computes per run rather than assuming a fixed
#: capacity (ADVICE r4).
BLOOM_BITS = 1 << 20
BLOOM_HASHES = 3


def bloom_fp_rate(n_members, m: int = BLOOM_BITS, k: int = BLOOM_HASHES):
    """Analytic false-positive rate ``(1 − e^{−k·n/m})^k`` as a Column
    expression over a member-count column — the gate-slack formula,
    valid at ANY fill factor (the fixed "1% of grams" slack it replaces
    silently under-covered once n outgrew ~m/10)."""
    n = F.col(n_members) if isinstance(n_members, str) else n_members
    return F.pow(
        F.lit(1.0) - F.exp(-F.lit(float(k)) * n.cast("double") / F.lit(float(m))),
        F.lit(float(k)),
    )


def bloom_build(
    items: DataFrame,
    col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
    seed: int = 11,
) -> DataFrame:
    """Build a Bloom filter over a column as its distinct SET-BIT table
    ``(bit int)`` — the sparse representation of the m-bit array (only
    positions that are 1). Same engine-portable universal hashing as
    the CMS, so the filter is deterministic and order/partitioning
    independent (bit-OR is commutative). ≤ k·|items| rows."""
    h = md5_int(F.col(col))
    pos = F.array(
        *[
            (affine_hash(h, a, b) % m).cast("int")
            for a, b in hash_params(k, seed)
        ]
    )
    return items.select(F.explode(pos).alias("bit")).distinct()


def bloom_might_contain(
    bits: DataFrame,
    probes: DataFrame,
    col: str,
    key_cols: list[str],
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
    seed: int = 11,
) -> DataFrame:
    """Membership probe: a probe row might-contain iff ALL k of its bit
    positions are set. Returns ``key_cols + [col, might_contain]``.
    The set-bit table broadcasts; the probe side explodes to k rows,
    semi-joins the bits, and counts hits per probe key — one narrow
    pass + one hash agg keyed by the probe, never a shuffle of the
    bits. No false negatives by construction: a member's k positions
    are all set, so ``might_contain`` is always TRUE for true members
    — the structural guarantee the gate asserts."""
    h = md5_int(F.col(col))
    pos = F.array(
        *[
            (affine_hash(h, a, b) % m).cast("int")
            for a, b in hash_params(k, seed)
        ]
    )
    exploded = probes.select(
        *key_cols, F.col(col), F.explode(pos).alias("bit")
    )
    hits = (
        exploded.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy(*key_cols, col)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        probes.select(*key_cols, col)
        .join(hits, [*key_cols, col], "left")
        .select(
            *key_cols,
            col,
            (F.coalesce(F.col("_hits"), F.lit(0)) == k).alias(
                "might_contain"
            ),
        )
    )


def cms_heavy_hitters_check(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = 7,
) -> DataFrame:
    """The gate query: top-``k`` tokens by EXACT count, each annotated
    with whether its CMS estimate respects the sketch contract
    ``exact ≤ est ≤ exact + slack·e·N/width`` (N = total tokens).

    Output ``(token, exact_count, within_bound)`` — the estimate
    itself is intentionally not a column (engine-specific magnitude;
    the CONTRACT is what an oracle recomputing exact counts can
    assert). Exact counts here are the audit tier; the sketch is the
    part that ships to 100 TB.
    """
    toks = df.select(F.explode(token_array(F.col(text_col))).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.desc("exact_count"), F.asc("token")).limit(k)

    counters = cms_build(df, text_col, depth, width, seed)
    est = cms_estimate(counters, top, "token", depth, width, seed)

    # N from the sketch itself (cms_total) — not a third corpus pass
    total = cms_total(counters)
    bound = F.ceil(
        F.lit(CMS_GATE_SLACK * math.e / width) * F.col("_n")
    ).cast("long")
    return (
        top.join(est, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "exact_count",
            (
                (F.col("cms_estimate") >= F.col("exact_count"))
                & (F.col("cms_estimate") <= F.col("exact_count") + bound)
            ).alias("within_bound"),
        )
    )


#: rolling-HLL geometry: 2^9 = 512 registers → rsd ≈ 1.04/√512 ≈ 4.6%
HLL_BITS = 9


def rolling_distinct_hll(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    b: int = HLL_BITS,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-N-day distinct-key estimate per day via EXPLICIT
    HyperLogLog registers (new r7) — the sketch-MERGEABILITY story
    made executable: per-day registers are built once (m = 2^b longs
    per day, constant state), and a trailing window merges them by
    per-register MAX — re-counting distinct users over every sliding
    window, which exactly is what a 100 TB pipeline cannot afford to
    do with count_distinct per window.

    Unlike the ``approx_count_distinct`` tier (engine-internal sketch,
    only its 3·rsd envelope is checkable), these registers hash with
    the repo's md5 family, so the DuckDB oracle rebuilds them
    BIT-IDENTICALLY and the estimate itself hash-matches.

    Determinism details: register index = md5 % m; rank = leading
    zeros of the remaining 51 bits + 1 computed via ``length(bin(x))``
    (minimal-digit binary strings in both engines — no float log2);
    the harmonic sum Σ2^−rho is scaled by 2^60 into exact integer
    terms (``shiftleft``) accumulated as DECIMAL(38,0); the standard
    HLL bias/small-range estimator then runs as one double formula
    (ln is transcendental; the final value routes through
    ``round_half_away`` anyway, which is engine-exact at every
    magnitude).

    Scale shape: one (day, register) aggregate (map-side combined —
    shuffle carries ≤ m rows per task per day), a dense
    days×m grid (tiny) for the trailing-MAX window, and a per-day
    aggregate over m rows. Event volume is touched exactly once.

    Returns (day, est_distinct) with day as an ISO string.
    """
    from ..functions.hashing import round_half_away

    m = 1 << b
    rest_bits = 60 - b  # md5_int yields 60 usable bits
    h = md5_int(F.concat(F.lit("hll:"), F.col(key_col).cast("string")))
    bucket = (h % m).cast("int")
    rest = F.shiftright(h, b)  # exact integer shift — no double round-trip
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(rest))
    )
    day_num = F.datediff(
        F.date_trunc("day", F.col(ts_col)).cast("date"),
        F.lit("1970-01-01").cast("date"),
    )
    # persisted: the distinct-days list AND the grid join both read
    # the register table — without it the event-volume aggregate runs
    # twice (plan showed two parquet scans). Output is days × ≤m rows.
    from .caching import track_persist

    regs = track_persist(
        df.select(day_num.alias("day_num"), bucket.alias("reg"), rho.alias("rho"))
        .groupBy("day_num", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    spark = df.sparkSession
    days = regs.select("day_num").distinct()
    grid = days.crossJoin(
        spark.range(m).select(F.col("id").cast("int").alias("reg"))
    )
    dense = grid.join(regs, ["day_num", "reg"], "left").select(
        "day_num", "reg", F.coalesce(F.col("rho"), F.lit(0)).alias("rho")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("reg")
        .orderBy("day_num")
        .rangeBetween(-(window_days - 1), 0)
    )
    merged = dense.select(
        "day_num", "reg", F.max("rho").over(w).alias("mrho")
    )
    # F.shiftleft requires a literal bit count; the SQL form accepts a
    # column expression
    term = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), 60 - mrho) AS DECIMAL(38,0))"
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # alpha·m²·2^60 as ONE python-computed double literal — no
    # engine-side float expression tree to diverge
    num = float(alpha * m * m * float(1 << 60))
    day_agg = merged.groupBy("day_num").agg(
        F.sum(term).cast("double").alias("_s"),
        F.sum(F.when(F.col("mrho") == 0, 1).otherwise(0)).alias("_v"),
    )
    raw = F.lit(num) / F.col("_s")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_v").cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("_v") > 0), small
    ).otherwise(raw)
    return day_agg.select(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("day_num"))
        .cast("string")
        .alias("day"),
        round_half_away(est, 3).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Theta sketch (fixed-threshold KMV, r15): the mergeable distinct
# sketch that — unlike HLL — supports INTERSECTION estimates, because
# its state is an actual uniform hash SAMPLE of the key universe
# rather than register maxima. θ is fixed at 1/THETA_DENOM of the
# 60-bit md5 space: a key is sampled iff md5_int(key) < 2^60/DENOM,
# so |sample| ~ Binomial(n_distinct, 1/DENOM) and
# est = DENOM · |sample| is unbiased with rsd ≈ sqrt((DENOM-1)/n).
# Set algebra transfers to the samples verbatim (the sampled
# sub-universe is itself uniform): |A∩B| ≈ DENOM·|S_A ∩ S_B| on the
# HASH values — which also makes the estimator bit-reproducible in
# DuckDB (md5 + integer arithmetic only).
#
# Scale shape: ONE distinct-aggregate over sub-threshold hashes —
# the shuffle carries ~n/DENOM 8-byte hash rows per group, no
# windows, no collect, map-side combinable, and sketches of shards
# union trivially. At 10^9 distinct keys per group the sample is
# ~16M hashes (DENOM=64) — executor-sized, with rsd ~0.01%.
# ---------------------------------------------------------------------------

THETA_DENOM = 64
THETA_THRESHOLD = (1 << 60) // THETA_DENOM

#: ceiling on the group count the overlap forms will crossJoin —
#: pairs are O(G²); beyond segment-sized group columns (event types,
#: tenants) the caller must raise the cap EXPLICITLY (or pass None)
#: rather than discover a silent quadratic broadcast at scale
THETA_MAX_GROUPS = 1024


def theta_sample(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """The sketch state: distinct (group, hash) pairs below θ.

    Cross-engine parity precondition (same rule as ``md5_int``
    callers elsewhere): ``key_col`` is hashed via Spark's
    cast-to-string, so the DuckDB oracle bit-reproduces estimates
    only for key types whose Spark string cast matches DuckDB's
    VARCHAR cast — integers and strings do; double / timestamp /
    decimal renderings differ between engines (``1.0`` vs ``1``,
    fractional-second padding). Hash such keys through an explicit,
    engine-agreed formatting first (e.g. ``date_format`` /
    ``format_number``) before calling the theta forms (ADVICE r15)."""
    return (
        df.select(
            F.col(group_col).alias("grp"), _theta_hash(key_col).alias("h")
        )
        .filter(F.col("h") < F.lit(THETA_THRESHOLD))
        .distinct()
    )


def _theta_hash(key_col: str):
    """The ONE key→60-bit-hash mapping shared by every theta form
    (fixed-θ and capped-KMV): diverging hashes would make their
    states non-foldable and their estimates incomparable."""
    return md5_int(F.concat(F.lit("theta:"), F.col(key_col).cast("string")))


def theta_distinct(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Production estimator: per-group distinct estimate from the
    θ-sample alone (no exact pass). Integer output — the estimate is
    DENOM · |sample| exactly. Groups whose sample is empty (true
    distinct ≲ DENOM) still emit a row with estimate 0.

    ONE scan, ONE aggregate (r16 optimization round, guide §2.4): the
    sub-threshold hash is nulled instead of filtered, so
    ``count(DISTINCT h)`` — which ignores NULLs — is exactly
    |θ-sample| while every group still emits a row. The previous
    shape scanned the base table twice (sample pass + full-table
    group-list distinct) and joined the two; this is the same output
    from a single distinct-aggregate whose shuffle carries the
    (grp, sampled-hash) pairs plus one null row per group.

    NULL-group parity: the old join-on-grp shape could never match a
    NULL group key (SQL null-join semantics), so a NULL group always
    reported n_sampled 0 — the hash is additionally nulled for NULL
    groups here to reproduce that exactly."""
    h = _theta_hash(key_col)
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.when(
                F.col(group_col).isNotNull()
                & (h < F.lit(THETA_THRESHOLD)),
                h,
            ).alias("h"),
        )
        .groupBy("grp")
        .agg(F.count_distinct(F.col("h")).alias("n_sampled"))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_sampled"),
            (F.col("n_sampled") * F.lit(THETA_DENOM)).alias("est_distinct"),
        )
    )


def theta_distinct_checked(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Registry gate form (HLL-checked pattern): the estimate NEXT TO
    the exact count with the 3σ envelope asserted as a column —
    σ = sqrt(n·(1−p)/p) = sqrt(n·(DENOM−1)) for p = 1/DENOM, plus one
    DENOM of slack for sampling granularity. sqrt is IEEE-correctly-
    rounded in both engines, so the flag is bit-reproducible."""
    groups = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    est = (
        theta_sample(df, group_col, key_col)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    envelope = F.lit(3.0) * F.sqrt(
        F.col("exact_distinct").cast("double")
        * F.lit(float(THETA_DENOM - 1))
    ) + F.lit(float(THETA_DENOM))
    joined = groups.join(est, "grp", "left").select(
        F.col("grp").alias(group_col),
        F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
        (
            F.coalesce(F.col("n_sampled"), F.lit(0))
            * F.lit(THETA_DENOM)
        ).alias("est_distinct"),
        "exact_distinct",
    )
    return joined.withColumn(
        "within_envelope",
        F.abs(
            F.col("est_distinct").cast("double")
            - F.col("exact_distinct").cast("double")
        )
        <= envelope,
    )


def _theta_overlap_core(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_groups: int | None = THETA_MAX_GROUPS,
) -> DataFrame:
    """Shared estimate side of the overlap forms: (type_a, type_b,
    n_a, n_b, n_inter, n_union) per group pair, computed entirely
    from the θ-samples.

    The θ-sample is ``localCheckpoint``-ed EAGERLY at plan
    construction (same trade as the media-profile hash frames, and
    for the same reason: without it Spark re-derives the sample scan
    per join side). Eager means this call blocks on the sampling
    scan, and executor-local checkpoint blocks are NOT fault-tolerant
    — lose an executor and the query fails rather than recomputes.
    Group count is guarded at ``max_groups`` before the G×G pair
    build; pass ``None`` to waive for a column known segment-sized
    (ADVICE r15).

    ONE sampling scan (r16 optimization round, guide §2.4): the
    sub-threshold hash is NULLED instead of filtered, so the
    checkpointed distinct frame carries both the θ-sample (rows with
    non-null h) AND the full group list (every group contributes at
    least one row — a (grp, NULL) row when none of its keys sampled).
    The previous shape paid a second full-table scan for the
    group-list distinct and joined it back; now group list, per-group
    sample counts (``count(h)`` ignores NULLs) and the intersection
    join all read the one checkpointed sketch-sized frame.

    Cheap refusal restored (r17, VERDICT r16 item 6): the
    ``max_groups`` guard runs BEFORE the sampling scan, on a distinct
    count pruned to ``group_col`` alone — a caller handing a
    too-wide column pays one single-column map-side-combined scan and
    gets the ValueError, never the full (grp, hash) materialization
    (the bc353d3 property the r16 single-scan rewrite had undone).
    The success path pays that pruned pre-scan too; it reads one
    column and partial-aggregates to G rows, which at any scale is
    cheaper than the full-width sample scan it precedes."""
    if max_groups is not None:
        n_g = (
            df.select(F.col(group_col).alias("grp")).distinct().count()
        )
        if n_g > max_groups:
            raise ValueError(
                f"theta_overlap: {n_g} distinct groups in "
                f"{group_col!r} exceeds max_groups={max_groups} — the "
                "pairwise form builds O(G²) broadcast pairs; raise "
                "max_groups explicitly (or pass None) only if that "
                "quadratic output surface is intended"
            )
    h = _theta_hash(key_col)
    s_all = (
        df.select(
            F.col(group_col).alias("grp"),
            F.when(h < F.lit(THETA_THRESHOLD), h).alias("h"),
        )
        .distinct()
        .localCheckpoint()
    )
    s = s_all.filter(F.col("h").isNotNull())
    gs = s_all.groupBy("grp").agg(F.count(F.col("h")).alias("n_s"))
    pairs = (
        # groups x groups: group cardinality is segment-sized by
        # contract (event types, tenants) — broadcast the right side
        gs.alias("a")
        .crossJoin(F.broadcast(gs.alias("b")))
        .filter(F.col("a.grp") < F.col("b.grp"))
        .select(
            F.col("a.grp").alias("type_a"),
            F.col("b.grp").alias("type_b"),
            F.col("a.n_s").alias("n_a"),
            F.col("b.n_s").alias("n_b"),
        )
    )
    inter = (
        s.alias("x")
        .join(s.alias("y"), F.col("x.h") == F.col("y.h"))
        .filter(F.col("x.grp") < F.col("y.grp"))
        .groupBy(
            F.col("x.grp").alias("type_a"), F.col("y.grp").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(inter, ["type_a", "type_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    )


def _est_jaccard_col():
    from ..functions.hashing import round_half_away

    return F.when(
        F.col("n_union") > 0,
        round_half_away(
            F.col("n_inter").cast("double")
            / F.col("n_union").cast("double"),
            6,
        ),
    ).alias("est_jaccard")


def theta_overlap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_groups: int | None = THETA_MAX_GROUPS,
) -> DataFrame:
    """Production pairwise audience overlap — the operation HLL cannot
    do. For every group pair (a < b): intersection / union / Jaccard
    estimates computed ENTIRELY from the θ-samples: the joins carry
    DENOM-times-smaller 8-byte hash sets, the plan never touches full
    key sets.

    Blocks at plan construction (the θ-sample is eagerly
    localCheckpoint-ed, non-fault-tolerant executor-local blocks) and
    refuses group columns above ``max_groups`` — pairs are O(G²) by
    contract; see :func:`_theta_overlap_core` (ADVICE r15)."""
    return _theta_overlap_core(df, group_col, key_col, max_groups).select(
        "type_a",
        "type_b",
        (F.col("n_inter") * F.lit(THETA_DENOM)).alias("est_intersection"),
        (F.col("n_union") * F.lit(THETA_DENOM)).alias("est_union"),
        _est_jaccard_col(),
    )


def theta_overlap_checked(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_groups: int | None = THETA_MAX_GROUPS,
) -> DataFrame:
    """:func:`theta_overlap` in gate form: the exact intersection and
    the 3σ envelope asserted alongside the estimates. Only the CHECK
    computes exact intersections over full key sets — drop it in
    production (:func:`theta_overlap`).

    est_jaccard is a ratio of two integers (sampled |∩| / sampled
    |∪|) → rounded with round_half_away for cross-engine
    bit-equality; NULL when the sampled union is empty.

    Same plan-construction behavior as :func:`theta_overlap`: eager
    non-fault-tolerant localCheckpoint of the θ-sample, and the
    ``max_groups`` refusal before the O(G²) pair build (ADVICE r15)."""
    core = _theta_overlap_core(df, group_col, key_col, max_groups)
    keys = df.select(
        F.col(group_col).alias("grp"), F.col(key_col).alias("k")
    ).distinct()
    exact_inter = (
        keys.alias("x")
        .join(keys.alias("y"), F.col("x.k") == F.col("y.k"))
        .filter(F.col("x.grp") < F.col("y.grp"))
        .groupBy(
            F.col("x.grp").alias("type_a"), F.col("y.grp").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    out = core.join(exact_inter, ["type_a", "type_b"], "left").withColumn(
        "exact_intersection",
        F.coalesce(F.col("exact_intersection"), F.lit(0)),
    )
    envelope = F.lit(3.0) * F.sqrt(
        F.col("exact_intersection").cast("double")
        * F.lit(float(THETA_DENOM - 1))
    ) + F.lit(float(THETA_DENOM))
    return out.select(
        "type_a",
        "type_b",
        (F.col("n_inter") * F.lit(THETA_DENOM)).alias("est_intersection"),
        "exact_intersection",
        _est_jaccard_col(),
        (
            F.abs(
                (F.col("n_inter") * F.lit(THETA_DENOM)).cast("double")
                - F.col("exact_intersection").cast("double")
            )
            <= envelope
        ).alias("within_envelope"),
    )


# ---------------------------------------------------------------------------
# Capped-KMV theta (adaptive θ, r16): the BOUNDED-STATE variant of the
# theta family. The fixed-θ sample above grows as n_distinct/DENOM —
# executor-sized up to ~10^9 keys per group, but a 10^11-key group at
# the 100 TB tier would carry a ~1.6 G-row sample. The capped form
# keeps only the k SMALLEST distinct hashes per group: θ adapts to the
# k-th minimum, state is O(k) per group at ANY cardinality, and the
# sketch stays mergeable ("k smallest of the union"). Estimator:
#   n_sampled < k  →  every distinct hash is in the sample: est exact
#   n_sampled = k  →  est = (k−1) · 2^60 / h_(k)   (classic KMV)
# rsd ≈ 1/√(k−2). Everything is md5 + integer top-k + one IEEE
# division, so — like the fixed form — every output column is
# bit-reproducible in DuckDB (row_number over distinct hashes).
#
# Scale shape: the build is a two-level top-k. Stage 1 (mapInPandas,
# Arrow-batched) holds a k-bounded max-heap per group per input
# partition — O(groups × k) memory, no shuffle — and emits ≤ k rows
# per (group, partition). Stage 2 ranks that reduced frame (≤
# partitions × groups × k rows) with one per-group window. The full
# distinct key set is never shuffled — the data-sized work stays in
# the partial stage, exactly the partial-combine property that makes
# the fixed form scale, now with frozen state.
# ---------------------------------------------------------------------------

#: default cap: rsd ≈ 1/√198 ≈ 7.1%, 8-byte hashes → 1.6 KB of state
#: per group at any key cardinality
THETA_K = 200


def _capped_partial(k: int):
    """Closure factory for the stage-1 mapInPandas partial: per input
    partition, the k smallest DISTINCT hashes per group. State is
    O(groups × k) per partition however many rows stream through.

    VECTORIZED (r16 optimization round, guide §4.2): the original
    body walked every row in interpreted Python (``for g, h in
    zip(...)`` over a per-group heap) — the classic row-loop-inside-
    an-Arrow-operator shape the guide calls out. This version folds
    each Arrow batch with three vectorized pandas ops (concat →
    drop_duplicates → per-group head-k over a sort), so per-batch
    cost is C-speed O((state+batch)·log) instead of a Python dict/heap
    transition per row. State between batches stays the bounded
    ≤ k-rows-per-group frame, so memory is identical to the heap
    form. Emits the same (grp, h) set per partition: the k smallest
    distinct hashes per group — stage 2's cross-partition distinct +
    rank is unchanged."""
    import pandas as pd

    def partial(batches):
        state: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf[["grp", "h"]]
            allf = (
                cur
                if state is None
                else pd.concat([state, cur], ignore_index=True)
            )
            # h arrives as Arrow int64 (the JVM filtered NULLs) and
            # every op below is value-preserving on int64 — the column
            # never passes through float64 (the r14 53-bit-mantissa
            # lesson). dropna=False: a NULL GROUP is a real group key
            # here (the heap form kept None dict keys); sort is on
            # exact integers after (grp, h) dedup, so head(k) is the
            # exact per-group k smallest.
            allf = allf.drop_duplicates()
            allf = allf.sort_values("h", kind="stable")
            state = allf.groupby("grp", sort=False, dropna=False).head(k)
        if state is None:
            state = pd.DataFrame(
                {
                    "grp": pd.Series([], dtype="object"),
                    "h": pd.array([], dtype="Int64"),
                }
            )
        yield state

    return partial


def theta_sample_capped(
    df: DataFrame, group_col: str, key_col: str, k: int = THETA_K
) -> DataFrame:
    """Bounded sketch state: the k smallest distinct theta-hashes per
    group, as ``(grp, h, rk)`` with ``rk`` the 1-based rank by hash.
    Layout-independent by construction (the k smallest of a set do not
    depend on partitioning — stage 1 only PREFILTERS; stage 2 computes
    the true top-k after a cross-partition DISTINCT). Same key→hash
    mapping and string-cast parity precondition as
    :func:`theta_sample`. NULL keys hash to NULL and are excluded (not
    members of the distinct set — the :func:`theta_sample` rule)."""
    proj = df.select(
        F.col(group_col).alias("grp"), _theta_hash(key_col).alias("h")
    ).filter(F.col("h").isNotNull())
    partial = proj.mapInPandas(_capped_partial(int(k)), proj.schema)
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    return (
        partial.distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(int(k)))
    )


def theta_capped_merge(k: int, *samples: DataFrame) -> DataFrame:
    """Merge capped sketches: k smallest of the union of the samples —
    the whole merge rule, which is why the state stays O(k) through
    any merge tree (shards → days → corpus). Input is sketch-sized;
    raw data is never re-touched."""
    if not samples:
        raise ValueError("theta_capped_merge needs at least one sample")
    unioned = samples[0].select("grp", "h")
    for s in samples[1:]:
        unioned = unioned.unionByName(s.select("grp", "h"))
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    return (
        unioned.distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(int(k)))
    )


def _theta_capped_agg(sample: DataFrame, k: int) -> DataFrame:
    """(grp, n_sampled, theta_k) from a capped sample: θ is the k-th
    minimum when the sketch is saturated, else the full 2^60 hash
    space (nothing was excluded — the sample IS the distinct set)."""
    return sample.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.when(
            F.count(F.lit(1)) >= F.lit(int(k)), F.max("h")
        )
        .otherwise(F.lit(1 << 60))
        .alias("theta_k"),
    )


def _theta_capped_est(k: int):
    """The KMV estimate column over (n_sampled, theta_k): exact below
    saturation, (k−1)·2^60/h_k at saturation. (k−1)·2^60 is ONE
    python-computed double literal (exactly representable — k−1 well
    under 2^53) and h_k casts to double identically in both engines,
    so the single IEEE division is bit-reproducible."""
    num = float((int(k) - 1) * (1 << 60))
    return F.when(
        F.col("n_sampled") < F.lit(int(k)),
        F.col("n_sampled").cast("double"),
    ).otherwise(F.lit(num) / F.col("theta_k").cast("double"))


def theta_distinct_capped(
    df: DataFrame, group_col: str, key_col: str, k: int = THETA_K
) -> DataFrame:
    """Production bounded-state estimator: per-group distinct estimate
    from the capped sample alone. Groups whose keys are all NULL still
    emit a row (n_sampled 0, estimate 0.0) — group list from the full
    table, the :func:`theta_distinct` rule."""
    agg = _theta_capped_agg(
        theta_sample_capped(df, group_col, key_col, k), k
    )
    est = round_half_away(_theta_capped_est(k), 3)
    return (
        df.select(F.col(group_col).alias("grp"))
        .distinct()
        .join(agg, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            F.coalesce(F.col("theta_k"), F.lit(1 << 60)).alias("theta_k"),
            F.coalesce(est, F.lit(0.0)).alias("est_distinct"),
        )
    )


def theta_distinct_capped_checked(
    df: DataFrame, group_col: str, key_col: str, k: int = THETA_K
) -> DataFrame:
    """Gate form: estimate NEXT TO the exact count with the 3σ
    envelope asserted — σ ≈ exact/√(k−2) for the KMV estimator, plus
    2.0 slack for rounding granularity; below saturation the estimate
    is exact and the envelope trivially true. Every column (rank
    arithmetic, θ, the one IEEE division, the envelope boolean) is
    bit-reproduced by the DuckDB oracle."""
    groups = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    agg = _theta_capped_agg(
        theta_sample_capped(df, group_col, key_col, k), k
    )
    est = round_half_away(_theta_capped_est(k), 3)
    rel = 3.0 / math.sqrt(int(k) - 2)
    joined = groups.join(agg, "grp", "left").select(
        F.col("grp").alias(group_col),
        F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
        F.coalesce(F.col("theta_k"), F.lit(1 << 60)).alias("theta_k"),
        F.coalesce(est, F.lit(0.0)).alias("est_distinct"),
        "exact_distinct",
    )
    envelope = F.lit(rel) * F.col("exact_distinct").cast("double") + F.lit(
        2.0
    )
    return joined.withColumn(
        "within_envelope",
        F.abs(
            F.col("est_distinct") - F.col("exact_distinct").cast("double")
        )
        <= envelope,
    )
