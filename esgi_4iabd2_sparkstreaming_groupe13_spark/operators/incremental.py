"""Incremental aggregate-state maintenance (mergeable partial
aggregates — the materialized-rollup story made executable).

A 100 TB pipeline cannot recompute its per-key rollups from raw events
on every refresh; it maintains a STATE table of mergeable partial
aggregates and folds each new slice in. Every statistic here is chosen
to be associative + commutative so that::

    finalize(merge(build(A), build(B))) == finalize(build(A ∪ B))

bit-for-bit — the property the pytest suite pins and the DuckDB oracle
exploits (the oracle computes the direct one-pass form; the registry
entry runs the split-build-merge form):

* ``n_rows`` / ``n_nonnull``  — longs, merge by SUM
* ``sum_dec``                 — DECIMAL(38,6) accumulation (exact,
                                order-independent; the repo-wide rule
                                for cross-engine sums)
* ``min_v`` / ``max_v``       — merge by MIN / MAX
* ``regs``                    — HyperLogLog registers (dense
                                ``array<int>`` of 2^b rhos, md5 family
                                — same geometry as
                                ``sketches.rolling_distinct_hll``),
                                merge by element-wise MAX; distinct
                                counts are the one statistic that is
                                NOT distributive exactly, so the state
                                carries the sketch, never the answer

Scale shape: ``build`` is a two-level aggregate (partial per
(key, register) — shuffle rows ≤ keys × 2^b regardless of event
volume — then per key); ``merge`` unions state tables (keys-sized, not
data-sized) and folds registers with ``zip_with``; ``finalize`` is a
narrow per-row projection over the state. The raw data is touched
exactly once, at build time.

``maintain_agg_state`` adds the durable loop: an idempotence ledger of
folded batch ids (at-least-once replays are no-ops — double-merging a
batch would double counts and sums) and the two-rename swap publish
from :mod:`maintenance` (crash windows self-heal on the next pass).

The reference system recomputes its aggregates per micro-batch from
the batch alone (`/root/reference/src/main/scala` consumer — no
cross-batch state); this module is part of the M4(d) extension tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, round_half_away
from .sketches import HLL_BITS

#: State-table value columns, in schema order (after the key columns).
STATE_COLS = ["n_rows", "n_nonnull", "sum_dec", "min_v", "max_v", "regs"]


def _hll_reg_rho(distinct_col: str, b: int):
    m = 1 << b
    rest_bits = 60 - b
    h = md5_int(
        F.concat(F.lit("hll:"), F.col(distinct_col).cast("string"))
    )
    bucket = (h % m).cast("int")
    rest = F.shiftright(h, b)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(rest))
    )
    return bucket, rho


def build_agg_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    distinct_col: str,
    b: int = HLL_BITS,
) -> DataFrame:
    """Per-key mergeable state for one slice of data.

    Two-level aggregate: stage 1 groups by (keys, register) — partial
    counts/sums/min/max ride along, so the shuffle after map-side
    combine carries ≤ |keys| × 2^b rows however large the slice — and
    stage 2 collapses to one row per key, packing the sparse
    (register, rho) entries into a dense ``array<int>`` of length 2^b.
    Rows with a NULL ``distinct_col`` count toward every statistic but
    contribute no register (NULL is not a member of the distinct set).
    """
    m = 1 << b
    reg, rho = _hll_reg_rho(distinct_col, b)
    v = F.col(value_col)
    st1 = (
        df.select(
            *[F.col(k) for k in keys],
            v.alias("_v"),
            reg.alias("_reg"),
            rho.alias("_rho"),
        )
        .groupBy(*keys, "_reg")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.count("_v").alias("_nn"),
            F.sum(F.col("_v").cast("decimal(38,6)")).alias("_sum"),
            F.min("_v").alias("_min"),
            F.max("_v").alias("_max"),
            F.max("_rho").alias("_mrho"),
        )
    )
    entries = F.filter(
        F.collect_list(F.struct(F.col("_reg"), F.col("_mrho"))),
        lambda s: s["_reg"].isNotNull(),
    )
    regmap = F.map_from_entries(entries)
    return st1.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_nn").alias("n_nonnull"),
        F.coalesce(
            F.sum("_sum"), F.lit(0).cast("decimal(38,6)")
        ).alias("sum_dec"),
        F.min("_min").alias("min_v"),
        F.max("_max").alias("max_v"),
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            _dense_lookup(regmap),
        ).alias("regs"),
    )


def _dense_lookup(regmap):
    # closure factory, not a default-arg lambda (PySpark arity gotcha)
    def look(i):
        return F.coalesce(F.element_at(regmap, i.cast("int")), F.lit(0))

    return look


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Union state tables and fold to one row per key: counts and
    decimal sums add, min/max nest, registers take the element-wise
    MAX (``zip_with``-folded over the per-key state rows). Input is
    keys-sized — this never touches raw data."""
    if not states:
        raise ValueError("merge_agg_states needs at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    keys = [c for c in unioned.columns if c not in STATE_COLS]
    merged_regs = F.aggregate(
        F.collect_list("regs"),
        F.element_at(F.collect_list("regs"), 1),
        lambda acc, x: F.zip_with(
            acc, x, lambda a, r: F.greatest(a, r)
        ),
    )
    return unioned.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nonnull").alias("n_nonnull"),
        F.sum("sum_dec").cast("decimal(38,6)").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        merged_regs.alias("regs"),
    )


def _hll_estimate(col_name: str, b: int):
    """HLL estimate expression over a dense register ARRAY column:
    integer-scaled harmonic sum folded in DECIMAL (exact), standard
    small-range correction — the ``sketches.rolling_distinct_hll``
    formula applied to an array instead of grid rows."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = float(alpha * m * m * float(1 << 60))
    s = F.expr(
        f"CAST(aggregate(transform({col_name}, r -> CAST(shiftleft("
        "CAST(1 AS BIGINT), 60 - r) AS DECIMAL(38,0))), CAST(0 AS"
        " DECIMAL(38,0)), (acc, x) -> acc + x) AS DOUBLE)"
    )
    v = F.size(F.filter(F.col(col_name), lambda r: r == 0))
    raw = F.lit(num) / s
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    return F.when((raw <= F.lit(2.5 * m)) & (v > 0), small).otherwise(raw)


def finalize_agg_state(state: DataFrame, b: int = HLL_BITS) -> DataFrame:
    """Readable aggregates from a state table: exact count / sum /
    mean / min / max plus the HLL distinct estimate (integer-scaled
    harmonic sum in DECIMAL, the standard small-range correction, the
    engine-exact rounding helper — the
    ``sketches.rolling_distinct_hll`` formula over this state's
    registers). Narrow per-row projection; no shuffle."""
    keys = [c for c in state.columns if c not in STATE_COLS]
    est = _hll_estimate("regs", b)
    mean = F.when(
        F.col("n_nonnull") > 0,
        round_half_away(
            F.col("sum_dec").cast("double")
            / F.col("n_nonnull").cast("double"),
            6,
        ),
    )
    return state.select(
        *keys,
        F.col("n_rows"),
        F.col("n_nonnull"),
        F.col("sum_dec").cast("double").alias("sum_value"),
        mean.alias("mean_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
        round_half_away(est, 3).alias("est_distinct"),
    )


def state_overlap(state: DataFrame, b: int = HLL_BITS) -> DataFrame:
    """Pairwise distinct-set overlap between slices, straight from a
    STATE table (single key column): inclusion–exclusion over HLL
    registers — ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)``, where the
    union sketch is the element-wise register MAX (exact sketch union,
    the property that makes HLL mergeable).

    The audience-overlap / cross-slice-contamination question ("how
    many users do slices A and B share?") answered WITHOUT touching
    raw data: input is |slices| state rows, work is |slices|² × 2^b
    array cells — metadata-sized at any corpus scale. Estimate error
    compounds (three ±1.04/√m estimates), so small overlaps of large
    sets can read negative; values are reported as-is rather than
    clamped, so the caller sees the sketch's actual resolution.

    Returns (slice_a, slice_b, est_a, est_b, est_union, est_overlap),
    slice_a < slice_b, estimates rounded 3 dp engine-exactly.
    """
    keys = [c for c in state.columns if c not in STATE_COLS]
    if len(keys) != 1:
        raise ValueError(
            f"state_overlap needs a single-key state, got keys={keys}"
        )
    k = keys[0]
    a = state.select(
        F.col(k).alias("slice_a"), F.col("regs").alias("ra")
    )
    bb = state.select(
        F.col(k).alias("slice_b"), F.col("regs").alias("rb")
    )
    paired = (
        a.crossJoin(bb)
        .filter(F.col("slice_a") < F.col("slice_b"))
        .withColumn(
            "ru", F.zip_with("ra", "rb", lambda x, y: F.greatest(x, y))
        )
    )
    ea = _hll_estimate("ra", b)
    eb = _hll_estimate("rb", b)
    eu = _hll_estimate("ru", b)
    return paired.select(
        "slice_a",
        "slice_b",
        round_half_away(ea, 3).alias("est_a"),
        round_half_away(eb, 3).alias("est_b"),
        round_half_away(eu, 3).alias("est_union"),
        round_half_away(ea + eb - eu, 3).alias("est_overlap"),
    )


#: Histogram-state value columns (after the key columns).
HIST_STATE_COLS = ["h_rows", "h_nonnull", "hist"]


def _hist_bin(value_col: str, lo: float, hi: float, n_bins: int):
    """Dense bin index for a double value: 0 = underflow (< lo),
    1..n_bins = in-range, n_bins+1 = overflow (≥ hi), NULL = NULL.
    Pure double arithmetic over LITERAL edges — identical IEEE ops in
    Spark and DuckDB, so bin membership is bit-stable cross-engine.

    The in-range position is clamped to ``n_bins`` (ADVICE r10): when
    ``(hi-lo)/n_bins`` is inexact, a value one ulp below ``hi`` can
    have ``floor((v-lo)/width)`` land ON ``n_bins`` — without the
    clamp that in-range value would be misfiled into the overflow
    slot. The oracle SQL applies the identical LEAST."""
    width = (float(hi) - float(lo)) / int(n_bins)
    v = F.col(value_col).cast("double")
    pos = F.least(
        F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("long")
        + F.lit(1).cast("long"),
        F.lit(int(n_bins)).cast("long"),
    )
    return (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(v < F.lit(float(lo)), F.lit(0).cast("long"))
        .when(v >= F.lit(float(hi)), F.lit(int(n_bins) + 1).cast("long"))
        .otherwise(pos)
    )


def build_hist_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-key mergeable DISTRIBUTION state: a fixed-edge histogram
    (``array<long>`` of n_bins+2 counts — underflow, n_bins in-range
    bins, overflow) plus row/non-null counts.

    The quantile companion to :func:`build_agg_state`: quantiles are
    not distributive, so — exactly like distinct counts riding HLL
    registers — the state carries a mergeable sketch (bin counts sum
    element-wise, EXACTLY) and only :func:`hist_quantiles` estimates.
    Estimate error is bounded by one bin width, a fixed, caller-chosen
    resolution (vs the probabilistic error of sampling sketches) —
    the right trade when the value domain is known, which is the
    common case for monitored metrics.

    Scale shape mirrors build_agg_state: stage 1 groups by
    (keys, bin) — after map-side combine the shuffle carries
    ≤ |keys| × (n_bins+2) rows however large the slice — stage 2
    packs one dense array row per key. NULL values count toward
    ``h_rows`` only.
    """
    idx = _hist_bin(value_col, lo, hi, n_bins)
    st1 = (
        df.select(*[F.col(k) for k in keys], idx.alias("_bin"))
        .groupBy(*keys, "_bin")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    entries = F.filter(
        F.collect_list(F.struct(F.col("_bin"), F.col("_n"))),
        lambda s: s["_bin"].isNotNull(),
    )
    binmap = F.map_from_entries(entries)

    def look(i):
        return F.coalesce(
            F.element_at(binmap, i.cast("long")), F.lit(0).cast("long")
        )

    return st1.groupBy(*keys).agg(
        F.sum("_n").alias("h_rows"),
        F.coalesce(
            F.sum(F.when(F.col("_bin").isNotNull(), F.col("_n"))),
            F.lit(0),
        ).alias("h_nonnull"),
        F.transform(
            F.sequence(F.lit(0), F.lit(int(n_bins) + 1)), look
        ).alias("hist"),
    )


def merge_hist_states(*states: DataFrame) -> DataFrame:
    """Union histogram states and fold to one row per key: counts add,
    bin arrays sum element-wise — EXACT merge (unlike HLL, no estimate
    lives in the state), so merge==one-pass is bit-trivial and the
    pytest pins it. Input is keys-sized; raw data is never touched."""
    if not states:
        raise ValueError("merge_hist_states needs at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    keys = [c for c in unioned.columns if c not in HIST_STATE_COLS]
    # Fold TAIL onto HEAD: seeding the fold with element 1 and then
    # folding the whole list would add the first slice twice — silent
    # with the HLL register MAX-merge this mirrors, corrupting for sums.
    lst = F.collect_list("hist")
    merged = F.aggregate(
        F.slice(lst, 2, F.size(lst) - 1),
        F.element_at(lst, 1),
        lambda acc, x: F.zip_with(acc, x, lambda a, r: a + r),
    )
    return unioned.groupBy(*keys).agg(
        F.sum("h_rows").alias("h_rows"),
        F.sum("h_nonnull").alias("h_nonnull"),
        merged.alias("hist"),
    )


def hist_quantiles(
    state: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Quantile estimates from a histogram state, for each q in
    ``qs`` (0 < q ≤ 1): type-1 target rank ``ceil(q·N)`` over the
    cumulative bin walk, linear interpolation inside the landing bin;
    underflow lands at ``lo``, overflow at ``hi`` (the histogram's
    honest resolution at the edges). Keys with no non-null values are
    dropped. Error ≤ one bin width by construction.

    All arithmetic is engine-portable by the repo rules: integer
    targets and cumulative counts (exact), one double interpolation
    composed in a fixed operation order, rounded half-away at 6 dp.
    The walk runs over the STATE (|keys| × (n_bins+2) rows — metadata-
    sized at any corpus scale), so the per-key window sort here is
    never a data-volume concern.
    """
    from pyspark.sql.window import Window

    bad = [q for q in qs if not (0.0 < float(q) <= 1.0)]
    if bad:
        # q > 1 would silently DROP the key (target rank exceeds every
        # cumulative count); q <= 0 would silently return lo (ADVICE
        # r10) — both are caller bugs, refuse loudly.
        raise ValueError(
            f"quantiles must be in (0, 1], got {bad} — q=1.0 is the "
            "maximum (the histogram's type-1 upper bound)"
        )
    width = (float(hi) - float(lo)) / int(n_bins)
    keys = [c for c in state.columns if c not in HIST_STATE_COLS]
    bins = state.select(
        *keys,
        F.col("h_nonnull").alias("_N"),
        F.posexplode("hist").alias("pos", "cnt"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bins = bins.withColumn("cum", F.sum("cnt").over(w))
    qcol = F.explode(
        F.array(*[F.lit(float(q)).cast("double") for q in qs])
    ).alias("q")
    qbins = bins.select(*keys, "_N", "pos", "cnt", "cum", qcol)
    target = F.ceil(F.col("q") * F.col("_N").cast("double")).cast("long")
    hit = qbins.filter((F.col("_N") > 0) & (F.col("cum") >= target))
    agg = hit.groupBy(*keys, "q", "_N").agg(
        F.min_by(F.struct("pos", "cnt", "cum"), F.col("pos")).alias("_b")
    )
    pos = F.col("_b.pos")
    cnt = F.col("_b.cnt")
    cum = F.col("_b.cum")
    tgt = F.ceil(F.col("q") * F.col("_N").cast("double")).cast("long")
    left = F.lit(float(lo)) + (pos - 1).cast("double") * F.lit(width)
    frac = (tgt - cum + cnt).cast("double") / cnt.cast("double")
    est = (
        F.when(pos == 0, F.lit(float(lo)))
        .when(pos == int(n_bins) + 1, F.lit(float(hi)))
        .otherwise(left + F.lit(width) * frac)
    )
    return agg.select(
        *keys,
        F.col("q"),
        F.col("_N").alias("n_used"),
        round_half_away(est, 6).alias("est_q"),
    )


def maintain_agg_state(
    batch_df: DataFrame,
    keys: list[str],
    value_col: str,
    distinct_col: str,
    state_path: str,
    batch_id: int,
    b: int = HLL_BITS,
) -> bool:
    """Fold one batch into the persisted state table, exactly once.

    At-least-once delivery makes naive folding wrong in a way dedup
    serving never is: re-merging a replayed batch silently DOUBLES its
    counts and sums. The ledger table under ``state_path/ledger``
    records folded batch ids; a replay is detected there and skipped
    (returns False). Both tables publish via the two-rename swap from
    :mod:`maintenance` (write tmp → swap), and every call heals a
    stranded swap first, so a crash between renames costs nothing but
    a retry.
    """
    batch_state = build_agg_state(batch_df, keys, value_col, distinct_col, b)
    return _fold_state(
        batch_df.sparkSession,
        batch_state,
        merge_agg_states,
        state_path,
        batch_id,
    )


def maintain_hist_state(
    batch_df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    state_path: str,
    batch_id: int,
) -> bool:
    """Fold one batch into a persisted histogram state, exactly once —
    the same ledger + two-rename swap loop as :func:`maintain_agg_state`
    (a replayed batch would double bin counts and silently shift every
    downstream quantile). Returns False on a detected replay."""
    batch_state = build_hist_state(batch_df, keys, value_col, lo, hi, n_bins)
    return _fold_state(
        batch_df.sparkSession,
        batch_state,
        merge_hist_states,
        state_path,
        batch_id,
    )


def _fold_state(
    spark: SparkSession,
    batch_state: DataFrame,
    merge_fn,
    state_path: str,
    batch_id: int,
) -> bool:
    """Shared exactly-once fold: heal stranded swaps, veto replayed
    batch ids via the ledger, merge the batch state into the persisted
    state with ``merge_fn``, publish both tables via the two-rename
    swap (crash windows self-heal on the next pass)."""
    from .maintenance import _swap_suffix, heal_swap
    from .windows import refuse_unpinned

    refuse_unpinned("a durable state fold")

    import glob as _glob

    state_dir = os.path.join(state_path, "state")
    ledger_dir = os.path.join(state_path, "ledger")
    for d in (state_dir, ledger_dir):
        # first-ever call has nothing to heal; heal_swap raises on a
        # missing dir with no swap siblings
        if (
            os.path.isdir(d)
            or _glob.glob(f"{d}__compact_*")
            or _glob.glob(f"{d}__old_*")
        ):
            heal_swap(d)

    if os.path.isdir(ledger_dir):
        done = spark.read.parquet(ledger_dir)
        if done.filter(F.col("batch_id") == batch_id).limit(1).count() > 0:
            return False
        merged = merge_fn(spark.read.parquet(state_dir), batch_state)
        ledger = done.unionByName(
            spark.createDataFrame([(batch_id,)], "batch_id long")
        )
    else:
        merged = batch_state
        ledger = spark.createDataFrame([(batch_id,)], "batch_id long")

    for target, frame in ((state_dir, merged), (ledger_dir, ledger)):
        tmp = f"{target}__compact_{_swap_suffix()}"
        frame.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(target):
            old = f"{target}__old_{_swap_suffix()}"
            os.rename(target, old)
            try:
                os.rename(tmp, target)
            except OSError:
                os.rename(old, target)
                raise
            import shutil

            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, target)
    return True


#: Theta-state value column (after the key columns): the capped-KMV
#: sample itself — a sorted ``array<long>`` of ≤ k hashes.
THETA_STATE_COLS = ["t_sample"]


def build_theta_state(
    df: DataFrame, keys: list[str], distinct_col: str, k: int | None = None
) -> DataFrame:
    """Per-key capped-KMV theta sample as a mergeable STATE column:
    the k smallest distinct theta-hashes of ``distinct_col``, packed
    into a sorted ``array<long>`` — ≤ 8·k bytes per key at ANY key
    cardinality (the bounded-state r16 companion to the HLL registers:
    registers answer distinct-within, the θ-sample additionally
    answers distinct-ACROSS via :func:`theta_state_overlap`, the
    direct intersection estimator inclusion–exclusion can't give).

    Same key→hash mapping as every theta form
    (``sketches._theta_hash``), so a persisted state stays foldable
    with any other theta sketch of the same column. NULL distinct
    values contribute nothing (not members); keys whose values are
    all NULL keep an empty sample. Build is distinct + one per-key
    top-k window over the SLICE being folded — increments are
    batch-sized by contract (the one-shot corpus-scale form with the
    bounded-heap partial is ``sketches.theta_sample_capped``)."""
    from pyspark.sql import Window

    from .sketches import THETA_K, _theta_hash

    k = THETA_K if k is None else int(k)
    proj = (
        df.select(
            *[F.col(c) for c in keys], _theta_hash(distinct_col).alias("_h")
        )
        .filter(F.col("_h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("_h")
    packed = (
        proj.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.lit(k))
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("_h")).alias("t_sample"))
    )
    return (
        df.select(*[F.col(c) for c in keys])
        .distinct()
        .join(packed, keys, "left")
        .select(
            *keys,
            F.coalesce(
                F.col("t_sample"), F.array().cast("array<long>")
            ).alias("t_sample"),
        )
    )


def merge_theta_states(*states: DataFrame, k: int | None = None) -> DataFrame:
    """Merge theta states: k smallest of the union per key — the whole
    rule, which is why state stays O(k) through any merge tree. Input
    is keys-sized (≤ k hashes per key per state); raw data is never
    re-touched. Keys present in any input survive the merge even with
    empty samples."""
    from pyspark.sql import Window

    from .sketches import THETA_K

    k = THETA_K if k is None else int(k)
    if not states:
        raise ValueError("merge_theta_states needs at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    keys = [c for c in unioned.columns if c not in THETA_STATE_COLS]
    w = Window.partitionBy(*keys).orderBy("_h")
    packed = (
        unioned.select(*keys, F.explode("t_sample").alias("_h"))
        .distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.lit(k))
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("_h")).alias("t_sample"))
    )
    return (
        unioned.select(*keys)
        .distinct()
        .join(packed, keys, "left")
        .select(
            *keys,
            F.coalesce(
                F.col("t_sample"), F.array().cast("array<long>")
            ).alias("t_sample"),
        )
    )


def _theta_cols(sample_col, k: int):
    """(n_sampled, theta_k, est) expressions over a sample-array
    column — the ONE estimator definition shared by finalize and
    overlap: θ is the k-th minimum when saturated else the full 2^60
    space; est is exact below saturation, (k−1)·2^60/θ above (the
    ``sketches._theta_capped_est`` formula re-expressed over arrays,
    same python-literal numerator so the IEEE division is
    bit-identical cross-engine)."""
    n = F.size(sample_col)
    theta = F.when(
        n >= F.lit(k), F.element_at(sample_col, k)
    ).otherwise(F.lit(1 << 60))
    num = float((k - 1) * (1 << 60))
    est = F.when(n < F.lit(k), n.cast("double")).otherwise(
        F.lit(num) / theta.cast("double")
    )
    return n, theta, est


def finalize_theta_state(state: DataFrame, k: int | None = None) -> DataFrame:
    """Readable distinct estimates from a theta state: per key —
    sample size, the adaptive θ, and the KMV estimate (rounded 3 dp
    engine-exactly). Narrow per-row projection; no shuffle."""
    from .sketches import THETA_K

    k = THETA_K if k is None else int(k)
    keys = [c for c in state.columns if c not in THETA_STATE_COLS]
    n, theta, est = _theta_cols(F.col("t_sample"), k)
    return state.select(
        *keys,
        n.cast("long").alias("n_sampled"),
        theta.alias("theta_k"),
        round_half_away(est, 3).alias("est_distinct"),
    )


def theta_state_overlap(state: DataFrame, k: int | None = None) -> DataFrame:
    """Pairwise distinct-set INTERSECTION estimates straight from a
    theta STATE table (single key column) — the operation
    :func:`state_overlap`'s HLL registers can only approximate by
    inclusion–exclusion (three compounding estimates, negative
    readings possible). Theta samples intersect DIRECTLY: restrict
    both samples to the shared threshold θ_min = min(θ_a, θ_b) — below
    it BOTH samples hold every key-hash of their sets — intersect, and
    scale by 2^60/θ_min. One unbiased estimate, never negative.

    Work is |slices|² × k array cells — metadata-sized at any corpus
    scale. Returns (slice_a, slice_b, theta_min, n_common,
    est_intersection), slice_a < slice_b, estimate rounded 3 dp
    engine-exactly."""
    from .sketches import THETA_K

    k = THETA_K if k is None else int(k)
    keys = [c for c in state.columns if c not in THETA_STATE_COLS]
    if len(keys) != 1:
        raise ValueError(
            f"theta_state_overlap needs a single-key state, got keys={keys}"
        )
    kc = keys[0]
    a = state.select(
        F.col(kc).alias("slice_a"), F.col("t_sample").alias("sa")
    )
    b = state.select(
        F.col(kc).alias("slice_b"), F.col("t_sample").alias("sb")
    )
    _, ta, _ = _theta_cols(F.col("sa"), k)
    _, tb, _ = _theta_cols(F.col("sb"), k)
    paired = (
        a.crossJoin(b)
        .filter(F.col("slice_a") < F.col("slice_b"))
        .withColumn("theta_min", F.least(ta, tb))
    )
    common = F.size(
        F.filter(
            F.array_intersect(F.col("sa"), F.col("sb")),
            _below(F.col("theta_min")),
        )
    )
    est = (common.cast("double") * F.lit(float(1 << 60))) / F.col(
        "theta_min"
    ).cast("double")
    return paired.select(
        "slice_a",
        "slice_b",
        "theta_min",
        common.cast("long").alias("n_common"),
        round_half_away(est, 3).alias("est_intersection"),
    )


def _below(threshold):
    # closure factory, not a default-arg lambda (PySpark arity gotcha)
    def f(h):
        return h < threshold

    return f


def maintain_theta_state(
    batch_df: DataFrame,
    keys: list[str],
    distinct_col: str,
    state_path: str,
    batch_id: int,
    k: int | None = None,
) -> bool:
    """Fold one batch's theta sample into the persisted state table,
    exactly once — the same ledger + two-rename swap loop as
    :func:`maintain_agg_state`. (Unlike counts, a replayed theta fold
    would actually be HARMLESS — "k smallest of the union" is
    idempotent — but the ledger still vetoes it: replays should be
    visible no-ops, not silent re-scans.) Returns False on a detected
    replay."""
    from functools import partial

    from .sketches import THETA_K

    k = THETA_K if k is None else int(k)
    batch_state = build_theta_state(batch_df, keys, distinct_col, k)
    return _fold_state(
        batch_df.sparkSession,
        batch_state,
        partial(_merge_theta_pair, k),
        state_path,
        batch_id,
    )


def _merge_theta_pair(k: int, s1: DataFrame, s2: DataFrame) -> DataFrame:
    return merge_theta_states(s1, s2, k=k)
