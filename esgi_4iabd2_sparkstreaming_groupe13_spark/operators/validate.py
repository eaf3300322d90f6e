"""Declarative data-quality validation — the Deequ-style expectation
suite a pipeline runs on every ingest before data is allowed
downstream (reference parity: the reference validates implicitly via
its defensive projections, ``StreamProcessor.scala:34-41``; this is
the explicit, reportable form a 100 TB pipeline needs).

Design: every check compiles to AGGREGATE EXPRESSIONS over one scan —
``validate`` runs a single global aggregate (partial+final, map-side
combined) no matter how many checks are declared, then explodes the
1-row result into a long (check, metric, passed) report. Adding a
check never adds a pass over the data. Distinct-count checks
(``uniqueness``) ride the same aggregate via Spark's count-distinct
Expand — still one scan.

Metrics are doubles rounded to 6 dp (informational, bit-stable across
engines so the DuckDB oracle can reproduce the report exactly).
Pass verdicts, however, are computed from EXACT count aggregates, not
the rounded ratio (ADVICE r6): a single duplicate key or NULL in 10M
rows yields a ratio of 0.9999999, which rounds to 1.0 — at 100 TB the
rare violation is exactly the target, so ``uniqueness`` compares
``count_distinct == count(*)`` and ``completeness`` compares
``count(col) >= min_ratio * count(*)`` on unrounded values. The
count-valued checks (``bounds``/``non_negative``/...) were already
exact.
"""

from __future__ import annotations

import math

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import round_half_away


@dataclass(frozen=True)
class Check:
    """One named expectation: an aggregate ``metric`` expression, a
    ``passed`` predicate over the rounded metric value, and — for
    ratio-valued checks where rounding can mask rare violations — an
    optional ``passed_agg`` aggregate boolean computed from EXACT
    counts, which takes precedence over ``passed`` when present."""

    name: str
    metric: Column
    passed: Callable[[Column], Column]
    passed_agg: Column | None = None


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-NULL values; passes at ``min_ratio`` or above.
    The verdict compares exact counts (``count(col) >= min_ratio *
    count(*)``) so a single NULL in 10M rows still fails at
    ``min_ratio=1.0``; the rounded ratio is informational only."""
    m = F.avg(F.when(F.col(col).isNotNull(), 1.0).otherwise(0.0))
    exact = F.count(F.col(col)).cast("double") >= (
        F.lit(float(min_ratio)) * F.count(F.lit(1)).cast("double")
    )
    return Check(
        f"completeness({col})", m, lambda v: v >= min_ratio, exact
    )


def uniqueness(*cols: str) -> Check:
    """count_distinct / count over the given key; passes iff the EXACT
    counts are equal (one duplicate in 10M rows fails — the rounded
    ratio would mask it). NULL keys count as violations
    (count_distinct skips them, so the counts diverge)."""
    m = F.countDistinct(*[F.col(c) for c in cols]) / F.count(F.lit(1))
    exact = F.countDistinct(*[F.col(c) for c in cols]) == F.count(
        F.lit(1)
    )
    return Check(
        f"uniqueness({','.join(cols)})", m, lambda v: v == 1.0, exact
    )


def bounds(col: str, lo: float, hi: float) -> Check:
    """Number of non-NULL values outside [lo, hi]; passes at 0."""
    m = F.sum(
        F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
    ).cast("double")
    return Check(f"bounds({col},{lo},{hi})", m, lambda v: v == 0.0)


def accepted_values(col: str, values: list[str]) -> Check:
    """Number of non-NULL values outside the accepted set; passes
    at 0."""
    m = F.sum(
        F.when(
            F.col(col).isNotNull() & ~F.col(col).isin(values), 1
        ).otherwise(0)
    ).cast("double")
    return Check(
        f"accepted_values({col})", m, lambda v: v == 0.0
    )


def non_negative(col: str) -> Check:
    """Number of negative values; passes at 0."""
    m = F.sum(F.when(F.col(col) < 0, 1).otherwise(0)).cast("double")
    return Check(f"non_negative({col})", m, lambda v: v == 0.0)


def min_rows(n: int) -> Check:
    """Row count; passes at ``n`` or above (empty-extract guard)."""
    return Check(
        f"min_rows({n})",
        F.count(F.lit(1)).cast("double"),
        lambda v: v >= float(n),
    )


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in ONE aggregate pass; return the long report
    (check, metric, passed) ordered by check name via the caller's
    sort if needed (the report is tiny — one row per check).

    Scale shape: a single partial+final global HashAggregate over one
    scan; the explode runs on the 1-row aggregate result, so report
    size is O(checks), independent of data volume. count-distinct
    checks add an Expand below the aggregate (Spark's standard
    multi-distinct plan), never a second scan of the source.
    """
    if not checks:
        raise ValueError("validate() needs at least one check")
    aggs = [
        round_half_away(c.metric, 6).alias(f"_m{i}")
        for i, c in enumerate(checks)
    ]
    aggs += [
        c.passed_agg.alias(f"_p{i}")
        for i, c in enumerate(checks)
        if c.passed_agg is not None
    ]
    agg_row = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(f"_m{i}").alias("metric"),
                (
                    F.col(f"_p{i}")
                    if c.passed_agg is not None
                    else c.passed(F.col(f"_m{i}"))
                ).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return agg_row.select(F.explode(report).alias("_r")).select(
        "_r.check", "_r.metric", "_r.passed"
    )


_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float",
                     "double", "decimal")
#: fixed-width microsecond format for temporal min/max — an EXPLICIT
#: format on both engine sides (Spark date_format vs DuckDB strftime)
#: instead of a bare CAST, whose trailing-zero trimming is an
#: engine-formatting detail no oracle should depend on
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def profile_table(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Per-column profile of a table — the "what is in this extract"
    report a pipeline materializes next to every ingest (and the
    input a human consults before writing :func:`validate` checks):
    row count, null count, EXACT distinct count, min/max, mean.

    One aggregate pass regardless of column count (the
    :func:`validate` design contract): every statistic compiles to an
    aggregate expression over one scan; the exact distinct counts ride
    Spark's count-distinct Expand — N profiled columns cost an N-way
    map-side expansion of the scan, still one job, no joins. Profile a
    SUBSET via ``columns`` when the table is very wide.

    Long-format output, one row per column, type-stable across column
    dtypes: ``(column, dtype, n_rows, n_nulls, n_distinct, min_num,
    max_num, mean, min_str, max_str)`` — numerics fill the double
    slots (mean decimal-accumulated then 6 dp half-away rounded, the
    cross-engine ratio contract), strings fill min/max_str, temporal
    columns format into min/max_str with an explicit fixed-width
    microsecond pattern (bare casts trim trailing zeros differently
    across engines). The single-row aggregate explodes into the
    report rows driver-free."""
    # canonical dtype labels: the same parquet column reads as
    # `timestamp` or `timestamp_ntz` depending on the file's physical
    # annotation (see sources/batch.py) — a profile report (and its
    # oracle) should name the FAMILY, not the session-dependent flavor
    dtypes = {
        c: ("timestamp" if t == "timestamp_ntz" else t)
        for c, t in df.dtypes
    }
    cols = columns if columns is not None else df.columns
    # TWO sibling aggregates over the same scan instead of one (r16
    # optimization round, guide §7.2/§2.3): the exact distinct counts
    # rewrite into an Expand(×N+1), and an aggregate whose buffer
    # holds STRING slots (min/max over string or date_format'd
    # temporal columns) cannot use HashAggregate — one fused aggregate
    # therefore planned as a SortAggregate chain that SORTS the
    # N+1-way-expanded table twice (measured 2.99-4.4 s at sf0.1 on
    # `orders`, the whole cost of q_profile). Splitting the
    # string-buffered min/max into their own expand-free aggregate
    # keeps every stage of the expensive expanded path HashAggregate
    # (mutable long/double/decimal buffers only) and makes the string
    # pass one narrow partial+final with NO sort and NO expand. The
    # two 1-row results recombine with a single-row cross join.
    # Cost: the source is scanned twice, each scan pruned to its own
    # column subset — at any scale the ×(N+1) expanded sort it removes
    # dwarfs the second pruned scan. Output rows are bit-identical.
    aggs: list[Column] = [F.count(F.lit(1)).alias("_pt_rows")]
    str_aggs: list[Column] = []
    for i, c in enumerate(cols):
        dt = dtypes[c]
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_pt_{i}_nn"))
        aggs.append(F.count_distinct(col).alias(f"_pt_{i}_nd"))
        if dt.startswith(_NUMERIC_PREFIXES):
            aggs.append(F.min(col).cast("double").alias(f"_pt_{i}_min"))
            aggs.append(F.max(col).cast("double").alias(f"_pt_{i}_max"))
            aggs.append(
                F.sum(col.cast("decimal(38,6)")).alias(f"_pt_{i}_sum")
            )
        elif dt in ("timestamp", "timestamp_ntz", "date"):
            str_aggs.append(
                F.date_format(F.min(col), _TS_FMT_SPARK).alias(
                    f"_pt_{i}_mins"
                )
            )
            str_aggs.append(
                F.date_format(F.max(col), _TS_FMT_SPARK).alias(
                    f"_pt_{i}_maxs"
                )
            )
        elif dt == "string":
            str_aggs.append(F.min(col).alias(f"_pt_{i}_mins"))
            str_aggs.append(F.max(col).alias(f"_pt_{i}_maxs"))
        # other dtypes (arrays, structs, binary): counts only
    # r17 (guide §2.5 input skew): the expanded count-distinct pass
    # multiplies the scan ×(N+1) through its partial HashAggregate —
    # on a single-split input that whole expansion ran in ONE task
    # (measured: q_profile max_task 1.38 s ≈ half its wall). Fan the
    # expensive branch out to cluster parallelism when under-split
    # (no-op on a well-split production table); the string min/max
    # branch stays on the raw pruned scan — it is one narrow
    # partial+final pass with nothing to parallelize at this width.
    exp_src = df
    para = df.sparkSession.sparkContext.defaultParallelism
    if exp_src.rdd.getNumPartitions() < para:
        exp_src = exp_src.repartition(para)
    row = exp_src.agg(*aggs)
    if str_aggs:
        row = row.crossJoin(df.agg(*str_aggs))

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for i, c in enumerate(cols):
        dt = dtypes[c]
        is_num = dt.startswith(_NUMERIC_PREFIXES)
        has_str = dt in ("timestamp", "timestamp_ntz", "date", "string")
        nn = F.col(f"_pt_{i}_nn")
        # ONE explicit double division over the exact decimal sum (the
        # cross-engine ratio contract: both engines perform the same
        # double op, then the same half-away rounding — never each
        # engine's own decimal-division scale rules)
        mean = (
            round_half_away(
                F.col(f"_pt_{i}_sum").cast("double")
                / nn.cast("double"),
                6,
            )
            if is_num
            else null_d
        )
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt).alias("dtype"),
                F.col("_pt_rows").cast("long").alias("n_rows"),
                (F.col("_pt_rows") - nn).cast("long").alias("n_nulls"),
                F.col(f"_pt_{i}_nd").cast("long").alias("n_distinct"),
                (F.col(f"_pt_{i}_min") if is_num else null_d).alias(
                    "min_num"
                ),
                (F.col(f"_pt_{i}_max") if is_num else null_d).alias(
                    "max_num"
                ),
                mean.alias("mean"),
                (F.col(f"_pt_{i}_mins") if has_str else null_s).alias(
                    "min_str"
                ),
                (F.col(f"_pt_{i}_maxs") if has_str else null_s).alias(
                    "max_str"
                ),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("_p")).select(
        "_p.*"
    )


#: ln(1 + 1/d) / ln(10) for d = 1..9, precomputed in Python so BOTH
#: engines consume identical double literals (no cross-engine
#: transcendental evaluation in the hot path).
BENFORD_SHARES: dict[int, float] = {
    d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_audit(df: DataFrame, cols: list[str]) -> DataFrame:
    """First-significant-digit distribution audit per column — one
    row per (column, digit 1-9) with observed counts and shares next
    to the Benford expectation. Fabricated, truncated, or unit-mixed
    numeric feeds drift from Benford on naturally-spanning magnitudes
    (amounts, populations); bounded or discrete columns legitimately
    don't — the audit reports, callers judge (like profile_table).

    The digit comes from ``floor(|v| / 10^floor(log10 |v|))`` — pure
    double arithmetic, identical in any IEEE engine (zero/null values
    are excluded; exact powers of 10 are the only boundary-sensitive
    inputs and land on exact doubles either way). One aggregate pass
    per column, unioned long-format: O(9 × columns) output rows.
    """
    parts = []
    for c in cols:
        v = F.abs(F.col(c))
        digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v))))
        per = (
            df.filter(F.col(c).isNotNull() & (F.col(c) != 0))
            .groupBy(digit.cast("long").alias("digit"))
            .agg(F.count(F.lit(1)).alias("n_obs"))
        )
        total = per.agg(F.sum("n_obs").alias("_n"))
        share = F.lit(0.0)
        for d, p in BENFORD_SHARES.items():
            share = F.when(F.col("digit") == d, F.lit(p)).otherwise(share)
        parts.append(
            per.crossJoin(F.broadcast(total)).select(
                F.lit(c).alias("column"),
                "digit",
                "n_obs",
                round_half_away(
                    F.col("n_obs").cast("double") / F.col("_n"), 6
                ).alias("obs_share"),
                F.round(share, 6).alias("benford_share"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fk_audit(
    edges: list[tuple[DataFrame, str, DataFrame, str, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (child, fk_col, parent,
    pk_col, edge_name), count child rows whose foreign key has no
    parent (NULL fks excluded — completeness() owns those) — the
    cross-TABLE complement of the single-table expectation suite,
    run before a snapshot is published so downstream joins can assume
    closed references instead of silently dropping rows.

    One left-anti join per declared edge (shuffled on the key, or
    broadcast when the parent key set is small — Catalyst/AQE picks),
    then a 1-row count per edge unioned into the long report. Orphan
    SAMPLES are deliberately not collected here: at 100 TB an orphan
    list can itself be huge — the count is the gate; a targeted
    anti-join query fetches examples once the gate fails.
    """
    if not edges:
        raise ValueError(
            "fk_audit needs at least one (child, fk, parent, pk, name) "
            "edge — a dynamically-built empty list is a caller bug, not "
            "a clean report"
        )
    parts = []
    for child, fk, parent, pk, name in edges:
        # no .distinct() on the parent key: left-anti semantics are
        # unaffected by right-side duplicates, and pk columns are
        # unique by contract — deduping would add a full aggregate +
        # exchange per edge for zero effect on the result
        orphans = (
            child.select(F.col(fk).alias("_fk"))
            .filter(F.col("_fk").isNotNull())
            .join(
                parent.select(F.col(pk).alias("_fk")),
                "_fk",
                "left_anti",
            )
        )
        parts.append(
            orphans.agg(
                F.lit(name).alias("edge"),
                F.count(F.lit(1)).alias("orphan_count"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "edge", "orphan_count", (F.col("orphan_count") == 0).alias("passed")
    )


#: PSI rule-of-thumb thresholds: < 0.1 stable, 0.1–0.2 moderate
#: shift, > 0.2 significant shift (retrain / investigate).
PSI_SHIFT_THRESHOLD = 0.2


def _bin_expr(value_col: str, bin_edges: list[float]):
    """THE binning contract, shared by the reference freeze, the
    slice report, and the frozen-reference scorer (bin = how many
    literal edges the value strictly exceeds): one definition, so the
    reference histogram and every scoring run can never skew."""
    if not bin_edges or sorted(bin_edges) != list(bin_edges):
        raise ValueError("bin_edges must be a non-empty ascending list")
    v = F.col(value_col).cast("double")
    expr = None
    for e in bin_edges:
        t = (v > F.lit(float(e))).cast("int")
        expr = t if expr is None else expr + t
    return expr


def psi_report(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    ref_slice: str,
    bin_edges: list[float],
    threshold: float = PSI_SHIFT_THRESHOLD,
) -> DataFrame:
    """Population Stability Index per slice vs a reference slice —
    the standard ML-monitoring drift gate for a numeric feature
    (does tomorrow's n_chars/quality/length distribution still look
    like the training corpus?). PSI = Σ_bins (pᵢ − qᵢ)·ln(pᵢ/qᵢ)
    over fixed bins; > 0.2 conventionally means significant shift.

    Bins are LITERAL edges (k edges → k+1 bins, bin = how many edges
    the value exceeds — a pure integer expression, no quantile
    estimation at scoring time), which is also the deployment
    contract: edges are frozen from the reference corpus once, then
    every monitoring run scores against the same frozen bins.
    Smoothing is add-half (Laplace): p̃ᵢ = (cᵢ + 0.5)/(n + 0.5·B), so
    empty bins contribute finite, engine-identical terms.

    Determinism contract: per-bin PSI terms are rounded to 6 dp and
    accumulated as DECIMAL(18,6) (the bm25/tfidf idiom), so the
    per-slice sum is reduction-order-independent and matches DuckDB.

    Scale shape: one narrow scan → groupBy(slice, bin) partial-
    aggregated counts (≤ slices·(B+1) rows after the combine), the
    reference row-set broadcast back onto the bin grid; nothing else
    moves. NULL values are excluded (a NULL feature is a completeness
    failure, not a distribution shift).

    Returns ``(slice, psi, shifted)`` for every non-reference slice.
    """
    nbins = len(bin_edges) + 1
    src = df.filter(F.col(value_col).isNotNull() & F.col(slice_col).isNotNull())
    counts = src.groupBy(
        F.col(slice_col).alias("slice"),
        _bin_expr(value_col, bin_edges).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("c"))

    # dense (slice × bin) grid so empty bins get their smoothed mass:
    # slices × (B+1) rows — metadata-sized at any corpus scale
    slices = counts.select("slice").distinct()
    grid = slices.crossJoin(
        src.sparkSession.range(nbins).select(F.col("id").cast("int").alias("bin"))
    )
    full = grid.join(counts, ["slice", "bin"], "left").select(
        "slice", "bin", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    totals = full.groupBy("slice").agg(F.sum("c").alias("n"))
    full = full.join(totals, "slice")

    ref = full.filter(F.col("slice") == ref_slice).select(
        "bin",
        F.col("c").alias("rc"),
        F.col("n").alias("rn"),
    )
    cur = full.filter(F.col("slice") != ref_slice)
    smooth = 0.5 * nbins
    p = (F.col("c") + 0.5) / (F.col("n") + F.lit(smooth))
    # an absent reference slice must fail LOUDLY at execution, not
    # silently return an empty (monitor-gone-dark) report: left join
    # + raise_error when the reference bin row is missing
    q = F.when(
        F.col("rn").isNull(),
        F.raise_error(
            F.lit(
                f"psi_report: reference slice {ref_slice!r} has no "
                f"non-NULL {value_col!r} rows"
            )
        ).cast("double"),
    ).otherwise((F.col("rc") + 0.5) / (F.col("rn") + F.lit(smooth)))
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        cur.join(F.broadcast(ref), "bin", "left")
        .select("slice", term.alias("_t"))
        .groupBy("slice")
        .agg(F.sum("_t").cast("double").alias("psi"))
        .select(
            "slice", "psi", (F.col("psi") > threshold).alias("shifted")
        )
    )


def freeze_reference_bins(
    df: DataFrame, value_col: str, bin_edges: list[float]
) -> list[int]:
    """Collect the frozen reference bin counts — run ONCE over the
    reference corpus at deploy time. The result is B+1 longs
    (metadata-sized however large the corpus), which then ride every
    monitoring run as literals: scoring never re-reads the reference.
    """
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(_bin_expr(value_col, bin_edges).alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = [0] * (len(bin_edges) + 1)
    for r in rows:
        counts[r["bin"]] = r["c"]
    return counts


def psi_vs_reference(
    df: DataFrame,
    value_col: str,
    bin_edges: list[float],
    ref_counts: list[int],
    threshold: float = PSI_SHIFT_THRESHOLD,
) -> DataFrame:
    """One-row PSI of ``df``'s ``value_col`` distribution against a
    FROZEN reference histogram (:func:`freeze_reference_bins`) — the
    scoring half of drift monitoring: the reference never re-scans,
    the monitored frame pays one narrow scan into a ≤B+1-row partial
    aggregate. Same add-half smoothing and 6dp DECIMAL term
    accumulation as :func:`psi_report`.

    Returns ``(n, psi, shifted)`` — one row, metadata-sized.
    """
    nbins = len(bin_edges) + 1
    if len(ref_counts) != nbins:
        raise ValueError(
            f"ref_counts must have {nbins} entries; got {len(ref_counts)}"
        )
    if sum(ref_counts) <= 0:
        raise ValueError("reference histogram is empty")

    spark = df.sparkSession
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(_bin_expr(value_col, bin_edges).alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ref = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(ref_counts)], ["bin", "rc"]
    )
    filled = ref.join(counts, "bin", "left").select(
        "bin", "rc", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    rn = float(sum(ref_counts))
    smooth = 0.5 * nbins
    # the batch total joins back as a broadcast scalar (no collect)
    tot = filled.agg(F.sum("c").alias("n"))
    p = (F.col("c") + 0.5) / (F.col("n") + F.lit(smooth))
    q = (F.col("rc") + 0.5) / (F.lit(rn) + F.lit(smooth))
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        filled.crossJoin(F.broadcast(tot))
        .select("n", term.alias("_t"))
        .groupBy("n")
        .agg(F.sum("_t").cast("double").alias("psi"))
        .select(
            F.col("n").cast("long").alias("n"),
            "psi",
            (F.col("psi") > threshold).alias("shifted"),
        )
    )
