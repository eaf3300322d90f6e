"""Engine-portable deterministic hashing primitives.

Spark's ``hash()`` (murmur3) and DuckDB's ``hash()`` are different
functions, so any sketch built on them could never be oracle-checked.
Everything here is built on ``md5`` — available and bit-identical in
both engines — reduced to integers with pure integer arithmetic, so
MinHash signatures, SimHash fingerprints and LSH bucket keys are
EXACTLY reproducible in ANSI-ish SQL (see plans/queries.py oracles).

All helpers return Spark ``Column`` expressions (JVM-side, codegen'd —
no Python UDFs anywhere on these paths).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1: hash values live in [0, P); products fit in
#: a signed 64-bit integer ((P-1)^2 < 2^62), so the modular arithmetic
#: below is overflow-free in both Spark and DuckDB.
HASH_PRIME = 2_147_483_647


def md5_int(col: Column) -> Column:
    """60-bit non-negative integer from the first 15 hex chars of md5.

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int_sql(expr: str) -> str:
    """The DuckDB rendering of :func:`md5_int` (kept adjacent so the
    two can't drift)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def affine_hash(base: Column, a: int, b: int) -> Column:
    """Universal-family hash h(x) = (a*(x mod P) + b) mod P."""
    return (F.lit(a) * (base % HASH_PRIME) + F.lit(b)) % HASH_PRIME


def affine_hash_sql(base_expr: str, a: int, b: int) -> str:
    return f"(({a} * ({base_expr} % {HASH_PRIME}) + {b}) % {HASH_PRIME})"


def hash_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficient pairs for ``n`` hash functions.

    A tiny LCG (Numerical Recipes constants) — NOT Python's ``random``,
    so the sequence is frozen forever and independent of interpreter
    version; the DuckDB oracle embeds the same literals.
    """
    params: list[tuple[int, int]] = []
    state = seed & 0xFFFFFFFF
    for _ in range(n):
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        a = (state % (HASH_PRIME - 1)) + 1  # a ∈ [1, P-1]
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        b = state % HASH_PRIME  # b ∈ [0, P-1]
        params.append((a, b))
    return params


def shingle_chars(text: Column, n: int = 3, max_chars: int = 512) -> Column:
    """Distinct character n-gram shingles of (the first ``max_chars``
    of) a string, as ``array<string>``. Pure higher-order functions —
    per-row narrow work, no explode, no shuffle.

    DuckDB equivalent (see ``shingle_chars_sql``)."""
    t = F.substring(text, 1, max_chars)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))


def shingle_chars_sql(expr: str, n: int = 3, max_chars: int = 512) -> str:
    t = f"substr({expr}, 1, {max_chars})"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({t}) - {n - 1}, 1)), "
        f"i -> substr({t}, i, {n})))"
    )


def token_array(text: Column) -> Column:
    """Lowercased word tokens (runs of letters/digits). Empty tokens
    filtered so split artifacts don't pollute counts."""
    arr = F.split(F.lower(text), r"[^a-z0-9]+")
    return F.filter(arr, lambda t: F.length(t) > 0)


def token_array_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), "
        f"t -> len(t) > 0)"
    )


def minhash_permutation_cols(
    hashed_shingles: Column, n_hashes: int, seed: int = 42
) -> list[Column]:
    """MinHash signature: for each of ``n_hashes`` affine permutations,
    the min over the PRE-HASHED shingle array (``array<long>`` from
    ``transform(shingles, md5_int)``). Hashing once and permuting the
    integers n times — instead of md5-ing inside every permutation —
    cuts the md5 count by n× (the dominant cost at 64 permutations).
    """

    def _perm(a: int, b: int):
        # closure factory: PySpark introspects lambda arity, so default
        # args would be misread as extra higher-order-function params
        return lambda h: affine_hash(h, a, b)

    return [
        F.array_min(F.transform(hashed_shingles, _perm(a, b)))
        for a, b in hash_params(n_hashes, seed)
    ]


def minhash_sql_elems(
    hashed_expr: str, n_hashes: int, seed: int = 42
) -> list[str]:
    """DuckDB renderings over a pre-hashed ``BIGINT[]`` expression
    (mirror of :func:`minhash_permutation_cols`)."""
    return [
        f"list_min(list_transform({hashed_expr}, "
        f"h -> {affine_hash_sql('h', a, b)}))"
        for a, b in hash_params(n_hashes, seed)
    ]


#: |x|·10^scale at or above 2^53 means ulp(x) ≥ 10^-scale: the double
#: carries no digits below the rounding scale, so rounding is the
#: identity — and passing through dodges Spark's floor→BIGINT
#: saturation at 2^63 (which DuckDB's floor→DOUBLE does not share).
_RHA_PASS_THROUGH = float(1 << 53)


def round_half_away(col: Column, scale: int) -> Column:
    """Engine-exact rounding of a DOUBLE at ``scale`` decimals:
    floor-based half-away-from-zero applied to the BINARY value —
    bit-identical in any IEEE engine.

    Why not ``F.round``: Spark rounds the double's shortest DECIMAL
    representation (java BigDecimal.valueOf + HALF_UP) while DuckDB
    rounds the BINARY double — the two disagree exactly when the true
    value sits on a .5 boundary at ``scale`` digits, which is
    REACHABLE whenever the value is a ratio of decimal-exact sums and
    small counts (means, coverage ratios, per-part revenue). Observed
    live at sf0.1: q_embed_centroid (sum/640) and q_tpch_q11
    (2dp-exact revenue sums) each flipped a last digit between
    engines. Transcendental outputs (log, sqrt) hit boundaries with
    probability ~0 and keep using round().

    Magnitude guard (ADVICE r6): Spark's ``floor(double)`` returns
    BIGINT (saturates at 2^63) while DuckDB's keeps DOUBLE, so the
    floor formula could diverge for |x|·10^scale ≥ 2^63. Values with
    |x|·10^scale ≥ 2^53 have ulp ≥ 10^-scale — no sub-scale digits
    exist to round — so both sides pass such values through unchanged
    (mirrored in :func:`round_half_away_sql`), making the helper
    engine-exact at EVERY magnitude, not just below the bigint bound.
    """
    f = float(10**scale)

    def rha_one(m: Column) -> Column:
        pos = F.floor(m * f + F.lit(0.5)) / f
        neg = -(F.floor((-m) * f + F.lit(0.5)) / f)
        return F.when(
            F.abs(m) >= F.lit(_RHA_PASS_THROUGH / f), m
        ).otherwise(F.when(m >= 0, pos).otherwise(neg))

    # Bind the input as a LAMBDA VARIABLE (1-element transform) so the
    # branch structure evaluates it exactly once per row — a raw
    # expression would run once for the sign test and again in the
    # taken branch, doubling whatever subtree feeds it (measured 2.3×
    # on q_top_ngram, whose input embeds the gram fold).
    return F.element_at(
        F.transform(F.array(col.cast("double")), rha_one), 1
    )


def round_half_away_sql(expr: str, scale: int) -> str:
    """DuckDB mirror of :func:`round_half_away` — the same floor
    formula over the same IEEE double, including the ≥2^53/f
    pass-through magnitude guard."""
    f = float(10**scale)
    return (
        f"CASE WHEN abs({expr}) >= {_RHA_PASS_THROUGH / f!r} "
        f"THEN ({expr}) "
        f"WHEN ({expr}) >= 0 "
        f"THEN floor(({expr}) * {f} + 0.5) / {f} "
        f"ELSE -(floor(-({expr}) * {f} + 0.5) / {f}) END"
    )
