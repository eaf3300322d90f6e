"""Joins (M4(b) — the reference implements none, SURVEY §2.3; the
rebuild proves the capability with scale-correct strategies).

Strategy notes baked into each helper:
* dimension joins → explicit ``broadcast()`` hint (zero shuffle of the
  fact side; the dim ships to every executor once);
* fact-fact joins → plain equi-join, Catalyst picks sort-merge; AQE
  (enabled in the session factory) converts to broadcast at runtime if
  a side turns out small, and splits skewed partitions;
* semi/anti forms for EXISTS/NOT EXISTS — never a distinct+inner join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact × small-dimension join with an explicit broadcast hint."""
    return fact.join(F.broadcast(dim), on, how)


def fact_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact × fact equi-join; leave strategy choice to Catalyst+AQE."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — ships only join keys of the right side."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, on, "left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side's key into
    ``salt_buckets`` sub-keys and explode the other side across all
    salts, so one hot key spreads over ``salt_buckets`` shuffle
    partitions instead of melting a single reducer.

    AQE's skew-join split (enabled in the session factory) handles
    moderate skew automatically at runtime; explicit salting is the
    structural fix when one key dominates by orders of magnitude (a
    viral id, a null-key default). Cost: the other side is replicated
    ×salt_buckets — use with the SMALLER side as ``other``.

    Only ``how`` in {'inner', 'left', 'left_semi'} is supported: in
    those modes every output row is anchored to exactly one salted
    ``skewed`` row, so results are identical to a plain join (verified
    in tests). Right/full outer would emit each unmatched ``other``
    row once per salt bucket (it was exploded ×salt_buckets), so they
    are rejected rather than silently wrong.
    """
    allowed = ("inner", "left", "left_outer", "left_semi", "leftsemi")
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {allowed}; got {how!r} — the "
            "non-skewed side is exploded across salt buckets, so "
            "right/full outer joins would duplicate unmatched rows"
        )
    salted_l = skewed.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_r = other.withColumn(
        "_salt_arr", F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).withColumn("_salt", F.explode("_salt_arr")).drop("_salt_arr")
    out = salted_l.join(salted_r, [key, "_salt"], how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach to each left row the payload of the nearest
    right row at-or-before (``backward``: latest ``right.ts <=
    left.ts``) or at-or-after (``forward``: earliest ``right.ts >=
    left.ts``) for the same key, NULLs when none exists — the
    time-series point-in-time lookup Spark has no native operator for.

    Implemented WITHOUT a join: tag both sides, ``unionByName``, and
    take ``last``/``first(payload, ignorenulls=True)`` over a window
    ordered by ``(ts, side)`` with the right side sorted into the
    frame at equal timestamps (inclusive semantics, matching DuckDB
    ``ASOF JOIN``). One shuffle on the key, no candidate-pair
    explosion — a range-condition join would explode to
    O(|left|·|right-per-key|) before filtering, while this is
    O(|left| + |right|) rows through one WindowExec.

    ``right`` must be unique per ``(key, ts)`` (pre-aggregate ties);
    its non-key/ts columns become ``{right_prefix}<name>`` outputs,
    plus ``{right_prefix}<ts_col>`` carrying the matched timestamp.
    """
    from pyspark.sql import Window

    assert direction in ("backward", "forward")
    payload_cols = [c for c in right.columns if c not in (key_col, ts_col)]
    payload = F.struct(
        F.col(ts_col).alias(f"{right_prefix}{ts_col}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload_cols],
    )
    # at equal ts the right row must land inside the left row's frame:
    # backward frame ends at current row → right sorts first;
    # forward frame starts at current row → right sorts last.
    right_side = 0 if direction == "backward" else 2
    r = right.select(
        F.col(key_col), F.col(ts_col), payload.alias("_payload")
    ).withColumn("_side", F.lit(right_side))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col("_side"))
    if direction == "backward":
        picked = F.last("_payload", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        picked = F.first("_payload", ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
    matched = u.withColumn("_asof", picked).filter(F.col("_side") == 1)
    out_fields = [f"{right_prefix}{ts_col}"] + [
        f"{right_prefix}{c}" for c in payload_cols
    ]
    return matched.select(
        *left.columns, *[F.col(f"_asof.{f}").alias(f) for f in out_fields]
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join (see ``asof_join``)."""
    return asof_join(left, right, key_col, ts_col, right_prefix, "backward")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Keyed range join: match each left row to right intervals of the
    same key containing its timestamp (``start <= ts <= end``).

    With an equi key the range predicate rides on the keyed
    shuffle-hash/sort-merge join as a post-probe filter — per-key work
    is |left_k|·|intervals_k|, bounded when intervals-per-key is small
    (sessions, campaigns, validity windows). For a KEYLESS range join
    at scale, bucketize: assign each left row floor(ts/width), explode
    each interval over its covered buckets, equi-join on bucket, then
    re-filter — turns the cross product into per-bucket work.
    """
    cond = (
        (left[key_col] == right[key_col])
        & (left[ts_col] >= right[start_col])
        & (left[ts_col] <= right[end_col])
    )
    return left.join(right, cond, how).drop(right[key_col])
