"""Scoped persist tracking.

Operators like MinHash-LSH persist intermediate frames (shingles,
signatures) that are consumed by several branches of ONE downstream
action. The frames stay useful only until that action completes, but
a lazily-returned DataFrame gives the operator no post-action hook to
unpersist them — so a long-lived session running many queries (the
bench loop, the correctness harness) would accumulate cached blocks
in executor storage indefinitely.

``track_persist`` registers every such frame; ``release_cached``
drops them all. Query entry points call ``release_cached()`` before
building a new plan (the previous query's action has completed by
then), and harnesses (bench.py, scripts/oracle_check.py) call it
after their final action, so no cached RDDs outlive the run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for later release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked frame; returns how many. Blocking, so a
    caller (or test) observing ``getPersistentRDDs`` right after sees
    the storage actually freed rather than racing the async removal."""
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking=True)
        n += 1
    return n
