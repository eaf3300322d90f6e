"""Targeted A/B bench for steady-drift adjudication (VERDICT r10 #1).

Runs a named subset of registry queries with REPS warm repetitions
(min-of-reps = steady number, same convention as bench.py) against
whatever tree PYTHONPATH points at, so two git worktrees can be
compared at fixed corpus + fixed script:

    PYTHONPATH=/root/repo        python scripts/ab_bench.py q_best_rep ...
    PYTHONPATH=/root/repo/.ab_r9 python scripts/ab_bench.py q_best_rep ...

Prints one JSON line {"tree": ..., "reps": N, "queries": {name:
{"min": s, "all": [...]}}, "load_avg_start": ...}.

WARMUP A/B PROTOCOL (VERDICT r14 item 6 — binding for any cross-tree
or warm-vs-unwarmed claim on this VM): the box is BIMODAL — identical
back-to-back REPS=3 slates have read 45.8 s and 71.7 s from the same
tree at low start load, and a single interleaved pair inverted a real
1.4x warmup effect in the r14 session. The only citable number is
MIN-PER-ARM OVER >= 2 INTERLEAVED PAIRS run at load < 2 with nothing
else on the machine: A B A B (each arm a full REPS>=3 invocation of
this script), then per-query min across that arm's invocations.
Single-pair deltas, whatever their direction, are noise-bound and
must not be recorded as verdicts. BASELINE.md's standing
"measurement rules" paragraph points here.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.caching import (
    release_cached,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import QUERIES
from esgi_4iabd2_sparkstreaming_groupe13_spark.session import get_spark


def force(df) -> int:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("checksum"),
    ).collect()[0]
    return row["n"]


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: ab_bench.py q_name [q_name ...]", file=sys.stderr)
        sys.exit(2)
    load0 = round(os.getloadavg()[0], 2)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab_bench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.cleaner.periodicGC.interval": "45s",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    from esgi_4iabd2_sparkstreaming_groupe13_spark.schemas import (
        TESTDATA_TABLES,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import (
        load_table,
    )

    for t in TESTDATA_TABLES:
        warm = load_table(spark, sf_dir, t)
        warm.agg(F.bit_xor(F.xxhash64(F.struct(*warm.columns)))).collect()

    by_name = {s.name: s for s in QUERIES}
    # one untimed throwaway of the first named query: whole-stage-
    # codegen JIT warmup, same methodology as bench.py (without it the
    # first rep reads ~1.6x hot — visible in the r11 adjudication
    # tables' rep-1 columns; min-of-reps already absorbed it)
    first = by_name.get(names[0])
    if first is not None:
        force(first.fn(spark, sf_dir))
        release_cached()
    out: dict[str, dict] = {}
    for name in names:
        spec = by_name.get(name)
        if spec is None:
            out[name] = {"error": "not in registry"}
            continue
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(spec.fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            release_cached()
        out[name] = {"min": min(times), "all": times}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "tree": os.environ.get("PYTHONPATH", os.getcwd()),
                "reps": reps,
                "queries": out,
                "load_avg_start": load0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
