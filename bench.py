"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a count() of the final frame (the
result sets are small aggregates/top-ks; materialization cost is the
query itself, not the driver transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import QUERIES
from esgi_4iabd2_sparkstreaming_groupe13_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # Warm the JVM/session so the first measured query doesn't pay
    # session startup (~seconds) that has nothing to do with the plan.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for spec in QUERIES:
        if not spec.headline:
            continue
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        timings[spec.name] = round(time.perf_counter() - t0, 3)
        print(f"# {spec.name}: {timings[spec.name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
