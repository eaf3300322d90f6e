"""Literal-vs-broadcast contamination-tag crossover probe (VERDICT
r14 item 3 / ADVICE r14).

``media_prep_stream`` embeds benchmark hashes as a plan LITERAL up to
``bench_literal_max`` (512) and switches to a one-row broadcast
stream-static join above it. Both paths compute the identical tag
(pytest-pinned); the trade is plan-construction/codegen cost that
grows with |bench| on the literal path vs one extra (broadcast) join
operator on the other. This probe measures, per benchmark size: plan
construction wall, and full availableNow drain wall over a fixed
small corpus, for BOTH paths — the BASELINE note on where the
crossover sits cites its output.

Usage: PYTHONPATH=/root/repo python scripts/contamination_crossover.py
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import multimodal as mm
from esgi_4iabd2_sparkstreaming_groupe13_spark.streaming.stateful import (
    media_prep_stream,
)

SCHEMA = "media_id long, kind string, payload binary, ts timestamp"
N_CORPUS = int(os.environ.get("XOVER_CORPUS", "2000"))
SIZES = [int(s) for s in os.environ.get("XOVER_SIZES", "64,256,512,2048,8192").split(",")]


def bench_payload(i: int) -> tuple[str, bytes]:
    if i % 2 == 0:
        return "image", mm._encode_png(mm.synth_variant_pixels(i))
    return "audio", mm._encode_wav(mm.synth_variant_frames(i))


def main() -> None:
    load0 = round(os.getloadavg()[0], 2)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="xover_")
    src = os.path.join(tmp, "src")
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (cid, *bench_payload(cid), t0 + datetime.timedelta(seconds=cid // 100))
        for cid in range(N_CORPUS)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(2).write.parquet(src)

    out: dict[str, dict] = {}
    for size in SIZES:
        # benchmark payloads: distinct contents far above the corpus ids
        bench = spark.createDataFrame(
            [(i, *bench_payload(100_000 + i)) for i in range(size)],
            "media_id long, kind string, payload binary",
        )
        row: dict[str, dict] = {}
        for mode, lit_max in (("literal", 10**9), ("broadcast", 0)):
            t_plan = time.time()
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            try:
                prep = media_prep_stream(
                    stream,
                    bench,
                    watermark="30 days",
                    bench_literal_max=lit_max,
                )
            except Exception as ex:  # plan construction itself can die
                row[mode] = {"error": type(ex).__name__, "msg": str(ex)[:200]}
                continue
            plan_s = time.time() - t_plan
            ck = tempfile.mkdtemp(prefix=f"xover_ck_{mode}_{size}_")
            t_run = time.time()
            try:
                q = (
                    prep.writeStream.format("memory")
                    .queryName(f"x_{mode}_{size}")
                    .outputMode("append")
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                ok = q.awaitTermination(900)
                n = spark.table(f"x_{mode}_{size}").count()
                row[mode] = {
                    "plan_s": round(plan_s, 2),
                    "drain_s": round(time.time() - t_run, 2),
                    "rows": n,
                    "drained": bool(ok),
                }
            except Exception as ex:
                row[mode] = {
                    "plan_s": round(plan_s, 2),
                    "error": type(ex).__name__,
                    "msg": str(ex)[:200],
                }
            shutil.rmtree(ck, ignore_errors=True)
        out[str(size)] = row
        print(f"# bench={size}: {json.dumps(row)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "corpus": N_CORPUS,
                "sizes": SIZES,
                "load_avg_start": load0,
                "results": out,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
