"""Streaming media-prep throughput harness (r14 — makes the BASELINE
streaming rows reproducible instead of ad-hoc).

Shape matches the r12/r13 measurements: N_CONTENTS distinct contents
x COPIES re-encodes, one parquet file per copy-wave -> availableNow
stream with maxFilesPerTrigger=1 (COPIES micro-batches), local[32].
Runs three pipelines over the SAME source and prints one JSON line:

  - dedup_only: the r13 stage (media_dedup_within_watermark) — decode
    + digest dedup, no gate/tag
  - unfused_gate_plus_dedup: the pre-r14 composition users would run
    for gate AND dedup — TWO independent decode passes of every
    payload (the quality gate stream and the dedup stream each decode)
  - fused: media_prep_stream — gate + dedup + contamination tag off
    ONE decode per micro-batch (VERDICT r13 item 3)

Each pipeline runs twice; the SECOND (warm-JVM) wall is reported,
matching the steady-bench convention. `high_load` carries the same
caveat rule as bench.py.

Usage: PYTHONPATH=/root/repo python scripts/stream_bench.py
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
    media_dedup_within_watermark,
    media_prep_stream,
    media_quality_gate_stream,
)

N_CONTENTS = int(os.environ.get("STREAM_BENCH_CONTENTS", "4000"))
COPIES = int(os.environ.get("STREAM_BENCH_COPIES", "4"))
SCHEMA = "media_id long, kind string, payload binary, ts timestamp"


def synth(spark: SparkSession, src: str) -> None:
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    for variant in range(COPIES):
        rows = []
        for cid in range(N_CONTENTS):
            if cid % 2 == 0:
                kind, payload = "image", mm._encode_png(
                    mm.synth_variant_pixels(cid), filters=(variant % 5,)
                )
            else:
                kind, payload = "audio", mm._encode_wav(
                    mm.synth_variant_frames(cid),
                    sample_rate=16000 + 1000 * variant,
                )
            rows.append(
                (
                    variant * N_CONTENTS + cid,
                    kind,
                    payload,
                    t0 + datetime.timedelta(seconds=variant * 60 + cid // 100),
                )
            )
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)


def drain(spark: SparkSession, src: str, name: str, make) -> float:
    ck = tempfile.mkdtemp(prefix=f"sb_{name}_")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = make(stream)
    t = time.time()
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(900), f"{name} did not drain"
    wall = time.time() - t
    shutil.rmtree(ck, ignore_errors=True)
    return wall


def main() -> None:
    load0 = round(os.getloadavg()[0], 2)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stream_bench_")
    src = os.path.join(tmp, "src")
    synth(spark, src)
    bench = spark.createDataFrame(
        [
            (
                i,
                *(
                    ("image", mm._encode_png(mm.synth_variant_pixels(2 * i), filters=(4,)))
                    if i % 2 == 0
                    else ("audio", mm._encode_wav(mm.synth_variant_frames(2 * i + 1), sample_rate=44100))
                ),
            )
            for i in range(16)
        ],
        "media_id long, kind string, payload binary",
    )

    total = N_CONTENTS * COPIES
    pipes = {
        "dedup_only": lambda s: media_dedup_within_watermark(
            s, ts_col="ts", watermark="30 days"
        ),
        # the pre-r14 composition: gate verdicts AND deduped output,
        # each pipeline decoding every payload independently. The gate
        # side is drained through the same sink for a fair wall.
        "unfused_gate_plus_dedup": None,  # handled below (two drains)
        # DEFAULT path (r15: decode_partitions='auto' repartitions each
        # micro-batch to defaultParallelism before the decode — VERDICT
        # r14 item 1 wants this within ~1.2x of the hand-tuned pin)
        "fused": lambda s: media_prep_stream(s, bench, watermark="30 days"),
        # hand-tuned pin (the r14 'knob a production stream should set'
        # — now the yardstick the auto default is graded against)
        "fused_par32": lambda s: media_prep_stream(
            s, bench, watermark="30 days", decode_partitions=32
        ),
        # pre-r15 default: no repartition — a 1-file trigger decodes
        # on ONE core (kept as the regression row for the auto gain)
        "fused_nopart": lambda s: media_prep_stream(
            s, bench, watermark="30 days", decode_partitions=None
        ),
    }
    result: dict[str, object] = {}
    for name, make in pipes.items():
        if name == "unfused_gate_plus_dedup":
            walls = []
            for rep in range(2):
                w1 = drain(
                    spark, src, f"uf_gate_{rep}", media_quality_gate_stream
                )
                w2 = drain(
                    spark,
                    src,
                    f"uf_dedup_{rep}",
                    lambda s: media_dedup_within_watermark(
                        s, ts_col="ts", watermark="30 days"
                    ),
                )
                walls.append(w1 + w2)
            wall = walls[-1]
        else:
            wall = min(
                drain(spark, src, f"{name}_{rep}", make) for rep in [0]
            )
            wall = drain(spark, src, f"{name}_w", make)  # warm rep
        result[name] = {
            "wall_s": round(wall, 2),
            "payloads_per_s": round(total / wall),
        }
    print(
        json.dumps(
            {
                "payloads": total,
                "contents": N_CONTENTS,
                "micro_batches": COPIES,
                "load_avg_start": load0,
                "high_load": load0 > (os.cpu_count() or 32) / 4,
                **result,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
