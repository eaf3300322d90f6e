"""Per-query task-metric probe (r17, guide §1: measure first).

Runs a named subset of headline queries under bench-identical session
conditions (same get_spark conf + bench.py's extra_conf + the same
table/codegen warmups), but with the Spark event log enabled and each
timed query wrapped in its own job group — then parses the event log
into per-query totals: wall, task time, JVM GC time, shuffle bytes,
spill, task count, and max single-task time. This answers "where did
the wall go" (executor compute vs GC vs scheduling vs driver) for the
32-core anti-scaling cluster without the UI.

Driver-JVM GC pauses (including the ContextCleaner's forced periodic
GC) are visible two ways: jvmGcTime inside tasks, and wall-vs-tasktime
gaps; pass GC_LOG=1 to also write an -Xlog:gc file for pause timing.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/perf_probe.py q_profile q_bm25 ...
Prints one JSON line per query plus a trailing summary line.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/spark-events-probe"
    os.makedirs(evdir, exist_ok=True)
    import shutil
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    extra = {
        "spark.ui.showConsoleProgress": "false",
        "spark.cleaner.periodicGC.interval": "45s",
        "spark.sql.codegen.cache.maxEntries": "4000",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    if os.environ.get("GC_LOG") == "1":
        extra["spark.driver.extraJavaOptions"] = (
            "-Xlog:gc*:file=/tmp/probe_gc.log:time,uptime"
        )
    spark = get_spark(app_name="perf_probe", extra_conf=extra)

    # bench.py warmups: JVM, tables, slot-1, per-plan codegen at sf0.001
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

    specs = [s for s in QUERIES if s.headline and (not names or s.name in names)]
    specs.sort(key=lambda s: s.name)

    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001"
    )
    if os.path.isdir(warm_dir):
        for spec in specs:
            force(spec.fn(spark, warm_dir))
            release_cached()

    groups: dict[str, str] = {}
    walls: dict[str, float] = {}
    for spec in specs:
        gid = f"probe-{spec.name}"
        spark.sparkContext.setJobGroup(gid, spec.name)
        groups[spec.name] = gid
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        force(df)
        walls[spec.name] = round(time.perf_counter() - t0, 3)
        release_cached()
        spark.sparkContext.setJobGroup("", "")
        print(f"# {spec.name}: {walls[spec.name]}s", file=sys.stderr)

    spark.stop()

    # ---- parse the event log: job group -> stages -> task metrics ----
    evfiles = [f for f in glob.glob(evdir + "/**/*", recursive=True) if os.path.isfile(f) and "appstatus" not in os.path.basename(f)]
    job_group_of_job: dict[int, str] = {}
    stages_of_job: dict[int, list[int]] = {}
    stage_metrics: dict[int, dict] = {}
    stage_sub: dict[int, tuple[float, float]] = {}
    for path in evfiles:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    gid = props.get("spark.jobGroup.id", "")
                    jid = ev["Job ID"]
                    job_group_of_job[jid] = gid
                    stages_of_job[jid] = [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ]
                elif et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info", {})
                    tm = ev.get("Task Metrics") or {}
                    m = stage_metrics.setdefault(
                        sid,
                        {
                            "tasks": 0,
                            "run_ms": 0,
                            "gc_ms": 0,
                            "cpu_ms": 0,
                            "max_task_ms": 0,
                            "shuffle_read_b": 0,
                            "shuffle_write_b": 0,
                            "spill_disk_b": 0,
                            "result_ser_ms": 0,
                            "deser_ms": 0,
                            "launch_ts": [],
                        },
                    )
                    m["tasks"] += 1
                    run = tm.get("Executor Run Time", 0)
                    m["run_ms"] += run
                    m["gc_ms"] += tm.get("JVM GC Time", 0)
                    m["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                    m["max_task_ms"] = max(m["max_task_ms"], run)
                    m["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                    m["result_ser_ms"] += tm.get("Result Serialization Time", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    m["shuffle_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                        "Local Bytes Read", 0
                    )
                    sw = tm.get("Shuffle Write Metrics") or {}
                    m["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
                    m["spill_disk_b"] += tm.get("Disk Bytes Spilled", 0)
                elif et == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    sid = si.get("Stage ID")
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sid is not None and sub and comp:
                        stage_sub[sid] = (sub, comp)

    per_query: dict[str, dict] = {}
    for name, gid in groups.items():
        agg = {
            "wall_s": walls[name],
            "n_jobs": 0,
            "n_stages": 0,
            "tasks": 0,
            "task_run_s": 0.0,
            "task_gc_s": 0.0,
            "task_cpu_s": 0.0,
            "max_task_s": 0.0,
            "stage_wall_s": 0.0,
            "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0,
            "spill_disk_mb": 0.0,
        }
        seen_stages = set()
        for jid, g in job_group_of_job.items():
            if g != gid:
                continue
            agg["n_jobs"] += 1
            for sid in stages_of_job.get(jid, []):
                if sid in seen_stages or sid not in stage_metrics:
                    continue
                seen_stages.add(sid)
                m = stage_metrics[sid]
                agg["n_stages"] += 1
                agg["tasks"] += m["tasks"]
                agg["task_run_s"] += m["run_ms"] / 1000
                agg["task_gc_s"] += m["gc_ms"] / 1000
                agg["task_cpu_s"] += m["cpu_ms"] / 1000
                agg["max_task_s"] = max(agg["max_task_s"], m["max_task_ms"] / 1000)
                agg["shuffle_read_mb"] += m["shuffle_read_b"] / 1e6
                agg["shuffle_write_mb"] += m["shuffle_write_b"] / 1e6
                agg["spill_disk_mb"] += m["spill_disk_b"] / 1e6
                if sid in stage_sub:
                    sub, comp = stage_sub[sid]
                    agg["stage_wall_s"] += (comp - sub) / 1000
        for k, v in agg.items():
            if isinstance(v, float):
                agg[k] = round(v, 3)
        per_query[name] = agg
        print(json.dumps({"query": name, **agg}))

    print(
        json.dumps(
            {
                "summary_total_wall": round(sum(walls.values()), 3),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
