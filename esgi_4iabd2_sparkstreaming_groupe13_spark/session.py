"""SparkSession factory.

Reference equivalent: session construction at
``MainConsumer.scala:32-37`` / ``MainProducer.scala:29-36`` (local[*],
``spark.sql.shuffle.partitions=2``, UI off, graceful shutdown). The
rebuild keeps the knobs configurable but defaults to scale-sane values:
AQE on (runtime shuffle-partition coalescing + skew-join splitting),
Arrow enabled for any pandas exchange, UTC session timezone so
timestamp semantics are stable across engines and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark-taxi-stream-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster the ``master``/memory settings come from
    spark-submit; everything set here is cluster-neutral. In local mode
    we size shuffle partitions to the core count instead of the 200
    default (tiny-partition overhead dominates otherwise) and rely on
    AQE to coalesce further at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)
    # PySpark's default driver heap is 1g — in local mode that one heap
    # serves EVERY executor thread, so a 32-way session runs its whole
    # shuffle/storage machinery in 1 GiB (observed: GC-bound timings
    # and OOM on the 10x scale probe). Honored only at JVM launch; a
    # no-op if a JVM is already up (e.g. an externally built session).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stopGracefullyOnShutdown", "true")
        # Keep parquet pushdown/pruning explicit (all default-on; pinned
        # so a misconfigured deployment can't silently disable them).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Read TIMESTAMP(NANOS) parquet columns as long (Spark has no
        # nanos type); sources.batch converts them to µs timestamps by
        # truncation — the same conversion DuckDB applies.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4 wraps EVERY Column/function call with a call-site
        # capture (getActiveSession + conf RPC per call) for richer
        # error contexts. Wide expression builders (MinHash's 32
        # permutations, SimHash's packed aggregates) issue thousands of
        # such calls; disabling the capture cuts driver-side plan
        # construction ~2x. Errors still carry the JVM stack.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
