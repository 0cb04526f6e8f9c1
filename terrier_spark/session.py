"""SparkSession construction tuned for this engine.

Defaults are sized for the sandbox (local[N], 32 cores, 128 GiB) but the
same knobs are the ones that matter on a 1000-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- Arrow enabled for every pandas UDF exchange;
- shuffle partitions sized to the parallelism level rather than the
  200 default (at cluster scale this would be ~2-3x total cores);
- broadcast threshold left at default so small dims broadcast.

Reference analog: the reference sizes its TBB worker pool and per-thread
states at startup (src/execution/sql/thread_state_container.cpp); here the
session config is the equivalent startup decision.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "terrier_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster this function would be called with master/deploy-mode set by
    spark-submit; everything else is identical.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # ~1 partition per core locally; on a cluster: 2-3x total cores.
        shuffle_partitions = max(cores, 8)

    builder = SparkSession.builder.appName(app_name)
    # Master resolution, in priority order: SPARK_GRAFT_MASTER (explicit
    # override) > spark-submit's --master (arrives as the spark.master
    # system property, visible through a default-loaded SparkConf) >
    # local[cores].  The old code ALWAYS called builder.master(), and
    # builder options outrank spark-submit's conf — so a cluster submit
    # silently ran local-mode on the driver, contradicting the
    # "--master wins" contract this module and cli.py document (review
    # finding r4).
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        try:
            from pyspark import SparkConf

            submitted = SparkConf(loadDefaults=True).contains("spark.master")
        except Exception:
            submitted = False
        if not submitted:
            master = f"local[{cores}]"
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # Throughput GC for a batch engine: with 32 concurrent tasks in
        # one local-mode JVM, G1's concurrent marking/barriers inflated
        # executor task time ~3x; ParallelGC cut a 320k-doc build from
        # 31-54s to 17-18s at local[32] (measured, BENCH/BASELINE.md).
        # On a real cluster the same flag goes to executor JVMs.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GC_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        # e.g. a tmpfs for benchmarking — stands in for the NVMe shuffle
        # disks cluster executors have (the sandbox VM disk is slow and
        # shared, which otherwise puts a serial floor under every run).
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
