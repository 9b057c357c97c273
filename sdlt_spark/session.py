"""SparkSession factory.

Tuned defaults per SURVEY.md §4: AQE on (runtime re-plan + partition
coalescing + skew-join), UTC session timezone (oracle comparability with
DuckDB), Arrow-enabled Python interop, shuffle partitions sized for the
local[32] test harness. On a real cluster the same builder applies — only
``master`` and the shuffle-partition count (or AQE advisory size) change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sdlt_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    defaults to all cores. AQE coalesces the shuffle-partition count at
    runtime, so the static number is an upper bound, not a tuning knob.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(4, int(cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SDLT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python Data Source filter pushdown (Spark 4.1): lets the vintage
        # batch source turn pushed comparisons into zone-map file skipping
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # The driver fixtures are single ~1-10 MB parquet files; the 128 MB
        # default would scan each as 1 task on a 32-core box. 4 MB splits
        # align scan parallelism with cores at local test scale. On a real
        # cluster with 128 MB-1 GB files, raise via SDLT_MAX_PARTITION_BYTES
        # (or leave Spark's default by setting it to 134217728).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SDLT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
    )
    # Round-12 adjudication of the round-11 global initialPartitionNum=512
    # (AQE coalesce-down headroom): interleaved A/B triplicates measured it
    # 2.4-2.5x SLOWER on the minhash family at sf0.1, flat at sf10, and
    # 1.8-2.1x slower at sf100 (signature stage 424 vs 240 s, heavy
    # hitters 228 vs 111 s — paired probes, the 512 run on the FASTER host
    # window; BASELINE.md/SCALE.md round 12). The per-exchange map-side
    # cost of 512 buckets dominates on local[32] at every scale this
    # sandbox can hold; the round-11 spill observation that motivated the
    # default belonged to the pre-kernel collect_set signature path. So
    # the default is Spark's own (initial = shuffle.partitions). On a real
    # cluster, size shuffle.partitions ~2-3x total cores as usual — or set
    # SDLT_INITIAL_PARTITIONS to re-enable the headroom where map-side
    # overhead amortizes across executors.
    if os.environ.get("SDLT_INITIAL_PARTITIONS"):
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ["SDLT_INITIAL_PARTITIONS"],
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
