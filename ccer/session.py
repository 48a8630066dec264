"""SparkSession factory with the engine's standard configuration.

Local mode here, but every knob is chosen for the 1000-executor case:
AQE on (runtime coalesce + skew-join splitting), Arrow enabled for the
pandas-UDF path, UTC session timezone pinned so timestamps compare
bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ccer",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # size shuffle partitions by DATA, not cores: a low-core run with
        # cores-sized partitions spills multi-GB sort buffers to disk and
        # degrades superlinearly. Start high; AQE coalesces the small ones.
        shuffle_partitions = max(4 * cores, 64)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(shuffle_partitions, 128)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # zstd checkpoints: the stage tables are write-once/read-once —
        # trade a little CPU (which scales) for disk I/O (which doesn't)
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local mode: the driver JVM hosts every executor thread — size the
        # heap for all of them (32 tasks × join hash maps + Arrow buffers)
        .config("spark.driver.memory", os.environ.get("CCER_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        # shuffle spill files on tmpfs: N concurrent shuffle writers on a
        # virtualized disk degrade with parallelism (random-write thrash);
        # on a real cluster this is the executors' local NVMe
        .config("spark.local.dir", os.environ.get("CCER_LOCAL_DIR", "/dev/shm/ccer-spark"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
