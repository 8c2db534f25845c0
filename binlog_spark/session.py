"""SparkSession factory with scale-minded defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "binlog-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # runtime re-planning: coalesce small shuffles, split skewed ones
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for pandas UDF / mapInPandas decode stages
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # minimal-row-image folding relies on last-wins map_concat
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # canonical temporal rendering is UTC-pinned
        .config("spark.sql.session.timeZone", "UTC")
        # local mode = one JVM for driver+executor: size the heap for the
        # concurrent task count (32 tasks × sort/agg buffers), not for a
        # driver-only role — 8g thrashes GC at local[32]
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # shuffle/spill scratch on tmpfs when available: local-mode disk
        # commit latency otherwise dominates (and adds noise to) small
        # benchmark batches; harmless fallback to /tmp elsewhere
        .config("spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIRS",
                               "/dev/shm/spark-local"
                               if os.path.isdir("/dev/shm") else "/tmp"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
