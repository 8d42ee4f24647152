"""SparkSession factory with the engine's recommended configuration.

Local mode here stands in for a multi-executor cluster; everything
below is either cluster-neutral (AQE, Arrow batching) or expressed so
the same code scales by raising ``spark.sql.shuffle.partitions`` and
executor counts (see BENCH.md for the N-vs-4N scaling evidence).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "atsc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # Note on glibc malloc tuning: raising MALLOC_MMAP/TRIM thresholds
    # speeds a standalone numpy worker pool ~10% at 32 workers (fewer
    # kernel mmap round-trips), but measurably HURTS PySpark here —
    # pyspark.daemon forks a worker per task, and retained dirty heaps
    # make every fork pay copy-on-write.  Measured and rejected.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime partition coalescing + skew-join
        # splitting are the backstop for hot-conversation skew.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas UDF; one series-day group is
        # <= 86_400 f64 samples (~0.7 MB), far below this batch bound.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    return builder.getOrCreate()
