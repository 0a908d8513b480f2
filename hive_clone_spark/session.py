"""SparkSession factory.

Tuned for the driver's local[N] harness but configured the way a real
cluster deployment would be: AQE on (runtime coalesce + skew-join
handling), Arrow for any Python exchange, UTC session timezone so
timestamp semantics match the DuckDB oracle, and a shuffle-partition
count sized to cores rather than the 200 default.

At 100 TB the same settings hold, with shuffle.partitions scaled to
~2-3x total executor cores and maxPartitionBytes left at 128m so scan
tasks stay balanced; AQE then coalesces small post-shuffle partitions
and splits skewed ones without manual retuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hive-clone-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Create (or reuse) the tuned SparkSession."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Catalyst / AQE: runtime re-planning, post-shuffle coalesce, skew splits
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # dims here are tiny; on a cluster this keeps star-schema joins broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Arrow for pandas UDF / toPandas exchange (vectorized, not per-row pickle)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # deterministic timestamp semantics (matches DuckDB's naive timestamps)
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
        # read as long and convert in catalog.table (truncation to micros
        # matches DuckDB's nanos→micros behavior)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
