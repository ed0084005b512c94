"""SparkSession factory with scale-conscious defaults.

Local test posture is ``local[$SPARK_GRAFT_CPUS]``; the same config
block is what we would ship to a 1000-executor cluster minus the
master/memory overrides: AQE (runtime re-planning, skew-join splitting,
small-partition coalescing) on, Arrow on for the Pandas-UDF tokenize
path, session timezone pinned UTC so results compare bit-identically
against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "dlp_rdb_bq_import_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Shuffle sizing: ~cores locally. On a real cluster this would be
        # sized to data volume (AQE coalesces down from a high initial
        # number); at 100 TB you set the *initial* partition count high
        # (e.g. 2000+) and let adaptive coalescing right-size each stage.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet scans: 128 MB split targets; vectorized reader on.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Fixture `events` stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert (values are µs-precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
