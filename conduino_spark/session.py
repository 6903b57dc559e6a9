"""SparkSession factory with the engine's scale-tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "conduino_spark", *, cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cpus
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # skewed sort-merge joins re-split at runtime (LSH band joins,
        # hot keys); free when unused
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 128m splits: at 100 TB this bounds scan-task memory; local
        # parquet this small never reaches it
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores events.ts as TIMESTAMP(NANOS), which
        # Spark 4 rejects; read as long and rebuild (sources.read_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # tz-naive parquet timestamps arrive as TIMESTAMP (session UTC),
        # not TIMESTAMP_NTZ — value-identical to DuckDB's naive reads,
        # and NTZ rejects cast("long")/unix_micros in Spark 4.1.2.
        # timeutil.ts_col is the belt-and-braces if data still lands NTZ.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-warehouse"))
        .getOrCreate()
    )
