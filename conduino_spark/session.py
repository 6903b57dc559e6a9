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
        # r15 A/B (guide §1/§2.2, recorded in OPTIMIZATION_r15.md):
        # size-based coalescing (parallelismFirst=false + advisory
        # 16m-64m) measured 4-12% SLOWER on the local bench — in-JVM
        # task launch is cheap, so the 32-task fixed cost it removes is
        # smaller than the parallelism it costs CPU-dense-but-byte-
        # light sf0.1 stages.  Local default therefore stays Spark's
        # parallelism-first.  At cluster scale the trade flips (per-
        # task cost includes real scheduling + fetch RPCs; partition
        # bytes grow with data): set SPARK_GRAFT_AQE_PARALLELISM_FIRST
        # =false and SPARK_GRAFT_AQE_ADVISORY=256m (guide §9).
        # Explicit repartition(N, ...) kernels are never coalesced
        # either way.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST",
                               "true"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_AQE_ADVISORY", "64m"))
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
