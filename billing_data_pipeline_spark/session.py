"""SparkSession factory tuned for this engine.

The reference delegates execution to an embedded DuckDB connection created
per asset (reference: pipeline/pipeline.py:178-181, DuckDBResource). Here the
analogous resource is one shared SparkSession; everything else is lazy
DataFrames.

Scale notes (100 TB target):
- AQE on: runtime shuffle-partition coalescing, join-strategy switching and
  skew-join splitting replace hand-tuned partition counts per stage.
- ``spark.sql.shuffle.partitions`` is a *default*; AQE coalesces down and a
  real cluster deployment raises it (rule of thumb: 2-3x total cores).
- Session timezone pinned to UTC so event-time semantics are deployment
  independent (and match the DuckDB oracle).
- Arrow enabled for the pandas exchange paths (Pandas UDFs, toPandas edges).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "billing-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    In local mode there is a single JVM; on a cluster the same config applies
    unchanged — nothing here assumes local execution except the default
    master.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")
        # local mode: the driver is the only JVM — give it the memory.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
