"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads, single JVM); the configs below are chosen so the same plans
scale to a multi-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, join
  strategy re-planning) — the knob that makes one logical plan hold
  from sf0.001 local to 100 TB cluster.
- shuffle partitions sized to local cores; on a real cluster this is
  overridden (or left to AQE's ``advisoryPartitionSizeInBytes``).
- Arrow enabled for every pandas-interop path (Pandas UDFs,
  applyInPandas, toPandas).
- Session timezone pinned to UTC so results hash identically to the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mathorcup_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Safe to call repeatedly — Spark returns the active session. If a
    session already exists (e.g. the driver created one and handed it
    to ``entry()``), its configs win; engine code must therefore not
    depend on these settings for correctness, only performance.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
