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

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def local_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a small driver-local DataFrame as a ``LocalTableScan``.

    ``createDataFrame(list, schema)`` parallelizes the list into
    ``defaultParallelism`` pickled-RDD slices; measured on local[32]
    (round 11), a 4-row check frame costs ~1.6 s per action — 32
    tasks, each a Python-worker round trip — and that pattern sat in
    the final plan of every self-asserted check query (guide §4: the
    JVM↔Python boundary, here for rows that are already on the
    driver). Routing the same rows through a pandas frame takes the
    Arrow conversion path and plans as a LocalTableScan: no RDD, no
    Python workers at execution (~0.4 s, and the cost is
    plan-construction only). Values and schema are identical — the
    explicit schema drives the Arrow conversion positionally, and
    object dtype hands ints/floats/strings/lists/timestamps/None to
    Arrow unchanged (verified collect()-equal against the list path).

    Assumes ``spark.sql.execution.arrow.pyspark.enabled=true`` (set by
    :func:`get_spark`; an externally-provided session with Arrow off
    silently falls back to the slow row path — performance-only, the
    values are identical either way). Unlike ``createDataFrame(list)``
    this path skips per-row type verification: a value that doesn't
    fit the declared schema surfaces as an Arrow cast error at plan
    construction, not a per-field TypeError — call sites declare their
    schemas honestly.
    """
    import pandas as pd

    rows = [tuple(r) for r in rows]
    if not rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(pd.DataFrame(rows, dtype=object), schema)


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
