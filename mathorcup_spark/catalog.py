"""Table catalog: the driver's testdata star schema (+ extensions).

Mirrors the reference's fixed-schema-declared-in-code posture
(reference ``src/headers.py:1-76`` declares 36-col valuation and
6-col transaction schemas as parallel name lists) but Spark-first:
explicit ``StructType`` per table, Parquet storage, schema-on-read.

At 100 TB these tables would be partitioned (``orders`` and
``lineitem`` by month of their date column, ``events`` by date) and
bucketed on their join keys; ``load`` reads whatever layout exists
under ``sf_dir`` so the same code serves flat local files and a
partitioned lake.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Explicit schemas (FIXTURES.md §1). Applied at read so a corrupt or
# schema-drifted file fails fast instead of silently inferring.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES = tuple(SCHEMAS)

# Dimension tables small enough to broadcast at any scale factor —
# joins against these should never shuffle the fact side.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table from ``sf_dir``.

    Plain ``spark.read.parquet`` — column pruning and predicate
    pushdown happen in whatever query consumes the result, so don't
    cache or materialize here.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    has no native type for; we read it as long (legacy conf, runtime-
    settable) and truncate to microseconds with integer division
    (int64 nanos exceed 2^53, so float division would corrupt low
    bits). DuckDB's TIMESTAMP_NS → python datetime also truncates to
    micros, so oracle comparisons line up.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(SCHEMAS)}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) infers
            # as TIMESTAMP_NTZ on Spark 4; cast to session-TZ timestamp
            # (session TZ pinned UTC) so epoch arithmetic
            # (unix_micros) and window() accept it, matching DuckDB's
            # naive-timestamp epoch.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class Tables:
    """Lazy attribute access to the catalog: ``t = Tables(spark, d); t.lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load(self._spark, self._sf_dir, name)

    def register_views(self) -> None:
        """Expose every table as a temp view for the SQL API."""
        for name in TABLES:
            load(self._spark, self._sf_dir, name).createOrReplaceTempView(name)
