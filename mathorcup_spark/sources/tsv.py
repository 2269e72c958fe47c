"""Headerless / ragged TSV ingestion (SURVEY.md §2.1 S1/S2) and the
engine's sink conventions (S3-S8).

The reference reads the competition's tab-separated, headerless data
files with pandas and assigns column names positionally
(``src/utils.py:35-37,46-47``), and hand-repairs ragged transaction
rows — 5-field lines right-padded to 6 (``src/utils.py:55-64``).
Spark-first equivalents:

- well-formed TSV → ``spark.read.csv`` with an explicit schema
  (distributed, splittable, pushdown-capable);
- ragged TSV → ``spark.read.text`` + ``split`` + ``F.get`` padding
  (ANSI-safe NULL for missing trailing fields), because the csv
  reader's PERMISSIVE mode can't express "pad short rows but fail
  rows that are too long".

Sinks: every inter-stage ``.xlsx`` materialization in the reference
(S3/S4) becomes Parquet — columnar, splittable, predicate-pushdown —
and is only written at *declared* sink points; intermediate stages
stay lazy in one Catalyst DAG (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_tsv(
    spark: SparkSession,
    path: str,
    names: list[str],
    types: list[T.DataType] | None = None,
) -> DataFrame:
    """S1: headerless TSV scan with positional column names.

    Reference: ``pd.read_csv(sep='\\t', header=None)`` + positional
    rename (``src/utils.py:35-37``). All-string unless ``types`` given.
    """
    if types is None:
        types = [T.StringType()] * len(names)
    schema = T.StructType(
        [T.StructField(n, t, True) for n, t in zip(names, types, strict=True)]
    )
    return spark.read.csv(path, sep="\t", header=False, schema=schema)


def read_ragged_tsv(
    spark: SparkSession,
    path: str,
    names: list[str],
    min_fields: int,
) -> DataFrame:
    """S2: ragged TSV scan — rows with ``min_fields``..``len(names)``
    fields are right-padded with NULLs; longer rows raise at action
    time, mirroring the reference's ``ValueError`` on malformed rows
    (``src/utils.py:55-64``).

    All columns come back as strings; cast downstream.
    """
    n = len(names)
    lines = spark.read.text(path)
    fields = F.split(F.col("value"), "\t")
    bad = (F.size(fields) > n) | (F.size(fields) < min_fields)
    # The malformed-row check is fused into the first output column (a
    # separate dropped check-column would be pruned by Catalyst and
    # never evaluated).
    first = F.when(
        bad, F.raise_error(F.concat(F.lit("malformed TSV row: "), F.col("value")))
    ).otherwise(F.get(fields, 0))
    return lines.select(
        first.alias(names[0]),
        *[F.get(fields, i).alias(names[i]) for i in range(1, n)],
    )


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S3/S5/S8 sink: stage materialization as Parquet (replaces xlsx/
    csv/npz in the reference — ``src/utils.py:39``, ``204-209``,
    ``preprocess.py:74-76``). Partition columns for pruning at scale."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_predictions_tsv(df: DataFrame, path: str, id_col: str, value_col: str) -> None:
    """S7: the competition's ``carid \\t price`` submission sink
    (reference ``src/evaluate.py:91-94``)."""
    df.select(id_col, value_col).write.mode("overwrite").csv(path, sep="\t")


def write_json(df: DataFrame, path: str) -> None:
    """S6: mapping/dictionary table sink as JSON lines (reference
    persists vocabularies as JSON, ``src/data.py:160-174``)."""
    df.write.mode("overwrite").json(path)
