"""Corrupt-tolerant JSONL ingestion (SURVEY.md §2.1 S6 complement).

The reference only *writes* JSON dictionaries (``src/data.py``,
mirrored by ``tsv.write_json``); a 100 TB ingest additionally has to
*read* JSON event feeds in which some fraction of lines is mangled —
truncated writes, encoding damage, schema drift. Failing the job on
the first bad line (FAILFAST) or silently nulling bad rows
(PERMISSIVE without inspection) are both wrong for a pipeline: the
standard contract is route-and-count — parse what parses, quarantine
what doesn't, and make the split auditable.

``read_jsonl`` returns (good, bad): ``good`` carries the typed rows,
``bad`` the verbatim corrupt lines for quarantine. Implementation is
PERMISSIVE mode with ``columnNameOfCorruptRecord``: one scan, no
Python, splittable, and the good-side projection prunes the corrupt
column so downstream plans never carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Parse JSONL at ``path`` against ``schema``; route bad lines.

    Returns ``(good, bad)``: good = typed rows (corrupt column
    pruned), bad = (line) verbatim corrupt inputs. Spark requires
    caching or re-reading to filter on the corrupt column of a JSON
    scan; re-reading keeps both sides lazy one-scan plans instead of
    pinning the corpus in memory.
    """
    # build immutably — StructType.add mutates the receiver
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    df = spark.read.schema(full_schema).option(
        "columnNameOfCorruptRecord", _CORRUPT
    ).json(path)
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    # Spark refuses corrupt-column-only queries on the same scan;
    # the documented pattern is a second scan projecting raw text,
    # re-parsed per line with the corrupt-record column populated.
    raw = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"), full_schema, {"columnNameOfCorruptRecord": _CORRUPT}
    )
    bad = raw.filter(
        (F.length(F.trim("value")) > 0) & parsed[_CORRUPT].isNotNull()
    ).select(F.col("value").alias("line"))
    return good, bad
