"""Storage layout for the 100 TB lake: partitioned + bucketed sinks.

The reference materializes every stage to a flat xlsx file
(``src/utils.py:39,48,67,131`` — no partitioning concept at all). At
cluster scale the layout IS the optimization: a fact table bucketed
on its join key lets every future join/aggregation on that key run
with ZERO shuffle (Spark's bucketing contract: same key, same bucket
count on both sides → outputPartitioning already satisfies the
join's distribution requirement), and date-partitioned directories
give partition pruning for time-range predicates.

``tests/test_layout.py`` proves the contract: it writes two bucketed
tables and asserts the join plan contains NO Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Persist ``df`` as a Parquet table bucketed on ``bucket_col``.

    ``path`` makes it an external table (data outside the warehouse
    dir); ``sort_col`` pre-sorts within buckets so sort-merge joins
    skip their sort too. Bucket count is a layout decision: pick
    ~(table size / 128 MB) rounded to a power of two, identical for
    every table sharing the join key.
    """
    writer = (
        df.write.mode("overwrite").format("parquet").option("path", path)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer = writer.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a previously written bucketed table (bucket metadata comes
    from the catalog, so joins can use it — ``spark.read.parquet`` on
    the raw path would lose the bucketing)."""
    return spark.table(table)
