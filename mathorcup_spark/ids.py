"""Distributed dense-ID assignment (E1 family, SURVEY.md §4.2).

The reference's ``Dictionary`` assigns first-seen insertion-order ids
(``reference/src/data.py:131-182``); the engine's deterministic
replacement is ``row_number() OVER (ORDER BY <order_cols>) - 1``. A
literal unpartitioned window computes that with a single-partition
global sort — fine for a 25-value brand vocabulary, a bottleneck the
moment a high-cardinality value domain (urls, user ids, shingles)
flows through the same code path at 100×.

:func:`dense_ids` keeps the exact ``row_number over ORDER BY``
semantics while staying distributed at any cardinality:

1. ``repartitionByRange(order_cols)`` — range partitions are globally
   ordered (every row in partition *i* sorts before every row in
   partition *i+1*), so a global rank decomposes into per-partition
   ranks plus a partition offset.
2. per-partition counts → cumulative offsets. The only global window
   runs over **#partitions rows** (≤ ``spark.sql.shuffle.partitions``),
   never data rows, and broadcasts back.
3. ``row_number`` within each range partition + offset.

Catalyst's ReuseExchange shares one shuffle between the counts pass
and the rank pass (same pattern proven by
``operators/sampling.py::r_ordered_split_train``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Append ``out_col`` = exclusive prefix sum of ``value_col`` under
    ``ORDER BY order_cols`` — semantically
    ``sum(value) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)`` with no single-partition exchange: the same
    range-partition + per-partition-offset decomposition as
    :func:`dense_ids`, with per-partition SUMS instead of counts.

    The offset window still runs over #partitions rows only; the
    per-partition running sum is an ordinary partitioned window.
    """
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    sums = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_psum"))
    offsets = sums.select(
        "_pid",
        F.coalesce(
            F.sum("_psum").over(
                W.partitionBy(F.col("_pid") % 1)
                .orderBy("_pid")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    local = F.coalesce(
        F.sum(value_col).over(
            W.partitionBy("_pid")
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, local + F.col("_off"))
        .drop("_pid", "_off")
    )


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    id_type: str = "long",
) -> DataFrame:
    """Append ``id_col`` = dense 0-based rank of each row under
    ``ORDER BY order_cols`` — semantically identical to
    ``(row_number().over(Window.orderBy(*order_cols)) - 1)`` but with
    no single-partition exchange at any input cardinality.

    Rows are assumed distinct on ``order_cols`` (every call site ranks
    a ``distinct()`` domain); ties would get arbitrary-but-unique ids,
    same as the unpartitioned window.
    """
    # Cost note (measured at sf0.1, local[32]): vs the old
    # single-partition window this adds ~0.5s of constant per-query
    # stage latency (range-boundary sampling + counts stage) on
    # vocabulary-sized domains — NOT data-proportional work; AQE
    # coalesces the tiny partitions at any scale. The old form's cost
    # grows with domain cardinality; this one's doesn't.
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # The cumulative-offset window runs over #partitions rows (metadata,
    # not data rows), deliberately on one reducer. partitionBy(_pid % 1)
    # — constant-valued but not constant-foldable — declares that single
    # partition to the planner; a bare orderBy window computes the same
    # thing but trips WindowExec's no-partition warning on every query,
    # drowning real signals (a foldable lit(0) is optimized away).
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(
                W.partitionBy(F.col("_pid") % 1)
                .orderBy("_pid")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    rank: Column = (
        F.row_number().over(W.partitionBy("_pid").orderBy(*order_cols))
        + F.col("_off")
        - 1
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, rank.cast(id_type))
        .drop("_pid", "_off")
    )
