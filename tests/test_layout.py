"""Bucketed-layout contract: co-bucketed joins must not shuffle.

This is the 100 TB story made testable at sf0.001: write orders and
lineitem bucketed on the order key, join them, and assert the
physical plan contains no Exchange operator — the join runs entirely
map-side at any scale because both inputs already satisfy the
required hash distribution.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from mathorcup_spark.catalog import load
from mathorcup_spark.sources.layout import read_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    orders = load(spark, SF_DIR, "orders")
    lineitem = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "orders_b", str(tmp_path / "orders_b"), "o_orderkey", 8,
        sort_col="o_orderkey",
    )
    write_bucketed(
        lineitem, "lineitem_b", str(tmp_path / "lineitem_b"), "l_orderkey", 8,
        sort_col="l_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the assertion is about
        # bucketing, not about one side being broadcast-small
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "orders_b").join(
            read_table(spark, "lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _formatted(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        # and the result is still correct
        n = joined.count()
        expected = lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes(spark, tmp_path):
    events = load(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        events.write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(str(tmp_path / "events_p"))
    )
    back = spark.read.parquet(str(tmp_path / "events_p"))
    one_day = back.filter(F.col("event_date") == back.agg(F.min("event_date")).collect()[0][0])
    plan = _formatted(one_day)
    # partition filter must appear as a PartitionFilters entry, not a
    # post-scan Filter over all files
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert one_day.count() > 0
