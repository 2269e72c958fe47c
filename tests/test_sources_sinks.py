"""Sink round-trips (SURVEY.md §2.1 S3/S5/S6/S7) and sketch-accuracy
checks that have no DuckDB oracle.

The reference materializes every stage to xlsx/csv/json/txt
(``src/utils.py:39,48,67,131,204-209,221-225``); our sinks are
Parquet/TSV/JSON writers whose correctness is a read-back equality
check, plus partition pruning as the scale-relevant property of the
partitioned Parquet sink.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mathorcup_spark import registry
from mathorcup_spark.catalog import load
from mathorcup_spark.sources.tsv import (
    write_json,
    write_parquet,
    write_predictions_tsv,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def test_parquet_roundtrip(spark, tmp_path):
    """S3/S5: Parquet sink → scan reproduces the DataFrame exactly."""
    orders = load(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_pq")
    write_parquet(orders, path)
    assert _rows(spark.read.parquet(path)) == _rows(orders)


def test_partitioned_parquet_prunes(spark, tmp_path):
    """Partitioned sink + partition pruning: a filter on the partition
    column must reach the scan as a partition filter, not a data
    filter — the property that makes date-partitioned layouts work at
    100 TB."""
    events = load(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    path = str(tmp_path / "events_part")
    write_parquet(events, path, partition_by=["event_date"])
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-01")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan
    # correctness of the pruned read
    expected = events.filter(F.col("event_date") == "2024-01-01")
    assert sorted(r.event_id for r in one_day.collect()) == sorted(
        r.event_id for r in expected.collect()
    )


def test_predictions_tsv_roundtrip(spark, tmp_path):
    """S7: the ``carid \\t price`` submission sink (reference
    src/evaluate.py:91-94) — read back as TSV, values survive."""
    preds = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("carid"),
        F.col("o_totalprice").alias("price"),
    )
    path = str(tmp_path / "preds_tsv")
    write_predictions_tsv(preds, path, "carid", "price")
    back = (
        spark.read.csv(path, sep="\t", schema="carid BIGINT, price DOUBLE")
    )
    assert _rows(back) == _rows(preds)


def test_json_roundtrip(spark, tmp_path):
    """S6: dictionary/mapping sink as JSON lines (reference persists
    vocabularies as JSON, src/data.py:160-174)."""
    mapping = (
        load(spark, SF_DIR, "nation")
        .select(F.col("n_name").alias("token"), F.col("n_nationkey").alias("id"))
    )
    path = str(tmp_path / "dict_json")
    write_json(mapping, path)
    back = spark.read.json(path, schema="token STRING, id INT")
    assert _rows(back) == _rows(mapping)


def test_approx_count_distinct_accuracy(spark):
    """HLL++ estimate within 5% of the exact distinct count — the
    query itself grades the sketch (within_5pct), and the oracle
    expects TRUE per group, so the driver hash-checks accuracy."""
    q = registry.queries()["a_approx_count_distinct"]
    rows = q(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.within_5pct is True, (r.event_type, r.n_events)


def test_jsonl_corrupt_routing(spark, tmp_path):
    """read_jsonl: every input line lands on exactly one side —
    parseable rows typed on good, mangled lines verbatim on bad."""
    from pyspark.sql import types as T

    from mathorcup_spark.sources.jsonl import read_jsonl

    p = str(tmp_path / "events.jsonl")
    lines = [
        '{"event_id": 1, "user_id": 10, "value": 1.5}',
        '{"event_id": 2, "user_id": 11, "value": 2.5}',
        '{"event_id": 3, "user_id": 12, "value":',  # truncated write
        "not json at all",
        '{"event_id": 4, "user_id": 13, "value": 4.0}',
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    good, bad = read_jsonl(spark, p, schema)
    assert sorted(r["event_id"] for r in good.collect()) == [1, 2, 4]
    assert good.columns == ["event_id", "user_id", "value"]
    bad_lines = sorted(r["line"] for r in bad.collect())
    assert bad_lines == sorted([lines[2], lines[3]])
    # caller's schema must not be mutated by the corrupt-column add
    assert len(schema.fields) == 3
