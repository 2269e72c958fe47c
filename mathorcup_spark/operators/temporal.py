"""Temporal join operators: as-of join and bounded range join on the
``events`` table.

The reference has no temporal joins (SURVEY.md §2.3: only equi-joins,
``src/utils.py:241-290``); these are the standard time-series joins a
Spark-native engine adds on top — the as-of join is the canonical
"latest reading at or before t" lookup, the range join the canonical
"activity within a bounded window after t" self-join.

Scale posture: the as-of join is NOT a range join — it is one shuffle
on the partition key plus a per-key ordered window pass (union both
sides, sort within key, carry the last right-side row forward with
``last(..., ignorenulls=True)``). That stays linear per key at 100 TB
where a naive ``ts_left >= ts_right`` range join would be quadratic
per key. The bounded range join keys its shuffle on the equi column
(user_id) so the time predicate only filters within a key's pairs,
which the 5-minute bound keeps small regardless of total scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "j_asof_join",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts, c.value AS click_value,
           e.ts AS asof_error_ts, e.value AS error_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    doc="As-of join: each click event picks up the most recent error "
    "event at-or-before it for the same user. Implemented as the "
    "scalable union-and-carry-forward pattern: tag both sides, one "
    "shuffle on user_id, sort by (ts, side) inside each key, then "
    "last(error_cols, ignorenulls=True) over an unbounded-preceding "
    "frame carries the latest error forward onto every later click — "
    "linear per key, no range join, no per-row subquery. Oracle is "
    "DuckDB's native ASOF JOIN (same >= tie semantics: ordering "
    "errors (side 0) before clicks (side 1) at equal ts).",
    tags=("join", "asof", "temporal"),
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    err_ts = F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True)
    err_val = F.last(F.when(F.col("side") == 0, F.col("value")), ignorenulls=True)
    return (
        clicks.unionByName(errors)
        .withColumn("asof_error_ts", err_ts.over(w))
        .withColumn("error_value", err_val.over(w))
        .filter((F.col("side") == 1) & F.col("asof_error_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("value").alias("click_value"),
            "asof_error_ts",
            "error_value",
        )
    )


@register(
    "j_range_join",
    oracle="""
    SELECT a.event_id, count(b.ts) AS n_next_5min
    FROM events a
    LEFT JOIN events b
      ON b.user_id = a.user_id AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.event_id
    """,
    doc="Bounded range join: per event, count same-user events in the "
    "following 5 minutes. The join keys its shuffle on user_id (the "
    "equi conjunct) so the time-range predicate only filters within "
    "one key's pairs; the 5-minute bound caps per-key fan-out "
    "independent of total data volume. Left join keeps zero-count "
    "events (count(b.ts) skips the null-extended rows).",
    tags=("join", "range", "temporal"),
)
def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.select("event_id", "user_id", "ts")
    b = ev.select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    cond = (
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") > F.col("ts"))
        & (F.col("b_ts") <= F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        a.join(b, cond, "left")
        .groupBy("event_id")
        .agg(F.count("b_ts").alias("n_next_5min"))
    )


@register(
    "w_lag_gap",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           lead(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts)
             AS next_gap_us
    FROM events
    """,
    doc="lag/lead frame windows (SURVEY §2.5 notes the reference has "
    "none — declared as free Spark built-ins): per-user inter-event "
    "gaps in microseconds, NULL at partition edges. Gap-in-epoch-"
    "micros keeps the arithmetic in BIGINT on both engines; ties "
    "broken by event_id so the ordering is total and deterministic. "
    "One shuffle on user_id, sort within partitions only.",
    tags=("window", "lag", "temporal"),
)
def w_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        (F.lead(us).over(w) - us).alias("next_gap_us"),
    )
