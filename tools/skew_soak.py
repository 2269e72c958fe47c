"""Zipf-skew soak: measure the salted-join pattern against real skew.

``tools/gen_scaled.py`` shifts keys uniformly, so AQE's skew-join
splitting and ``j_salted_skew_join``'s manual salt never face an
actually-hot key. This tool manufactures one: it rewrites a source
directory's ``lineitem`` so ~30% of rows collapse onto 4 zipf-weighted
hot orderkeys (key 1 ≈ 16% of the table, then 8%, 4%, 2%), writes it
next to the untouched companion tables, and times the same
join+aggregate three ways:

1. plain shuffle join, AQE off          — the straggler baseline
2. plain shuffle join, AQE skew-join on — Spark's automatic split
3. manual (key, salt) join, AQE off     — the engine's explicit pattern

Broadcast is disabled for the comparison (autoBroadcastJoinThreshold
= -1): at 100 TB neither side of an orders⋈lineitem fits in a
broadcast, so the interesting regime is shuffle-join skew. All three
variants must return identical aggregates (asserted), and the report
is the wall-clock + max-task skew table for SCALING.md.

Usage: python tools/skew_soak.py [src_dir] [out_dir] [n_runs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from mathorcup_spark.catalog import load
from mathorcup_spark.registry import dsum
from mathorcup_spark.session import get_spark

HOT = [(160, 1), (240, 2), (280, 3), (300, 4)]  # cum ‰ thresholds → hot key


def gen_skewed(spark, src: str, out: str) -> None:
    li = load(spark, src, "lineitem")
    h = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(1000))
    hot = None
    for bound, key in HOT:
        cond = h < bound
        hot = F.when(cond, key) if hot is None else hot.when(cond, key)
    li.withColumn(
        "l_orderkey",
        F.coalesce(hot.cast("long"), F.col("l_orderkey")),
    ).repartition(32).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    for t in ("orders",):
        load(spark, src, t).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def _join_plain(spark, sf_dir: str):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum("l_extendedprice", "gross_revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def _join_salted(spark, sf_dir: str, n_salt: int = 8):
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)).cast("int"),
    )
    orders = load(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(dsum("l_extendedprice", "gross_revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".data/skew"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    base = {
        # big-big regime: no broadcast escape hatch
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    spark = get_spark("skew_soak", extra_conf=base)
    gen_skewed(spark, src, out)
    n_hot = (
        load(spark, out, "lineitem")
        .groupBy("l_orderkey").count().orderBy(F.desc("count")).limit(5)
    )
    print("hottest keys:", [(r[0], r[1]) for r in n_hot.collect()])
    expected = sorted(map(tuple, _join_plain(spark, out).collect()))
    spark.stop()

    variants = [
        ("plain (AQE off)", dict(base), _join_plain),
        (
            "plain (AQE skew-join)",
            {
                **base,
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                # sf0.1-sized partitions: defaults (256MB/5x) never
                # trigger on MB-scale soak data, which would silently
                # measure AQE-off twice; thresholds scaled to the soak
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            },
            _join_plain,
        ),
        ("salted x8 (AQE off)", dict(base), _join_salted),
    ]
    report = []
    for label, conf, build in variants:
        spark = get_spark("skew_soak_variant", extra_conf=conf)
        got = sorted(map(tuple, build(spark, out).collect()))  # warm + assert
        assert got == expected, f"{label} changed the answer"
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            build(spark, out).count()
            times.append(time.perf_counter() - t0)
        report.append((label, min(times)))
        print(f"{label}: {min(times):.2f}s  (runs: {[f'{t:.2f}' for t in times]})")
        spark.stop()

    print("\n| variant | time |\n|---|---|")
    for label, t in report:
        print(f"| {label} | {t:.2f}s |")


if __name__ == "__main__":
    main()
