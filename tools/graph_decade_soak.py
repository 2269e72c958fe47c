"""Second-decade scale probe for the wedge/iterative graph family
(judge r7 item 6).

SCALING.md's sf0.1 -> sf1 soak measures one decade; the 100x claims
for the five scale-sensitive graph operators (g_triangle_count,
g_adamic_adar, g_node_jaccard, g_bfs_distance, g_label_propagation)
extrapolated from it. This probe measures the NEXT decade: a
key-shifted x10 replica of .data/sf1's lineitem (the only table the
five ops read — l_orderkey / l_partkey / l_suppkey shifted by
copy_index * (max_key + 1), so the graph becomes 10 disjoint copies: |E|
exactly 10x, per-node structure unchanged, the same construction
gen_scaled.py uses for the first decade), then each op timed at sf1
and at the x10 dir.

Pass criterion: factor <= 12x for 10x edges (linear-in-edges with
headroom for shuffle constants; a superlinear wedge explosion would
show 30-100x). Prints a markdown table for SCALING.md.

Usage: python tools/graph_decade_soak.py [sf1_dir] [out_dir]
(defaults .data/sf1 and .data/sf10g; the x10 build is skipped if
out_dir already has lineitem.parquet)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from mathorcup_spark import registry
from mathorcup_spark.catalog import load
from mathorcup_spark.session import get_spark

OPS = (
    "g_triangle_count",
    "g_adamic_adar",
    "g_node_jaccard",
    "g_bfs_distance",
    "g_label_propagation",
)
N_COPIES = 10
MAX_FACTOR = 12.0


def build_x10(spark, src: str, out: str) -> None:
    li = load(spark, src, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    maxes = li.agg(
        F.max("l_orderkey").alias("o"),
        F.max("l_partkey").alias("p"),
        F.max("l_suppkey").alias("s"),
    ).first()
    copies = li.withColumn(
        "_i", F.explode(F.array(*[F.lit(i) for i in range(N_COPIES)]))
    )
    shifted = copies.select(
        (F.col("l_orderkey") + F.col("_i") * F.lit(maxes["o"] + 1))
        .cast("long")
        .alias("l_orderkey"),
        (F.col("l_partkey") + F.col("_i") * F.lit(maxes["p"] + 1))
        .cast("long")
        .alias("l_partkey"),
        (F.col("l_suppkey") + F.col("_i") * F.lit(maxes["s"] + 1))
        .cast("long")
        .alias("l_suppkey"),
    )
    shifted.repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else ".data/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".data/sf10g"
    spark = get_spark("graph_decade_soak")
    if not Path(f"{out}/lineitem.parquet").exists():
        print(f"building x{N_COPIES} lineitem at {out} ...", flush=True)
        build_x10(spark, src, out)
    qs = registry.queries()
    print(
        f"| query | {src} s | {out} s | factor (10x edges) |\n"
        "|---|---|---|---|"
    )
    failures = []
    for name in OPS:
        t0 = time.perf_counter()
        qs[name](spark, src).count()
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        qs[name](spark, out).count()
        big = time.perf_counter() - t0
        factor = big / base
        flag = "" if factor <= MAX_FACTOR else " **SUPERLINEAR**"
        if factor > MAX_FACTOR:
            failures.append(f"{name}: {factor:.1f}x")
        print(
            f"| `{name}` | {base:.1f} | {big:.1f} | {factor:.1f}x{flag} |",
            flush=True,
        )
    if failures:
        print(f"\nFAIL superlinear second decade: {failures}")
        return 1
    print(f"\nall {len(OPS)} ops <= {MAX_FACTOR}x for 10x edges")
    return 0


if __name__ == "__main__":
    sys.exit(main())
