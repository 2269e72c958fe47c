"""Partition-pruned time scans: fixed-window query cost vs history size.

The claim behind `lake_partitioned_events` (operators/lake.py): once
events are written day-partitioned, a time-windowed query's cost is a
function of the WINDOW, not of total retained history — the property
that makes a 100 TB event lake queryable. This soak measures it:

- build day-partitioned layouts holding 1x / 4x / 10x months of
  history (day-shifted copies of the sf0.1 events table, event_ids
  offset so rows stay unique);
- run the SAME fixed 3-day-window aggregation (absolute dates inside
  the first month, so the answer is identical on every layout),
  median-of-3;
- control: the same query over the same rows stored UNPARTITIONED
  (plain parquet appends), where Spark must scan every file because
  day is a derived column with no layout to prune on (parquet
  row-group min/max on ts still helps IO but every file is opened);
- assert the day-window predicate lands in PartitionFilters on the
  partitioned layouts (the lake_partitioned_events runtime contract).

Usage: python tools/partition_prune_soak.py [sf_dir]
Appends nothing; prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import contextlib
import io
import re
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mathorcup_spark.catalog import load  # noqa: E402
from mathorcup_spark.registry import DEC  # noqa: E402
from mathorcup_spark.session import get_spark  # noqa: E402

# default to the regenerated sf1 replica (10x events) so the scan
# costs are large enough to separate from fixed JVM/planning costs;
# falls back to sf0.1 when .data/sf1 is absent
_SF1 = Path(__file__).resolve().parents[1] / ".data" / "sf1"
SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else (str(_SF1) if _SF1.exists() else "/root/testdata/sf0.1")
)
COPIES = (1, 4, 10)
PASSES = 3


def _window_query(df):
    # fixed absolute 3-day window inside the first month
    return (
        df.filter((F.col("d") >= F.lit("2024-01-03")) & (F.col("d") <= F.lit("2024-01-05")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
        )
    )


def main() -> None:
    spark = get_spark("partition_prune_soak")
    events = load(spark, SF_DIR, "events")
    base = events.withColumn("d", F.to_date("ts"))
    max_id = base.agg(F.max("event_id")).first()[0] + 1

    work = tempfile.mkdtemp(prefix="mathorcup_prune_soak_")
    rows = []
    try:
        for copies in COPIES:
            shifted = None
            for k in range(copies):
                c = base.select(
                    (F.col("event_id") + F.lit(k * max_id)).alias("event_id"),
                    (F.col("ts") + F.expr(f"INTERVAL {k * 30} DAYS")).alias(
                        "ts"
                    ),
                    "user_id",
                    "event_type",
                    "value",
                ).withColumn("d", F.to_date("ts"))
                shifted = c if shifted is None else shifted.unionByName(c)

            part_dir = f"{work}/part_{copies}"
            flat_dir = f"{work}/flat_{copies}"
            shifted.write.mode("overwrite").partitionBy("d").parquet(part_dir)
            # control: same rows, same file COUNT (one file per day,
            # repartitioned by d) but no directory layout to prune on
            shifted.repartition("d").write.mode("overwrite").parquet(flat_dir)

            part = spark.read.parquet(part_dir)
            flat = spark.read.parquet(flat_dir).withColumn("d", F.to_date("ts"))

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                _window_query(part).explain("formatted")
            pf = re.search(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
            assert pf and "d#" in pf.group(1), (
                f"copies={copies}: window predicate not in PartitionFilters"
            )

            t_part, t_flat = [], []
            n_part = n_flat = 0
            for _ in range(PASSES):
                t0 = time.perf_counter()
                n_part = _window_query(part).count()
                t_part.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                n_flat = _window_query(flat).count()
                t_flat.append(time.perf_counter() - t0)
            assert n_part == n_flat, (copies, n_part, n_flat)

            # bytes the pruned scan is ALLOWED to touch (the 3
            # matching day directories) vs the table total — the
            # signal that matters at 100 TB, where wall-clock at this
            # SF is planner-dominated either way
            def _du(p: Path) -> int:
                return sum(f.stat().st_size for f in p.rglob("*.parquet"))

            total_b = _du(Path(part_dir))
            win_b = sum(
                _du(d)
                for d in Path(part_dir).iterdir()
                if d.name in ("d=2024-01-03", "d=2024-01-04", "d=2024-01-05")
            )
            rows.append(
                (
                    copies,
                    copies * 30,
                    statistics.median(t_part),
                    statistics.median(t_flat),
                    win_b,
                    total_b,
                    n_part,
                )
            )
            print(
                f"copies={copies}: partitioned {statistics.median(t_part):.2f}s"
                f" flat {statistics.median(t_flat):.2f}s rows={n_part}"
                f" bytes {win_b}/{total_b}",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        "\n| history (days) | pruned scan s | unpartitioned s "
        "| window bytes | table bytes | bytes touched |"
    )
    print("|---|---|---|---|---|---|")
    for copies, days, tp, tf, wb, tb, n in rows:
        print(
            f"| {days} | {tp:.2f} | {tf:.2f} | {wb / 1e6:.1f} MB "
            f"| {tb / 1e6:.1f} MB | {100 * wb / tb:.1f}% |"
        )
    p1, p10 = rows[0][2], rows[-1][2]
    f1, f10 = rows[0][3], rows[-1][3]
    print(
        f"\npruned factor over 10x history: {p10 / p1:.2f}x; "
        f"unpartitioned factor: {f10 / f1:.2f}x; "
        f"window bytes flat at {rows[-1][4] / 1e6:.1f} MB while the "
        f"table grew {rows[-1][5] / rows[0][5]:.1f}x"
    )


if __name__ == "__main__":
    main()
