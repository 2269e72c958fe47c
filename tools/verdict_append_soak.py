"""Incremental verdict maintenance soak (judge round-5 item 3): a
production lake appends batches to the verdict table forever, so the
number that matters is PER-BATCH cost as the table grows. This
appends a sequence of EQUAL-SIZED batches to an incrementally
maintained verdict table (sources/verdicts.py) and times each one:
if append cost is a function of the batch (screens on batch text +
a pruned probe of the hash store), the times stay flat while the
table grows several-fold; a rebuild-per-batch strategy would grow
linearly instead (the rebuild column shows that counterfactual).

Usage: python tools/verdict_append_soak.py [sf_dir] [n_batches]
Defaults: /root/testdata/sf0.1, 7 batches (initial 20% + 7 x 10%).
Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mathorcup_spark.catalog import load  # noqa: E402
from mathorcup_spark.session import get_spark  # noqa: E402
from mathorcup_spark.sources.verdicts import (  # noqa: E402
    append_to_verdict_table,
    build_verdicts_frozen,
    create_verdict_table,
    read_incremental_verdicts,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("verdict_append_soak")
    docs = load(spark, sf_dir, "documents")
    mx = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    cut0 = mx * 20 // 100
    step = mx * 10 // 100

    out = tempfile.mkdtemp(prefix="verdict_soak_")
    rows = []
    try:
        t0 = time.perf_counter()
        create_verdict_table(spark, docs.filter(F.col("doc_id") < cut0), out)
        t_create = time.perf_counter() - t0
        print(f"create over initial 20%: {t_create:.1f}s")
        print()
        print("| batch | corpus rows before | batch rows | append s |"
              " rebuild-counterfactual s |")
        print("|---|---|---|---|---|")
        lo = cut0
        eval_store = spark.read.parquet(f"{out}/eval")
        for i in range(n_batches):
            hi = min(lo + step, mx)
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            n_before = read_incremental_verdicts(spark, out).count()
            n_batch = batch.count()
            t0 = time.perf_counter()
            append_to_verdict_table(spark, out, batch)
            t_append = time.perf_counter() - t0
            # counterfactual: what a rebuild-the-world strategy pays
            # for the same arrival (full build over everything so far)
            t0 = time.perf_counter()
            build_verdicts_frozen(
                spark, docs.filter(F.col("doc_id") < hi), eval_store
            ).count()
            t_rebuild = time.perf_counter() - t0
            rows.append((i + 1, n_before, n_batch, t_append, t_rebuild))
            print(
                f"| {i + 1} | {n_before} | {n_batch} | {t_append:.1f} |"
                f" {t_rebuild:.1f} |"
            )
            lo = hi
        first, last = rows[0][3], rows[-1][3]
        growth = (
            read_incremental_verdicts(spark, out).count() / max(rows[0][1], 1)
        )
        print()
        print(
            f"append factor batch1 -> batch{len(rows)}: "
            f"{last / first:.2f}x while the table grew {growth:.1f}x; "
            f"rebuild counterfactual ends at "
            f"{rows[-1][4] / rows[0][3]:.1f}x a single append"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
