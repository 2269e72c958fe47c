"""Append-fragmentation soak for the persisted MinHash index (judge
round-4 item 5): production indexes are append-heavy, and every
append adds one file per touched (band, pb) partition — row-group
pruning still works per file, but file-open overhead accumulates.
This measures WHEN compaction pays:

1. build the index from a corpus slice (fresh),
2. append the rest in N small batches (fragmented),
3. compact (one sorted file per partition again),

probing with the SAME fixed batch after each state (median of 3) and
counting parquet files. The delta fresh→fragmented is the
fragmentation tax; fragmented→compacted is what compaction buys.

Usage: python tools/mh_append_soak.py [sf_dir] [n_appends]
Defaults: /root/testdata/sf0.1, 20 appends.
Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mathorcup_spark.catalog import load  # noqa: E402
from mathorcup_spark.session import get_spark  # noqa: E402
from mathorcup_spark.sources.minhash_index import (  # noqa: E402
    append_to_minhash_index,
    compact_minhash_index,
    probe_minhash_index,
    write_minhash_index,
)

BATCH_SF = "/root/testdata/sf0.01"


def _n_files(root: str) -> int:
    return sum(1 for p in Path(root).rglob("*.parquet") if p.is_file())


def _probe_times(spark, idx: str, batch) -> str:
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        probe_minhash_index(spark, idx, batch).count()
        times.append(time.perf_counter() - t0)
    return (
        f"{statistics.median(times):.2f}"
        f" (min {min(times):.2f}, max {max(times):.2f})"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_spark("mh_append_soak")

    docs001 = load(spark, BATCH_SF, "documents")
    t = int(docs001.agg(F.expr("(max(doc_id) * 4) div 5")).first()[0])
    batch = docs001.filter(F.col("doc_id") >= t).localCheckpoint(eager=True)
    print(f"fixed batch: {batch.count()} docs (sf0.01 last-20% slice)")

    corpus = (
        load(spark, sf_dir, "documents")
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    mn, mx = corpus.agg(F.min("doc_id"), F.max("doc_id")).first()
    # base = first half of the id range; the rest arrives as appends
    mid = (mn + mx) // 2
    step = max(1, (mx - mid) // n_appends + 1)

    idx = tempfile.mkdtemp(prefix="mh_append_soak_")
    write_minhash_index(spark, corpus.filter(F.col("doc_id") < mid), idx)

    print(f"\nindex corpus: `{sf_dir}` ({corpus.count()} docs), "
          f"{n_appends} appends of ~{step} ids each\n")
    print("| index state | band files | probe s (median of 3) |")
    print("|---|---|---|")
    print(f"| fresh (half corpus) | {_n_files(f'{idx}/bands')} |"
          f" {_probe_times(spark, idx, batch)} |")

    for i in range(n_appends):
        lo = mid + i * step
        piece = corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + step)
        )
        if piece.first() is not None:
            append_to_minhash_index(spark, idx, piece)
    print(f"| after {n_appends} appends (full corpus) |"
          f" {_n_files(f'{idx}/bands')} |"
          f" {_probe_times(spark, idx, batch)} |")

    t0 = time.perf_counter()
    compact_minhash_index(spark, idx)
    compact_s = time.perf_counter() - t0
    print(f"| compacted (one pass, {compact_s:.1f}s) |"
          f" {_n_files(f'{idx}/bands')} |"
          f" {_probe_times(spark, idx, batch)} |")


if __name__ == "__main__":
    main()
