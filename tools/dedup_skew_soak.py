"""Duplicate-heavy corpus soak: near-dup bucket-join skew, measured.

A boilerplate-heavy corpus concentrates MinHash (band, bucket) keys:
documents sharing a template produce identical (or near-identical)
signatures, so a handful of buckets hold a large fraction of the
corpus and the LSH candidate self-join fans out quadratically INSIDE
those buckets while every other join task is tiny — the classic
straggler shape. This tool manufactures that corpus (30% of docs
rewritten onto 5 templates, each with a small unique tail so they are
near-dups rather than exact dups), reports the bucket histogram, and
times `d_minhash_lsh` and `d_dedup_clusters` with AQE's skew
handling on vs off.

Two findings this encodes (see SCALING.md):

- the candidate blow-up inside a template bucket is REAL WORK, not a
  partitioning artifact — 1500 docs on 5 templates IS ~220k true
  candidate pairs; no join strategy removes them. The mitigation is
  pipeline-level: run exact dedup first (d_exact_dedup collapses
  template copies to survivors), which this tool also measures as
  the "exact-first" variant.
- what AQE skew-splitting CAN fix is the straggler: the hot buckets
  land in a few shuffle partitions; with skew-split those partitions
  are subdivided so the fan-out parallelizes.

Usage: python tools/dedup_skew_soak.py [src_dir] [out_dir] [n_runs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from mathorcup_spark.catalog import load
from mathorcup_spark.session import get_spark

TEMPLATES = 5
HOT_PERMILLE = 300  # ~30% of docs collapse onto the templates


def gen_skewed(spark, src: str, out: str) -> None:
    docs = load(spark, src, "documents")
    # deterministic 30% selection; template text is long enough that
    # its shingles dominate the signature. Half the template docs are
    # EXACT copies (what a boilerplate-heavy crawl really contains —
    # and what the exact-first mitigation collapses), half carry a
    # unique tail so they stay near-dups that only LSH catches.
    base = F.concat(
        F.lit("standard boilerplate disclaimer template number "),
        (F.pmod(F.xxhash64("doc_id"), F.lit(TEMPLATES))).cast("string"),
        F.lit(
            " all rights reserved terms of service apply please read"
            " carefully before proceeding this content is provided as"
            " is without warranty of any kind either express or"
            " implied including fitness for a particular purpose"
        ),
    )
    near = F.concat(base, F.lit(" unique tail "), F.col("doc_id").cast("string"))
    is_exact_copy = F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(2)) == 0
    template = F.when(is_exact_copy, base).otherwise(near)
    is_hot = F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(1000)) < HOT_PERMILLE
    skewed = docs.withColumn(
        "text", F.when(is_hot, template).otherwise(F.col("text"))
    ).withColumn("n_chars", F.length("text"))
    skewed.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )


def bucket_histogram(spark, sf_dir: str):
    from mathorcup_spark.functions.dedup import _banded_sigs, _shingle_df

    banded = _banded_sigs(_shingle_df(spark, sf_dir))
    return (
        banded.groupBy("band", "bucket")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".data/dedup_skew"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("dedup_skew_gen")
    gen_skewed(spark, src, out)
    hist = bucket_histogram(spark, out)
    n_docs = load(spark, out, "documents").count()
    print(f"{n_docs} docs; hottest (band,bucket) sizes:",
          [r["count"] for r in hist])

    from mathorcup_spark import registry

    qs = registry.queries()

    def exact_first(spark, sf_dir):
        """The mitigation pipeline: collapse exact template copies to
        survivors before LSH (here templates are near-dups so this
        mostly measures the added exact pass's cost)."""
        from pyspark.sql import Window as W

        from mathorcup_spark.functions.dedup import (
            _minhash_candidates,
            shingles_from,
        )

        docs = load(spark, sf_dir, "documents")
        norm = F.md5(F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))))
        survivors = (
            docs.withColumn("h", norm)
            .withColumn(
                "rn",
                F.row_number().over(W.partitionBy("h").orderBy("doc_id")),
            )
            .filter(F.col("rn") == 1)
            .drop("h", "rn")
        )
        return _minhash_candidates(shingles_from(spark, survivors))

    spark.stop()

    aqe_off = {
        "spark.sql.adaptive.enabled": "false",
    }
    aqe_skew = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # soak data is MB-scale; default 256MB/5x thresholds never fire
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    }
    variants = [
        ("d_minhash_lsh (AQE off)", aqe_off, qs["d_minhash_lsh"]),
        ("d_minhash_lsh (AQE skew-join)", aqe_skew, qs["d_minhash_lsh"]),
        ("d_minhash_lsh_capped (AQE off)", aqe_off, qs["d_minhash_lsh_capped"]),
        ("d_dedup_clusters (capped, AQE off)", aqe_off, qs["d_dedup_clusters"]),
        ("d_dedup_clusters (capped, AQE skew-join)", aqe_skew,
         qs["d_dedup_clusters"]),
        ("exact-first + LSH (AQE skew-join)", aqe_skew, exact_first),
    ]
    report = []
    for label, conf, build in variants:
        spark = get_spark("dedup_skew_variant", extra_conf=conf)
        n = build(spark, out).count()  # warm codegen
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            build(spark, out).count()
            times.append(time.perf_counter() - t0)
        report.append((label, min(times), n))
        print(f"{label}: {min(times):.2f}s, {n} rows"
              f"  (runs: {[f'{t:.2f}' for t in times]})")
        spark.stop()

    print("\n| variant | time | output rows |\n|---|---|---|")
    for label, t, n in report:
        print(f"| {label} | {t:.2f}s | {n} |")


if __name__ == "__main__":
    main()
