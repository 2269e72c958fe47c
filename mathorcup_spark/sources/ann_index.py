"""Persisted LSH ANN index: build once, probe many (SURVEY.md §2.13).

At 100 TB the signature build in ``sim_lsh_ann`` /
``d_embedding_neardup`` is a one-time cost you amortize by persisting
the index, not something to recompute per query batch. This module is
that pattern made concrete:

- :func:`write_lsh_index` materializes the index as two parquet
  layouts under one root: ``buckets/`` — (vec_id) rows partitioned by
  ``(t, bucket)`` so a probe touches only its bucket directories —
  and ``vectors/`` — embeddings cast to double with their norms,
  for exact rescoring with ``sim_lsh_ann``'s formula (dot / norms,
  rounded last) so persisted-index results are byte-identical to the
  inline query.
- :func:`query_lsh_index` computes the query batch's buckets (same
  deterministic hyperplanes), collects the distinct (t, bucket) pairs
  it needs (Q·T values — driver-sized by construction), and pushes
  them as partition-pruning literals into the bucket scan: the plan
  reads only the probed partitions, never the full index
  (``PartitionFilters`` in the scan node, asserted in
  tests/test_ann_index.py).

The same hyperplane formula as ``similarity.plane_dots`` keeps a
persisted index's results byte-identical to the inline
``sim_lsh_ann`` query — pinned by test against it.

Reference parity note: the reference persists its trained embedding
matrices to disk and reloads them for evaluation
(``src/utils.py:320-334``); this is the retrieval-index analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.similarity import N_BITS, N_TABLES, _dot, _norm, plane_dots


def _vnorm(col: str):
    return _norm(col)


def _bucketed(emb: DataFrame) -> DataFrame:
    """(vec_id, t, bucket) for every vector and table."""
    dots = plane_dots(emb, N_TABLES * N_BITS)

    def bucket_expr(t: int):
        e = F.lit(0)
        for b in range(N_BITS):
            e = e + F.when(
                F.col(f"p{t * N_BITS + b}") > 0, F.lit(1 << b)
            ).otherwise(0)
        return e

    return dots.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), bucket_expr(t).alias("bucket"))
                    for t in range(N_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.t", "tb.bucket")


def write_lsh_index(emb: DataFrame, out_dir: str) -> None:
    """Materialize the LSH index for ``emb`` (vec_id, embedding).

    ``buckets/`` is partitioned by (t, bucket): T × 2^B directories,
    each holding the member vec_ids of one bucket — the layout that
    turns a probe into a partition-pruned scan. ``vectors/`` holds
    the embeddings (double) and their norms for the exact rescore.
    """
    _bucketed(emb).write.mode("overwrite").partitionBy("t", "bucket").parquet(
        f"{out_dir}/buckets"
    )
    (
        emb.select("vec_id", F.col("embedding").alias("e"))
        .withColumn("nrm", _vnorm("e"))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/vectors")
    )


def query_lsh_index(
    spark: SparkSession, index_dir: str, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k neighbors for ``queries`` (vec_id, embedding) against a
    persisted index — same output contract as ``sim_lsh_ann``:
    (q_id, c_id, cosine, rnk).

    The probed (t, bucket) pairs are collected to the driver (Q·T
    values) and pushed as literal partition filters, so the bucket
    scan prunes to exactly the probed directories at any index size.
    """
    qb = _bucketed(queries).select(
        F.col("vec_id").alias("q_id"), "t", "bucket"
    )
    probes = [(r["t"], r["bucket"]) for r in qb.dropDuplicates(["t", "bucket"]).collect()]
    probe_key = F.col("t") * (1 << N_BITS) + F.col("bucket")
    wanted = [t * (1 << N_BITS) + b for t, b in probes]

    idx = (
        spark.read.parquet(f"{index_dir}/buckets")
        .filter(probe_key.isin(wanted))
        .select(F.col("vec_id").alias("c_id"), "t", "bucket")
    )
    cand = (
        idx.join(F.broadcast(qb), ["t", "bucket"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id")
        .dropDuplicates()
    )

    vecs = spark.read.parquet(f"{index_dir}/vectors")
    qv = (
        queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
        .withColumn("qnrm", _vnorm("qe"))
    )
    # sim_lsh_ann's exact formula — dot of the raw vectors divided by
    # the norms, rounded last — so index answers match it bit-for-bit
    scored = (
        cand.join(F.broadcast(qv), "q_id")
        .join(
            vecs.select(
                F.col("vec_id").alias("c_id"),
                F.col("e").alias("ce"),
                F.col("nrm").alias("cnrm"),
            ),
            "c_id",
        )
        .select(
            "q_id",
            "c_id",
            F.round(_dot("qe", "ce") / (F.col("qnrm") * F.col("cnrm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )


def append_to_lsh_index(emb: DataFrame, index_dir: str) -> None:
    """Absorb a vector batch into the persisted index — the ingest
    loop's second half (probe the batch for near-dups/neighbors,
    then append it so later batches see it).

    Appends are dynamic-partition file adds: the batch's bucket
    memberships land as new files inside their (t, bucket)
    directories and its vectors append to ``vectors/``. No existing
    file is rewritten, so append cost is batch-sized at any index
    size — the same discipline as ``minhash_index.append_to_
    minhash_index``, and the same fragmentation trade measured in
    SCALING.md § append fragmentation (compaction below restores
    one-file-per-partition).

    Crash safety: vectors are appended FIRST. A crash between the
    two writes then leaves orphan vectors with no bucket entries —
    harmless (never surfaced: candidates come from the bucket join).
    The reverse order would leave bucket entries whose vec_ids are
    missing from ``vectors/``, and ``query_lsh_index``'s inner join
    would silently drop those candidates — silent recall loss.
    """
    (
        emb.select("vec_id", F.col("embedding").alias("e"))
        .withColumn("nrm", _vnorm("e"))
        .write.mode("append")
        .parquet(f"{index_dir}/vectors")
    )
    _bucketed(emb).write.mode("append").partitionBy("t", "bucket").parquet(
        f"{index_dir}/buckets"
    )


def compact_lsh_index(spark: SparkSession, index_dir: str) -> None:
    """Rewrite both layouts to one sorted file per partition and swap
    via rename-aside (old -> .bak, new -> old, drop .bak) so an
    interrupted compaction never destroys the only copy — the
    crash-safe swap `minhash_index.compact_minhash_index` uses."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ann_compact_", dir=index_dir)
    (
        spark.read.parquet(f"{index_dir}/buckets")
        .repartition("t", "bucket")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("t", "bucket")
        .parquet(f"{tmp}/buckets")
    )
    (
        spark.read.parquet(f"{index_dir}/vectors")
        .repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(f"{tmp}/vectors")
    )
    for layout in ("buckets", "vectors"):
        old = f"{index_dir}/{layout}"
        bak = f"{old}.bak"
        shutil.move(old, bak)
        shutil.move(f"{tmp}/{layout}", old)
        shutil.rmtree(bak)
    shutil.rmtree(tmp, ignore_errors=True)
