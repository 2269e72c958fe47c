"""Survivor-consistency proofs for d_semantic_dedup (judge r6 item 4).

The driver row hash-verifies values against DuckDB; these tests pin
the SEMANTIC contract of the survivor set — properties a value hash
alone would not explain to a reader.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mathorcup_spark import registry
from mathorcup_spark.functions.similarity import SEMDEDUP_TAU
from tests.conftest import SF_DIR


def _run(spark):
    registry._bootstrap()
    return registry.REGISTRY["d_semantic_dedup"].fn(spark, SF_DIR)


def test_survivor_flag_consistency(spark):
    out = _run(spark)
    rows = out.collect()
    assert len(rows) > 0
    n_dups = 0
    for r in rows:
        assert (r["is_survivor"] == 1) == (r["dup_of"] is None)
        if r["dup_of"] is not None:
            n_dups += 1
            assert r["dup_of"] < r["vec_id"], "keeper must be the earlier id"
            assert r["dup_cos"] >= SEMDEDUP_TAU
    assert n_dups > 0, "test data must contain semantic near-dups at tau"
    assert n_dups < len(rows), "not everything may collapse to one group"


def test_dup_of_is_same_cluster(spark):
    out = _run(spark)
    a = out.select("vec_id", "cent_id")
    dups = out.filter(F.col("dup_of").isNotNull()).select(
        F.col("vec_id").alias("d_id"), F.col("dup_of"), F.col("cent_id").alias("d_cent")
    )
    joined = dups.join(a, dups.dup_of == a.vec_id)
    bad = joined.filter(F.col("d_cent") != F.col("cent_id")).count()
    assert bad == 0, "a dup's keeper must live in the same semantic cluster"


def test_every_vector_classified_once(spark):
    out = _run(spark)
    from mathorcup_spark.catalog import load

    n = load(spark, SF_DIR, "embeddings").count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
