"""Persisted LSH index: answers must match the inline sim_lsh_ann
query exactly, and probes must partition-prune the bucket scan."""

from __future__ import annotations

from mathorcup_spark import registry
from mathorcup_spark.catalog import load
from mathorcup_spark.sources.ann_index import query_lsh_index, write_lsh_index

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_index_matches_inline_query(spark, tmp_path):
    registry._bootstrap()
    emb = load(spark, SF_DIR, "embeddings")
    out = str(tmp_path / "lsh_index")
    write_lsh_index(emb, out)

    queries = emb.filter("vec_id < 10")
    got = query_lsh_index(spark, out, queries, k=5)
    want = registry.REGISTRY["sim_lsh_ann"].fn(spark, SF_DIR)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_probe_partition_prunes(spark, tmp_path):
    registry._bootstrap()
    emb = load(spark, SF_DIR, "embeddings")
    out = str(tmp_path / "lsh_index")
    write_lsh_index(emb, out)

    # one query vector probes at most N_TABLES buckets; the scan must
    # carry partition filters and read only those directories
    one = emb.filter("vec_id = 0")
    df = query_lsh_index(spark, out, one, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruned scan reads <= N_TABLES of the T * 2^B bucket dirs
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:  # Spark prints selected partition count in the scan node
        from mathorcup_spark.functions.similarity import N_TABLES

        assert int(m.group(1)) <= N_TABLES
