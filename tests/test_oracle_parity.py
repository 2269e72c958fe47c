"""Generic oracle-parity harness: every registered query with an
oracle runs on Spark AND DuckDB at sf0.001 and must match on row
count, column names, and (order-insensitively, doubles rounded to
1e-9) values — mirroring the driver's CORRECTNESS check.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mathorcup_spark import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def _params():
    registry._bootstrap()
    return [q.name for q in registry.REGISTRY.values() if q.oracle is not None]


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, duck, name):
    q = registry.REGISTRY[name]
    sdf = q.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _norm_rows(scols, srows) == _norm_rows(dcols, drows), f"{name}: values differ"


def test_all_oracle_keys_have_queries():
    assert set(registry.oracles()) <= set(registry.queries())


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


def test_driver_surface():
    """The driver verifies a bounded set of queries (50 in round 1):
    the surface exposed via __spark_entry__ must be exactly the 50
    DRIVER_SURFACE names, registered, deduplicated, leading the full
    registry ordering, and with ZERO rows-only queries: round 7
    oracle-ized the last three (r_seeded_suite via per-SF pinned
    sample checksums, ml_pipeline_suite via metric-floor check rows,
    ml_kmeans_ivf_ann via recall-floor check rows), each with a
    DuckDB oracle that re-derives the check key counts independently
    and pins the ok flags — the full 50-row driver surface is
    hash-verified."""
    surface = registry.driver_surface()
    assert len(surface) == 50
    assert tuple(surface) == registry.DRIVER_SURFACE
    qs = list(registry.queries())
    assert len(qs) == len(set(qs))
    assert tuple(qs[: len(registry.DRIVER_SURFACE)]) == registry.DRIVER_SURFACE
    ors = registry.driver_oracles()
    rows_only = [q for q in registry.DRIVER_SURFACE if q not in ors]
    assert rows_only == []
