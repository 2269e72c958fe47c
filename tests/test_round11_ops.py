"""Round-11 operator contracts: the scale-dispatched SemDeDup path
(two-level assignment + Arrow BLAS pair kernel) and the sampled
Adamic-Adar estimator.

The driver rows hash-verify values against DuckDB; these tests pin
the SEMANTIC contracts — kernel == HOF bitwise on the committed
fixture, and the Horvitz-Thompson estimator's unbiasedness — that a
value hash alone would not explain.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mathorcup_spark import registry
from mathorcup_spark.catalog import load
from mathorcup_spark.functions.similarity import (
    _flat_assign,
    semantic_dedup_from,
    semdedup_k,
    semdedup_verdict_np,
    two_level_assign,
    unit_embeddings,
)
from tests.conftest import SF_DIR


def test_pair_kernel_matches_hof_pair_stage(spark):
    """semdedup_verdict_np on the flat assignment must reproduce
    semantic_dedup_from row-for-row: same earliest-dup keeper, same
    rounded cosine, NULL (not NaN) dup_cos for survivors."""
    emb = load(spark, SF_DIR, "embeddings")
    unit = unit_embeddings(emb).localCheckpoint(eager=True)
    k = semdedup_k(int(emb.count()))
    cents = unit.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("u").alias("cu")
    )
    hof = {
        r["vec_id"]: (r["cent_id"], r["is_survivor"], r["dup_of"], r["dup_cos"])
        for r in semantic_dedup_from(unit, cents).collect()
    }
    ker = {
        r["vec_id"]: (r["cent_id"], r["is_survivor"], r["dup_of"], r["dup_cos"])
        for r in semdedup_verdict_np(
            _flat_assign(unit, cents).localCheckpoint(eager=True)
        ).collect()
    }
    assert hof == ker


def test_two_level_assignment_schema_and_coverage(spark):
    """two_level_assign returns every vector exactly once with a
    valid centroid, and each assigned centroid is the exact argmax
    within the probed coarse cells (spot-checked via membership in
    the centroid set)."""
    emb = load(spark, SF_DIR, "embeddings")
    unit = unit_embeddings(emb).localCheckpoint(eager=True)
    n = int(emb.count())
    k = max(66, n // 4)  # force the two-level regime on the fixture
    cents = unit.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("u").alias("cu")
    )
    asg = two_level_assign(spark, unit, cents)
    rows = asg.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    cent_ids = set(range(k))
    assert all(r["cent_id"] in cent_ids for r in rows)


def _aa_duck(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return con


_AA_BASE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
      FROM op a JOIN op b ON a.o = b.o AND b.p > a.p),
adj AS (SELECT p1 u, p2 v FROM e UNION ALL SELECT p2, p1 FROM e),
deg AS (SELECT u, count(*) d FROM adj GROUP BY u),
tr AS (SELECT u, v FROM (
   SELECT a.u, a.v,
          row_number() OVER (PARTITION BY a.u ORDER BY dv.d, a.v) rn
   FROM adj a JOIN deg dv ON dv.u = a.v) WHERE rn <= 16),
trs AS (SELECT u, v, count(*) OVER (PARTITION BY v) t,
        row_number() OVER (PARTITION BY v ORDER BY
          md5(CAST(v AS VARCHAR) || ':' || CAST(u AS VARCHAR)), u) srn
        FROM tr),
samp AS (SELECT u, v, t, least(t, 24) s FROM trs WHERE srn <= 24)
"""


def test_sampled_adamic_adar_ht_mass_is_unbiased():
    """The Horvitz-Thompson reweighting must make the TOTAL estimated
    AA mass match the exact mass (the estimator is unbiased per pair;
    summed over every shared-neighbor stratum the relative error
    collapses — measured 1.0000 at sf0.01 and sf0.1, pinned loosely
    here at the test fixture)."""
    con = _aa_duck(SF_DIR)
    exact, est, max_t = con.execute(
        _AA_BASE
        + """
SELECT
 (SELECT sum(1.0/ln(dz.d)) FROM tr a
    JOIN tr b ON a.v = b.v AND b.u > a.u
    JOIN deg dz ON dz.u = a.v WHERE dz.d >= 2),
 (SELECT sum((CAST(a.t*(a.t-1) AS DOUBLE)/(a.s*(a.s-1)))/ln(dz.d))
    FROM samp a JOIN samp b ON a.v = b.v AND b.u > a.u
    JOIN deg dz ON dz.u = a.v WHERE dz.d >= 2 AND a.s >= 2),
 (SELECT max(t) FROM trs)
"""
    ).fetchone()
    assert max_t > 24, "fixture must make the member cap bind"
    assert 0.9 <= est / exact <= 1.1


def test_sampled_adamic_adar_join_terms_reduced():
    """The member cap must actually shrink the wedge join: capped
    Σ min(t,24)² well below the exact face's Σ t² on the fixture."""
    con = _aa_duck(SF_DIR)
    full, capped = con.execute(
        _AA_BASE
        + """
SELECT (SELECT sum(t*t) FROM (SELECT count(*) t FROM tr GROUP BY v)),
       (SELECT sum(least(t,24)*least(t,24))
          FROM (SELECT count(*) t FROM tr GROUP BY v))
"""
    ).fetchone()
    assert capped < 0.5 * full


def test_sampled_adamic_adar_runs_and_shapes(spark):
    registry._bootstrap()
    out = registry.REGISTRY["g_adamic_adar_sampled"].fn(spark, SF_DIR)
    rows = out.collect()
    assert out.columns == ["u", "v", "est_common", "aa_score"]
    assert 0 < len(rows) <= 50
    assert all(r["aa_score"] > 0 for r in rows)
    # HT weights only inflate: every estimated count is >= 1 wedge
    assert all(r["est_common"] >= 1.0 for r in rows)
