"""SQL-API parity: the same semantics through spark.sql(...) as
through the DataFrame path (SURVEY §4.2 item 4)."""

from __future__ import annotations

from mathorcup_spark import registry
from mathorcup_spark.sql import FLAGSHIP_SQL, register_sql_surface

SF_DIR = "/root/testdata/sf0.001"


def test_flagship_sql_matches_dataframe(spark):
    register_sql_surface(spark, SF_DIR)
    via_sql = spark.sql(FLAGSHIP_SQL).collect()
    via_df = registry.queries()["flagship_revenue_by_priority"](
        spark, SF_DIR
    ).collect()
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]


def test_views_cover_catalog(spark):
    register_sql_surface(spark, SF_DIR)
    for t in ("region", "lineitem", "documents", "embeddings", "events"):
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").first().n > 0


def test_sql_udf_geometry(spark):
    register_sql_surface(spark, SF_DIR)
    rows = spark.sql(
        "SELECT dims_volume('2*3*4') AS v, dims_volume('bad') AS b,"
        " dims_volume(NULL) AS n"
    ).first()
    assert rows.v == 24.0 and rows.b is None and rows.n is None
