"""SQL surface: every catalog table as a view + engine helpers as
SQL functions (SURVEY.md §4.2 item 4 — "a registered set of SQL views
+ functions so every §2 operator is runnable as spark.sql(...)").

No Catalyst extension needed: ``createOrReplaceTempView`` exposes the
tables, and the helpers below are registered with
``spark.udf.register`` only where no builtin composition exists —
they are thin, deterministic, and Arrow-free (scalar string math), so
the SQL path stays as oracle-comparable as the DataFrame path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .catalog import TABLES, load


def register_sql_surface(spark: SparkSession, sf_dir: str) -> None:
    """Expose the catalog and engine helpers to ``spark.sql``.

    After this, every §2 operator's semantics can be written as plain
    SQL over the views — e.g. the flagship query, dictionary encoding
    (window over distinct), geometry parsing (split + casts).
    """
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

    # F2 geometry: "L*W*H" -> volume, as a SQL-callable expression.
    # Registered as a Python UDF ONLY for SQL-API ergonomics; the
    # DataFrame path uses the pure-column split/cast composition in
    # functions/scalar.py (JVM-side). Not for 100 TB hot paths.
    def dims_volume(s: str | None) -> float | None:
        if not s:
            return None
        try:
            length, width, height = (float(p) for p in s.split("*"))
        except ValueError:
            return None
        return length * width * height

    spark.udf.register("dims_volume", dims_volume, "double")


FLAGSHIP_SQL = """
SELECT o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         / count(l_quantity) AS avg_qty,
       count(*) AS n_items,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
