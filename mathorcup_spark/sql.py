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
    # A SQL-body function, NOT a Python UDF: the body inlines into the
    # caller's plan as JVM column expressions (split/try_cast), so it
    # stays inside whole-stage codegen and is safe in 100 TB hot
    # paths — same semantics as the DataFrame path in
    # functions/scalar.py (NULL on null/malformed input).
    spark.sql(
        r"""
        CREATE OR REPLACE TEMPORARY FUNCTION dims_volume(s STRING)
        RETURNS DOUBLE
        RETURN TRY_CAST(get(split(s, '\\*'), 0) AS DOUBLE)
             * TRY_CAST(get(split(s, '\\*'), 1) AS DOUBLE)
             * TRY_CAST(get(split(s, '\\*'), 2) AS DOUBLE)
        """
    )


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
