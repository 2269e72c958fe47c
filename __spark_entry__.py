"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mathorcup_spark.registry``: every operator from
SURVEY.md §2 registers a named query + DuckDB oracle there; this file
just exposes the three driver hooks.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mathorcup_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["flagship_revenue_by_priority"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver surface: exactly 50 queries covering every SURVEY.md §2
    operator (composed per-family suites + flagship + specialty ops +
    all 22 TPC-H shapes). The full fine-grained registry stays the
    user-facing API (``mathorcup_spark.registry.queries()``), verified
    by tests/test_oracle_parity.py; COVERAGE.md maps operator → query.
    """
    return registry.driver_surface()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (rows-only checks omitted)."""
    return registry.driver_oracles()
