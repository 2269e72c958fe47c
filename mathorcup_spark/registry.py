"""Query registry: the engine's declared surface.

Every operator from SURVEY.md §2 that is SQL-expressible registers a
named query here together with its DuckDB oracle SQL; the driver (and
``tests/test_oracle_parity.py``) runs both on the same parquet tables
and hash-compares results. ``__spark_entry__.py`` is a thin shim over
this module.

Oracle-compatibility discipline (learned rules, applied everywhere):

- **Sum doubles through decimal.** A double sum is order-dependent, so
  Spark (32-way partial agg) and DuckDB would differ in low bits and
  the driver's value hash would flip. Casting each row to
  ``decimal(38,6)`` first makes the sum exact and order-independent
  on both engines; cast the final value back to double. Per-row
  double arithmetic (IEEE 754) is deterministic across engines, so
  derived measures like ``price * (1 - disc)`` are safe to compute in
  double *before* the decimal cast.
- **avg = decimal sum / count in double.** Both engines then perform
  the identical IEEE division.
- **Cast integer window/date extracts.** DuckDB ``year()`` /
  ``row_number()`` return BIGINT, Spark returns INT — cast both sides
  to BIGINT.
- **Integer sums:** DuckDB ``sum(BIGINT)`` is HUGEINT — cast oracle
  side to BIGINT.
- **Alias every computed column identically on both sides** (driver
  sorts columns by name before hashing).
- Timestamps: session TZ pinned UTC (see ``session.py``) so naive
  DuckDB timestamps collect identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


# --- oracle-stable aggregate helpers (Spark side) ---------------------------
#
# decimal(18,6), NOT decimal(38,6): Spark's whole-stage codegen for
# precision-38 decimal aggregates compiles pathologically slowly
# (~90s cold vs ~1s, measured on 4.1.2); 18 digits keeps per-row
# values Long-backed while the sum accumulator (decimal(28,6)) is
# still exact past 1e21 — comfortably above any 100 TB column total.
# Per-row domain limit: |value| < 1e12.

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent double sum: decimal(38,6) accumulate → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def oracle_dsum(expr: str, alias: str) -> str:
    """DuckDB fragment matching :func:`dsum`."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return (
        f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count({expr}) AS {alias}"
    )


def queries() -> dict[str, QueryFn]:
    _bootstrap()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    _bootstrap()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_booted = False


def _bootstrap() -> None:
    """Import every module that registers queries (idempotent)."""
    global _booted
    if _booted:
        return
    from .plans import queries as _  # noqa: F401  (imports populate REGISTRY)

    _booted = True
