"""Determinism proofs for the seeded (rows-only) sampling operators.

The driver can only rows-check ``r_seeded_suite`` (seeded Spark RNG
has no cross-engine oracle), so this module supplies the missing
evidence: at a fixed seed and partition layout, every seeded member
must produce the SAME rows on repeated runs in one session — Spark's
``sample``/``randomSplit`` draw from a per-partition XORShift stream
seeded by (seed, partition id), so determinism holds as long as the
plan's partitioning is stable, which the fixed parquet layout
guarantees. A flaky value here would mean the driver's rows-only
smoke check was green while the operator silently changed output
between runs.
"""

from __future__ import annotations

import pytest

from mathorcup_spark import registry
from tests.conftest import SF_DIR

SEEDED_MEMBERS = [
    "r_exact_n_sample",
    "r_fraction_sample",
    "r_random_split_marker",
    "r_seeded_suite",
]


def _rows(spark, name):
    df = registry.queries()[name](spark, SF_DIR)
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("name", [n for n in SEEDED_MEMBERS])
def test_seeded_op_is_deterministic_across_runs(spark, name):
    qs = registry.queries()
    if name not in qs:
        pytest.skip(f"{name} not registered")
    first = _rows(spark, name)
    second = _rows(spark, name)
    assert len(first) > 0, f"{name} returned 0 rows (driver smoke would fail)"
    assert first == second, f"{name} is not run-to-run deterministic"
