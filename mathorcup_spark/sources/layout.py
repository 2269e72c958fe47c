"""Storage layout for the 100 TB lake: partitioned + bucketed sinks.

The reference materializes every stage to a flat xlsx file
(``src/utils.py:39,48,67,131`` — no partitioning concept at all). At
cluster scale the layout IS the optimization: a fact table bucketed
on its join key lets every future join/aggregation on that key run
with ZERO shuffle (Spark's bucketing contract: same key, same bucket
count on both sides → outputPartitioning already satisfies the
join's distribution requirement), and date-partitioned directories
give partition pruning for time-range predicates.

``tests/test_layout.py`` proves the contract: it writes two bucketed
tables and asserts the join plan contains NO Exchange operator.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str | tuple[str, ...],
    n_buckets: int,
    sort_col: str | tuple[str, ...] | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Persist ``df`` as a Parquet table bucketed on ``bucket_col``.

    ``path`` makes it an external table (data outside the warehouse
    dir); ``sort_col`` pre-sorts within buckets so sort-merge joins
    skip their sort too. Bucket count is a layout decision: pick
    ~(table size / 128 MB) rounded to a power of two, identical for
    every table sharing the join key.
    """
    bucket_cols = (bucket_col,) if isinstance(bucket_col, str) else tuple(bucket_col)
    writer = (
        df.write.mode("overwrite").format("parquet").option("path", path)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_col:
        sort_cols = (sort_col,) if isinstance(sort_col, str) else tuple(sort_col)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a previously written bucketed table (bucket metadata comes
    from the catalog, so joins can use it — ``spark.read.parquet`` on
    the raw path would lose the bucketing)."""
    return spark.table(table)


# --- build-once derived tables ----------------------------------------------
#
# Several query families re-derive the SAME expensive intermediate
# from the base tables (the co-purchase edge list behind the g_*
# graph family costs an order-key self-join + distinct + two degree
# joins, and round 8 rebuilt it independently in SEVEN queries).
# `materialize_derived` persists such a deterministic derivation ONCE
# per input fingerprint as a bucketed Parquet table and hands every
# later caller the bucketed scan — no rebuild, and self-joins /
# aggregations on the bucket column skip their Exchange entirely
# (the write_bucketed contract proven by tests/test_layout.py).
#
# Cache keying and lifetime:
# - the fingerprint hashes the resolved sf_dir path PLUS the size and
#   mtime of the fingerprint file(s), so regenerated testdata can
#   never serve a stale cache;
# - table registrations live in the session's in-memory catalog, so a
#   fresh process rebuilds (first g_* query pays once, the rest of
#   the session reads); data files live under a per-process temp dir
#   removed at exit.
# On a production lake this would be a real warehouse table refreshed
# by the ingest pipeline; the per-process temp lifetime is the local
# test analog.

_CACHE_ROOT = os.environ.get("SPARK_GRAFT_CACHE_DIR") or os.path.join(
    tempfile.gettempdir(), f"mcs_derived_{os.getpid()}"
)
_cleanup_registered = False


def default_buckets(spark: SparkSession | None = None) -> int:
    """Scale-adaptive bucket count for derived tables (guide §2.2:
    partitioning must not be a constant tuned for one deployment).

    The bucketed caches exist so the heavy self-joins (wedge
    enumeration on `oriented`/`trunc`, the banded LSH candidate
    join) run with no Exchange — but the bucket count then CAPS the
    parallelism of those joins' stages: measured round 11, the
    g_triangle_count wedge stage carried 53 s of executor CPU in 8
    tasks on 32 cores (wall ~7 s) purely because n_buckets was a
    constant 8. Locally the number tracks the core count the driver
    granted (``$SPARK_GRAFT_CPUS``, the same signal session.py
    sizes shuffle partitions with): HALF the cores, floored at 8 —
    the round-11 idle-machine A/B (3 passes each) measured 8/16/32
    buckets at 9.5/6.1/5.5 s wall for g_triangle_count and
    6.0/4.1/3.4 s for g_adamic_adar, so cores/2 captures most of
    the win, while executor CPU of these memory-bandwidth-bound
    probe joins inflates ~1.8× at 16 concurrent tasks vs ~3× at 32
    (no spill, ≤2 s GC — pure contention) and the halved task width
    leaves headroom for host-steal spikes. On a production lake the
    right number is ~(part size / 128 MB) per write_bucketed's doc —
    set ``SPARK_GRAFT_DERIVED_BUCKETS`` to pin that value. Bucket
    count is layout-only: row values, and therefore every oracle
    hash, are unchanged.

    ``spark`` (when given) supplies the live core count via
    ``sparkContext.defaultParallelism`` — correct even when the
    driver built its own session or passed ``get_spark(cpus=...)``
    without exporting ``SPARK_GRAFT_CPUS`` (ADVICE r11); the env var
    is the fallback for call sites without a session handle.
    """
    env = os.environ.get("SPARK_GRAFT_DERIVED_BUCKETS")
    if env:
        try:
            return max(1, int(env))
        except ValueError as exc:
            raise ValueError(
                "SPARK_GRAFT_DERIVED_BUCKETS must be an integer bucket "
                f"count, got {env!r}"
            ) from exc
    if spark is not None:
        return max(8, int(spark.sparkContext.defaultParallelism) // 2)
    return max(8, int(os.environ.get("SPARK_GRAFT_CPUS", "32")) // 2)


def _fingerprint(sf_dir: str, fingerprint_files: tuple[str, ...]) -> str:
    h = hashlib.md5(os.path.realpath(sf_dir).encode())
    for rel in fingerprint_files:
        p = os.path.join(sf_dir, rel)
        st = os.stat(p)
        h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:10]


def materialize_derived(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    parts: tuple[str, ...],
    builds: Callable[[], dict[str, tuple[DataFrame, str, str | None]]],
    fingerprint_files: tuple[str, ...] = ("lineitem.parquet",),
    n_buckets: int | None = None,
) -> dict[str, DataFrame]:
    """Return ``{part: bucketed DataFrame}`` for a named derivation.

    ``builds()`` is called only on a cache miss and returns
    ``{part_name: (df, bucket_col, sort_col)}`` covering exactly
    ``parts``; every part is persisted via :func:`write_bucketed`
    under one fingerprint so the parts are always mutually consistent
    (built from one pass over the same inputs). A cache hit requires
    ALL declared parts registered — a partially-written derivation is
    rebuilt, never half-served. ``n_buckets`` defaults to
    :func:`default_buckets` (scale-adaptive: granted cores locally,
    ``SPARK_GRAFT_DERIVED_BUCKETS`` = ~(part size / 128 MB) on a
    lake); pass an explicit value only when the consumer needs a
    specific layout (e.g. the 1-bucket fit tables).
    """
    global _cleanup_registered
    if n_buckets is None:
        n_buckets = default_buckets(spark)
    key = _fingerprint(sf_dir, fingerprint_files)
    tables = {p: f"mcs_{name}_{key}_{p}" for p in parts}
    if all(spark.catalog.tableExists(t) for t in tables.values()):
        return {p: spark.table(t) for p, t in tables.items()}
    built = builds()
    assert set(built) == set(parts), (
        f"builds() returned {sorted(built)}, declared {sorted(parts)}"
    )
    out: dict[str, DataFrame] = {}
    for part, (df, bucket_col, sort_col) in built.items():
        table = tables[part]
        path = os.path.join(_CACHE_ROOT, table)
        # ONE file per bucket (repartition on the bucket key into
        # n_buckets tasks). The elided operator is the EXCHANGE —
        # Spark 4 never trusts bucketed sortBy metadata at read time
        # (SPARK-28632: with multi-file buckets the claim could be
        # wrong, so it is off by default and a per-partition Sort
        # remains in merge joins); single-file buckets + sortBy still
        # buy row-group locality and the cheapest possible in-memory
        # sort (already-ordered input).
        bcols = (bucket_col,) if isinstance(bucket_col, str) else tuple(bucket_col)
        df = df.repartition(n_buckets, *[df[c] for c in bcols])
        write_bucketed(df, table, path, bucket_col, n_buckets, sort_col=sort_col)
        out[part] = spark.table(table)
    if not _cleanup_registered and not os.environ.get("SPARK_GRAFT_CACHE_DIR"):
        atexit.register(shutil.rmtree, _CACHE_ROOT, ignore_errors=True)
        _cleanup_registered = True
    return out
