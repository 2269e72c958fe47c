"""Composed verification suites (driver-evidence consolidation).

The correctness driver verifies a bounded prefix of the query
registry (50 entries in round 1), so fine-grained single-operator
queries compete for slots. Each suite below UNIONs the *actual
output rows* of several registered operators into one common typed
schema, and its oracle is built by wrapping each operator's existing
DuckDB oracle with the identical column remap — one driver row then
hash-verifies every underlying operator's full result set.

The fine-grained queries stay registered (they are the user-facing
API and remain covered by ``tests/test_oracle_parity.py``); the
suites exist so every SURVEY.md §2 operator lands hard driver
evidence each round. COVERAGE.md §evidence maps operator → suite.

Scale posture: a suite is a UNION ALL of its member plans — Spark
executes the members independently (no added shuffle, no barrier);
the union is concatenation, so the suite costs exactly the sum of
its members.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import REGISTRY, register
from . import relational as R
from . import sampling as S
from . import temporal as TP
from ..streaming import windows as STW

# slot name -> (spark cast type, duckdb cast type)
_TYPES = {
    "long": ("long", "BIGINT"),
    "string": ("string", "VARCHAR"),
    "double": ("double", "DOUBLE"),
    "timestamp": ("timestamp", "TIMESTAMP"),
}


def _remap_df(df: DataFrame, op: str, schema: list[tuple[str, str]],
              slots: dict[str, str | Column]) -> DataFrame:
    """Project ``df`` into the suite's common schema with an op tag."""
    cols: list[Column] = [F.lit(op).alias("op")]
    for name, typ in schema:
        src = slots.get(name)
        if src is None:
            col = F.lit(None)
        elif isinstance(src, Column):
            col = src
        else:
            col = F.expr(src)
        cols.append(col.cast(_TYPES[typ][0]).alias(name))
    return df.select(*cols)


def _remap_sql(inner_sql: str, op: str, schema: list[tuple[str, str]],
               slots: dict[str, str]) -> str:
    parts = [f"'{op}' AS op"]
    for name, typ in schema:
        src = slots.get(name, "NULL")
        parts.append(f"CAST({src} AS {_TYPES[typ][1]}) AS {name}")
    return f"SELECT {', '.join(parts)} FROM (\n{inner_sql}\n) _sub"


def _oracle_of(name: str) -> str:
    sql = REGISTRY[name].oracle
    assert sql is not None, f"{name} has no oracle to compose"
    return sql


def _suite(schema: list[tuple[str, str]],
           members: list[tuple[str, str, dict[str, str]]]):
    """(oracle_sql, spark_fn) for a suite over registered members.

    ``members``: (op_tag, registered_query_name, slot mapping). The
    slot mapping is shared between the Spark remap and the SQL remap,
    so any expression used must parse identically on both engines
    (column names, concat, cast(x as string) — all aligned aliases).
    """
    oracle = "\nUNION ALL\n".join(
        _remap_sql(_oracle_of(qname), op, schema, slots)
        for op, qname, slots in members
    )

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = None
        for op, qname, slots in members:
            piece = _remap_df(REGISTRY[qname].fn(spark, sf_dir), op, schema, slots)
            out = piece if out is None else out.unionByName(piece)
        assert out is not None
        return out

    return oracle, fn


# ---------------------------------------------------------------------------
# §2.2 projections / filters / slices — P1-P8 in one driver row
# ---------------------------------------------------------------------------

_PROJ_SCHEMA = [("id1", "long"), ("id2", "long"), ("str1", "string"),
                ("num1", "double")]
_proj_oracle, _proj_fn = _suite(
    _PROJ_SCHEMA,
    [
        ("project_filter", "p_project_filter",
         {"id1": "c_custkey", "str1": "c_name", "num1": "c_acctbal"}),
        ("rename_all", "p_rename_all",
         {"id1": "region_id", "str1": "region_name"}),
        ("drop_columns", "p_drop_columns",
         {"id1": "p_partkey", "str1": "p_brand", "num1": "p_size"}),
        ("head_slice", "p_head_slice",
         {"id1": "o_orderkey", "num1": "o_totalprice"}),
        ("tail_slice", "p_tail_slice",
         {"id1": "o_orderkey", "num1": "o_totalprice"}),
        ("threshold", "p_threshold_indicator",
         {"id1": "l_orderkey", "id2": "l_linenumber", "num1": "low_discount"}),
    ],
)


@register(
    "rel_projection_suite",
    oracle=_proj_oracle,
    doc="P1-P8 composed: rename-all (P1), drop (P2), projection + "
    "eq/null filters (P3-P6), ordered head and anti-join tail slices "
    "(P7), threshold indicator (P8) — the full output rows of each "
    "member operator union-tagged into one hash-verified result "
    "(reference src/utils.py:37-254, src/data.py:9-11).",
    tags=("P1", "P2", "P3", "P4", "P5", "P6", "P7", "P8", "suite"),
)
def rel_projection_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _proj_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.3 joins — J1-J5 + lookup-encode in one driver row
# ---------------------------------------------------------------------------

_JOIN_SCHEMA = [("id1", "long"), ("id2", "long"), ("str1", "string"),
                ("str2", "string"), ("str3", "string"), ("num1", "double")]
_join_oracle, _join_fn = _suite(
    _JOIN_SCHEMA,
    [
        ("broadcast_inner", "j_broadcast_inner",
         {"id1": "c_custkey", "str1": "c_name", "str2": "n_name",
          "str3": "r_name"}),
        ("filtered_inner", "j_filtered_inner",
         {"id1": "o_orderkey", "str1": "c_name", "num1": "o_totalprice"}),
        ("left_outer", "j_left_outer",
         {"id1": "c_custkey", "id2": "o_orderkey"}),
        ("semi", "j_semi", {"id1": "c_custkey", "str1": "c_name"}),
        ("anti", "j_anti", {"id1": "c_custkey", "str1": "c_name"}),
        ("lookup_encode", "j_lookup_encode",
         {"id1": "p_partkey", "id2": "brand_id"}),
    ],
)


@register(
    "rel_join_suite",
    oracle=_join_oracle,
    doc="J1-J5 composed: broadcast inner (J1/J3), filtered inner (J2), "
    "left outer, semi (EXISTS), anti (J5/U2), dictionary lookup-encode "
    "(J4/E1/E2/F11) — full member outputs in one union "
    "(reference src/utils.py:241-290, src/data.py:131-182).",
    tags=("J1", "J2", "J3", "J4", "J5", "F11", "suite"),
)
def rel_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _join_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.4 core aggregations — A1/A2/A5-A8/A16 in one driver row
# ---------------------------------------------------------------------------

_AGG_SCHEMA = [("k1", "string"), ("k2", "string"), ("n", "long"),
               ("num1", "double")]

_STATS = [("mean", "mean_acctbal"), ("min", "min_acctbal"),
          ("max", "max_acctbal"), ("std", "std_acctbal")]
_MEASURES = ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
             "avg_qty", "avg_price", "avg_disc", "count_order"]


def _col_stats_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a_column_stats unpivoted to (k1=stat, num1=value, n)."""
    stack = ", ".join(f"'{s}', {c}" for s, c in _STATS)
    return R.a_column_stats(spark, sf_dir).select(
        F.expr(f"stack({len(_STATS)}, {stack}) as (k1, num1)"), F.col("n")
    )


_COL_STATS_LONG_SQL = (
    f"WITH s AS ({_oracle_of('a_column_stats')})\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{s}' AS k1, {c} AS num1, n FROM s" for s, c in _STATS
    )
)


def _grouped_multi_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a_grouped_multi_agg unpivoted: one row per (group, measure)."""
    stack = ", ".join(
        f"'{m}', " + (f"cast({m} as double)" if m == "count_order" else m)
        for m in _MEASURES
    )
    return (
        R.a_grouped_multi_agg(spark, sf_dir)
        .select(
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus"),
            F.expr(f"stack({len(_MEASURES)}, {stack}) as (m, num1)"),
        )
        .select("k1", F.concat_ws(":", "l_linestatus", "m").alias("k2"), "num1")
    )


_GROUPED_MULTI_LONG_SQL = (
    f"WITH g AS ({_oracle_of('a_grouped_multi_agg')})\n"
    "SELECT k1, l_linestatus || ':' || m AS k2, num1 FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT l_returnflag AS k1, l_linestatus, '{m}' AS m, "
        + ("CAST(count_order AS DOUBLE)" if m == "count_order" else m)
        + " AS num1 FROM g"
        for m in _MEASURES
    )
    + "\n) _m"
)

_agg_members_oracle = "\nUNION ALL\n".join(
    [
        _remap_sql(_COL_STATS_LONG_SQL, "col_stats", _AGG_SCHEMA,
                   {"k1": "k1", "n": "n", "num1": "num1"}),
        _remap_sql(_oracle_of("a_distinct_union_domain"), "domain",
                   _AGG_SCHEMA, {"k1": "nationkey"}),
        _remap_sql(_oracle_of("a_dedup_rows"), "dedup_rows", _AGG_SCHEMA,
                   {"n": "l_orderkey", "k1": "l_returnflag",
                    "k2": "l_linestatus"}),
        _remap_sql(_oracle_of("a_histogram"), "histogram", _AGG_SCHEMA,
                   {"k1": "bin", "n": "n"}),
        _remap_sql(_oracle_of("a_group_degree_norm"), "degree_norm",
                   _AGG_SCHEMA,
                   {"k1": "l_partkey", "k2": "l_returnflag", "n": "deg",
                    "num1": "norm"}),
        _remap_sql(_GROUPED_MULTI_LONG_SQL, "grouped_multi", _AGG_SCHEMA,
                   {"k1": "k1", "k2": "k2", "num1": "num1"}),
    ]
)


@register(
    "rel_agg_suite",
    oracle=_agg_members_oracle,
    doc="A1/A2/A5-A8/A16 composed: one-scan column stats "
    "(mean/std/min/max/count, unpivoted), distinct union domain "
    "(A5/U1), row dedup (A6), 40-bin histogram (A7), group degree "
    "norm (A8/G2), and the 8-aggregate grouped pass (TPC-H Q1 shape, "
    "unpivoted) — each member's full result hash-verified "
    "(reference src/data.py:108-125, src/utils.py:76-83, "
    "preprocess.py:135-160, src/graph.py:30-43).",
    tags=("A1", "A2", "A5", "A6", "A7", "A8", "A16", "suite"),
)
def rel_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    pieces = [
        _remap_df(_col_stats_long(spark, sf_dir), "col_stats", _AGG_SCHEMA,
                  {"k1": "k1", "n": "n", "num1": "num1"}),
        _remap_df(R.a_distinct_union_domain(spark, sf_dir), "domain",
                  _AGG_SCHEMA, {"k1": "nationkey"}),
        _remap_df(R.a_dedup_rows(spark, sf_dir), "dedup_rows", _AGG_SCHEMA,
                  {"n": "l_orderkey", "k1": "l_returnflag",
                   "k2": "l_linestatus"}),
        _remap_df(R.a_histogram(spark, sf_dir), "histogram", _AGG_SCHEMA,
                  {"k1": "bin", "n": "n"}),
        _remap_df(R.a_group_degree_norm(spark, sf_dir), "degree_norm",
                  _AGG_SCHEMA,
                  {"k1": "l_partkey", "k2": "l_returnflag", "n": "deg",
                   "num1": "norm"}),
        _remap_df(_grouped_multi_long(spark, sf_dir), "grouped_multi",
                  _AGG_SCHEMA, {"k1": "k1", "k2": "k2", "num1": "num1"}),
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# §2.5 windows — W1-W3 + lag/lead in one driver row
# ---------------------------------------------------------------------------

_WIN_SCHEMA = [("id1", "long"), ("id2", "long"), ("n", "long"),
               ("num1", "double"), ("num2", "double")]
_win_oracle, _win_fn = _suite(
    _WIN_SCHEMA,
    [
        ("rank_per_group", "w_rank_per_group",
         {"id1": "o_custkey", "id2": "o_orderkey", "n": "rnk"}),
        ("topk_per_group", "w_topk_per_group",
         {"id1": "o_custkey", "id2": "o_orderkey", "num1": "o_totalprice"}),
        ("argmax_per_row", "w_argmax_per_row",
         {"id1": "vec_id", "id2": "argmax_class", "num1": "max_score"}),
        ("running_agg", "w_running_agg",
         {"id1": "user_id", "id2": "event_id", "num1": "best_so_far",
          "num2": "running_sum"}),
        ("lag_gap", "w_lag_gap",
         {"id1": "event_id", "id2": "user_id", "n": "gap_us",
          "num1": "next_gap_us"}),
    ],
)


@register(
    "rel_window_suite",
    oracle=_win_oracle,
    doc="W1-W3 + lag/lead composed: per-group rank (W1), top-k per "
    "group (W2/W4), per-row argmax (W2), running max + exact running "
    "sum (W3), inter-event lag/lead gaps — full member outputs "
    "(reference src/evaluate.py:105-109,237-247, preprocess.py:67-78).",
    tags=("W1", "W2", "W3", "W4", "suite"),
)
def rel_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _win_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.6 set ops — U1-U4 in one driver row
# ---------------------------------------------------------------------------

_SET_SCHEMA = [("id1", "long"), ("id2", "long"), ("num1", "double")]
_set_oracle, _set_fn = _suite(
    _SET_SCHEMA,
    [
        ("union_all", "u_union_all",
         {"id1": "nationkey", "num1": "acctbal"}),
        ("except", "u_except", {"id1": "o_custkey"}),
        ("intersect", "u_intersect", {"id1": "nationkey"}),
        ("bidirectional", "u_bidirectional_edges",
         {"id1": "src", "id2": "dst"}),
    ],
)


@register(
    "rel_setops_suite",
    oracle=_set_oracle,
    doc="U1-U4 composed: union-all concat (U3), except-distinct (U2), "
    "intersect, bidirectional edge mirror (U4/G3) — full member "
    "outputs (reference src/utils.py:248,279, src/graph.py:51-53, "
    "src/evaluate.py:133-136).",
    tags=("U1", "U2", "U3", "U4", "G3", "suite"),
)
def rel_setops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _set_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# Multi-dimensional aggregates — ROLLUP + CUBE in one driver row
# ---------------------------------------------------------------------------

_GS_SCHEMA = [("k1", "string"), ("k2", "string"), ("gid", "long"),
              ("n_rows", "long"), ("total_price", "double")]
_gs_oracle, _gs_fn = _suite(
    _GS_SCHEMA,
    [
        ("rollup", "a_rollup_subtotals",
         {"k1": "o_orderpriority", "k2": "o_orderstatus", "gid": "gid",
          "n_rows": "n_orders", "total_price": "total_price"}),
        ("cube", "a_cube_all_combos",
         {"k1": "o_orderstatus", "k2": "order_year", "gid": "gid",
          "n_rows": "n_orders", "total_price": "total_price"}),
    ],
)


@register(
    "a_grouping_sets",
    oracle=_gs_oracle,
    doc="ROLLUP (hierarchy subtotals) + CUBE (all grouping combos) "
    "composed — every grouping-set row of both members, GROUPING() "
    "ids disambiguating subtotal rows from genuine NULL keys. Single "
    "shuffle per member (map-side grouping-set expansion).",
    tags=("rollup", "cube", "suite"),
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gs_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.9 sampling — deterministic members (oracle) + seeded members
# (rows-only) in two driver rows
# ---------------------------------------------------------------------------

_RDET_SCHEMA = [("id1", "long"), ("id2", "long"), ("id3", "long"),
                ("id4", "long"), ("str1", "string"), ("num1", "double")]
_rdet_oracle, _rdet_fn = _suite(
    _RDET_SCHEMA,
    [
        ("ordered_split", "r_ordered_split_train",
         {"id1": "o_orderkey", "num1": "o_totalprice"}),
        ("negative_sampling", "r_negative_sampling",
         {"id1": "head", "str1": "rel", "id2": "tail", "id3": "label"}),
        ("subgraph_relabel", "r_subgraph_relabel",
         {"id1": "src", "id2": "dst", "id3": "src_local",
          "id4": "dst_local"}),
    ],
)


@register(
    "r_deterministic_suite",
    oracle=_rdet_oracle,
    doc="Deterministic sampling ops composed: ordered 70/30 split (R2, "
    "distributed rank), hash-corrupt negative sampling (R4), subgraph "
    "compact relabel (R5) — full member outputs "
    "(reference src/samples.py:19-47,106-117).",
    tags=("R2", "R4", "R5", "suite"),
)
def r_deterministic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rdet_fn(spark, sf_dir)


@register(
    "r_seeded_suite",
    oracle=None,  # seeded Spark RNG has no cross-engine oracle
    doc="Seeded sampling ops composed (rows-only): exact-n sample "
    "count (R3), Bernoulli fraction sample count (R3), seeded split "
    "marker counts per side (R1/R6/R7). Counts are stable per "
    "(seed, partition layout); per-op determinism is pinned in "
    "tests/test_properties.py.",
    tags=("R1", "R3", "R6", "R7", "suite"),
)
def r_seeded_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = (
        S.r_exact_n_sample(spark, sf_dir)
        .agg(F.count("*").alias("n"))
        .select(F.lit("exact_n").alias("op"), F.col("n").cast("long"))
    )
    frac = (
        S.r_fraction_sample(spark, sf_dir)
        .agg(F.count("*").alias("n"))
        .select(F.lit("fraction").alias("op"), F.col("n").cast("long"))
    )
    marker = (
        S.r_random_split_marker(spark, sf_dir)
        .groupBy("is_train")
        .agg(F.count("*").alias("n"))
        .select(
            F.concat(F.lit("split_"), F.col("is_train").cast("string")).alias("op"),
            F.col("n").cast("long"),
        )
    )
    return exact.unionByName(frac).unionByName(marker)


# ---------------------------------------------------------------------------
# §2.12 streaming aggregations (batch face) — one driver row
# ---------------------------------------------------------------------------

_ST_SCHEMA = [("key", "string"), ("ts1", "timestamp"), ("ts2", "timestamp"),
              ("n", "long"), ("num1", "double")]
_st_oracle, _st_fn = _suite(
    _ST_SCHEMA,
    [
        ("tumbling", "st_tumbling_window",
         {"key": "event_type", "ts1": "win_start", "ts2": "win_end",
          "n": "n", "num1": "total"}),
        ("sliding", "st_sliding_window", {"ts1": "win_start", "n": "n"}),
        ("session", "st_session_window",
         {"key": "user_id", "ts1": "sess_start", "ts2": "sess_end",
          "n": "n_events", "num1": "session_value"}),
        ("earliest_dedup", "st_earliest_dedup",
         {"key": "concat(cast(user_id as string), ':', event_type)",
          "ts1": "first_ts", "n": "n_dups"}),
    ],
)


@register(
    "st_batch_semantics_suite",
    oracle=_st_oracle,
    doc="§2.12 streaming aggregation semantics, batch face, composed: "
    "tumbling window, sliding window, session window "
    "(gaps-and-islands oracle), earliest-event dedup — the same "
    "aggregation builders run under readStream + watermark in "
    "tests/test_streaming.py; this row hash-verifies their window "
    "arithmetic end to end.",
    tags=("streaming", "suite"),
)
def st_batch_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _st_fn(spark, sf_dir)


# keep linters honest about the re-exported modules used in mappings
_ = (TP, STW)
