"""Physical-plan assertions: the scale posture, made durable.

Correctness tests prove the queries compute the right answer at
sf0.001; these prove the *plans* are the ones that survive 100 TB —
broadcast where a side is small, pushdown/pruning at the scan,
whole-stage codegen in the hot path, no global single-partition sort
for top-n. A regression here is invisible to the oracle harness (the
answer stays right) but catastrophic at scale, which is why the plan
shape itself is under test.
"""

from __future__ import annotations

import pytest

from mathorcup_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = registry.queries()[name](spark, SF_DIR)
    # collect() this exact DataFrame first: with AQE the executed plan
    # is only final (re-planned joins, codegen `*(n)` markers) after
    # the plan itself has run — count() would execute a different plan
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_join_broadcasts(spark):
    plan = _plan(spark, "j_broadcast_inner")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_and_projection_reach_scan(spark):
    plan = _plan(spark, "p_project_filter")
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan schema must not include unprojected cols
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "c_comment" not in read_schema and "c_nationkey" not in read_schema


def test_flagship_filter_pushed_and_codegen(spark):
    plan = _plan(spark, "flagship_revenue_by_priority")
    # `*(n)` prefixes mark whole-stage-codegen spans in the final plan
    assert plan.count("*(") >= 3
    # the shipdate filter reaches the lineitem parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_global_topn_avoids_total_sort(spark):
    plan = _plan(spark, "p_head_slice")
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_single_shuffle_window(spark):
    """The as-of join must stay union + window — one exchange on
    user_id — and never degrade to a join with a range condition
    (BroadcastNestedLoopJoin / CartesianProduct), which is quadratic
    per key."""
    plan = _plan(spark, "j_asof_join")
    assert "Window" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_salted_join_no_nested_loop(spark):
    plan = _plan(spark, "j_salted_skew_join")
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_lsh_ann_never_cross_joins(spark):
    """The whole point of the LSH path: candidate generation is an
    equi-join on (table, bucket), never an all-pairs product."""
    plan = _plan(spark, "sim_lsh_ann")
    assert "Cartesian" not in plan


@pytest.mark.parametrize(
    "name", ["flagship_revenue_by_priority", "a_grouped_multi_agg"]
)
def test_aggregates_have_partial_stage(spark, name):
    """Map-side partial aggregation before the exchange (two
    HashAggregate levels) — the thing that keeps a 100 TB groupBy
    from shuffling raw rows."""
    plan = _plan(spark, name)
    assert plan.count("HashAggregate") >= 2
