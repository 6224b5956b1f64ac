"""Physical-plan assertions: the scale properties the engine claims
(pushdown, pruning, broadcasts, window top-k, no cartesian products)
are verified in the optimized plans, not just asserted in docstrings."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def plan_of(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    scan = plan[plan.index("ReadSchema") :].split("\n")[0]
    # only the 7 referenced columns are read, not all 16
    assert "l_orderkey" not in scan and "l_comment" not in scan
    assert "l_quantity" in scan and "l_returnflag" in scan


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # lineitem never shuffles on join keys


def test_q5_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_regional_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # all four dims broadcast


def test_topk_uses_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_orders_per_customer")
    # rank<=3 predicate becomes a per-group top-k, not a full sort+filter
    assert "WindowGroupLimit" in plan


def test_order_limit_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "latest_events_limit")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_is_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "urgent_order_lines_semi")
    assert "LeftSemi" in plan


def test_anti_join_is_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "customers_without_recent_orders")
    assert "LeftAnti" in plan


def test_whole_stage_codegen_everywhere(spark, sf_dir):
    for name in ["q1_pricing_summary", "events_daily_rollup_two_level"]:
        plan = plan_of(spark, sf_dir, name)
        # '*(n)' marks operators fused into a WholeStageCodegen stage
        assert "*(1)" in plan and "*(2)" in plan, name


def test_lsh_band_join_is_equi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sim_ann_lsh_hyperplane")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["dedup_exact", "text_token_counts", "mm_binary_metadata"])
def test_map_side_ops_have_no_shuffle_on_fact(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    # at most the aggregate's own exchange; never a join exchange
    assert "SortMergeJoin" not in plan
