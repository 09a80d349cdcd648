"""Physical-plan regression guards: the scale properties SCALE.md claims
must stay true as queries evolve (broadcast-only dim joins, pushdown,
top-k without global sort)."""

from __future__ import annotations

import pytest

from etl_pipeline_mini_project_01_spark.plans.registry import (
    QUERIES,
    load_all_plans,
)

load_all_plans()

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_all_broadcast(spark):
    plan = _plan(spark, "j7_star_join_region_revenue")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan
    # column pruning: l_orderkey is not needed and must not be read
    scan = plan.split("FileScan parquet")[1].split("\n")[0]
    assert "l_orderkey" not in scan


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "g7_viral_content")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_band_join_broadcast_not_cartesian(spark):
    plan = _plan(spark, "j3_band_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_fact_dim_lookup_no_fact_shuffle(spark):
    plan = _plan(spark, "j2_dimension_lookup")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


@pytest.mark.parametrize("name", ["g1_daily_engagement_summary",
                                  "q1_pricing_summary"])
def test_aggregates_are_partial_final(spark, name):
    plan = _plan(spark, name)
    assert "partial_" in plan  # map-side combine present
