"""Physical-plan regression tests: pin the plan shapes SCALE.md
claims — predicate pushdown reaching the scan, column pruning,
broadcast dimension joins, single-shuffle window chains, map-only
codegen passes. A correctness-preserving change that silently
regresses one of these (extra Exchange, lost PushedFilters) fails
here, not in a 100 TB run."""

from __future__ import annotations

import pytest

import pudl_spark.plans.queries as q

SF = "/root/testdata/sf0.001"


def _plan(spark, name, mode="simple"):
    df = q.QUERIES[name](spark, SF)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary", "formatted")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: projection never reads the wide comment/name columns
    assert "l_comment" not in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_snowflake_join_broadcasts_dims_single_agg_shuffle(spark):
    plan = _plan(spark, "nation_revenue_by_year")
    assert plan.count("BroadcastHashJoin") >= 3   # region/nation/customer
    assert "SortMergeJoin" not in plan            # nothing data-sized shuffles to sort
    # exactly one hash-partitioned exchange: the final aggregation
    assert plan.count("Exchange hashpartitioning") == 1


def test_pii_scrub_is_map_only(spark):
    plan = _plan(spark, "doc_pii_scrub")
    # the only exchange is the explicit small-file spread
    # (REPARTITION_BY_NUM); the scrub itself forces no shuffle
    assert "ENSURE_REQUIREMENTS" not in plan
    assert "BroadcastExchange" not in plan


def test_asof_join_is_single_shuffle(spark):
    plan = _plan(spark, "purchase_asof_signup")
    # signup dedup + window both partition by the same key; the union
    # trick must not introduce a range join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_anomaly_flags_single_window_partitioning(spark):
    plan = _plan(spark, "event_anomaly_flags")
    # all three screens share the user_id partitioning: one hash
    # exchange total (the median join side broadcasts)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucket_blocked_range_join_is_equi(spark):
    plan = _plan(spark, "supplier_close_balances")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
