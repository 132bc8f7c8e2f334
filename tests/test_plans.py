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


def test_decontaminate_broadcasts_benchmark_semi_join(spark):
    plan = _plan(spark, "doc_decontaminate")
    # the benchmark shingle-hash set broadcasts; the corpus side is
    # never on the build side of a shuffled join
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_sessionize_single_exchange(spark):
    plan = _plan(spark, "event_sessions_windowed")
    # both window passes share the user partitioning: exactly one
    # hash exchange in the whole plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_latc_islands_partition_by_island_key(spark):
    plan = _plan(spark, "impute_latc_mape")
    # the pandas island consumes the explicit island repartitioning;
    # no extra exchange between the spread and the applyInPandas
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_island_per_source(spark):
    plan = _plan(spark, "doc_pack_sequences")
    assert "FlatMapGroupsInPandas" in plan
    # island input projected to three narrow columns, never the text
    assert "text" not in plan


def test_bm25_is_map_only_with_broadcast_stats(spark):
    plan = _plan(spark, "doc_bm25_relevance")
    # the only join is the 1-row corpus-stats broadcast; scoring is a
    # map-only projection over the token arrays
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_dedup_joins_stay_hash_or_broadcast(spark):
    plan = _plan(spark, "doc_bloom_incremental_dedup")
    # candidate confirm + flag join: equi-joins only, no sort-merge on
    # the full batch and never a cartesian; text never reaches a join
    # (both sides carry the 64-bit hash)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_png_features_map_only_one_spread_exchange(spark):
    """media_png_features is encode->decode->sum map-only except for
    the single id-spread Exchange (spread_small_input — distributes
    the Python islands when the tiny id scan arrives as one
    partition; a no-op at real scale). Nothing else shuffles, and the
    nation scan prunes to the single key column."""
    plan = _plan(spark, "media_png_features")
    assert plan.count("Exchange") <= 1, plan
    assert "MapInPandas" in plan
    assert "struct<n_nationkey" in plan


def test_holed_overlay_broadcasts_zone_side(spark):
    """nation_holed_zone_overlay: the 2-row zone side broadcasts; the
    only hash exchanges are the pair dedup and final zone rollup."""
    plan = _plan(spark, "nation_holed_zone_overlay")
    assert "BroadcastExchange" in plan


def test_quality_classifier_map_only(spark):
    plan = _plan(spark, "doc_quality_classifier")
    # fixed-weight classifier is pure projection: only the explicit
    # small-file spread exchange, nothing induced by the operator
    assert "ENSURE_REQUIREMENTS" not in plan
    assert "BroadcastExchange" not in plan
    assert "Window" not in plan


def test_dup_spans_shuffles_hashes_not_text(spark):
    plan = _plan(spark, "doc_dup_spans", "formatted")
    # every operator-INDUCED exchange (ENSURE_REQUIREMENTS) carries
    # hashes/ids only — the text column never shuffles. (The explicit
    # REPARTITION_BY_NUM spread of the small base table is exempt: it
    # moves the raw docs by design and self-disables at real scale.)
    import re

    induced = [m.group(0) for m in re.finditer(
        r"\(\d+\) Exchange\n(?:.*\n)*?Arguments: [^\n]*", plan)
        if "ENSURE_REQUIREMENTS" in m.group(0)]
    assert induced, "expected at least the gram-hash aggregation exchange"
    for sec in induced:
        assert "text" not in sec


def test_tfidf_topk_uses_window_group_limit(spark):
    plan = _plan(spark, "doc_tfidf_topk")
    # rank<=3 must push into the shuffle as WindowGroupLimit (top-k
    # never materializes the full ranked term list per doc), and the
    # 1-row corpus count must broadcast, not shuffle the tf table
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zorder_stats_single_exchange_pruned_scan(spark):
    plan = _plan(spark, "lineitem_zorder_stats", "formatted")
    # z-value and bucket are map-side bit algebra: exactly one
    # aggregation exchange, and the scan reads only the two key
    # columns (never the wide lineitem payload)
    assert plan.count("ENSURE_REQUIREMENTS") == 1
    assert "REPARTITION" not in plan
    assert "l_comment" not in plan and "l_extendedprice" not in plan
    assert "partial_min" in plan  # map-side combine before the shuffle


def test_pseudonymize_is_map_only(spark):
    plan = _plan(spark, "event_user_pseudonymize")
    assert "ENSURE_REQUIREMENTS" not in plan
    assert "BroadcastExchange" not in plan
    assert "Window" not in plan


def test_seasonal_decompose_partitions_by_series_key(spark):
    plan = _plan(spark, "event_seasonal_decompose", "formatted")
    # every exchange keys on the series (event_type ...) — no global
    # single-partition ordering anywhere in the plan
    assert "SinglePartition" not in plan
    assert "Exchange hashpartitioning" in plan.replace("\n", " ") or \
        "hashpartitioning" in plan


def test_snapshot_diff_joins_on_id_never_text(spark):
    plan = _plan(spark, "corpus_snapshot_diff", "formatted")
    import re

    for m in re.finditer(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|"
                         r"BroadcastHashJoin)\n(?:.*\n)*?Arguments: [^\n]*",
                         plan):
        assert "text" not in m.group(0)


def test_profile_is_single_scan(spark):
    import re

    plan = _plan(spark, "orders_profile", "formatted")
    # formatted output shows each node in the tree AND the detail
    # list; count distinct detail entries "(n) Scan parquet"
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1


def test_q18_aggregates_before_join_and_topk_never_sorts(spark):
    """large_volume_customers: the per-order quantity sum must reduce
    lineitem BEFORE any join (partial agg map-side), the lineitem
    scan must read only the two needed columns, and the global
    top-100 must plan as TakeOrderedAndProject (per-partition top-k
    + k-row merge), never a total Sort."""
    plan = _plan(spark, "large_volume_customers", "simple")
    assert "TakeOrderedAndProject(limit=100" in plan, plan
    # The agg's partial pass sits in the lineitem branch, below the
    # joins: everything before the first join line must contain it.
    first_join = min(plan.find("BroadcastHashJoin") % 10**9,
                     plan.find("SortMergeJoin") % 10**9,
                     plan.find("ShuffledHashJoin") % 10**9)
    assert "partial_sum" in plan[first_join:], plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" \
        in plan, plan
    # No standalone global Sort: the only ordering operator is the
    # TakeOrderedAndProject itself.
    assert "\n   +- Sort " not in plan and "+- Sort [" not in plan, plan
