"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator query (SURVEY.md §2 coverage) as a
callable (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the driver's differential correctness check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pudl_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# STANDING RULE (VERDICT r4 "Next round" #2): any query whose
# implementation OR oracle changed during a round goes at the HEAD of
# the next round's driver prefix so its certification never goes
# stale. Builders list the touched names here each round; the
# import-time check (and tests/test_entry.py) enforces that every one
# of them sits inside the 50-slot driver prefix.
_TOUCHED_THIS_ROUND = [
    # r8: IVF store grows its {table}_seeds SIDECAR (VERDICT r7 #1):
    # build persists (seed_id, seed_vec, seed_nrm, ccell); the probe
    # reads it instead of rescanning the corpus-sized store, and
    # pushes the probed cell ids into the store scan as an In()
    # filter. The shared seed-cell fold moved to seed_cells() —
    # every ivf_partitioned_argmax caller re-certifies.
    "ann_ivf_store_probe", "ivf_store_cell_stats",
    "embedding_semantic_dedup", "embedding_ivf_clusters",
    # r8: _cluster_block's cosine now replays the SQL fold order
    # exactly (dimension-wise accumulate, no BLAS reassociation/FMA
    # — ADVICE r7 ulp hazard); both blocked-cluster queries
    # re-certify (embedding_ivf_clusters doubly touched above)
    "embedding_blocked_clusters",
    # r8: n_users routed through salted_distinct_count — exact
    # distinct via (key,value) dedupe + count, NO set
    # materialization in any aggregation buffer (VERDICT r7 #2)
    "salted_event_type_totals",
    # r8: decode_avi_frames returns (frame_no, frame) pairs so a
    # leading dropped-frame placeholder can't shift every later
    # frame's label (ADVICE r7); extract_video_frames consumes the
    # true positions
    "media_avi_frames", "media_video_frames",
    # r8: LSH store increment certified at jaccard >= 0.8 in BOTH
    # query and oracle — the threshold the 16x4 banding argument
    # actually covers (ADVICE r7 medium)
    "doc_lsh_store_increment",
    # r8: bottomk_sample gained the max_strata driver-cardinality
    # guard (ADVICE r7 / VERDICT r7 #7)
    "doc_bottomk_sample",
    # r8: NEW query — the BPE APPLY leg driver-certified against a
    # fixed literal merge table (VERDICT r7 #3: train stays
    # rows-only, apply is map-only and SQL-replayable)
    "doc_apply_bpe",
    # r8: NEW queries — prefix-filter similarity join (SSJoin/
    # PPJoin: deterministically COMPLETE candidates, the exact
    # complement to probabilistic LSH banding, same definitional
    # oracle), rendezvous/HRW sharding (minimal-movement shard
    # assignment, map-only md5 argmax), and the TPC-H Q18 shape
    # (aggregate-then-join + TakeOrderedAndProject top-k)
    "doc_prefix_filter_dup_pairs", "doc_rendezvous_shards",
    "large_volume_customers",
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 7

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- ALL 36 queries whose latest green driver row is still
    #    round 4 (VERDICT r7 next-round #3: after this round the
    #    oldest certification anywhere is r5 and the rolling window
    #    is steady-state at <= 3 rounds' age). Alphabetical;
    #    computed from CORRECTNESS_r01..r07 latest-green rows. --
    "doc_token_budget", "event_anomalous_regions",
    "event_anomaly_flags", "event_bad_days", "event_local_outliers",
    "event_sessions_cc", "event_user_kmv_distinct",
    "event_value_quartiles", "events_to_utc", "exact_dedup_docs",
    "fill_monthly_revenue_gaps", "harvest_report_consistency",
    "harvest_user_profile", "jw_part_name_similarity",
    "monthly_orders_densified", "nation_revenue_by_year",
    "nations_with_both_roles", "order_price_screens",
    "order_year_fragments", "pricing_summary",
    "rolling_monthly_revenue", "rollup_revenue",
    "scale_by_ownership_suppliers", "snake_cased_part_types",
    "supplier_address_parse", "supplier_code_cleanup",
    "supplier_nation_codes", "supplier_overlap_union_area",
    "table_row_counts", "top_revenue_orders",
    "user_event_source_label", "user_latest_good_value",
    "user_ramp_extremes", "user_stable_load_bin",
    "weighted_avg_price", "weighted_median_quantity",
    # -- The 44 r5-certified rows lead the r9 re-cert queue (from
    #    `clean_customer_names` alphabetically): the three late-r8
    #    queries displaced the r5 head this round. --
]


def validate_recertification(touched: list[str],
                             priority: list[str]) -> None:
    """Raise unless every touched/new query sits in the 50-slot
    driver prefix — the standing re-certification rule."""
    out = [n for n in touched if n not in priority[:50]]
    if out:
        raise AssertionError(
            f"touched queries outside the 50-slot driver prefix: {out}")


# A typo or a renamed query must fail loudly at import time, not
# silently demote the entry out of the evidence-dense prefix
# (ADVICE r2); tests/test_entry.py re-asserts this plus the
# README-count invariant.
_missing = [n for n in _PRIORITY if n not in QUERIES]
if _missing:
    raise AssertionError(
        f"_PRIORITY names not in QUERIES registry: {_missing}")
validate_recertification(_TOUCHED_THIS_ROUND, _PRIORITY)


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _PRIORITY if n in src}
    out.update((n, v) for n, v in src.items() if n not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
