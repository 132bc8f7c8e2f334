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
    # r7: extract_video_frames/decode_avi_frames now REALLY skip
    # non-sampled AVI frame decodes via the chunk walk (VERDICT r6
    # #1 — the r6 ledger claimed this early and the round never got
    # back to it; landed this round with decode-count + corrupt-
    # frame pins in tests/test_avi.py)
    "media_avi_frames", "media_video_frames",
    # r7: SemDeDup made TOTAL (ADVICE r6): unassigned vectors now
    # left-join back with NULL cluster / is_kept=true — impl AND
    # oracle changed
    "embedding_semantic_dedup",
    # r7: NEW queries — footer-stats pushdown + observe counters
    # driver-certified (VERDICT r5 #6 / r6 next-round #5)
    "scan_stats_orders", "orders_observed_counts",
    # r7: NEW query — IVF-cell-blocked clustering (VERDICT r6
    # next-round #8): ivf_partitioned_argmax becomes the shared
    # assignment primitive for the whole embedding family
    "embedding_ivf_clusters",
    # r7: NEW query — persisted cell-bucketed IVF store with
    # Exchange-free cell-keyed reads (the layout the argmax
    # docstring promised)
    "ivf_store_cell_stats",
    # r7: NEW queries — histogram-guided exact quantiles (no total
    # sort) and exact per-stratum bottom-k hash sampling (prefilter
    # + exactness guard; functions/sampling.py)
    "lineitem_exact_quantiles", "doc_bottomk_sample",
    # r7: NEW query — persisted incremental LSH near-dup index
    # (build_lsh_store/lsh_store_probe); the shared oph_banded/
    # shingle_hash_sets/verified_jaccard_pairs extraction also
    # touches the one-shot miner's callers, re-certified here
    # (minhash_dedup_clusters already sits in the r3 block below)
    "doc_lsh_store_increment", "minhash_near_dup_pairs",
    "doc_leakage_safe_split",
    # r7: NEW query — ANN top-k served from the persisted IVF store
    # (ivf_store_topk; the centroid machinery it shares with
    # ivf_partitioned_argmax was extracted to centroid_array/
    # _topn_centroid_fold — the three argmax-backed queries above
    # are already in this touched list)
    "ann_ivf_store_probe",
    # r7: NEW query — TPC-H Q21-shaped EXISTS/NOT-EXISTS pair
    # rewritten as one grouped pass (plan pinned)
    "suppliers_kept_waiting",
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 6

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- ALL 23 queries whose latest green driver row is round 3:
    #    the alphabetical r3 tail rolled from the r6 prefix
    #    (VERDICT r6 "Next round" #2). After round 7 no registered
    #    query's latest driver row predates round 4. --
    "excel_roundtrip_nation", "fs_linkage_trained",
    "hourly_wide_melt_roundtrip", "imputation_mape_score",
    "impute_event_values", "impute_latc_tubal_mape",
    "lineitem_multiheader_stack", "lineitem_zorder_stats",
    "linkage_best_match", "minhash_dedup_clusters",
    "nation_holed_zone_overlay", "nation_multipart_explode",
    "ngram_jaccard_dup_pairs", "orders_profile",
    "part_name_levenshtein_pairs", "pipeline_nation_summary",
    "region_revenue_allocation", "signup_conversion_funnel",
    "simhash_near_dup_pairs", "sql_interface_nation_revenue",
    "supplier_close_balances", "supplier_customer_pagerank",
    "supplier_territory_area",
    # -- remaining slots: the oldest round-4 certifications
    #    (alphabetical; 50 r4 rows total — the remaining 37 roll to
    #    round 8: `events_to_utc`/`event_value_quartiles` displaced
    #    by embedding_ivf_clusters + ivf_store_cell_stats, then
    #    `event_sessions_cc`/`event_user_kmv_distinct` by
    #    lineitem_exact_quantiles + doc_bottomk_sample, then
    #    `event_anomaly_flags`/`event_bad_days`/
    #    `event_local_outliers` by the LSH-store block, then
    #    `event_anomalous_regions`/`doc_token_budget` by
    #    ann_ivf_store_probe + suppliers_kept_waiting). New queries
    #    added during the round displace from the END of this block;
    #    displaced names stay r4-certified and lead the r8 re-cert
    #    queue. --
    "allocate_order_total", "ann_cosine_topk",
    "annual_nations_complete_months", "calc_reconcile_orders",
    "correct_quantity_units", "customer_intkey_sentinel",
    "customer_parts_true_gran", "customer_phone_standardized",
    "customer_unique_priority", "date_merge_month",
    "doc_fingerprints_fast", "doc_shingle_stats",
    "doc_stratified_sample",
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
