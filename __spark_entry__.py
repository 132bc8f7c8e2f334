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
    # r12: NEW queries — the three r11-staged registrations land
    # (VERDICT r11 #1): redelivery convergence of both idempotent
    # appends (`doc_lsh_store_redelivery`, `ivf_store_redelivery` —
    # hash-grade evidence that re-applying an identical batch leaves
    # a store serving byte-identically to a single append) and the
    # streaming LSH loop's end-to-end pairs-sink certification
    # (`doc_lsh_stream_pairs` — the r11 flagship streaming work,
    # previously pytest-parity only).
    "doc_lsh_store_redelivery", "ivf_store_redelivery",
    "doc_lsh_stream_pairs",
    # r12: both samplers re-certify — bottomk_sample and
    # weighted_bottomk_sample now run through the ONE
    # `stratified_threshold_sample` scaffold (VERDICT r11 #2, the
    # r9-scheduled unification; brute-force regression pin in
    # tests/test_r13_queue.py).
    "doc_bottomk_sample", "doc_weighted_sample",
    # r12: the minhash family re-certifies — minhash_candidate_pairs
    # now shingles the corpus ONCE (sets checkpointed, band keys via
    # dedup.oph_banded_from_sets — byte-identical by construction,
    # tripwire-pinned; same-session A/B faster at both scales, see
    # SCALE.md r12 notes). oph_banded itself is untouched, so no
    # LSH-store row is re-touched by this half of the swap. The
    # FULL transitive caller set is three queries (r12 review):
    # the two direct minhash rows plus doc_leakage_safe_split,
    # which routes through minhash_clusters ->
    # minhash_candidate_pairs.
    "minhash_near_dup_pairs", "minhash_dedup_clusters",
    "doc_leakage_safe_split",
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 11

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- The 2 rows whose latest green driver row is round 6 (5
    #    rounds stale — the ledger's oldest debt, displaced from the
    #    r11 prefix by the build-param re-touches; VERDICT r11 #2
    #    queued them first and here they are), then 39 of the 42
    #    r7-certified rows (alphabetical; the other three are the
    #    touched minhash-family rows above), then ONE spare slot for
    #    the alphabetically-first r8 row (`doc_apply_bpe`). 8 touched
    #    + 2 + 39 + 1 = exactly the 50-slot prefix. Histogram at
    #    r12 start: r11=50, r10=45, r8=46, r7=42, r6=2. --
    "user_value_ramps", "xbrl_roundtrip_totals",
    "allocate_order_total", "ann_cosine_topk",
    "annual_nations_complete_months", "calc_reconcile_orders",
    "correct_quantity_units", "customer_intkey_sentinel",
    "customer_parts_true_gran", "customer_phone_standardized",
    "customer_unique_priority", "date_merge_month",
    "doc_fingerprints_fast",
    "doc_shingle_stats", "doc_stratified_sample",
    "excel_roundtrip_nation", "fs_linkage_trained",
    "hourly_wide_melt_roundtrip", "imputation_mape_score",
    "impute_event_values", "impute_latc_tubal_mape",
    "lineitem_exact_quantiles", "lineitem_multiheader_stack",
    "lineitem_zorder_stats", "linkage_best_match",
    "nation_holed_zone_overlay", "nation_multipart_explode",
    "ngram_jaccard_dup_pairs", "orders_observed_counts",
    "orders_profile", "part_name_levenshtein_pairs",
    "pipeline_nation_summary", "region_revenue_allocation",
    "scan_stats_orders", "signup_conversion_funnel",
    "simhash_near_dup_pairs", "sql_interface_nation_revenue",
    "supplier_close_balances", "supplier_customer_pagerank",
    "supplier_territory_area", "suppliers_kept_waiting",
    "doc_apply_bpe",
    # -- r13 queue (sketched now the way r12's was in r11): the r8
    #    cohort is r13's rotation load — 44 rows after this round
    #    re-certifies doc_apply_bpe (spare) and doc_bottomk_sample
    #    (sampler swap) out of the 46 (4 rounds stale at r13, the
    #    sustainable boundary at ceil(189/50)=4). Four staged
    #    queries register
    #    on top, all pre-verified vs DuckDB in
    #    tests/test_r13_queue.py with oracles in plans/queued.py:
    #    `ivf_stream_matches` (IVF stream end-to-end matches-sink
    #    cert), `ivf_store_reseed` (rebuild-after-appends ==
    #    one-shot build; the reseed gained a pending-marker re-entry
    #    protocol + snapshot-carried params this round, closing both
    #    r11 ADVICE hazards BEFORE its certification lands),
    #    `datapackage_descriptor` (S13's first driver row — the
    #    descriptor rendered relationally against a literal
    #    expected frame, VERDICT r11 #6) and
    #    `events_null_value_screen` (P29's first driver row —
    #    drop_records_with_null_in_column incl. the max-drop guard,
    #    VERDICT r11 #6). 44 + 4 = 48, leaving TWO spare slots: the
    #    two alphabetically-first r10 rows (`clean_customer_names`,
    #    `complete_year_nations`). r14's load is then the remaining
    #    r10 cohort (43 rows, 4 rounds stale) + 7 spare. The exact
    #    44-row r8 cohort, precomputed from CORRECTNESS_r01..r11 +
    #    this prefix (alphabetical): doc_rendezvous_shards,
    #    doc_token_budget, embedding_blocked_clusters,
    #    embedding_ivf_clusters, embedding_semantic_dedup,
    #    event_anomalous_regions, event_anomaly_flags,
    #    event_bad_days, event_local_outliers, event_sessions_cc,
    #    event_user_kmv_distinct, event_value_quartiles,
    #    events_to_utc, exact_dedup_docs, fill_monthly_revenue_gaps,
    #    harvest_report_consistency, harvest_user_profile,
    #    jw_part_name_similarity, large_volume_customers,
    #    media_avi_frames, media_video_frames,
    #    monthly_orders_densified, nation_revenue_by_year,
    #    nations_with_both_roles, order_price_screens,
    #    order_year_fragments, pricing_summary,
    #    rolling_monthly_revenue, rollup_revenue,
    #    salted_event_type_totals, scale_by_ownership_suppliers,
    #    snake_cased_part_types, supplier_address_parse,
    #    supplier_code_cleanup, supplier_nation_codes,
    #    supplier_overlap_union_area, table_row_counts,
    #    top_revenue_orders, user_event_source_label,
    #    user_latest_good_value, user_ramp_extremes,
    #    user_stable_load_bin, weighted_avg_price,
    #    weighted_median_quantity.
    #    The build_lsh_store half of the oph_banded swap (bands from
    #    the just-written sets table — the one-shot-miner half
    #    landed THIS round with zero extra slots) touches all five
    #    LSH-store rows (3 certified r11 + 2 r12); it stays staged
    #    with its tripwire green until those rows rotate through the
    #    prefix naturally (r15 for the r11 trio), rather than
    #    displacing r13/r14 recerts. --
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
