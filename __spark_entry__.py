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
    # r15: NO new registrations — the round's substantive work is
    # the r12-staged `build_lsh_store_singlepass` swap landing as
    # `functions/dedup.py::build_lsh_store`'s live body (sets table
    # written first, bands derived from the WRITTEN sets table via
    # `oph_banded_from_sets` — one corpus text pass instead of two,
    # measured 32% faster build; params still written last so a
    # half-built store fails loudly). The swap touches every query
    # that BUILDS an LSH store, so all five are declared here: the
    # three r11-green rows (in the r15 rotation cohort anyway —
    # zero extra slots) plus the two r12-green rows (costing two
    # slots per the precomputed budget). Byte-identity of both
    # store tables vs the pre-swap two-pass build is pinned against
    # frozen fingerprints at two SFs (tests/test_r16_queue.py), and
    # the three bench-suite store rows were re-floored same-session
    # (SCALE.md r15).
    "doc_lsh_store_increment", "doc_lsh_store_ingest",
    "doc_lsh_store_probe_small", "doc_lsh_store_redelivery",
    "doc_lsh_stream_pairs",
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 14

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- The r11 cohort is r15's rotation load: all 44 rows whose
    #    latest green driver row is round 11 (4 rounds stale at
    #    r15, the ceil(194/50)=4 staleness boundary — the guarantee
    #    binds exactly this round). Alphabetical; recomputed this
    #    round from CORRECTNESS_r01..r14 and byte-equal to the
    #    cohort precomputed in the r14 sketch. The cohort's three
    #    LSH-store rows sit in _TOUCHED_THIS_ROUND above (the swap
    #    re-certification doubling as their rotation), leaving 41
    #    rows here. 5 touched + 41 cohort + 4 spares = exactly the
    #    50-slot prefix. Histogram at r15 start: r14=50, r13=50,
    #    r12=50, r11=44. --
    "date_merge_year", "dbf_roundtrip_supplier",
    "dedupe_on_category_priority", "doc_chunk_windows",
    "doc_curation_decisions", "doc_decontaminate",
    "doc_gopher_repetition", "doc_pack_sequences", "doc_pii_scrub",
    "doc_quality_classifier", "doc_source_mixture", "doc_tfidf_topk",
    "doc_token_stats", "dominant_event_type",
    "embedding_quantization", "embedding_random_projection",
    "event_props_extract", "event_seasonal_decompose",
    "event_type_changelog", "event_user_pseudonymize",
    "event_zone_assignment", "fk_orphan_counts",
    "freshest_event_per_user", "fs_linkage_parts",
    "hourly_event_windows", "impute_latc_mape",
    "incremental_rebuild_counts", "ivf_store_append",
    "ivf_store_cell_stats", "jw_linkage_parts",
    "nation_zone_overlay", "orders_above_customer_avg",
    "parse_address_tagged_suppliers", "pivot_event_values",
    "purchase_asof_signup", "purchases_per_signup_interval",
    "sqlite_roundtrip_orders", "supplier_month_utilization",
    "union_balances_by_nation", "unpivot_lineitem_measures",
    "user_running_stats",
    # -- spares: the 4 alphabetically-first r12 rows (the
    #    precomputed with-swap budget: the swap's two r12-green
    #    touched rows consumed the other two no-swap spare slots) --
    "allocate_order_total", "ann_cosine_topk",
    "annual_nations_complete_months", "calc_reconcile_orders",
    # -- r16 queue (sketched now, the discipline that has kept the
    #    rotation exact six rounds running): the load is the
    #    REMAINING r12 cohort — 44 rows, 4 rounds stale at r16
    #    (the original 50 r12 rows minus the 6 this prefix
    #    re-certifies: doc_lsh_store_redelivery,
    #    doc_lsh_stream_pairs and the 4 spares above). The exact
    #    cohort, precomputed from CORRECTNESS_r01..r14 + this
    #    prefix (alphabetical): correct_quantity_units,
    #    customer_intkey_sentinel, customer_parts_true_gran,
    #    customer_phone_standardized, customer_unique_priority,
    #    date_merge_month, doc_apply_bpe, doc_bottomk_sample,
    #    doc_fingerprints_fast, doc_leakage_safe_split,
    #    doc_shingle_stats, doc_stratified_sample,
    #    doc_weighted_sample, excel_roundtrip_nation,
    #    fs_linkage_trained, hourly_wide_melt_roundtrip,
    #    imputation_mape_score, impute_event_values,
    #    impute_latc_tubal_mape, ivf_store_redelivery,
    #    lineitem_exact_quantiles, lineitem_multiheader_stack,
    #    lineitem_zorder_stats, linkage_best_match,
    #    minhash_dedup_clusters, minhash_near_dup_pairs,
    #    nation_holed_zone_overlay, nation_multipart_explode,
    #    ngram_jaccard_dup_pairs, orders_observed_counts,
    #    orders_profile, part_name_levenshtein_pairs,
    #    pipeline_nation_summary, region_revenue_allocation,
    #    scan_stats_orders, signup_conversion_funnel,
    #    simhash_near_dup_pairs, sql_interface_nation_revenue,
    #    supplier_close_balances, supplier_customer_pagerank,
    #    supplier_territory_area, suppliers_kept_waiting,
    #    user_value_ramps, xbrl_roundtrip_totals. 44 + any r16
    #    registrations/touched + the alphabetically-first r13 rows
    #    as spares fill the 50: with no registration that is SIX
    #    spares (bpe_merges_docs, datapackage_descriptor,
    #    doc_prefix_filter_dup_pairs, doc_rendezvous_shards,
    #    doc_token_budget, embedding_blocked_clusters). --
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
