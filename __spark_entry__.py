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


# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). Rounds 1-3 certified 114 distinct queries green; this
# final rotation (VERDICT r3 "Next round" #2) puts the 32 queries
# that have NEVER had a driver row at the head — after it, every
# registered query has been driver-certified in some round — and
# fills the remaining 18 slots with RE-certification of the most
# load-bearing round-1 rows (flagship scan/agg/join/window paths and
# the dedup/ANN family), so their certification stays current.
_PRIORITY = [
    # -- the last 32 never-driver-checked queries --
    "harvest_report_consistency",  # r3 red on oracle HUGEINT; CAST fixed
    "doc_token_budget",  # same latent HUGEINT, caught by the type sweep
    "supplier_code_cleanup", "event_value_quartiles",
    "doc_fingerprints_fast", "annual_nations_complete_months",
    "events_to_utc", "user_event_source_label",
    "order_year_fragments", "doc_shingle_stats",
    "event_local_outliers", "customer_unique_priority",
    "correct_quantity_units", "fill_monthly_revenue_gaps",
    "user_latest_good_value", "date_merge_month",
    "snake_cased_part_types", "nations_with_both_roles",
    "customer_phone_standardized", "customer_intkey_sentinel",
    "supplier_nation_codes", "supplier_address_parse",
    "event_anomalous_regions", "event_bad_days",
    "jw_part_name_similarity", "user_ramp_extremes",
    "user_stable_load_bin", "customer_parts_true_gran",
    "event_user_kmv_distinct", "doc_stratified_sample",
    "table_row_counts", "order_price_screens",
    # -- new this round (overlapping-dissolve union) --
    "supplier_overlap_union_area",
    # -- re-certification of load-bearing round-1 rows (18 slots) --
    "pricing_summary", "nation_revenue_by_year",
    "allocate_order_total", "calc_reconcile_orders",
    "harvest_user_profile", "rollup_revenue",
    "weighted_avg_price", "weighted_median_quantity",
    "monthly_orders_densified", "event_sessions_cc",
    "exact_dedup_docs", "minhash_near_dup_pairs",
    "ann_cosine_topk", "event_anomaly_flags",
    "rolling_monthly_revenue", "top_revenue_orders",
    "scale_by_ownership_suppliers",
]

# A typo or a renamed query must fail loudly at import time, not
# silently demote the entry out of the evidence-dense prefix
# (ADVICE r2); tests/test_entry.py re-asserts this plus the
# README-count invariant.
_missing = [n for n in _PRIORITY if n not in QUERIES]
if _missing:
    raise AssertionError(
        f"_PRIORITY names not in QUERIES registry: {_missing}")


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _PRIORITY if n in src}
    out.update((n, v) for n, v in src.items() if n not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
