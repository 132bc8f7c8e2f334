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
    # r6: SemDeDup de-quadratified (sqrt-n seeds, VERDICT r5 #3) —
    # implementation AND oracle changed
    "embedding_semantic_dedup",
    # r6: extract_video_frames now skips non-sampled AVI frame
    # decodes via the chunk index (VERDICT r5 #4); both frame-sample
    # queries route through the touched function
    "media_avi_frames", "media_video_frames",
    # r6: hygiene rewrites (TemporaryDirectory store; temp-view drop)
    "incremental_rebuild_counts", "orders_above_customer_avg",
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 5

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- ALL 25 queries whose latest green driver row is round 2:
    #    the 16 displaced from the r5 prefix (VERDICT r5 "Next
    #    round" #2) plus the 9 that had been deliberately deferred
    #    behind dedicated unit suites (csv/dbf/sqlite/xbrl source
    #    roundtrips, the address tagger, user_running_stats,
    #    date_merge_year, dedupe_on_category_priority,
    #    dominant_event_type). After round 6 no registered query's
    #    latest driver row predates round 3. --
    "supplier_month_utilization", "union_balances_by_nation",
    "unpivot_lineitem_measures", "user_value_ramps",
    "salted_event_type_totals", "purchases_per_signup_interval",
    "purchase_asof_signup", "pivot_event_values",
    "nation_zone_overlay", "jw_linkage_parts",
    "impute_latc_mape", "hourly_event_windows",
    "fs_linkage_parts", "freshest_event_per_user",
    "fk_orphan_counts", "event_type_changelog",
    "csv_partition_extract_nation", "dbf_roundtrip_supplier",
    "sqlite_roundtrip_orders", "xbrl_roundtrip_totals",
    "parse_address_tagged_suppliers", "user_running_stats",
    "date_merge_year", "dedupe_on_category_priority",
    "dominant_event_type",
    # -- remaining slots: the oldest round-3 certifications
    #    (alphabetical; 43 r3 rows total — the rest roll to round 7).
    #    New queries added during the round displace from the END of
    #    this block; displaced names stay r3-certified and lead the
    #    r7 re-cert queue. --
    "ann_ivf_topk", "ann_lsh_bucketed", "corpus_snapshot_diff",
    "doc_chunk_windows", "doc_curation_decisions",
    "doc_decontaminate", "doc_gopher_repetition",
    "doc_leakage_safe_split", "doc_pack_sequences", "doc_pii_scrub",
    "doc_quality_classifier", "doc_source_mixture", "doc_tfidf_topk",
    "doc_token_stats", "embedding_quantization",
    "embedding_random_projection", "event_props_extract",
    "event_seasonal_decompose", "event_user_pseudonymize",
    "event_zone_assignment",
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
