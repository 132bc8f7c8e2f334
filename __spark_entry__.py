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
    # real-decode multimodal rework + new queries (r5)
    "media_feature_extract", "media_jpeg_features",
    "media_thumbnail_stats", "media_gif_features",
    "media_video_frames", "incremental_rebuild_counts",
    "bpe_merges_docs",
    # heavy.py candidate pinning (r5) + r4-touched-after-r3-cert rows
    "doc_top_terms", "doc_dup_spans", "doc_bigram_perplexity",
    # share the touched multimodal module (decode dispatch)
    "media_png_features", "media_wav_features",
    # new in r5: ORC/JSONL sinks, shard manifest, SemDeDup, triangles
    "orc_sink_roundtrip", "doc_shard_manifest",
    "embedding_semantic_dedup", "part_copurchase_triangles",
    "jsonl_sink_roundtrip", "market_share_by_year",
    "orders_above_customer_avg", "order_counts_cube",
    "event_value_histogram", "media_avi_frames",
    "fixed_width_roundtrip_nation", "parquet_schema_evolution",
    "file_provenance_counts", "doc_chunk_spans_udtf",
    "event_type_median_udaf",
    # shared-columnar-writer refactor touched the parquet sink too
    "parquet_sink_roundtrip",
]

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST (r1 first, then
# r2), so certification age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- oldest certs: latest green row is round 1 (12) --
    "complete_year_nations", "doc_bpe_token_estimate",
    "doc_fingerprints", "doc_language_id",
    "doc_quality_scores", "embedding_near_dup_pairs",
    "mode_segment_per_nation", "order_status_flags",
    "primary_priority_share", "spot_fix_regions",
    "sum_min_count_semantics", "uncategorized_part_types",
    # -- next-oldest: latest green row is round 2 (10 of 36; the six
    #    source-roundtrip queries with dedicated unit suites —
    #    csv/dbf/sqlite/xbrl/parquet-sink/address-tagger — plus
    #    user_running_stats, date_merge_year (its month twin was
    #    r4-certified), dedupe_on_category_priority,
    #    dominant_event_type, and — displaced by this round's
    #    15 touched/new prefix rows —
    #    supplier_month_utilization, union_balances_by_nation,
    #    unpivot_lineitem_measures, user_value_ramps,
    #    salted_event_type_totals, purchases_per_signup_interval,
    #    purchase_asof_signup (already r4-certified),
    #    pivot_event_values, nation_zone_overlay, jw_linkage_parts,
    #    impute_latc_mape, hourly_event_windows, fs_linkage_parts,
    #    freshest_event_per_user, fk_orphan_counts and
    #    event_type_changelog roll to round 6; parquet_sink_roundtrip
    #    moved UP into the touched prefix after the shared-writer
    #    refactor) --
    "clean_customer_names",
    "declarative_transform_orders",
    "doc_bloom_incremental_dedup", "doc_bm25_relevance",
    "embedding_blocked_clusters",
    "encode_order_status", "event_hypertable_rollup",
    "event_run_lengths", "event_sessions_windowed",
    "event_sliding_windows",
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
