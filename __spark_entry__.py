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
    # r13: NEW queries — the four r12-staged registrations land
    # (VERDICT r12 #1): the IVF ingest loop's end-to-end
    # matches-sink certification (`ivf_stream_matches` — the
    # embedding-side twin of r12's `doc_lsh_stream_pairs`), the
    # reseed certification (`ivf_store_reseed` —
    # rebuild-after-appends hash-equal to a one-shot full-corpus
    # build, landing AFTER the r12 crash-safety hardening), S13's
    # first driver row (`datapackage_descriptor`) and P29's first
    # driver row (`events_null_value_screen`). All four were
    # pre-verified vs DuckDB in the r12 staging queue tests.
    "ivf_stream_matches", "ivf_store_reseed",
    "datapackage_descriptor", "events_null_value_screen",
    # r13: the BPE trainer's oracle UPGRADES from rows-only to a
    # hash-grade recursive-CTE replay (VERDICT r12 #7) — an oracle
    # change, so the row re-certifies this round; it takes the
    # second spare slot (complete_year_nations returns to the r14
    # cohort).
    "bpe_merges_docs",
    # r13: prefix_filter_pairs gains the same single-text-pass cure
    # the r12 minhash swap applied (checkpointed sets frame; output
    # byte-identical, plan pinned in tests/test_prefix_filter.py) —
    # same-session A/B floors: sf0.1 5.19 -> 2.41 s, 10x 20.06 ->
    # 13.33 s. Its one registered caller re-certifies here, taking
    # the last spare slot (clean_customer_names returns to the r14
    # cohort).
    "doc_prefix_filter_dup_pairs",
    # r13: embedding_semantic_dedup's assigned frame (feeds both
    # self-join sides + the final projection) now localCheckpoints —
    # A/B floors sf0.1 3.68 -> 2.86 s, 10x 7.32 -> 6.55 s, output
    # byte-identical. The row was ALREADY in this prefix as an r8
    # cohort member; it moves up here only to declare the touch
    # (same 50 names).
    "embedding_semantic_dedup",
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 12

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- The r8 cohort is r13's rotation load: all 44 rows whose
    #    latest green driver row is round 8 (4 rounds stale at r13,
    #    the sustainable boundary at ceil(193/50)=4 — this is the
    #    round where the ledger's own <=4-round guarantee first
    #    binds exactly). Alphabetical; recomputed this round from
    #    CORRECTNESS_r01..r12 and byte-equal to the cohort
    #    precomputed in the r12 sketch. 7 touched/new + 43 =
    #    exactly the 50-slot prefix (both spare slots went to the
    #    BPE oracle upgrade and the prefix-filter swap's caller;
    #    embedding_semantic_dedup is the 44th cohort row, listed
    #    in the touched block above because its assigned-frame
    #    checkpoint landed this round). Histogram at r13 start:
    #    r12=50, r11=49, r10=45, r8=44. --
    "doc_rendezvous_shards", "doc_token_budget",
    "embedding_blocked_clusters", "embedding_ivf_clusters",
    "event_anomalous_regions",
    "event_anomaly_flags", "event_bad_days", "event_local_outliers",
    "event_sessions_cc", "event_user_kmv_distinct",
    "event_value_quartiles", "events_to_utc", "exact_dedup_docs",
    "fill_monthly_revenue_gaps", "harvest_report_consistency",
    "harvest_user_profile", "jw_part_name_similarity",
    "large_volume_customers", "media_avi_frames",
    "media_video_frames", "monthly_orders_densified",
    "nation_revenue_by_year", "nations_with_both_roles",
    "order_price_screens", "order_year_fragments", "pricing_summary",
    "rolling_monthly_revenue", "rollup_revenue",
    "salted_event_type_totals", "scale_by_ownership_suppliers",
    "snake_cased_part_types", "supplier_address_parse",
    "supplier_code_cleanup", "supplier_nation_codes",
    "supplier_overlap_union_area", "table_row_counts",
    "top_revenue_orders", "user_event_source_label",
    "user_latest_good_value", "user_ramp_extremes",
    "user_stable_load_bin", "weighted_avg_price",
    "weighted_median_quantity",
    # -- r14 queue (sketched now the way r13's was in r12): the
    #    load is the FULL remaining r10 cohort — 44 rows, 4 rounds
    #    stale at r14 (doc_prefix_filter_dup_pairs re-certifies
    #    THIS round with the single-pass swap, leaving 44 of 45).
    #    The exact cohort, precomputed from CORRECTNESS_r01..r12 +
    #    this prefix (alphabetical): clean_customer_names,
    #    complete_year_nations,
    #    declarative_transform_orders, doc_bigram_perplexity,
    #    doc_bloom_incremental_dedup, doc_bm25_relevance,
    #    doc_bpe_token_estimate, doc_chunk_spans_udtf,
    #    doc_dup_spans, doc_fingerprints, doc_language_id,
    #    doc_quality_scores,
    #    doc_shard_manifest, doc_top_terms,
    #    doc_weighted_rendezvous_shards, embedding_near_dup_pairs,
    #    encode_order_status, event_hypertable_rollup,
    #    event_run_lengths, event_sessions_windowed,
    #    event_sliding_windows, event_type_median_udaf,
    #    event_value_histogram, file_provenance_counts,
    #    fixed_width_roundtrip_nation, jsonl_sink_roundtrip,
    #    market_share_by_year, media_feature_extract,
    #    media_gif_features, media_jpeg_features,
    #    media_png_features, media_thumbnail_stats,
    #    media_wav_features, mode_segment_per_nation,
    #    orc_sink_roundtrip, order_counts_cube, order_status_flags,
    #    parquet_schema_evolution, parquet_sink_roundtrip,
    #    part_copurchase_triangles, primary_priority_share,
    #    spot_fix_regions, sum_min_count_semantics,
    #    uncategorized_part_types. 44 + any r14 registrations
    #    (e.g. the staged `table_quality_screens` composite) + the
    #    alphabetically-first r11 rows as spares fill the 50:
    #    with one registration that is FIVE spares
    #    (ann_ivf_store_probe, ann_ivf_topk, ann_lsh_bucketed,
    #    corpus_snapshot_diff, csv_partition_extract_nation);
    #    with none, SIX (add date_merge_year). r15's load is then
    #    the remaining
    #    ~42 r11 rows — which include the five LSH-store rows, so
    #    the staged `build_lsh_store_singlepass` swap
    #    (plans/queued.py, tripwires in tests/test_r14_queue.py)
    #    lands THAT round as a decorator move. --
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
