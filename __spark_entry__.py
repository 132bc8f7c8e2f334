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
    # r16 (optimization round 2): every query whose implementation
    # changed since the r15 artifact drop. Three change families:
    # (1) the IVF store lifecycle — concurrent store+sidecar build
    #     writes, the parsed-SQL `_topn_centroid_fold` (bit-exact by
    #     equality test, but an implementation change is an
    #     implementation change), and the both-tables streaming
    #     bootstrap gates — touching every IVF-path query including
    #     the two clustering/dedup queries that assign via
    #     `ivf_partitioned_argmax`;
    "ann_ivf_store_probe", "ivf_store_append", "ivf_store_redelivery",
    "ivf_store_cell_stats", "ivf_store_reseed", "embedding_ivf_clusters",
    "embedding_semantic_dedup",
    # (2) the LSH store serving path — `lsh_store_probe`'s collected
    #     band-key/candidate-pair LocalRelation serving, concurrent
    #     plain-append writes, the bootstrap gate;
    "doc_lsh_store_increment", "doc_lsh_store_probe_small",
    "doc_lsh_store_ingest", "doc_lsh_store_redelivery",
    "doc_lsh_stream_pairs",
    # (3) the localCheckpoint-pin adjudications — screens' orders pin
    #     pruned to its shared columns, tfidf's tf pin reverted, the
    #     bigram explode pin dropped, heavy_hitters' item-stream pin
    #     dropped (plan shapes changed; rows oracle-verified equal).
    "table_quality_screens", "doc_tfidf_topk", "doc_bigram_perplexity",
    "doc_top_terms",
    # (4) the driver-side construction fast paths (guide §1.2): query
    #     expressions assembled as ONE parsed SQL text instead of
    #     per-call py4j Column operators — bit-exact by equality test
    #     and by this round's oracle sweeps, but an implementation
    #     change is an implementation change (the `_topn_centroid_fold`
    #     standard above). Queries whose own expression trees now come
    #     from the SQL-text builders (bm25, the rendezvous pair, the
    #     zorder interleave, the text/dedup shingle-and-score family):
    "doc_bm25_relevance", "declarative_transform_orders",
    "doc_bpe_token_estimate", "doc_quality_scores", "doc_language_id",
    "doc_quality_classifier", "doc_curation_decisions",
    "doc_decontaminate", "doc_rendezvous_shards",
    "doc_weighted_rendezvous_shards", "doc_dup_spans",
    "simhash_near_dup_pairs", "doc_prefix_filter_dup_pairs",
    "doc_fingerprints_fast", "doc_shingle_stats", "lineitem_zorder_stats",
    "minhash_near_dup_pairs", "minhash_dedup_clusters",
    "ngram_jaccard_dup_pairs",
    # (5) the one-SQL construction rewrites (guide §1.2, the same
    #     per-construction analysis-cost cure at whole-query scope):
    #     market_share_by_year's 8-relation chain and
    #     table_quality_screens' union tail now render as ONE
    #     spark.sql template — physical plans verified node-for-node
    #     equal (plans/r16), results oracle-pinned; screens is
    #     already rotated by (3).
    "market_share_by_year",
    #     NOT rotated (documented adjudication): queries affected only
    #     by the registry-wide catalog fast paths (the schema memo and
    #     the metadata-based spread decision) with no expression-tree
    #     change — 194 > 50 slots makes rotating "everything" the same
    #     as rotating nothing, the decision equivalence is test-pinned
    #     (tests/test_catalog_fastpath.py), and the full-registry
    #     oracle sweep this round covered all 194.
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 15

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- The r12 cohort is r16's rotation load: the 44 rows whose
    #    latest green driver row is round 12 (4 rounds stale at
    #    r16, the ceil(194/50)=4 staleness boundary). Alphabetical;
    #    recomputed this round from CORRECTNESS_r01..r15. Eight
    #    cohort rows (ivf_store_redelivery, doc_fingerprints_fast,
    #    doc_shingle_stats, lineitem_zorder_stats,
    #    minhash_dedup_clusters, minhash_near_dup_pairs,
    #    ngram_jaccard_dup_pairs, simhash_near_dup_pairs) sit in
    #    _TOUCHED_THIS_ROUND above, leaving 36; the 36-slot touched
    #    set (an optimization round touches hot paths, and the
    #    construction fast paths touch the whole text/dedup family)
    #    leaves room for the first 14 — the LAST 22 cohort rows
    #    (imputation_mape_score + impute_event_values ..
    #    xbrl_roundtrip_totals, named in the r17 queue note below)
    #    slip to the r17 queue at 5 rounds stale, a breach of the
    #    4-round target forced by the touched-first rule
    #    (36 + 36 > 50); r17 MUST lead its prefix with them.
    #    36 touched + 14 cohort = exactly the 50-slot prefix.
    #    Histogram at r16 start: r15=50, r14=50, r13=50, r12=44. --
    "correct_quantity_units", "customer_intkey_sentinel",
    "customer_parts_true_gran", "customer_phone_standardized",
    "customer_unique_priority", "date_merge_month", "doc_apply_bpe",
    "doc_bottomk_sample", "doc_leakage_safe_split",
    "doc_stratified_sample", "doc_weighted_sample",
    "excel_roundtrip_nation", "fs_linkage_trained",
    "hourly_wide_melt_roundtrip",
    # imputation_mape_score was the 15th cohort slot until the late
    # market_share_by_year rotation (touched set (5)) reclaimed it:
    # 36 touched + 14 cohort = the 50-slot prefix; it joins the 21
    # displaced r12 rows at the head of the r17 queue below.
    # -- r17 queue (sketched now, keeping the rotation exact): lead
    #    with the 22 5-round-stale r12 rows (imputation_mape_score,
    #    impute_event_values,
    #    impute_latc_tubal_mape, lineitem_exact_quantiles,
    #    lineitem_multiheader_stack, linkage_best_match,
    #    nation_holed_zone_overlay, nation_multipart_explode,
    #    orders_observed_counts, orders_profile,
    #    part_name_levenshtein_pairs, pipeline_nation_summary,
    #    region_revenue_allocation, scan_stats_orders,
    #    signup_conversion_funnel, sql_interface_nation_revenue,
    #    supplier_close_balances, supplier_customer_pagerank,
    #    supplier_territory_area, suppliers_kept_waiting,
    #    user_value_ramps, xbrl_roundtrip_totals), then the r13
    #    cohort (50 rows, 4 rounds stale at r17) minus whatever r17
    #    touches — 22 + 28 of 50 fills the prefix; the remaining r13
    #    rows spill to r18's head exactly like this round's 22. --
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
