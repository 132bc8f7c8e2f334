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
    # r9: NEW query — the LSH store's PRUNED serving regime gets the
    # same hash-grade evidence as the IVF twin (VERDICT r8 #2): a
    # 117-doc batch under the 2048 In()-gate at every test scale, so
    # the certified path IS the row-group-pruned one.
    "doc_lsh_store_probe_small",
    # r9: NEW query — incremental IVF store append via the persisted
    # seeds sidecar (VERDICT r8 #3); the oracle replays the
    # full-corpus assignment, exact because the batch holds no
    # seed-eligible rows (build+append == rebuild-on-union).
    "ivf_store_append",
    # r9: NEW query — weighted rendezvous sharding, the logarithmic
    # -w/ln(u) HRW variant for heterogeneous shard capacity
    # (VERDICT r8 stretch #8).
    "doc_weighted_rendezvous_shards",
    # r9: PPJoin+ depth-1 suffix filter added to the prefix join
    # (VERDICT r8 stretch #7) — candidates collapse to their first
    # common prefix token and a Hamming partition bound prunes
    # ~14% more before the exact verify; plus the broadcast_freq
    # option / AQE skew note on the frequency join (ADVICE r8).
    "doc_prefix_filter_dup_pairs",
    # r9: lsh_store_probe/ivf_store_topk regime gates take a
    # batch_rows hint and localCheckpoint the small batch so the
    # caller's batch lineage evaluates ONCE (ADVICE r8 #1/#2);
    # build_ivf_store persists+unpersists its intermediates instead
    # of localCheckpoint (executor-loss-safe, ADVICE r8 #3) — every
    # query over either store path re-certifies.
    "doc_lsh_store_increment", "ann_ivf_store_probe",
    "ivf_store_cell_stats",
]

# The prefix ordering below was BUILT against the certification
# state as of this round's start (CORRECTNESS_r01..r<this>): the
# ordering tests must evaluate staleness against the same state,
# because the round's own CORRECTNESS file (generated FROM this very
# prefix) lands post-commit and flips every re-certified row
# "green-in-latest" (VERDICT r5 "What's wrong" #1). Bump when
# rebuilding the prefix for a new round.
_BUILT_AGAINST_ROUND = 8

# Evidence-dense ordering: the driver checks only the FIRST 50
# entries of queries() (CORRECTNESS_r0N keys == insertion-order
# prefix). After round 4 every registered query carries an all-green
# driver row; from round 5 on, the prefix is (a) this round's
# touched/new queries, then (b) rolling RE-certification of the
# queries whose latest green driver row is OLDEST, so certification
# age stays bounded across rounds.
_PRIORITY = _TOUCHED_THIS_ROUND + [
    # -- ALL 43 queries whose latest green driver row is still
    #    round 5 (VERDICT r8 next-round #1: after this round the
    #    oldest certification anywhere is r6 and the rolling window
    #    is steady-state at <= 3 rounds' age). Alphabetical;
    #    computed from CORRECTNESS_r01..r08 latest-green rows.
    #    7 touched + 43 re-certs = exactly the 50-slot prefix. --
    "clean_customer_names", "complete_year_nations",
    "declarative_transform_orders", "doc_bigram_perplexity",
    "doc_bloom_incremental_dedup", "doc_bm25_relevance",
    "doc_bpe_token_estimate", "doc_chunk_spans_udtf",
    "doc_dup_spans", "doc_fingerprints", "doc_language_id",
    "doc_quality_scores", "doc_shard_manifest", "doc_top_terms",
    "embedding_near_dup_pairs", "encode_order_status",
    "event_hypertable_rollup", "event_run_lengths",
    "event_sessions_windowed", "event_sliding_windows",
    "event_type_median_udaf", "event_value_histogram",
    "file_provenance_counts", "fixed_width_roundtrip_nation",
    "jsonl_sink_roundtrip", "market_share_by_year",
    "media_feature_extract", "media_gif_features",
    "media_jpeg_features", "media_png_features",
    "media_thumbnail_stats", "media_wav_features",
    "mode_segment_per_nation", "orc_sink_roundtrip",
    "order_counts_cube", "order_status_flags",
    "parquet_schema_evolution", "parquet_sink_roundtrip",
    "part_copurchase_triangles", "primary_priority_share",
    "spot_fix_regions", "sum_min_count_semantics",
    "uncategorized_part_types",
    # -- r10 queue: the 45 r6-certified rows (alphabetically from
    #    `ann_ivf_topk`) lead the next re-cert prefix; with 45 slots
    #    spoken for, r10 has room for <= 5 touched/new queries.
    #    First in line: `doc_lsh_store_ingest` and
    #    `doc_weighted_sample`, STAGED ready-to-register in
    #    pudl_spark/plans/queued.py — their query/oracle pairs
    #    already pass the driver-style differential check at sf0.01
    #    (tests/test_r10_queue.py), so registration is a move.
    #    Also queued: unify bottomk/weighted_bottomk scaffolding
    #    (touches certified doc_bottomk_sample), and derive
    #    build_lsh_store's bands pass from the just-written sets
    #    table instead of re-shingling the raw text (saves one full
    #    corpus text pass per index build; touches oph_banded and so
    #    re-certifies the minhash family — needs their prefix
    #    slots). --
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
