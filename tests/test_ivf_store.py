"""Round-7: cell-bucketed IVF store — the persisted layout that makes
every cell-keyed pass Exchange-free (the promise in
`ivf_partitioned_argmax`'s docstring). Pins the plan property the
oracle sweep can't see."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pudl_spark.functions.similarity import build_ivf_store
from pudl_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ivf_store_total_and_exchange_free(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with tempfile.TemporaryDirectory() as td:
        build_ivf_store(spark, emb, "t_ivf_store",
                        os.path.join(td, "store"))
        try:
            s = spark.table("t_ivf_store")
            # TOTAL: every vector stored once; unassigned rows (if
            # any) sit in negative singleton cells.
            assert s.count() == emb.count()
            neg = s.filter(F.col("cell") < 0)
            for r in neg.collect():
                assert r["cell"] == -r["vec_id"] - 1
            # Store-side reads plan with NO Exchange once broadcast
            # is off: the self-join on the bucket column and the
            # per-cell aggregation both reuse the bucketing.
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            b = s.select("cell", F.col("vec_id").alias("b_id"))
            join_plan = (s.join(b, "cell")._jdf.queryExecution()
                         .executedPlan().toString())
            assert "Exchange" not in join_plan, join_plan
            agg_plan = (s.groupBy("cell").count()._jdf.queryExecution()
                        .executedPlan().toString())
            assert "Exchange" not in agg_plan, agg_plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
            spark.sql("DROP TABLE IF EXISTS t_ivf_store")
            spark.sql("DROP TABLE IF EXISTS t_ivf_store_seeds")


def test_ivf_store_query_self_cleans(spark):
    out = QUERIES["ivf_store_cell_stats"](spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    # members sum to the corpus; the catalog keeps no residue —
    # neither the store nor its seed sidecar.
    emb_n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == emb_n
    assert not any(t.name in ("ann_ivf_store", "ann_ivf_store_seeds")
                   for t in spark.catalog.listTables())


def test_ivf_store_probe_reads_sidecar_not_corpus(spark):
    """VERDICT r7 #1: the probe's seed table comes from the persisted
    ``{table}_seeds`` sidecar, and the only store access is the
    candidate fetch — pruned to the probed cells by a pushed In()
    filter. No probe stage reads the full store's vec rows."""
    from pudl_spark.functions.similarity import ivf_store_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    with tempfile.TemporaryDirectory() as td:
        build_ivf_store(spark, emb, "t_ivf_sidecar",
                        os.path.join(td, "store"))
        try:
            out = ivf_store_topk(spark, "t_ivf_sidecar", queries,
                                 k=10, seed_probe=3)
            plan = (out._jdf.queryExecution().executedPlan()
                    .toString())
            # The seed sidecar is read (centroids + seed cells)...
            assert "t_ivf_sidecar_seeds" in plan, plan
            # ...and the store table itself is scanned exactly once
            # (the candidate fetch), with the probed-cell In()
            # predicate pushed into that scan.
            store_scans = [ln for ln in plan.splitlines()
                           if "FileScan" in ln
                           and "t_ivf_sidecar" in ln
                           and "t_ivf_sidecar_seeds" not in ln]
            assert len(store_scans) == 1, plan
            assert "In(cell" in store_scans[0], store_scans[0]
            # Pruning preserved the result: identical to the
            # unpruned join-only path.
            got = sorted(map(tuple, out.collect()))
            ref = sorted(map(tuple, ivf_store_topk(
                spark, "t_ivf_sidecar", queries, k=10, seed_probe=3,
                prune_scan=False).collect()))
            assert got == ref
        finally:
            spark.sql("DROP TABLE IF EXISTS t_ivf_sidecar")
            spark.sql("DROP TABLE IF EXISTS t_ivf_sidecar_seeds")


def test_ivf_store_topk_probe(spark):
    from pudl_spark.functions.similarity import (
        brute_force_topk, ivf_store_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    with tempfile.TemporaryDirectory() as td:
        build_ivf_store(spark, emb, "t_ivf_probe",
                        os.path.join(td, "store"))
        try:
            got = ivf_store_topk(spark, "t_ivf_probe", queries,
                                 k=10, seed_probe=3).collect()
        finally:
            spark.sql("DROP TABLE IF EXISTS t_ivf_probe")
            spark.sql("DROP TABLE IF EXISTS t_ivf_probe_seeds")
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    exact = brute_force_topk(emb, queries, k=10).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for qid, rows in by_q.items():
        # The query vector is a member of its own assigned cell and
        # that cell is always probed -> self is the rank-1 hit.
        top = min(rows, key=lambda r: r["rank"])
        assert top["neighbor_id"] == qid and top["rank"] == 1
        assert abs(top["score"] - 1.0) < 1e-9
        got_ids = {r["neighbor_id"] for r in rows}
        hits += len(got_ids & exact_by_q[qid])
        total += len(exact_by_q[qid])
    assert len(by_q) == 8
    # Deterministic corpus + deterministic probe: recall@10 is a
    # fixed number; require a loose floor so the probe is meaningful
    # (brute force would be 1.0, random ~0).
    assert hits / total >= 0.4, f"recall {hits}/{total}"
