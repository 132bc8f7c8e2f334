"""Blocked clustering (G3 shape): engineered tight clusters must come
out as single-linkage components; unrelated vectors stay singletons."""

from __future__ import annotations

import numpy as np

from pudl_spark.functions.clustering import cluster_embeddings_blocked


def make_vectors():
    rng = np.random.RandomState(7)
    base_a = rng.randn(64)
    base_b = rng.randn(64)
    rows = []
    # cluster around A: ids 0-2, cluster around B: ids 10-11, noise 20+
    for i in range(3):
        rows.append((i, (base_a + 0.01 * rng.randn(64)).tolist()))
    for i in range(2):
        rows.append((10 + i, (base_b + 0.01 * rng.randn(64)).tolist()))
    for i in range(3):
        rows.append((20 + i, rng.randn(64).tolist()))
    return rows


def test_blocked_clusters_found(spark):
    df = spark.createDataFrame(make_vectors(),
                               "vec_id long, embedding array<double>")
    out = cluster_embeddings_blocked(df, threshold=0.95)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert len(got) == 8                       # every vector labeled
    assert got[0] == got[1] == got[2] == 0     # A-cluster, min id 0
    assert got[10] == got[11] == 10            # B-cluster, min id 10
    noise = {got[20], got[21], got[22]}
    assert noise == {20, 21, 22}               # noise stays singleton
    assert got[0] != got[10]


def test_ivf_topk_exact_at_full_probe_and_recall(spark):
    from pudl_spark.catalog import read_parquet_table
    from pudl_spark.functions.similarity import brute_force_topk, ivf_topk

    emb = read_parquet_table(
        spark, "/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    # nprobe == nlist scans every cell -> must equal brute force
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, queries, k=5, nlist=4, nprobe=4).collect()
    }
    assert full == exact
    # partial probe: recall@5 over the 3 queries stays useful
    part = ivf_topk(emb, queries, k=5, nlist=8, nprobe=3).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in part}
    want = {(q, n) for (q, _), n in exact.items()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall
