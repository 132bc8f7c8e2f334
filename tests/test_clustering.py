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
