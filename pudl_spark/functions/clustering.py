"""Blocked clustering — the G3 entity-clustering shape.

Ref: cross-year plant clustering
(src/pudl/analysis/record_linkage/link_cross_year.py:34-300): build a
pairwise-distance structure, block it so the quadratic work happens
inside bounded groups, cluster within each block with an in-memory
kernel, and emit stable cluster ids. The reference runs
DBSCAN/agglomerative (sklearn) per block; here the in-block kernel is
a NumPy single-linkage threshold clustering (union-find over pairs
with cosine >= threshold) — deterministic, dependency-free, and
swappable for sklearn without touching the Spark plumbing.

Scale shape: LSH bucketing bounds block sizes, the blocks shuffle
once, and each block's O(n_block^2) kernel runs in one applyInPandas
task — the same island pattern as the tensor-imputation step (M1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pudl_spark.functions.similarity import _hyperplanes, lsh_signature_expr

CLUSTER_SCHEMA = "vec_id long, block long, cluster_id long"


def _cluster_block(pdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Single-linkage components over cosine >= threshold (NumPy)."""
    import numpy as np

    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype="float64")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sim = unit @ unit.T
    n = len(ids)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if sim[i, j] >= threshold:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = [find(i) for i in range(n)]
    cluster_ids = {}
    for i, r in enumerate(roots):
        cluster_ids.setdefault(r, int(ids[[k for k, rr in enumerate(roots)
                                           if rr == r]].min()))
    return pd.DataFrame({
        "vec_id": ids,
        "block": pdf["block"].to_numpy(),
        "cluster_id": [cluster_ids[r] for r in roots],
    })


def cluster_embeddings_blocked(df: DataFrame, id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               threshold: float = 0.8,
                               n_planes: int = 6, dim: int = 64,
                               seed: int = 42) -> DataFrame:
    """LSH-block then single-linkage cluster within each block.

    Returns (vec_id, block, cluster_id) with cluster_id = min member
    id. Like the reference's blocked DBSCAN, clusters never span
    blocks — the blocking trades a little recall for making the
    quadratic kernel tractable; multi-probe or banded signatures
    tighten it.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    blocked = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        lsh_signature_expr(F.col(vec_col), planes).alias("block"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _cluster_block(pdf, threshold)

    return blocked.groupBy("block").applyInPandas(kernel, CLUSTER_SCHEMA)
