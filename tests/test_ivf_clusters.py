"""Round-7: IVF-cell-blocked clustering (VERDICT r6 next-round #8) —
`ivf_partitioned_argmax` as the single assignment primitive for the
embedding family. Structural pins the oracle-parity sweep can't see:
totality, plan shape (bounded broadcasts only), and the
identical-vectors-share-a-cluster guarantee."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pudl_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ivf_clusters_total_and_consistent(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = QUERIES["embedding_ivf_clusters"](spark, SF).cache()
    rows = out.collect()
    # TOTAL: every vector exactly once — no silent drops (ADVICE r6).
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)) == emb.count()
    by_id = {r["vec_id"]: r for r in rows}
    for r in rows:
        if r["block"] is None:
            # singleton rule: unassigned vectors cluster alone
            assert r["cluster_id"] == r["vec_id"]
        else:
            # cluster_id is a member of the same block (min member id)
            assert r["cluster_id"] <= r["vec_id"]
            assert by_id[r["cluster_id"]]["block"] == r["block"]
    # Deterministic across executions.
    again = {(r["vec_id"], r["block"], r["cluster_id"])
             for r in QUERIES["embedding_ivf_clusters"](spark, SF).collect()}
    assert again == {(r["vec_id"], r["block"], r["cluster_id"])
                     for r in rows}
    out.unpersist()


def test_ivf_clusters_identical_vectors_share_cluster(spark):
    # Identical vectors probe identical cells and cos==1 links them:
    # an injected exact duplicate must land in its twin's cluster.
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dup = (emb.filter(F.col("vec_id") == 5)
           .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                   "embedding", "label"))
    with tempfile.TemporaryDirectory() as td:
        emb.unionByName(dup).write.parquet(
            os.path.join(td, "embeddings.parquet"))
        got = {r["vec_id"]: r for r in
               QUERIES["embedding_ivf_clusters"](spark, td).collect()}
    assert got[1_000_005]["cluster_id"] == got[5]["cluster_id"]
    assert got[1_000_005]["block"] == got[5]["block"]


def test_ivf_clusters_plan_shape(spark):
    # The only nested-loop products are the bounded centroid-stage
    # broadcasts (1-row seed count, O(sqrt(k)) centroid array) —
    # never an unkeyed corpus x corpus product; the block co-location
    # is a keyed shuffle for the applyInPandas island. Since r15 the
    # assignment is pinned behind a lazy localCheckpoint (so the
    # blocked/singleton union evaluates the argmax tree ONCE); the
    # outer plan therefore shows the pinned RDD, and the broadcast
    # shape is asserted on the argmax pipeline itself.
    df = QUERIES["embedding_ivf_clusters"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("CartesianProduct") == 0
    assert "FlatMapGroupsInPandas" in plan
    # One pinned assignment feeds both union branches: the argmax
    # tree must not be replayed per branch.
    assert plan.count("Scan ExistingRDD") == 2
    assert "Scan parquet" not in plan

    from pudl_spark.functions.similarity import (
        ivf_partitioned_argmax, l2_norm_expr, sample_seeds)
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "embedding")
           .withColumn("nrm", l2_norm_expr(F.col("embedding"))))
    inner = ivf_partitioned_argmax(emb, sample_seeds(emb))
    iplan = inner._jdf.queryExecution().executedPlan().toString()
    assert iplan.count("CartesianProduct") == 0
    assert "BroadcastNestedLoopJoin" in iplan
