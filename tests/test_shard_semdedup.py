"""Round-5 additions: deterministic training-shard manifest and
SemDeDup semantic dedup — structural properties the oracle-parity
sweep can't see (balance, determinism, keep-rule semantics)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pudl_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_shard_manifest_balanced_and_deterministic(spark):
    out = QUERIES["doc_shard_manifest"](spark, SF).cache()
    rows = out.collect()
    n = len(rows)
    assert n > 0
    # md5 assignment is uniform: no shard holds more than ~4x the
    # mean even at this tiny sf (binomial tail bound, not a tuning).
    per = {}
    for r in rows:
        per[r["shard_id"]] = per.get(r["shard_id"], 0) + 1
    assert max(per.values()) <= max(8, math.ceil(4 * n / 64))
    assert 0 <= min(per) and max(per) <= 63
    # seq_in_shard is dense 1..k per shard and cum offsets increase.
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard_id"], r["seq_in_shard"])):
        k = by_shard.setdefault(r["shard_id"], [0, 0])
        assert r["seq_in_shard"] == k[0] + 1
        assert r["cum_chars_in_shard"] > k[1]
        k[0], k[1] = r["seq_in_shard"], r["cum_chars_in_shard"]
    # Deterministic across executions: identical manifest both runs.
    again = {(r["doc_id"], r["shard_id"], r["seq_in_shard"])
             for r in QUERIES["doc_shard_manifest"](spark, SF).collect()}
    assert again == {(r["doc_id"], r["shard_id"], r["seq_in_shard"])
                     for r in rows}
    out.unpersist()


def test_semantic_dedup_keep_rule(spark):
    out = QUERIES["embedding_semantic_dedup"](spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    # Every cluster's lowest vec_id is always kept (nothing below it
    # to collide with), and every vector appears exactly once.
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    lowest = {}
    for r in rows:
        c = r["cluster_seed"]
        if c not in lowest or r["vec_id"] < lowest[c]["vec_id"]:
            lowest[c] = r
    assert all(r["is_kept"] for r in lowest.values())


def test_semantic_dedup_drops_exact_duplicate_vectors(spark):
    # Inject an exact duplicate pair: the higher id must be dropped,
    # the lower kept — the SemDeDup keep-lowest rule on cos == 1.
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dup = (emb.filter(F.col("vec_id") == 3)
           .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                   "embedding", "label"))
    import os
    import tempfile

    from pudl_spark.plans.queries import QUERIES as Q
    with tempfile.TemporaryDirectory() as td:
        emb.unionByName(dup).write.parquet(os.path.join(td, "embeddings.parquet"))
        for t in ["documents"]:
            spark.read.parquet(f"{SF}/{t}.parquet").write.parquet(
                os.path.join(td, f"{t}.parquet"))
        got = {r["vec_id"]: r for r in
               Q["embedding_semantic_dedup"](spark, td).collect()}
    assert got[1_000_003]["is_kept"] is False
    assert got[1_000_003]["cluster_seed"] == got[3]["cluster_seed"]


def test_shard_manifest_single_exchange_plan(spark):
    # shard_id must be map-only: the ONLY Exchange in the plan is the
    # 64-way hash repartition the per-shard window needs.
    df = QUERIES["doc_shard_manifest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort


def _emb_with_seeds(spark):
    from pudl_spark.functions.similarity import l2_norm_expr

    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "embedding")
           .withColumn("nrm", l2_norm_expr(F.col("embedding"))))
    seeds = emb.filter(F.col("vec_id") % 97 == 1).select(
        F.col("vec_id").alias("seed_id"),
        F.col("embedding").alias("seed_vec"),
        F.col("nrm").alias("seed_nrm"))
    return emb, seeds


def test_ivf_argmax_exact_when_every_seed_is_centroid(spark):
    """centroid_factor >= sqrt(k) promotes every seed to a centroid;
    each seed's cell is then itself and the probed top-2 cells are
    the top-2 seeds — so the nprobe=2 assignment must equal the
    brute-force argmax EXACTLY (same scores, same tie rule)."""
    from pudl_spark.functions.similarity import (
        dot_expr, ivf_partitioned_argmax)

    emb, seeds = _emb_with_seeds(spark)
    got = {r["vec_id"]: r["cluster_seed"]
           for r in ivf_partitioned_argmax(
               emb, seeds, nprobe=2, centroid_factor=1e6).collect()}
    brute = emb.join(F.broadcast(seeds)).select(
        "vec_id", "seed_id",
        (dot_expr(F.col("embedding"), F.col("seed_vec"))
         / (F.col("nrm") * F.col("seed_nrm"))).alias("score"))
    want = {r["vec_id"]: r["cluster_seed"] for r in brute.groupBy(
        "vec_id").agg(F.max_by("seed_id", F.struct(
            F.col("score"), (-F.col("seed_id")).alias("ns")))
        .alias("cluster_seed")).collect()}
    assert got == want


def test_ivf_argmax_total_and_centroids_bounded(spark):
    """Default factor: every vector gets exactly one cluster, and the
    broadcast centroid subset stays ~factor*sqrt(k) (binomial tail:
    <= 4x the expectation even at this tiny sf), never all k seeds."""
    import math

    from pudl_spark.functions.similarity import ivf_partitioned_argmax

    emb, seeds = _emb_with_seeds(spark)
    k = seeds.count()
    out = ivf_partitioned_argmax(emb, seeds, nprobe=2,
                                 centroid_factor=2.0).collect()
    ids = [r["vec_id"] for r in out]
    assert len(ids) == len(set(ids)) == emb.count()
    seed_ids = {r["seed_id"] for r in seeds.collect()}
    assert all(r["cluster_seed"] in seed_ids for r in out)
    # replay the centroid threshold rule to count the broadcast side
    h6 = F.conv(F.substring(F.md5(F.concat(
        F.col("seed_id").cast("string"), F.lit(":cent"))), 1, 6),
        16, 10).cast("double")
    n_cents = seeds.filter(
        h6 * math.sqrt(float(k)) < 16777216.0 * 2.0).count()
    assert 1 <= n_cents <= max(4, math.ceil(8 * math.sqrt(k)))


def test_semantic_dedup_broadcasts_seeds(spark):
    # Seed scoring must be a broadcast product (seeds << corpus) and
    # the pair check an equi-join keyed on cluster_seed — never an
    # unkeyed corpus x corpus product. Since the r13 assigned-frame
    # checkpoint, the registered query's FINAL plan reads the
    # checkpointed blocks (the centroid broadcast runs inside the
    # checkpoint's own materialization job), so the broadcast shape
    # pins on the assignment subplan and the final plan pins the
    # checkpoint scan + the absence of any unkeyed product.
    from pudl_spark.catalog import read_parquet_table, \
        spread_small_input
    from pudl_spark.functions.similarity import (
        ivf_partitioned_argmax, l2_norm_expr, sample_seeds)

    emb = spread_small_input(
        read_parquet_table(spark, f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding"),
        "vec_id").withColumn("nrm", l2_norm_expr(F.col("embedding")))
    best = ivf_partitioned_argmax(emb, sample_seeds(emb, 97),
                                  nprobe=2, centroid_factor=2.0)
    sub = best._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in sub
    assert sub.count("CartesianProduct") == 0

    df = QUERIES["embedding_semantic_dedup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan  # the checkpointed assigned
    assert plan.count("CartesianProduct") == 0
