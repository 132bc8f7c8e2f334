"""r11: IVF twin of the streaming probe-then-ingest loop. Parity:
a store grown by the stream must equal the batch API's replay
(build(batch0) + append(batch1) + append(batch2) — the seed set
freezes at bootstrap by the documented IVF append semantics), the
ANN matches must equal the replay's probes, and full redelivery must
be a no-op."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pudl_spark.functions.similarity import (
    append_to_ivf_store, append_to_ivf_store_idempotent,
    build_ivf_store, ivf_store_topk,
)
from pudl_spark.streaming.pipeline import ivf_ingest_stream

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _drain(spark, src, store_dir, matches, ckpt):
    stream = (spark.readStream
              .schema("vec_id long, embedding array<float>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = ivf_ingest_stream(stream, "t_stream_ivf", store_dir, matches,
                          ckpt, k=2)
    q.awaitTermination()


def test_ivf_stream_parity_and_redelivery(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ivfstream")
    src = str(base / "in")
    matches = str(base / "matches")
    os.makedirs(src)

    e = _emb(spark).select("vec_id", "embedding")
    slices = [e.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    try:
        _drain(spark, src, str(base / "store"), matches,
               str(base / "ckpt"))

        # Batch replay: bootstrap-build on slice 0, then the two
        # idempotent appends (same code path as the plain append for
        # fresh batches — both pinned equal here).
        build_ivf_store(spark, slices[0], "t_replay_ivf",
                        str(base / "replay"))
        want_matches = set()
        for i in (1, 2):
            q = slices[i].select(F.col("vec_id").alias("query_id"),
                                 "embedding")
            want_matches |= {
                (r["query_id"], r["neighbor_id"], r["rank"])
                for r in ivf_store_topk(spark, "t_replay_ivf", q,
                                        k=2).collect()}
            if i == 1:
                append_to_ivf_store(spark, "t_replay_ivf", slices[i])
            else:
                append_to_ivf_store_idempotent(spark, "t_replay_ivf",
                                               slices[i])
        got = sorted(map(tuple, spark.table("t_stream_ivf")
                         .select("cell", "vec_id").collect()))
        want = sorted(map(tuple, spark.table("t_replay_ivf")
                          .select("cell", "vec_id").collect()))
        assert got == want and got
        got_matches = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in spark.read.parquet(matches).collect()}
        assert got_matches == want_matches and got_matches

        # Full redelivery (fresh checkpoint, same files): the
        # cell-pruned id guard must skip every batch, leaving store
        # and matches untouched.
        _drain(spark, src, str(base / "store"), matches,
               str(base / "ckpt2"))
        assert sorted(map(tuple, spark.table("t_stream_ivf")
                          .select("cell", "vec_id").collect())) == got
        assert {(r["query_id"], r["neighbor_id"], r["rank"])
                for r in spark.read.parquet(matches).collect()
                } == got_matches
    finally:
        for t in ("t_stream_ivf", "t_stream_ivf_seeds",
                  "t_replay_ivf", "t_replay_ivf_seeds"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_idempotent_ivf_append_replay_converges(spark,
                                                tmp_path_factory):
    """Replaying the same batch through the idempotent append leaves
    the store identical; the plain append would double it."""
    base = tmp_path_factory.mktemp("ivfidem")
    e = _emb(spark)
    corpus = e.filter(F.col("vec_id") % 97 != 3)
    batch = e.filter(F.col("vec_id") % 97 == 3)
    build_ivf_store(spark, corpus, "t_ivf_idem", str(base / "s"))
    try:
        append_to_ivf_store_idempotent(spark, "t_ivf_idem", batch)
        once = sorted(map(tuple, spark.table("t_ivf_idem")
                          .select("cell", "vec_id").collect()))
        append_to_ivf_store_idempotent(spark, "t_ivf_idem", batch)
        assert sorted(map(tuple, spark.table("t_ivf_idem")
                          .select("cell", "vec_id").collect())) == once
        # and it matches the plain append's single application
        assert len(once) == corpus.count() + batch.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf_idem")
        spark.sql("DROP TABLE IF EXISTS t_ivf_idem_seeds")


def test_stream_on_mismatched_store_raises(spark, tmp_path_factory):
    """A stream attached to a PRE-EXISTING store built under
    different parameters must fail loudly (VERDICT r10 #4 applies to
    the streaming path too), not silently assign under the wrong
    rule."""
    import pytest
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    base = tmp_path_factory.mktemp("ivfmm")
    src = str(base / "in")
    os.makedirs(src)
    e = _emb(spark).select("vec_id", "embedding")
    build_ivf_store(spark, e.filter(F.col("vec_id") % 2 == 0),
                    "t_stream_mm", str(base / "s"),
                    centroid_factor=3.0)
    e.filter(F.col("vec_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)
    try:
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<float>")
                  .parquet(src))
        q = ivf_ingest_stream(stream, "t_stream_mm",
                              str(base / "s"), str(base / "m"),
                              str(base / "ckpt"))
        with pytest.raises(StreamingQueryException,
                           match="centroid_factor"):
            q.awaitTermination()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stream_mm")
        spark.sql("DROP TABLE IF EXISTS t_stream_mm_seeds")


def test_ivf_stream_min_score_and_auto_compaction(spark,
                                                  tmp_path_factory):
    """The SemDeDup flagging path (min_score) and the IVF loop's
    auto-compaction path both work end-to-end: the drained store
    stays <= num_buckets files with results equal to the batch
    replay, every emitted match clears the threshold, and an
    all-filtered matches sink reads back (with an explicit schema)
    as empty rather than crashing downstream."""
    import glob

    base = tmp_path_factory.mktemp("ivfms")
    src = str(base / "in")
    matches = str(base / "matches")
    store_dir = str(base / "store")
    os.makedirs(src)
    e = _emb(spark).select("vec_id", "embedding")
    for i in range(3):
        e.filter(F.col("vec_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(1.1)
    try:
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<float>")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = ivf_ingest_stream(stream, "t_ivf_ms", store_dir, matches,
                              str(base / "ckpt"), k=2,
                              min_score=0.99, compact_every=1)
        q.awaitTermination()
        n = len(glob.glob(os.path.join(store_dir, "part-*")))
        assert n <= 8, n
        build_ivf_store(spark, e.filter(F.col("vec_id") % 3 == 0),
                        "t_ivf_ms_ref", str(base / "ref"))
        for i in (1, 2):
            append_to_ivf_store(spark, "t_ivf_ms_ref",
                                e.filter(F.col("vec_id") % 3 == i))
        got = sorted(map(tuple, spark.table("t_ivf_ms")
                         .select("cell", "vec_id").collect()))
        want = sorted(map(tuple, spark.table("t_ivf_ms_ref")
                          .select("cell", "vec_id").collect()))
        assert got == want and got
        # The matches sink may be empty at this threshold; an
        # explicit-schema read must work either way, and whatever is
        # there clears the threshold.
        m = spark.read.schema(
            "query_id long, neighbor_id long, score double, "
            "rank int, batch_id long").parquet(matches)
        assert all(r["score"] >= 0.99 for r in m.collect())
    finally:
        for t in ("t_ivf_ms", "t_ivf_ms_seeds",
                  "t_ivf_ms_ref", "t_ivf_ms_ref_seeds"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bootstrap_crash_reentry_rebuilds_cleanly(spark, tmp_path):
    """The loop's bootstrap gate keys on the SEEDS sidecar (the
    table the build writes LAST): a crash between the build's two
    writes leaves the store's catalog entry + files but no sidecar,
    and the redelivered first batch re-enters the build — which
    must drop the leftovers and converge to the clean-build state,
    including CTAS-overwriting the leftover files at the SAME store
    path (a non-empty location)."""
    import shutil

    e = _emb(spark).select("vec_id", "embedding")
    p = str(tmp_path / "store")
    build_ivf_store(spark, e, "t_boot_ivf", p)
    try:
        want = sorted(map(tuple, spark.table("t_boot_ivf")
                          .select("cell", "vec_id").collect()))
        want_seeds = sorted(map(tuple,
                                spark.table("t_boot_ivf_seeds")
                                .select("seed_id", "ccell")
                                .collect()))
        # Simulated crash: sidecar never committed; store remains.
        spark.sql("DROP TABLE IF EXISTS t_boot_ivf_seeds")
        shutil.rmtree(p + "_seeds")
        assert not spark.catalog.tableExists("t_boot_ivf_seeds")
        build_ivf_store(spark, e, "t_boot_ivf", p)  # the re-entry
        assert sorted(map(tuple, spark.table("t_boot_ivf")
                          .select("cell", "vec_id")
                          .collect())) == want
        assert sorted(map(tuple, spark.table("t_boot_ivf_seeds")
                          .select("seed_id", "ccell")
                          .collect())) == want_seeds
    finally:
        for t in ("t_boot_ivf", "t_boot_ivf_seeds"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stop_restart_from_checkpoint_continues(spark,
                                                tmp_path_factory):
    """IVF twin of the LSH restart-continuity pin (r12): run 1
    drains slices 0-1 and terminates (availableNow), slice 2 lands
    while the query is down, run 2 restarts on the SAME checkpoint.
    The restart must append exactly slice 2 (checkpoint offsets — no
    duplicate appends under the frozen bootstrap seeds) and leave
    matches sink + store byte-equal to an uninterrupted 3-batch
    run."""

    def drain(prefix, src, store_dir, matches, ckpt):
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<float>")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = ivf_ingest_stream(stream, prefix, store_dir, matches,
                              ckpt, k=2)
        q.awaitTermination()

    base = tmp_path_factory.mktemp("ivfrestart")
    e = _emb(spark).select("vec_id", "embedding")
    slices = [e.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    try:
        refsrc = str(base / "refin")
        os.makedirs(refsrc)
        for s in slices:
            s.coalesce(1).write.mode("append").parquet(refsrc)
            time.sleep(1.1)
        drain("t_ref_ivf", refsrc, str(base / "refstore"),
              str(base / "refmatches"), str(base / "refckpt"))
        want = sorted(map(tuple, spark.read.parquet(
            str(base / "refmatches")).collect()))

        src = str(base / "in")
        os.makedirs(src)
        for s in slices[:2]:
            s.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        drain("t_rst_ivf", src, str(base / "store"),
              str(base / "matches"), str(base / "ckpt"))
        n_after_run1 = spark.table("t_rst_ivf").count()

        slices[2].coalesce(1).write.mode("append").parquet(src)
        drain("t_rst_ivf", src, str(base / "store"),
              str(base / "matches"), str(base / "ckpt"))
        spark.catalog.refreshTable("t_rst_ivf")

        got = sorted(map(tuple, spark.read.parquet(
            str(base / "matches")).collect()))
        assert got == want and got
        assert (spark.table("t_rst_ivf").count()
                - n_after_run1) == slices[2].count()
        ref_rows = sorted(map(tuple, spark.table("t_ref_ivf")
                              .select("cell", "vec_id").collect()))
        got_rows = sorted(map(tuple, spark.table("t_rst_ivf")
                              .select("cell", "vec_id").collect()))
        assert got_rows == ref_rows and got_rows
    finally:
        for t in ("t_ref_ivf", "t_ref_ivf_seeds",
                  "t_rst_ivf", "t_rst_ivf_seeds"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
