"""r11 (VERDICT r10 stretch #10): streaming twin of the LSH
probe-then-ingest loop. Parity is the contract: a store grown by the
foreachBatch sink must equal the batch-built store row-for-row, the
mined pairs must equal the batch API's replay, and redelivering every
batch (fresh checkpoint, same source) must change nothing."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pudl_spark.functions.dedup import build_lsh_store, lsh_store_probe
from pudl_spark.streaming.pipeline import lsh_ingest_stream

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from pudl_spark.catalog import read_parquet_table

    return read_parquet_table(spark, f"{SF}/documents.parquet")


def _drain(spark, schema, src, prefix, store, pairs, ckpt):
    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = lsh_ingest_stream(stream, prefix, store, pairs, ckpt,
                          jaccard_threshold=0.5)
    q.awaitTermination()


def test_stream_ingest_parity_and_redelivery(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lshstream")
    src = str(base / "in")
    store = str(base / "store")
    pairs = str(base / "pairs")
    ckpt = str(base / "ckpt")
    os.makedirs(src)

    d = _docs(spark).select("doc_id", "text")
    schema = d.schema.simpleString().replace("struct<", "") \
        .rstrip(">").replace(":", " ").replace(",", ", ")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    # One file per micro-batch; distinct mtimes pin the source order
    # (FileStreamSource processes oldest-first).
    for i, s in enumerate(slices):
        s.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    try:
        _drain(spark, schema, src, "t_stream_lsh", store, pairs, ckpt)

        # Parity 1: stream-grown store == batch-built store.
        build_lsh_store(spark, d, "doc_id", "text", "t_batch_lsh",
                        str(base / "ref"))
        for suffix in ("_bands", "_sets"):
            got = sorted(map(tuple,
                             spark.table(f"t_stream_lsh{suffix}")
                             .collect()))
            want = sorted(map(tuple,
                              spark.table(f"t_batch_lsh{suffix}")
                              .collect()))
            assert got == want and got, suffix

        # Parity 2: mined pairs == the batch API's ordered replay
        # (slice i probed against slices < i). Batch 0 bootstraps
        # and emits nothing.
        want_pairs = set()
        for i in (1, 2):
            earlier = d.filter(F.col("doc_id") % 3 < i)
            build_lsh_store(spark, earlier, "doc_id", "text",
                            "t_replay", str(base / f"rp{i}"))
            want_pairs |= {
                (r["new_id"], r["corpus_id"]) for r in lsh_store_probe(
                    spark, "t_replay", slices[i], "doc_id", "text",
                    jaccard_threshold=0.5).collect()}
        got_pairs = {(r["new_id"], r["corpus_id"])
                     for r in spark.read.parquet(pairs).collect()}
        assert got_pairs == want_pairs and got_pairs

        # Redelivery: a FRESH checkpoint re-delivers every batch; the
        # idempotent append and the skip-if-ingested guard must leave
        # store AND pairs byte-identical.
        before_sets = sorted(map(tuple, spark.table("t_stream_lsh_sets")
                                 .collect()))
        _drain(spark, schema, src, "t_stream_lsh", store, pairs,
               str(base / "ckpt2"))
        assert sorted(map(tuple, spark.table("t_stream_lsh_sets")
                          .collect())) == before_sets
        assert {(r["new_id"], r["corpus_id"])
                for r in spark.read.parquet(pairs).collect()
                } == got_pairs
    finally:
        for t in ("t_stream_lsh_bands", "t_stream_lsh_sets",
                  "t_batch_lsh_bands", "t_batch_lsh_sets",
                  "t_replay_bands", "t_replay_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_auto_compaction_bounds_files(spark, tmp_path_factory):
    """compact_every keeps a long-lived ingest loop's file counts
    bounded without changing results: after the drain the store
    holds <= num_buckets files per table and still equals the
    batch-built store."""
    import glob

    base = tmp_path_factory.mktemp("lshcmp")
    src = str(base / "in")
    store = str(base / "store")
    os.makedirs(src)
    d = _docs(spark).select("doc_id", "text")
    for i in range(3):
        d.filter(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(1.1)
    try:
        stream = spark.readStream.schema("doc_id long, text string") \
            .option("maxFilesPerTrigger", 1).parquet(src)
        q = lsh_ingest_stream(stream, "t_str_cmp", store,
                              str(base / "pairs"), str(base / "ckpt"),
                              jaccard_threshold=0.5, compact_every=1)
        q.awaitTermination()
        for sub in ("bands", "sets"):
            n = len(glob.glob(os.path.join(store, sub, "part-*")))
            assert n <= 8, (sub, n)
        build_lsh_store(spark, d, "doc_id", "text", "t_ref_cmp",
                        str(base / "ref"))
        for suffix in ("_bands", "_sets"):
            got = sorted(map(tuple, spark.table(f"t_str_cmp{suffix}")
                             .collect()))
            want = sorted(map(tuple, spark.table(f"t_ref_cmp{suffix}")
                              .collect()))
            assert got == want and got, suffix
    finally:
        for t in ("t_str_cmp_bands", "t_str_cmp_sets",
                  "t_ref_cmp_bands", "t_ref_cmp_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bootstrap_crash_reentry_rebuilds_cleanly(spark, tmp_path):
    """The loop's bootstrap gate keys on the SETS table (the one the
    build writes LAST): a crash between the build's two writes
    leaves the bands catalog entry + files but no sets table, and
    the redelivered first batch re-enters the build — which must
    drop the leftovers and converge to the clean-build state,
    including CTAS-overwriting the leftover bands files at the SAME
    store path (a non-empty location)."""
    import shutil

    d = _docs(spark).select("doc_id", "text")
    p = str(tmp_path / "store")
    build_lsh_store(spark, d, "doc_id", "text", "t_boot_lsh", p)
    try:
        want = {s: sorted(map(tuple,
                              spark.table(f"t_boot_lsh{s}").collect()))
                for s in ("_bands", "_sets")}
        # Simulated crash: sets never committed; bands remains.
        spark.sql("DROP TABLE IF EXISTS t_boot_lsh_sets")
        shutil.rmtree(os.path.join(p, "sets"))
        assert not spark.catalog.tableExists("t_boot_lsh_sets")
        build_lsh_store(spark, d, "doc_id", "text", "t_boot_lsh", p)
        for s in ("_bands", "_sets"):
            got = sorted(map(tuple,
                             spark.table(f"t_boot_lsh{s}").collect()))
            assert got == want[s] and got, s
    finally:
        for t in ("t_boot_lsh_bands", "t_boot_lsh_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stop_restart_from_checkpoint_continues(spark,
                                                tmp_path_factory):
    """Checkpoint CONTINUITY across process restarts (r12 gap: the
    redelivery tests replay batches within one checkpoint lineage or
    from a fresh one, but nothing pinned a stopped-and-restarted
    query): run 1 drains slices 0-1 (availableNow terminates), slice
    2 arrives while the query is DOWN, run 2 restarts on the SAME
    checkpoint. The restart must process ONLY the new file (offsets
    come from the checkpoint — no re-mining, no duplicate appends),
    continue the micro-batch numbering (slice i -> batch_id i), and
    leave sink + store byte-equal to an uninterrupted 3-batch run.
    This is the stop-rebuild-restart choreography the reseed's
    maintenance-window docstring prescribes."""
    base = tmp_path_factory.mktemp("lshrestart")
    src = str(base / "in")
    os.makedirs(src)
    d = _docs(spark).select("doc_id", "text")
    schema = d.schema.simpleString().replace("struct<", "") \
        .rstrip(">").replace(":", " ").replace(",", ", ")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    try:
        # Uninterrupted reference run (own store/sink/checkpoint).
        refsrc = str(base / "refin")
        os.makedirs(refsrc)
        for s in slices:
            s.coalesce(1).write.mode("append").parquet(refsrc)
            time.sleep(1.1)
        _drain(spark, schema, refsrc, "t_ref_lsh",
               str(base / "refstore"), str(base / "refpairs"),
               str(base / "refckpt"))
        want_pairs = sorted(map(tuple, spark.read.parquet(
            str(base / "refpairs")).collect()))

        # Run 1: only slices 0-1 exist; availableNow drains and
        # terminates — the "stop" half of the maintenance window.
        for s in slices[:2]:
            s.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        _drain(spark, schema, src, "t_rst_lsh", str(base / "store"),
               str(base / "pairs"), str(base / "ckpt"))
        n_sets_after_run1 = spark.table("t_rst_lsh_sets").count()

        # Slice 2 lands while the query is down; run 2 restarts on
        # the SAME checkpoint.
        slices[2].coalesce(1).write.mode("append").parquet(src)
        _drain(spark, schema, src, "t_rst_lsh", str(base / "store"),
               str(base / "pairs"), str(base / "ckpt"))
        for t in ("t_rst_lsh_bands", "t_rst_lsh_sets"):
            spark.catalog.refreshTable(t)  # test-session file index

        got_pairs = sorted(map(tuple, spark.read.parquet(
            str(base / "pairs")).collect()))
        assert got_pairs == want_pairs and got_pairs
        # batch_id continuity: slice 2's pairs carry batch_id 2 in
        # BOTH runs (also implied by the equality above, asserted
        # directly for the restart).
        b2 = {r["batch_id"] for r in spark.read.parquet(
            str(base / "pairs")).filter(
            F.col("new_id") % 3 == 2).collect()}
        assert b2 == {2}
        # The restart appended exactly slice 2 — no re-mining of the
        # already-committed batches.
        assert (spark.table("t_rst_lsh_sets").count()
                - n_sets_after_run1) == slices[2].count()
        for suffix in ("_bands", "_sets"):
            got = sorted(map(tuple, spark.table(f"t_rst_lsh{suffix}")
                             .collect()))
            want = sorted(map(tuple, spark.table(f"t_ref_lsh{suffix}")
                              .collect()))
            assert got == want and got, suffix
    finally:
        for t in ("t_rst_lsh_bands", "t_rst_lsh_sets",
                  "t_ref_lsh_bands", "t_ref_lsh_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
