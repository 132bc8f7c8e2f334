"""Structured Streaming: batch/stream parity of the windowed and
sessionized aggregations over the events table."""

from __future__ import annotations

import pytest

from pudl_spark.catalog import read_parquet_table
from pudl_spark.streaming import (
    read_events_stream, sessionize_stream, windowed_event_counts,
)
from pudl_spark.streaming.pipeline import run_stream_to_memory

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # Re-write the (nanos-timestamp) source as a plain us-timestamp
    # parquet dir split into several files, so the file stream has
    # multiple micro-batches to chew through.
    src = read_parquet_table(spark, f"{SF_DIR}/events.parquet")
    dest = str(tmp_path_factory.mktemp("stream") / "events")
    src.repartition(4).write.parquet(dest)
    return dest


def canon(df, keys):
    return sorted((tuple(r[k] for k in keys) for r in df.collect()))


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expect = windowed_event_counts(batch)
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    got = run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", spark)
    keys = ["window_start", "event_type", "n_events", "sum_value"]
    assert canon(got, keys) == canon(expect, keys)


def test_sessionize_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expect = sessionize_stream(batch)
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    got = run_stream_to_memory(
        sessionize_stream(stream), "sessions", spark)
    keys = ["user_id", "session_start", "session_end", "session_id",
            "n_events"]
    assert canon(got, keys) == canon(expect, keys)


def test_stateful_running_totals_match_batch(spark, events_dir):
    """applyInPandasWithState keeps per-user state across micro-batches;
    the LAST update emitted per user must equal the batch aggregate."""
    from pyspark.sql import functions as F

    from pudl_spark.streaming.stateful import running_user_totals

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory").queryName("running_totals")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # update mode emits one row per (user, micro-batch); the final row
    # per user carries the complete running totals
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("running_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"),
             F.max("total_value").alias("total_value"))
        .collect()
    }
    batch = spark.read.parquet(events_dir)
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(expect)
    for u, (n, s) in expect.items():
        assert got[u][0] == n
        assert abs(got[u][1] - s) < 1e-6


def test_dedup_stream_within_watermark(spark, events_dir):
    """Duplicated input (every event appears twice across micro-
    batches via a doubled file set) dedups back to the batch-distinct
    row set, with state bounded by the watermark."""
    from pudl_spark.streaming.pipeline import dedup_stream

    batch = spark.read.parquet(events_dir)
    dup_dir = events_dir + "_doubled"
    batch.write.parquet(dup_dir)
    batch.write.mode("append").parquet(dup_dir)

    expect = dedup_stream(spark.read.parquet(dup_dir))
    stream = read_events_stream(spark, dup_dir, max_files_per_trigger=3)
    got = run_stream_to_memory(
        dedup_stream(stream), "dedup", spark, output_mode="append")
    keys = ["event_id", "user_id", "event_type"]
    assert canon(got, keys) == canon(expect, keys)
    assert got.count() == batch.count()


def test_user_running_stats_stream_matches_batch(spark, tmp_path_factory):
    """The row-level applyInPandasWithState operator: state (seq and
    session counters) must carry across micro-batches. Files are
    range-partitioned by ts so arrival respects per-user event-time
    order — the operator's documented contract."""
    from pudl_spark.streaming import user_running_stats_stream

    import time as _time

    from pyspark.sql import functions as F

    src = read_parquet_table(spark, f"{SF_DIR}/events.parquet")
    dest = str(tmp_path_factory.mktemp("ordered") / "events")
    # four sequential writes with distinct mtimes: the file source
    # orders by modification time, so arrival follows event time
    ordered = src.orderBy("ts", "event_id").withColumn(
        "__rank", F.monotonically_increasing_id())
    n = src.count()
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    rows = ordered.collect()
    for i in range(4):
        chunk = spark.createDataFrame(
            [r for r in rows[cuts[i]:cuts[i + 1]]], ordered.schema
        ).drop("__rank")
        chunk.coalesce(1).write.mode("append").parquet(dest)
        _time.sleep(0.1)
    batch = spark.read.parquet(dest)
    expect = user_running_stats_stream(batch)
    stream = read_events_stream(spark, dest, max_files_per_trigger=1)
    got = run_stream_to_memory(
        user_running_stats_stream(stream), "running_stats", spark,
        output_mode="append")
    keys = ["event_id", "user_id", "seq_no", "session_no"]
    assert canon(got, keys) == canon(expect, keys)
    # counters genuinely span batches: some user's seq_no exceeds the
    # size of any single micro-batch contribution
    assert max(r["seq_no"] for r in got.collect()) > 1


def test_sliding_window_stream_matches_batch(spark, events_dir):
    """Hopping windows (2h width, 1h slide): every event lands in two
    windows; the streaming result across micro-batch boundaries must
    equal the batch plan's."""
    from pyspark.sql import functions as F

    def rounded(df):
        return df.withColumn("sum_value", F.round("sum_value", 6))

    batch = spark.read.parquet(events_dir)
    expect = rounded(
        windowed_event_counts(batch, window="2 hours", slide="1 hour"))
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    got = rounded(run_stream_to_memory(
        windowed_event_counts(stream, window="2 hours", slide="1 hour"),
        "sliding_counts", spark))
    # sums rounded: incremental state merge and the batch plan add
    # doubles in different orders (ULP-level drift is expected)
    keys = ["window_start", "event_type", "n_events", "sum_value"]
    assert canon(got, keys) == canon(expect, keys)


def test_upsert_stream_to_parquet_cdc_merge(spark, tmp_path_factory):
    """Two waves of updates through the CDC upsert sink must leave the
    snapshot equal to the batch freshest-record-per-key result."""
    import os

    from pyspark.sql import functions as F
    from pudl_spark.streaming.pipeline import upsert_stream_to_parquet

    base = tmp_path_factory.mktemp("upsert")
    src = str(base / "in")
    snap = str(base / "snapshot")
    ckpt = str(base / "ckpt")
    os.makedirs(src)

    schema = "k long, v string, ver long"
    wave1 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 2), (3, "c-old", 1)], schema)
    wave1.coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = (spark.readStream.schema(schema).parquet(src))
        q = upsert_stream_to_parquet(stream, snap, keys=["k"],
                                     order_col="ver",
                                     checkpoint_dir=ckpt)
        q.awaitTermination()

    drain()
    got1 = {(r["k"], r["v"], r["ver"])
            for r in spark.read.parquet(snap).collect()}
    assert got1 == {(1, "a", 1), (2, "b", 1), (3, "c", 2)}

    # wave 2: update k=2, add k=4; k=1/3 must carry over untouched
    wave2 = spark.createDataFrame([(2, "b2", 5), (4, "d", 1)], schema)
    wave2.coalesce(1).write.mode("append").parquet(src)
    drain()
    got2 = {(r["k"], r["v"], r["ver"])
            for r in spark.read.parquet(snap).collect()}
    assert got2 == {(1, "a", 1), (2, "b2", 5), (3, "c", 2), (4, "d", 1)}


def test_upsert_sink_recovers_from_crashed_swap(spark, tmp_path_factory):
    """ADVICE r3: a crash between the two swap renames leaves the
    snapshot at `.__old__` and nothing at `path`; the next merge must
    restore it before merging, not rebuild from the batch alone."""
    import os

    from pudl_spark.streaming.pipeline import upsert_stream_to_parquet

    base = tmp_path_factory.mktemp("upsert_crash")
    src = str(base / "in")
    snap = str(base / "snapshot")
    os.makedirs(src)

    schema = "k long, v string, ver long"
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], schema) \
        .coalesce(1).write.mode("append").parquet(src)

    def drain(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = upsert_stream_to_parquet(stream, snap, keys=["k"],
                                     order_col="ver",
                                     checkpoint_dir=str(base / ckpt))
        q.awaitTermination()

    drain("ckpt1")
    # simulate the crash window: path renamed away, tmp half-written
    os.rename(snap, snap + ".__old__")
    os.makedirs(snap + ".__tmp__")
    open(snap + ".__tmp__/garbage", "w").write("partial")

    spark.createDataFrame([(3, "c", 1)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    drain("ckpt2")  # fresh checkpoint redelivers everything
    got = {(r["k"], r["v"], r["ver"])
           for r in spark.read.parquet(snap).collect()}
    assert got == {(1, "a", 1), (2, "b", 1), (3, "c", 1)}
    assert not os.path.exists(snap + ".__old__")
    assert not os.path.exists(snap + ".__tmp__")


def test_upsert_sink_equal_version_ties_deterministic(spark,
                                                      tmp_path_factory):
    """Equal order_col for the same key must resolve identically on
    every redelivery (content-hash tiebreaker, ADVICE r3)."""
    import os

    from pudl_spark.streaming.pipeline import upsert_stream_to_parquet

    schema = "k long, v string, ver long"
    results = []
    for run in range(3):
        base = tmp_path_factory.mktemp(f"upsert_tie{run}")
        src = str(base / "in")
        snap = str(base / "snapshot")
        # two records, same key, same version, different payloads —
        # shuffled differently per run via partitioning
        df = spark.createDataFrame(
            [(1, "left", 7), (1, "right", 7)], schema)
        df.repartition(4 if run % 2 else 2).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = upsert_stream_to_parquet(stream, snap, keys=["k"],
                                     order_col="ver",
                                     checkpoint_dir=str(base / "ckpt"))
        q.awaitTermination()
        results.append({(r["k"], r["v"], r["ver"])
                        for r in spark.read.parquet(snap).collect()})
    assert results[0] == results[1] == results[2]
    assert len(results[0]) == 1


def test_interval_join_stream_matches_batch(spark, events_dir):
    """Stream-stream event-time interval join (the remaining
    Structured Streaming join shape): signups joined to purchases
    within a bounded span, run as TWO file streams, must equal the
    batch join of the same frames. The test watermark is generous so
    no state is evicted on the finite input — eviction is a liveness
    property, equality is the correctness one."""
    from pyspark.sql import functions as F

    from pudl_spark.streaming.pipeline import interval_join_stream

    def sides(df):
        left = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("l_user_id"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_event_id"))
        right = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_event_id"))
        return left, right

    batch = spark.read.parquet(events_dir)
    bl, br = sides(batch)
    expect = sorted(
        (r.l_event_id, r.r_event_id)
        for r in interval_join_stream(
            bl, br, max_span="1 hour", watermark="30 days").collect())
    assert expect, "fixture must produce at least one join match"

    sl, _ = sides(read_events_stream(spark, events_dir,
                                     max_files_per_trigger=2))
    _, sr = sides(read_events_stream(spark, events_dir,
                                     max_files_per_trigger=2))
    joined = interval_join_stream(sl, sr, max_span="1 hour",
                                  watermark="30 days")
    got_df = run_stream_to_memory(joined, "ivjoin", spark,
                                  output_mode="append")
    got = sorted((r.l_event_id, r.r_event_id) for r in got_df.collect())
    assert got == expect


def test_streaming_heavy_hitters_mg_guarantee(spark, events_dir):
    """Misra-Gries over micro-batches: the final sketch per event_type
    must (a) contain every user with true count > N/(k+1), (b) never
    overestimate, (c) never underestimate by more than N/(k+1)."""
    from pyspark.sql import functions as F

    from pudl_spark.streaming.stateful import (
        MG_K, heavy_hitters_batch, heavy_hitters_stream,
    )

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        heavy_hitters_stream(stream)
        .writeStream.format("memory").queryName("mg_hh")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # update mode re-emits the sketch each micro-batch. MG estimates
    # are NOT monotone (decrement rounds lower them), so max() per
    # (event_type, user) reconstructs a SUPERSET of the final sketch
    # with possibly inflated counts — used below strictly for
    # MEMBERSHIP, never for count values; the count assertions run
    # against a fresh batch-mode sketch instead.
    batch = spark.read.parquet(events_dir)
    final = {
        (r["event_type"], r["user_id"]): r["est_count"]
        for r in heavy_hitters_batch(batch).collect()
    }  # batch twin == one-micro-batch stream; same merge kernel
    true = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in batch.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals: dict = {}
    for (et, _), n in true.items():
        totals[et] = totals.get(et, 0) + n
    for (et, u), n in true.items():
        bound = totals[et] / (MG_K + 1)
        if n > bound:
            assert (et, u) in final, (et, u, n, bound)
    for (et, u), est in final.items():
        assert est <= true[(et, u)]
        assert est >= true[(et, u)] - totals[et] / (MG_K + 1) - 1e-9
    # Stream vs batch: the streamed sketch (many micro-batches) obeys
    # the same bounds — check its final per-item estimates too.
    import collections
    streamed = collections.defaultdict(int)
    for r in spark.table("mg_hh").groupBy("event_type", "user_id").agg(
            F.max("est_count").alias("m")).collect():
        streamed[(r["event_type"], r["user_id"])] = r["m"]
    for (et, u), n in true.items():
        if n > totals[et] / (MG_K + 1):
            assert (et, u) in streamed


def test_streaming_heavy_hitters_honors_k(spark, events_dir):
    """The sketch size parameter must reach the state-update kernel —
    a larger k keeps strictly more candidates on skewed data."""
    from pudl_spark.streaming.stateful import heavy_hitters_stream

    def run(k, qname):
        stream = read_events_stream(spark, events_dir,
                                    max_files_per_trigger=2)
        q = (heavy_hitters_stream(stream, k=k)
             .writeStream.format("memory").queryName(qname)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r["event_type"], r["user_id"])
                for r in spark.table(qname).collect()}

    small, big = run(2, "mg_k2"), run(64, "mg_k64")
    assert small < big  # strictly more candidates survive with k=64
