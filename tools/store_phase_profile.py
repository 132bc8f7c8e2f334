"""Phase decomposition of the store-family bench queries (r16 ask #1:
WHERE do the ~4-5 s go — build writes, catalog round trips, probe
planning, or the final verify action?).

Replays each lifecycle with per-phase wall timing + StatusTracker job
counts (per-phase job groups), after one untimed warmup of the whole
query. Usage: python tools/store_phase_profile.py [lsh|ivf|ingest]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Phase:
    def __init__(self, spark):
        self.spark = spark
        self.sc = spark.sparkContext
        self.rows = []

    def run(self, name, fn):
        group = f"ph-{name}-{time.monotonic_ns()}"
        self.sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        jobs = len(self.sc.statusTracker().getJobIdsForGroup(group))
        self.rows.append((name, round(wall, 3), jobs))
        return out

    def report(self, label):
        total = sum(w for _, w, _ in self.rows)
        print(f"== {label}: total {total:.3f}s ==")
        for name, wall, jobs in self.rows:
            print(f"  {name:<38} {wall:7.3f}s  jobs={jobs}")
        self.rows = []


def lsh_lifecycle(spark, ph, prefix="lshprof", mod=43,
                  min_store_bytes=0):
    import tempfile

    from pyspark.sql import functions as F

    from pudl_spark.functions.dedup import (
        build_lsh_store, lsh_store_probe, shingle_hash_sets,
        oph_banded_from_sets,
    )
    from pudl_spark.plans.queries import _collected, _t
    from pudl_spark.sources.files import (
        set_table_build_params, write_bucketed_table,
    )

    d = _t(spark, SF_DIR, "documents")
    corpus = d.filter(F.col("doc_id") % mod != 0)
    batch = d.filter(F.col("doc_id") % mod == 0)
    with tempfile.TemporaryDirectory(prefix="pudl_prof_") as td:
        # decomposed build
        ph.run("build.drop_tables", lambda: [
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{s}")
            for s in ("bands", "sets")])
        ph.run("build.write_sets", lambda: write_bucketed_table(
            shingle_hash_sets(corpus, "doc_id", "text", 3),
            f"{prefix}_sets", ["id"], 8, sort_cols=["id"],
            path=os.path.join(td, "sets")))
        ph.run("build.write_bands", lambda: write_bucketed_table(
            oph_banded_from_sets(spark.table(f"{prefix}_sets"),
                                 64, 16, checkpoint=False),
            f"{prefix}_bands", ["band", "bucket"], 8,
            sort_cols=["band", "bucket", "id"],
            path=os.path.join(td, "bands")))
        ph.run("build.set_params", lambda: set_table_build_params(
            spark, f"{prefix}_bands",
            {"num_hashes": 64, "bands": 16, "shingle_k": 3,
             "num_buckets": 8}))
        try:
            out = ph.run("probe.plan+actions", lambda: lsh_store_probe(
                spark, prefix, batch, "doc_id", "text",
                jaccard_threshold=0.8,
                min_store_bytes=min_store_bytes))
            out2 = ph.run("probe.final_collect",
                          lambda: _collected(spark, out))
            ph.run("noop_sink", lambda: out2.write.format("noop")
                   .mode("overwrite").save())
        finally:
            ph.run("drop_cleanup", lambda: [
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_{s}")
                for s in ("bands", "sets")])


def ivf_lifecycle(spark, ph, prefix="ivfprof"):
    import tempfile

    from pyspark.sql import functions as F

    from pudl_spark.functions.similarity import (
        build_ivf_store, ivf_store_topk,
    )
    from pudl_spark.plans.queries import _collected, _t

    e = _t(spark, SF_DIR, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    with tempfile.TemporaryDirectory(prefix="pudl_prof_") as td:
        ph.run("build_ivf_store", lambda: build_ivf_store(
            spark, e, prefix, os.path.join(td, "store")))
        try:
            out = ph.run("probe.plan+collect", lambda: ivf_store_topk(
                spark, prefix, queries_df, k=10, seed_probe=3))
            out2 = ph.run("final_collect", lambda: _collected(
                spark, out.select("query_id", "neighbor_id",
                                  F.col("rank").cast("int"),
                                  F.round(F.col("score"), 6))))
            ph.run("noop_sink", lambda: out2.write.format("noop")
                   .mode("overwrite").save())
        finally:
            ph.run("drop_cleanup", lambda: [
                spark.sql(f"DROP TABLE IF EXISTS {prefix}"),
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_seeds")])


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from pudl_spark.plans.queries import QUERIES
    from pudl_spark.session import get_spark

    spark = get_spark("store_phase_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    ph = Phase(spark)
    if which in ("lsh", "all"):
        # warmup: full query once, untimed
        QUERIES["doc_lsh_store_probe_small"](spark, SF_DIR) \
            .write.format("noop").mode("overwrite").save()
        for i in range(2):
            lsh_lifecycle(spark, ph)
            ph.report(f"doc_lsh_store_probe_small run{i}")
    if which in ("ivf", "all"):
        QUERIES["ann_ivf_store_probe"](spark, SF_DIR) \
            .write.format("noop").mode("overwrite").save()
        for i in range(2):
            ivf_lifecycle(spark, ph)
            ph.report(f"ann_ivf_store_probe run{i}")
    spark.stop()


if __name__ == "__main__":
    main()
