"""Structural cost profile of a query: Spark jobs, stages and tasks
per bench-query execution — the noise-independent counterpart to
wall-clock floors (guide §1: know WHERE the time goes).

Each driver-scheduled job carries fixed scheduling cost regardless of
data volume (~0.1-0.3 s at 32 tasks on the local harness), so a query
that runs 12 small jobs pays seconds before any real work; this tool
makes that count visible and comparable before/after a change.

Usage:
    python tools/job_profile.py [--runs N] name ...
Prints one JSON line per query (best wall of N):
    {"query": ..., "jobs": J, "stages": S, "tasks": T, "wall": sec}
Counts come from the Python StatusTracker via a per-run job group
(after an untimed warmup run).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from pudl_spark.plans.queries import QUERIES
    from pudl_spark.session import get_spark

    spark = get_spark("pudl_spark_jobprofile")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.names:
        fn = QUERIES.get(name)
        if fn is None:
            print(json.dumps({"query": name, "error": "not found"}))
            continue
        gc.collect()
        spark.catalog.clearCache()
        sc.setJobGroup(f"warmup-{name}", name)
        fn(spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()  # untimed warmup
        best = None
        for i in range(args.runs):
            group = f"jp-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            wall = time.perf_counter() - t0
            tracker = sc.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            stages = set()
            for j in job_ids:
                info = tracker.getJobInfo(j)
                if info:
                    stages.update(info.stageIds)
            tasks = 0
            real_stages = 0
            for s in stages:
                si = tracker.getStageInfo(s)
                if si and si.numCompletedTasks > 0:
                    real_stages += 1
                    tasks += si.numCompletedTasks
            cur = {"query": name, "jobs": len(job_ids),
                   "stages_submitted": len(stages),
                   "stages_run": real_stages, "tasks": tasks,
                   "wall": round(wall, 3)}
            if best is None or cur["wall"] < best["wall"]:
                best = cur
        print(json.dumps(best), flush=True)
        sc.setJobGroup("idle", "idle")

    spark.stop()


if __name__ == "__main__":
    main()
