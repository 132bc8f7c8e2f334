"""Per-query profiling harness for the optimization rounds.

Runs named queries() entries at $SPARK_GRAFT_SF_DIR (default sf0.1)
with the same session + noop-sink methodology as bench.py, prints
min-of-N wall seconds, and (with --explain DIR) writes each query's
``.explain("formatted")`` to DIR/<name>.txt so plan claims in
OPTIMIZATION_r*.md are checkable without running Spark.

Usage:
    python tools/profile_query.py [--runs N] [--explain DIR] name ...
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3,
                    help="timed runs after the untimed warmup")
    ap.add_argument("--explain", default=None,
                    help="directory for formatted-plan dumps")
    args = ap.parse_args()

    from pudl_spark.plans.queries import QUERIES
    from pudl_spark.session import get_spark

    spark = get_spark("pudl_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    for name in args.names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND")
            continue
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile: {name}")

        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}.txt"),
                      "w") as f:
                f.write(plan)

        def _timed() -> float:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            return time.perf_counter() - t0

        _timed()  # untimed warmup (C2 JIT), same as bench.py
        runs = [_timed() for _ in range(args.runs)]
        print(f"{name}: min={min(runs):.3f}s runs="
              f"{[round(r, 3) for r in runs]}", flush=True)
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
