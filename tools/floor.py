"""Isolated floor measurement — THE protocol SCALE.md adjudications
use, packaged so rounds stop re-scripting it inline (r12).

Protocol (SCALE.md r7, refined r12): fresh session, one UNTIMED
warmup execution per (query, scale), then N timed runs; the floor is
the min. Ratios adjudicate ONLY when numerator and denominator come
from the same session — cross-session ratios carry the documented
1.3-1.4x environmental spread, which with a ~2 s denominator moves a
10x growth ratio by >1.5 all by itself (the r11 minhash false flag).

Usage:
  python tools/floor.py QUERY [QUERY ...]        # sf0.1 floors
  python tools/floor.py --sf1 QUERY [...]        # + 10x scaled copy
  python tools/floor.py --runs 5 QUERY
Prints one JSON line per query:
  {"query": ..., "sf0.1": {"runs": [...], "floor": ...},
   "sf1": {...}, "floor_ratio": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    runs_n, with_sf1 = 3, False
    while args and args[0].startswith("--"):
        if args[0] == "--sf1":
            with_sf1 = True; args = args[1:]
        elif args[0] == "--runs":
            runs_n = int(args[1]); args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    if not args:
        raise SystemExit("usage: floor.py [--sf1] [--runs N] QUERY...")

    from scale_stress import BASE, SCALED, build_scaled

    from pudl_spark.plans.queries import QUERIES
    from pudl_spark.session import get_spark

    spark = get_spark("floor")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    scales = [("sf0.1", BASE)]
    if with_sf1:
        print("building 10x copy ...", file=sys.stderr)
        build_scaled(spark, 10)
        scales.append(("sf1", SCALED))
    for name in args:
        fn = QUERIES[name]
        out: dict = {"query": name}
        for label, sf in scales:
            spark.catalog.clearCache()
            fn(spark, sf).write.format("noop") \
                .mode("overwrite").save()  # untimed warmup
            runs = []
            for _ in range(runs_n):
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop") \
                    .mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 2))
            out[label] = {"runs": runs, "floor": min(runs)}
        if with_sf1:
            out["floor_ratio"] = round(
                out["sf1"]["floor"] / out["sf0.1"]["floor"], 2)
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
