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
  python tools/floor.py --all-watched [OLD NEW]  # auto-adjudicate
Prints one JSON line per query:
  {"query": ..., "sf0.1": {"runs": [...], "floor": ...},
   "sf1": {...}, "floor_ratio": ...}

--all-watched (VERDICT r12 #8): compares the sf1 growth ratios of
two bench artifacts (default: the committed anchor
BENCH_LATEST_FULL.json vs the latest run's BENCH_SCRATCH.json) and
re-floors — at both scales, same-session — every query whose suite
ratio moved by more than 1.5x round-over-round, turning the
recurring per-round adjudication asks into one command. Queries in
only one artifact's sf1 section are flooded too (new watches).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def watched_movers(old_path: str, new_path: str,
                   threshold: float = 1.5) -> list[str]:
    """Queries whose sf1 suite growth ratio moved > threshold (either
    direction) between two bench artifacts, plus queries tracked in
    only one of them. Pure artifact comparison — no Spark."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def ratios(p: str) -> dict[str, float]:
        with open(os.path.join(repo, p) if not os.path.isabs(p)
                  else p) as f:
            d = json.load(f)
        sf1 = d.get("sf1") or {}
        return {q: v["ratio_vs_base"] for q, v in sf1.items()
                if isinstance(v, dict) and "ratio_vs_base" in v}

    old, new = ratios(old_path), ratios(new_path)
    movers = sorted(set(old) ^ set(new))
    for q in sorted(set(old) & set(new)):
        lo, hi = sorted((old[q], new[q]))
        if lo > 0 and hi / lo > threshold:
            movers.append(q)
    return sorted(set(movers))


def main() -> int:
    args = sys.argv[1:]
    runs_n, with_sf1, all_watched = 3, False, False
    while args and args[0].startswith("--"):
        if args[0] == "--sf1":
            with_sf1 = True; args = args[1:]
        elif args[0] == "--runs":
            runs_n = int(args[1]); args = args[2:]
        elif args[0] == "--all-watched":
            all_watched = True; args = args[1:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    if all_watched:
        if len(args) > 2:
            raise SystemExit(
                "--all-watched takes at most two operands "
                "(OLD_ARTIFACT NEW_ARTIFACT), got: " + " ".join(args))
        old_p, new_p = (args + ["BENCH_LATEST_FULL.json",
                                "BENCH_SCRATCH.json"][len(args):])[:2]
        args = watched_movers(old_p, new_p)
        with_sf1 = True
        print(f"re-flooring {len(args)} moved watches: {args}",
              file=sys.stderr)
        if not args:
            return 0
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
        if name not in QUERIES:
            # --all-watched can select a watch whose query was
            # renamed/retired since the old artifact; skip it rather
            # than dying after the (expensive) scaled-copy build.
            print(f"skipping {name}: not in the query registry",
                  file=sys.stderr)
            continue
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
