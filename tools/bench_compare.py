"""Compare two BENCH_r*.json artifacts with the SCALE.md drift rule.

The round-6 lesson: suite readings drift TOGETHER (r6 read a uniform
~1.22x slower than r5 across queries whose code never changed — machine
noise, not regressions). The honest per-query signal is therefore the
ratio RELATIVE to the round's environmental shift, estimated as the
median ratio over a set of queries known to be untouched.

Usage:
    python tools/bench_compare.py BENCH_r06.json BENCH_r07.json \
        [--touched name1,name2,...]

Prints:
  - the untouched-query median ratio (the environmental drift estimate)
  - per-query drift-adjusted ratios, flagging only |adjusted| >= 1.5x
  - sf1 growth-ratio deltas where both files carry them

``--touched`` names are excluded from the drift estimate (their changes
are real); default is to estimate drift over every common query, which
is conservative when few queries changed.
"""

from __future__ import annotations

import argparse
import json
import re
import statistics
import sys


def _recover_from_tail(tail: str) -> dict:
    """Best-effort parse of a driver BENCH_r*.json whose 2000-char
    "tail" window cut the head of the bench line (r1-r6 artifacts:
    parsed=null once the line outgrew the window). Per-query seconds
    and the sf1 block live late in the line, so the tail usually
    keeps them; the headline wall may be gone (-> value absent)."""
    out: dict = {"queries": {}, "sf1": {}}
    sf1_at = tail.find('"sf1"')
    head = tail if sf1_at < 0 else tail[:sf1_at]
    for m in re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)[,}]', head):
        name, sec = m.group(1), float(m.group(2))
        if name in ("value", "sf", "n", "rc", "cpus"):
            continue
        out["queries"][name] = sec
    if sf1_at >= 0:
        for m in re.finditer(
                r'"([a-z0-9_]+)": \{"sec": ([0-9.]+), '
                r'"ratio_vs_base": ([0-9.]+)\}', tail[sf1_at:]):
            out["sf1"][m.group(1)] = {"sec": float(m.group(2)),
                                      "ratio_vs_base": float(m.group(3))}
    wall = re.search(r'"value": ([0-9.]+)', tail)
    if wall:
        out["value"] = float(wall.group(1))
    return out


def load(path: str) -> dict:
    with open(path) as f:
        d = json.loads(f.read().strip())
    if "queries" in d:          # raw bench line / BENCH_LATEST_FULL
        return d
    if d.get("parsed"):         # driver artifact, line fit the window
        return d["parsed"]
    return _recover_from_tail(d.get("tail", ""))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--touched", default="",
                    help="comma-separated queries changed this round "
                         "(excluded from the drift estimate)")
    ap.add_argument("--flag", type=float, default=1.5,
                    help="drift-adjusted ratio that flags a query")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    touched = {t for t in args.touched.split(",") if t}
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    if not common:
        sys.exit("no common queries between the two files")

    ratios = {n: nq[n] / oq[n] for n in common if oq[n] > 0}
    untouched = [r for n, r in ratios.items() if n not in touched]
    drift = statistics.median(untouched) if untouched else 1.0
    print(f"common queries: {len(common)}  "
          f"(drift estimate over {len(untouched)} untouched)")
    print(f"environmental drift (untouched median ratio): {drift:.3f}")
    ow, nw = old.get("value"), new.get("value")
    if ow and nw:
        print(f"suite wall: {ow:.1f} -> {nw:.1f} s "
              f"({nw / ow:.2f}x raw, {nw / ow / drift:.2f}x adjusted)")
    else:
        print("suite wall: not recoverable from one side "
              "(truncated driver artifact)")

    flagged = []
    for n in common:
        if n not in ratios:  # old reading was 0.0 (truncated tail)
            continue
        adj = ratios[n] / drift
        if adj >= args.flag or adj <= 1.0 / args.flag:
            flagged.append((adj, n))
    if flagged:
        print(f"\nqueries beyond {args.flag}x after drift adjustment "
              "(plan signals, not noise):")
        for adj, n in sorted(flagged, reverse=True):
            mark = " [touched]" if n in touched else ""
            print(f"  {n}: {oq[n]:.2f} -> {nq[n]:.2f} s "
                  f"(raw {ratios[n]:.2f}x, adjusted {adj:.2f}x){mark}")
    else:
        print("\nno query beyond the flag threshold after drift "
              "adjustment — the suite moved together.")

    os1, ns1 = old.get("sf1", {}), new.get("sf1", {})
    both = sorted(set(os1) & set(ns1))
    if both:
        print("\nsf1 growth ratios (10x data; SCALE.md bars: shuffle-"
              "bound <=5, compute-bound <=10):")
        for n in both:
            print(f"  {n}: {os1[n]['ratio_vs_base']:.2f} -> "
                  f"{ns1[n]['ratio_vs_base']:.2f}")
        for n in sorted(set(ns1) - set(os1)):
            print(f"  {n}: (new) {ns1[n]['ratio_vs_base']:.2f}")


if __name__ == "__main__":
    main()
