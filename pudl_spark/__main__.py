"""CLI — `python -m pudl_spark <command>`.

The reference drives everything through `dg launch --job pudl`
(SURVEY.md §3.1); here the equivalent surface is:

    python -m pudl_spark list                      # registered queries
    python -m pudl_spark query <name> [--sf-dir D] [-n 20]
    python -m pudl_spark explain <name> [--sf-dir D]
    python -m pudl_spark validate [--sf-dir D]     # FK + PK checks
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pudl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    for c in ("query", "explain"):
        p = sub.add_parser(c)
        p.add_argument("name")
        p.add_argument("--sf-dir",
                       default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                              "/root/testdata/sf0.01"))
        if c == "query":
            p.add_argument("-n", "--rows", type=int, default=20)

    v = sub.add_parser("validate", help="FK integrity over the catalog")
    v.add_argument("--sf-dir",
                   default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                          "/root/testdata/sf0.01"))

    args = ap.parse_args(argv)

    from pudl_spark.plans.queries import ORACLES, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            tag = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:40s} [{tag}]")
        return 0

    from pudl_spark.session import get_spark

    spark = get_spark("pudl_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd in ("query", "explain"):
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; try `list`",
                  file=sys.stderr)
            return 2
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.rows, truncate=False)
        return 0

    if args.cmd == "validate":
        from pudl_spark.schema.enforce import check_foreign_key
        from pudl_spark.catalog import Catalog

        cat = Catalog(root=args.sf_dir)
        fks = [
            ("nation", ["n_regionkey"], "region", ["r_regionkey"]),
            ("customer", ["c_nationkey"], "nation", ["n_nationkey"]),
            ("supplier", ["s_nationkey"], "nation", ["n_nationkey"]),
            ("orders", ["o_custkey"], "customer", ["c_custkey"]),
            ("lineitem", ["l_orderkey"], "orders", ["o_orderkey"]),
            ("lineitem", ["l_partkey"], "part", ["p_partkey"]),
            ("lineitem", ["l_suppkey"], "supplier", ["s_suppkey"]),
        ]
        rc = 0
        for child, ccols, parent, pcols in fks:
            n = check_foreign_key(
                cat.read(spark, child), ccols,
                cat.read(spark, parent), pcols)
            status = "ok" if n == 0 else f"{n} ORPHANS"
            if n:
                rc = 1
            print(f"{child}.{ccols} -> {parent}.{pcols}: {status}")
        return rc

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
