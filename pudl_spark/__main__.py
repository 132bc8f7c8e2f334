"""CLI — `python -m pudl_spark <command>`.

The reference drives everything through `dg launch --job pudl`
(SURVEY.md §3.1); here the equivalent surface is:

    python -m pudl_spark list                      # registered queries
    python -m pudl_spark query <name> [--sf-dir D] [-n 20]
    python -m pudl_spark explain <name> [--sf-dir D]
    python -m pudl_spark validate [--sf-dir D]     # FK + PK checks
    python -m pudl_spark etl --store DIR [--incremental]  # demo DAG
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

    e = sub.add_parser(
        "etl", help="materialize the demo asset DAG (raw->core->out)")
    e.add_argument("--sf-dir",
                   default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                          "/root/testdata/sf0.01"))
    e.add_argument("--store", required=True,
                   help="output directory for per-asset parquet")
    e.add_argument("--incremental", action="store_true",
                   help="skip assets whose fingerprint is unchanged")

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

    if args.cmd == "etl":
        from pyspark.sql import functions as F

        from pudl_spark.catalog import read_parquet_table
        from pudl_spark.plans.pipeline import AssetGraph

        sf = args.sf_dir
        g = AssetGraph()

        def _sig(table):
            p = os.path.join(sf, f"{table}.parquet")
            st = os.stat(p)
            return f"{p}:{st.st_size}:{int(st.st_mtime)}"

        @g.add("core_customers", group="core", version="1",
               inputs_signature=lambda: _sig("customer"))
        def core_customers(sp, inputs):
            from pudl_spark.operators.strings import normalize_strings

            c = read_parquet_table(
                sp, os.path.join(sf, "customer.parquet"))
            c = c.withColumn("clean_name", F.col("c_name"))
            return normalize_strings(c, ["clean_name"]).select(
                "c_custkey", "c_nationkey", "clean_name", "c_acctbal")

        @g.add("out_nation_summary", deps=("core_customers",),
               group="out", version="1",
               inputs_signature=lambda: _sig("nation"))
        def out_nation_summary(sp, inputs):
            n = read_parquet_table(
                sp, os.path.join(sf, "nation.parquet"))
            return (inputs["core_customers"]
                    .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
                    .groupBy("n_name")
                    .agg(F.count(F.lit(1)).alias("n_customers"),
                         F.sum("c_acctbal").alias("total_balance")))

        paths = g.materialize(spark, args.store,
                              incremental=args.incremental)
        for name, path in paths.items():
            print(f"materialized {name} -> {path}")
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
