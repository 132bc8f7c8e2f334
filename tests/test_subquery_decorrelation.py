"""Catalyst must decorrelate the correlated-scalar-subquery query
into aggregate joins — no per-row subquery execution nodes."""

from __future__ import annotations

from pudl_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_correlated_subqueries_become_joins(spark):
    df = QUERIES["orders_above_customer_avg"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ScalarSubquery") == 0
    assert plan.count("Join") >= 2


def test_semantics_strictly_above_average(spark):
    rows = QUERIES["orders_above_customer_avg"](spark, SF).collect()
    assert rows
    # Recompute per-customer averages independently and check every
    # returned order is strictly above its customer's mean.
    from pudl_spark.catalog import read_parquet_table
    full = read_parquet_table(spark, f"{SF}/orders.parquet").collect()
    by_cust: dict = {}
    for r in full:
        by_cust.setdefault(r["o_custkey"], []).append(r["o_totalprice"])
    import decimal
    for r in rows:
        vals = [decimal.Decimal(f"{v:.2f}") for v in by_cust[r["o_custkey"]]]
        assert decimal.Decimal(f"{r['o_totalprice']:.2f}") * len(vals) \
            > sum(vals)


def test_q21_shape_single_grouped_pass(spark):
    """suppliers_kept_waiting rewrites EXISTS/NOT EXISTS as one
    grouped pass: under the at-scale SMJ regime the group-by and
    both windows reuse the join's orderkey partitioning — the only
    Exchanges are the join's two sides plus the tiny final
    per-supplier aggregate."""
    import re

    from pudl_spark.plans.queries import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["suppliers_kept_waiting"](
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    hashes = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    # join sides (l_orderkey, o_orderkey) + final s_name agg — and
    # crucially NO exchange keyed on (orderkey, suppkey) or for the
    # windows.
    assert sorted(hashes) == ["l_orderkey", "o_orderkey", "s_name"], plan
