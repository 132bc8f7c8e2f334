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
