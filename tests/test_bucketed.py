"""Bucketed tables: the co-located join plans without an Exchange."""

from __future__ import annotations

from pudl_spark.catalog import read_parquet_table
from pudl_spark.sources.files import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    orders = read_parquet_table(spark, f"{SF_DIR}/orders.parquet")
    lineitem = read_parquet_table(spark, f"{SF_DIR}/lineitem.parquet")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
