"""Salted aggregation equivalence and pipeline asset checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pudl_spark.operators.skew import salted_agg, salted_collect_set
from pudl_spark.plans.pipeline import AssetGraph
from pudl_spark.validate import ValidationError, check_columns_are_close


def test_salted_sum_equals_plain_sum(spark):
    df = spark.createDataFrame(
        [("hot", i % 7) for i in range(500)] + [("cold", 1)],
        "k string, v int")
    plain = {r["k"]: r["s"] for r in
             df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["s"] for r in salted_agg(
        df, ["k"],
        partial_aggs=[F.sum("v").alias("ps")],
        final_aggs=[F.sum("ps").alias("s")],
        salt_buckets=8).collect()}
    assert salted == plain


def test_salted_collect_set_equals_plain(spark):
    df = spark.createDataFrame(
        [("hot", i % 13) for i in range(300)], "k string, v int")
    plain = set(df.groupBy("k").agg(
        F.collect_set("v").alias("s")).collect()[0]["s"])
    got = set(salted_collect_set(df, ["k"], "v").collect()[0]["v_set"])
    assert got == plain


def test_salted_distinct_count_exact_and_setless(spark):
    """VERDICT r7 #2: exact COUNT(DISTINCT) as two grouped passes —
    and the plan holds NO set-building aggregate anywhere (the
    collect_set path materialized the hot key's whole distinct set
    in one buffer)."""
    from pudl_spark.operators.skew import salted_distinct_count

    df = spark.createDataFrame(
        [("hot", i % 97) for i in range(1000)]
        + [("cold", 1), ("cold", None), (None, 3), (None, 3)],
        "k string, v int")
    out = salted_distinct_count(df, ["k"], "v", out_col="n")
    got = {r["k"]: r["n"] for r in out.collect()}
    # NULL value not counted; NULL key is its own group.
    assert got == {"hot": 97, "cold": 1, None: 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    for banned in ("collect_set", "collect_list", "array_distinct"):
        assert banned not in plan, plan
    # Two-stage shape: a (key, value) dedupe aggregate feeding a
    # per-key count — both partial-agg'd (>= 4 HashAggregate nodes).
    assert plan.count("HashAggregate") >= 4, plan


def test_asset_checks_abort_on_violation(spark, tmp_path):
    g = AssetGraph()

    @g.add("bad_metrics",
           checks=(lambda df: check_columns_are_close(df, "a", "b"),))
    def bad(spark_, inputs):
        return spark_.createDataFrame([(1.0, 2.0)], "a double, b double")

    with pytest.raises(ValidationError, match="bad_metrics.check"):
        g.materialize(spark, str(tmp_path))


def test_asset_checks_pass(spark, tmp_path):
    g = AssetGraph()

    @g.add("good_metrics",
           checks=(lambda df: check_columns_are_close(df, "a", "b"),))
    def good(spark_, inputs):
        return spark_.createDataFrame([(1.0, 1.0)], "a double, b double")

    paths = g.materialize(spark, str(tmp_path))
    assert spark.read.parquet(paths["good_metrics"]).count() == 1


def test_scan_stats_pushes_aggregates_to_parquet_footer(spark):
    from pudl_spark.catalog import scan_stats

    before = spark.conf.get("spark.sql.parquet.aggregatePushdown",
                            "false")
    before_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    got = scan_stats(spark, "/root/testdata/sf0.001/lineitem.parquet",
                     ["l_quantity", "l_orderkey"])
    assert got["pushed"] is True
    assert got["min_l_quantity"] == 1.0
    assert got["max_l_quantity"] == 50.0
    assert got["n_rows"] > 0
    # confs restored to whatever the session had
    assert spark.conf.get(
        "spark.sql.parquet.aggregatePushdown", "false") == before
    assert spark.conf.get(
        "spark.sql.sources.useV1SourceList") == before_v1


def test_observed_counts_single_pass(spark):
    from pyspark.sql import functions as F

    from pudl_spark.catalog import read_parquet_table
    from pudl_spark.validate import observed_counts

    df = read_parquet_table(
        spark, "/root/testdata/sf0.001/orders.parquet")
    watched, obs = observed_counts(df, "order_quality", {
        "n": F.count(F.lit(1)),
        "n_null_price": F.sum(
            F.col("o_totalprice").isNull().cast("long")),
        "n_big": F.sum((F.col("o_totalprice") > 100000).cast("long")),
    })
    out = watched.groupBy("o_orderstatus").count().collect()
    assert out
    got = obs.get
    assert got["n"] == df.count()
    assert got["n_null_price"] == 0
    assert 0 < got["n_big"] < got["n"]
