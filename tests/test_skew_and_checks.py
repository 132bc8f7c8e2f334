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
