"""Validation-layer checks and calculation-forest reconciliation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pudl_spark.plans.forest import (
    CalcEdge, forest_levels, reconcile_calculations,
)
from pudl_spark.validate import (
    ValidationError, assert_empty, check_columns_are_close,
    check_foreign_key_df, check_one2one_mapping,
    check_quantile_constraints, check_row_counts_per_partition,
    check_sum_close_to_total,
)


def test_row_counts_per_partition(spark):
    df = spark.createDataFrame(
        [(2020, i) for i in range(3)] + [(2021, i) for i in range(5)],
        "year int, id int")
    ok = check_row_counts_per_partition(df, "year",
                                        {"2020": 3, "2021": 5})
    assert ok.count() == 0
    bad = check_row_counts_per_partition(df, "year",
                                         {"2020": 3, "2021": 4, "2022": 1})
    rows = {r["year"] for r in bad.collect()}
    assert rows == {"2021", "2022"}
    with pytest.raises(ValidationError, match="row_counts"):
        assert_empty(bad, "row_counts")


def test_quantile_constraints(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)],
                               "v double")
    ok = check_quantile_constraints(
        df, "v", [(0.5, 49, 51), (0.9, 89, 91)])
    assert ok.count() == 0
    bad = check_quantile_constraints(df, "v", [(0.5, 0, 10)])
    assert bad.count() == 1


def test_columns_are_close(spark):
    df = spark.createDataFrame(
        [(1, 100.0, 100.0000001), (2, 100.0, 105.0), (3, None, None)],
        "id int, a double, b double")
    bad = check_columns_are_close(df, "a", "b", rel_tol=1e-6,
                                  key_cols=["id"])
    assert [r["id"] for r in bad.collect()] == [2]


def test_sum_close_to_total(spark):
    df = spark.createDataFrame(
        [("g1", 40.0, 100.0), ("g1", 60.0, 100.0),
         ("g2", 10.0, 100.0)],
        "g string, part double, total double")
    bad = check_sum_close_to_total(df, ["g"], "part", "total")
    assert [r["g"] for r in bad.collect()] == ["g2"]


def test_one2one_mapping(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 3)],
        "x string, y int")
    bad = check_one2one_mapping(df, "x", "y")
    assert {(r["side"], r["value"]) for r in bad.collect()} == {("x", "b")}


def test_foreign_key_df(spark):
    child = spark.createDataFrame([(1,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    bad = check_foreign_key_df(child, ["fk"], parent, ["pk"])
    assert [r["fk"] for r in bad.collect()] == [99]


def test_forest_levels_and_cycles():
    edges = [CalcEdge("total", "opex"), CalcEdge("total", "capex"),
             CalcEdge("opex", "fuel"), CalcEdge("opex", "labor")]
    assert forest_levels(edges) == [["opex"], ["total"]]
    with pytest.raises(ValueError, match="cycle"):
        forest_levels([CalcEdge("a", "b"), CalcEdge("b", "a")])


def test_reconcile_calculations_two_levels(spark):
    edges = [CalcEdge("total", "opex"), CalcEdge("total", "capex"),
             CalcEdge("opex", "fuel"), CalcEdge("opex", "labor", 2.0)]
    facts = spark.createDataFrame(
        [("e1", "fuel", 10.0), ("e1", "labor", 5.0),
         ("e1", "opex", 20.0),            # = 10 + 2*5: consistent
         ("e1", "capex", 7.0),
         ("e1", "total", 30.0)],          # calc = 20 + 7 = 27: off by 3
        "entity string, fact string, value double")
    out = reconcile_calculations(facts, edges, ["entity"], "fact", "value")
    rows = {r["fact"]: r for r in out.collect()}
    assert rows["opex"]["is_consistent"]
    assert rows["opex"]["calculated"] == 20.0
    assert not rows["total"]["is_consistent"]
    assert rows["total"]["calculated"] == 27.0
    assert rows["total"]["correction"] == pytest.approx(3.0)
