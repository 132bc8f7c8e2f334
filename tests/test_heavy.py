"""Misra-Gries heavy hitters: exactness vs a plain groupBy, the
certificate, and the adversarial stream the decrement step must
survive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pudl_spark.functions.heavy import HeavyHitterUncertain, heavy_hitters


def test_heavy_hitters_matches_exact_counts(spark):
    rows = ([("a",)] * 500 + [("b",)] * 300 + [("c",)] * 200
            + [(f"x{i}",) for i in range(400)])
    df = spark.createDataFrame(rows, ["v"]).repartition(8)
    got = heavy_hitters(df, "v", k=3, capacity=64).collect()
    assert [(r["item"], r["n"], r["rank"]) for r in got] == [
        ("a", 500, 1), ("b", 300, 2), ("c", 200, 3)]


def test_heavy_hitters_tie_break_is_total(spark):
    rows = [("b",)] * 5 + [("a",)] * 5 + [("c",)] * 9
    df = spark.createDataFrame(rows, ["v"])
    got = heavy_hitters(df, "v", k=3, capacity=64).collect()
    assert [r["item"] for r in got] == ["c", "a", "b"]


def test_heavy_hitters_uncertain_raises(spark):
    # capacity 1 over many distinct singletons cannot certify top-k
    rows = [(f"u{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["v"]).repartition(4)
    with pytest.raises(HeavyHitterUncertain):
        heavy_hitters(df, "v", k=2, capacity=1)


def test_heavy_hitters_survives_decrement_pressure(spark):
    # one true heavy item drowned in distinct noise: the decrement
    # step must not evict it (count 600 > N/(cap+1) = 1600/33 ~ 48.5)
    rows = [("hot",)] * 600 + [(f"n{i}",) for i in range(1000)]
    df = spark.createDataFrame(rows, ["v"]).repartition(2)
    got = heavy_hitters(df, "v", k=1, capacity=32).collect()
    assert got[0]["item"] == "hot" and got[0]["n"] == 600
