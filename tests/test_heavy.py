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


def test_heavy_hitters_fewer_distinct_than_k_exact(spark):
    # corpus has only 2 distinct items; k=5 is satisfiable exactly
    # because the candidate set covers the whole corpus (ADVICE r3:
    # the certificate must not test rows[-1] as if it were the k-th)
    rows = [("a",)] * 7 + [("b",)] * 3
    df = spark.createDataFrame(rows, ["v"]).repartition(2)
    got = heavy_hitters(df, "v", k=5, capacity=64).collect()
    assert [(r["item"], r["n"]) for r in got] == [("a", 7), ("b", 3)]


def test_heavy_hitters_fewer_candidates_than_k_raises(spark):
    # capacity 1 keeps ~1 candidate per partition; with k larger than
    # the candidate count and non-candidate noise left in the corpus,
    # ranks beyond the candidates are unknowable -> must raise, not
    # return a short "certified" list (ADVICE r3 certification hole)
    rows = [("hot",)] * 400 + [(f"n{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, ["v"]).repartition(2)
    with pytest.raises(HeavyHitterUncertain):
        heavy_hitters(df, "v", k=8, capacity=1)


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "v string")
    assert heavy_hitters(df, "v", k=3, capacity=8).collect() == []


def test_heavy_hitters_survives_decrement_pressure(spark):
    # one true heavy item drowned in distinct noise: the decrement
    # step must not evict it (count 600 > N/(cap+1) = 1600/33 ~ 48.5)
    rows = [("hot",)] * 600 + [(f"n{i}",) for i in range(1000)]
    df = spark.createDataFrame(rows, ["v"]).repartition(2)
    got = heavy_hitters(df, "v", k=1, capacity=32).collect()
    assert got[0]["item"] == "hot" and got[0]["n"] == 600
