"""G4 Fellegi-Sunter linkage: level assignment, weight math, blocking."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pudl_spark.functions.linkage import (
    bayes_factor_bits, block_candidates, exact_comparison,
    fellegi_sunter_weight, name_comparison, similarity_ratio,
)


def test_name_comparison_levels(spark):
    df = spark.createDataFrame(
        [("abc", "abc"), ("abcdefghij", "abcdefghijs"),
         ("abcdefghij", "zzzzzzzzzz"), (None, "x")],
        "l string, r string")
    out = df.select(
        name_comparison(F.col("l"), F.col("r")).alias("bits")).collect()
    assert out[0]["bits"] == bayes_factor_bits(0.5, 0.004)     # exact
    assert out[1]["bits"] == bayes_factor_bits(0.3, 0.01)      # sim>=0.9
    assert out[2]["bits"] == bayes_factor_bits(0.05, 0.916)    # else
    assert out[3]["bits"] == 0.0                               # null level


def test_weight_is_prior_plus_factors(spark):
    df = spark.createDataFrame([("a", "a", "x", "y")],
                               "l1 string, r1 string, l2 string, r2 string")
    w = fellegi_sunter_weight([
        exact_comparison(F.col("l1"), F.col("r1"), 0.9, 0.04),
        exact_comparison(F.col("l2"), F.col("r2"), 0.9, 0.04),
    ], prior=0.01)
    got = df.select(w.alias("w")).collect()[0]["w"]
    want = (math.log2(0.01 / 0.99) + bayes_factor_bits(0.9, 0.04)
            + bayes_factor_bits(0.1, 0.96))
    assert got == want


def test_block_candidates_union_dedup(spark):
    left = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y")], "lk long, b1 string, b2 string")
    right = spark.createDataFrame(
        [(10, "a", "x"), (20, "z", "x")], "rk long, b1 string, b2 string")
    pairs = block_candidates(left, right, [["b1"], ["b2"]], "lk", "rk")
    got = {(r["lk"], r["rk"]) for r in pairs.collect()}
    # (1,10) matches BOTH rules but appears once; (2,10) via b1;
    # (1,20) via b2
    assert got == {(1, 10), (2, 10), (1, 20)}


def test_similarity_ratio_bounds(spark):
    df = spark.createDataFrame([("kitten", "sitting")], "l string, r string")
    got = df.select(
        similarity_ratio(F.col("l"), F.col("r")).alias("s")).collect()[0]["s"]
    assert got == 1.0 - 3.0 / 7.0


def test_asof_join_backward_semantics(spark):
    import datetime as dt

    from pudl_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def at(h):
        return t0 + dt.timedelta(hours=h)

    left = spark.createDataFrame(
        [("u", 1, at(5)), ("u", 2, at(10)), ("u", 3, at(0)),
         ("v", 4, at(3))],
        "k string, lid long, ts timestamp")
    right = spark.createDataFrame(
        [("u", at(2), 100.0), ("u", at(5), None), ("u", at(7), 300.0),
         ("w", at(1), 900.0)],
        "k string, rts timestamp, val double")
    out = asof_join(left, right, ["k"], "ts", "rts", ["val"])
    got = {r["lid"]: (r["asof_rts"], r["asof_val"]) for r in out.collect()}
    assert got[1] == (at(5), None)     # ties match (<=); NULL val kept
    assert got[2] == (at(7), 300.0)    # latest at-or-before
    assert got[3] == (None, None)      # nothing before -> left join null
    assert got[4] == (None, None)      # key with no right rows at all
    assert out.count() == 4            # left rows preserved exactly


def test_banded_value_join_completeness(spark):
    """Pairs straddling a bucket boundary are still found; pairs just
    outside tolerance are not; no duplicates."""
    from pudl_spark.operators.joins import banded_value_join

    left = spark.createDataFrame(
        [(1, 9.99), (2, 50.0)], "lid long, lv double")
    right = spark.createDataFrame(
        [(10, 10.01), (11, 19.98), (12, 20.01), (13, 49.0)],
        "rid long, rv double")
    out = banded_value_join(left, right, "lv", "rv", 10.0)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    # 9.99 matches 10.01 (boundary straddle) and 19.98 (9.99 apart);
    # 20.01 is 10.02 away -> excluded; 50.0 matches 49.0 only.
    assert got == [(1, 10), (1, 11), (2, 13)]


JW_CASES = [
    ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
    ("JELLYFISH", "SMELLYFISH"), ("DUANE", "DWAYNE"),
    ("", ""), ("", "A"), ("ABC", "ABC"), ("AB", "BA"), ("a", "b"),
    ("CRATE", "TRACE"), ("abcd", "abcd "), ("x", "x"),
    ("ab", "abzzzzzzzz"),                 # boost above threshold
    ("abqrst", "abxyzw"),                 # prefix but jaro <= 0.7: no boost
    ("az", "aq"),                         # jaro == 2/3: boundary, no boost
    ("abcdefgh", "abcdefghijklmnop"),     # prefix capped at 4
    ("lavender midnight", "lavender midnights"),
    ("thgindim rednevals", "lavender midnight"),
]


def test_jaro_winkler_matches_duckdb_exactly(spark):
    """The pandas-UDF kernel must reproduce DuckDB's
    jaro_winkler_similarity double-for-double — this is what makes
    the jw_* query oracles valid."""
    import duckdb

    from pudl_spark.functions.linkage import jaro_winkler

    df = spark.createDataFrame(JW_CASES, "a string, b string")
    got = {(r["a"], r["b"]): r["jw"] for r in df.select(
        "a", "b", jaro_winkler(F.col("a"), F.col("b")).alias("jw")
    ).collect()}
    for a, b in JW_CASES:
        want = duckdb.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


def test_jaro_winkler_null_propagates(spark):
    from pudl_spark.functions.linkage import jaro_winkler

    df = spark.createDataFrame(
        [("x", None), (None, "y"), ("x", "y")], "a string, b string")
    vals = [r["jw"] for r in df.select(
        jaro_winkler(F.col("a"), F.col("b")).alias("jw")).collect()]
    assert vals[0] is None and vals[1] is None and vals[2] == 0.0


def test_jaro_winkler_batch_matches_scalar_randomized():
    """The vectorized batch kernel must be bitwise-identical to the
    scalar reference on randomized strings (incl. empties, equals,
    prefix-extends, non-ASCII)."""
    import random

    from pudl_spark.functions.linkage import (
        _jaro_winkler_batch, _jaro_winkler_pair)

    rng = random.Random(7)
    alpha = "abcdefgh XYZ0123é"
    cases = []
    for _ in range(2000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        if rng.random() < 0.2:
            b = a
        if rng.random() < 0.2:
            b = a[:rng.randint(0, len(a))] + b
        cases.append((a, b))
    got = _jaro_winkler_batch([a for a, _ in cases],
                              [b for _, b in cases])
    for (a, b), v in zip(cases, got):
        assert v == _jaro_winkler_pair(a, b), (a, b)


def test_gamma_column_levels_and_nulls(spark):
    from pudl_spark.functions.linkage import gamma_column

    df = spark.createDataFrame(
        [("abc", "abc"), ("abc", "abd"), ("abc", "zzz"), (None, "abc")],
        "l string, r string")
    g = gamma_column([F.col("l") == F.col("r"),
                      F.levenshtein("l", "r") <= 1])
    got = [r[0] for r in df.select(g).collect()]
    assert got == [2, 1, 0, 0]


def test_em_train_recovers_planted_mixture(spark):
    """EM on a synthetic two-class population with known m/u must
    recover the planted parameters from unlabeled pattern counts.

    Three comparisons: the Fellegi-Sunter conditional-independence
    mixture is only identifiable with k >= 3 (2 binary comparisons
    give 3 observed degrees of freedom for 5 parameters)."""
    import random

    from pudl_spark.functions.linkage import em_train

    rng = random.Random(7)
    rows = []
    for _ in range(4000):
        if rng.random() < 0.4:  # match class
            a = 1 if rng.random() < 0.9 else 0
            b = 1 if rng.random() < 0.8 else 0
            c = 1 if rng.random() < 0.7 else 0
        else:
            a = 1 if rng.random() < 0.05 else 0
            b = 1 if rng.random() < 0.2 else 0
            c = 1 if rng.random() < 0.1 else 0
        rows.append((a, b, c))
    df = spark.createDataFrame(rows, "a int, b int, c int")
    em = em_train(df, {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")},
                  {"a": 2, "b": 2, "c": 2})
    assert abs(em.lam - 0.4) < 0.05
    assert abs(em.m["a"][1] - 0.9) < 0.05
    assert abs(em.u["a"][1] - 0.05) < 0.05
    assert abs(em.m["b"][1] - 0.8) < 0.07
    assert abs(em.u["b"][1] - 0.2) < 0.07
    assert abs(em.m["c"][1] - 0.7) < 0.07
    assert abs(em.u["c"][1] - 0.1) < 0.07


def test_em_train_deterministic(spark):
    from pudl_spark.functions.linkage import em_train

    df = spark.createDataFrame(
        [(i % 2, (i // 2) % 2) for i in range(100)], "a int, b int")
    r1 = em_train(df, {"a": F.col("a"), "b": F.col("b")}, {"a": 2, "b": 2})
    r2 = em_train(df, {"a": F.col("a"), "b": F.col("b")}, {"a": 2, "b": 2})
    assert r1 == r2


def test_em_train_from_counts_matches_em_train(spark):
    """`em_train` is exactly `em_train_from_counts` over its one
    distributed aggregation (the r15 fs_linkage_trained scan-sharing
    rests on this): feeding the same γ-pattern sufficient statistics
    directly must reproduce identical float64 parameters, in any
    pattern order."""
    from pudl_spark.functions.linkage import (
        em_train, em_train_from_counts,
    )

    df = spark.createDataFrame(
        [((i * 7) % 3, (i * 5) % 2, (i * 11) % 2) for i in range(500)],
        "a int, b int, c int")
    full = em_train(df, {"a": F.col("a"), "b": F.col("b"),
                         "c": F.col("c")}, {"a": 3, "b": 2, "c": 2})
    counts: dict = {}
    for i in range(500):
        k = ((i * 7) % 3, (i * 5) % 2, (i * 11) % 2)
        counts[k] = counts.get(k, 0) + 1
    items = sorted(counts.items())
    direct = em_train_from_counts(
        [list(k) for k, _ in items], [v for _, v in items],
        ["a", "b", "c"], {"a": 3, "b": 2, "c": 2})
    assert direct.lam == full.lam
    assert direct.m == full.m and direct.u == full.u
    assert direct.iters == full.iters


def test_score_with_em_separates_planted_classes(spark):
    """End-to-end train -> score: EM-trained weights must rank true
    matches above non-matches on the planted-mixture fixture."""
    import random

    from pudl_spark.functions.linkage import em_train, score_with_em

    rng = random.Random(11)
    rows = []
    for _ in range(2000):
        is_match = rng.random() < 0.4
        if is_match:
            a = 1 if rng.random() < 0.9 else 0
            b = 1 if rng.random() < 0.8 else 0
            c = 1 if rng.random() < 0.7 else 0
        else:
            a = 1 if rng.random() < 0.05 else 0
            b = 1 if rng.random() < 0.2 else 0
            c = 1 if rng.random() < 0.1 else 0
        rows.append((is_match, a, b, c))
    df = spark.createDataFrame(rows, "is_match boolean, a int, b int, c int")
    gammas = {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")}
    em = em_train(df, gammas, {"a": 2, "b": 2, "c": 2})
    scored = df.withColumn("w", score_with_em(gammas, em))
    agg = scored.groupBy("is_match").agg(F.avg("w").alias("mw")).collect()
    means = {r.is_match: r.mw for r in agg}
    assert means[True] > means[False] + 3.0  # clear separation in bits
