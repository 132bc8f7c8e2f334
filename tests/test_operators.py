import datetime as dt

import pytest

from pyspark.sql import functions as F

from pudl_spark.operators import (
    add_run_ids, allocate_proportionally, apply_diffs, best_snapshot,
    categorize_strings, convert_units, correct_units, dedupe_on_category,
    drop_invalid_rows, expand_timeseries, make_changelog, most_frequent,
    most_and_more_frequent, normalize_strings, nullify_outliers,
    organize_cols, remove_leading_zeros_from_numeric_strings,
    rename_columns, spot_fix_values, standardize_na_values,
    strip_non_numeric_values, unique_or_null, weighted_average,
    weighted_quantile, zero_pad_numeric_string, connected_components,
)
from pudl_spark.operators.numeric import UnitConversion


def rows(df, *cols):
    out = df.select(*cols).collect()
    return [tuple(r) for r in out]


def test_normalize_strings(spark):
    df = spark.createDataFrame(
        [("  Héllo   Wörld  ",), ("",), (None,)], "s string")
    out = normalize_strings(df, ["s"])
    assert [r["s"] for r in out.collect()] == ["hello world", None, None]


def test_strip_non_numeric(spark):
    df = spark.createDataFrame(
        [("abc 12.5 MW",), ("x",), ("-3,5 units",)], "s string")
    out = strip_non_numeric_values(df, ["s"])
    assert [r["s"] for r in out.collect()] == ["12.5", None, "-3.5"]


def test_categorize_strings_unmapped_null(spark):
    df = spark.createDataFrame([("coal",), ("COAL-ish",)], "fuel string")
    out = categorize_strings(df, "fuel", {"coal": ["col", "coal"]})
    assert [r["fuel"] for r in out.collect()] == ["coal", None]


def test_convert_and_correct_units(spark):
    df = spark.createDataFrame([(1000.0,), (1.0,), (50.0,)],
                               "heat_mmbtu double")
    out = convert_units(df, "heat_mmbtu",
                        UnitConversion(multiplier=1000.0,
                                       from_unit="mmbtu", to_unit="btu"))
    assert out.columns == ["heat_btu"]
    # correct_units: values far outside [0, 100] get the /1000 retry
    df2 = spark.createDataFrame(
        [("coal", 50000.0), ("coal", 50.0), ("gas", 50000.0)],
        "fuel string, v double")
    fixed = correct_units(
        df2, "v", "fuel", "coal",
        [UnitConversion(multiplier=0.001)], valid_range=(0.0, 100.0))
    got = {(r["fuel"], r["v"]) for r in fixed.collect()}
    assert ("coal", 50.0) in got and ("gas", 50000.0) in got
    assert ("coal", 50000.0) not in got


def test_nullify_outliers_and_na(spark):
    df = spark.createDataFrame([("5",), ("-1",), ("n/a",)], "v string")
    df = standardize_na_values(df, ["v"])
    out = nullify_outliers(df, "v", 0, 10)
    assert [r["v"] for r in out.collect()] == [5.0, None, None]


def test_zero_pad_and_leading_zeros(spark):
    df = spark.createDataFrame([("7",), ("007",), ("abc",)], "z string")
    assert [r["z"] for r in zero_pad_numeric_string(df, "z", 3).collect()] \
        == ["007", "007", None]
    assert [r["z"] for r in
            remove_leading_zeros_from_numeric_strings(df, "z").collect()] \
        == ["7", "7", "abc"]


def test_rename_and_organize(spark):
    df = spark.createDataFrame([(1, 2, 3)], "b int, id int, a int")
    out = organize_cols(rename_columns(df, {"b": "zz"}), ["id"])
    assert out.columns == ["id", "a", "zz"]
    with pytest.raises(KeyError):
        rename_columns(df, {"nope": "x"})


def test_drop_invalid_rows(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 5), (None, None)], "x int, y int")
    out = drop_invalid_rows(df, ["x", "y"], invalid_values=[0])
    assert rows(out, "x", "y") == [(0, 5)]


def test_spot_fix_values(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    out = spot_fix_values(df, ["id"], ["v"], fixes=[(2, "B!")])
    assert dict(rows(out, "id", "v")) == {1: "a", 2: "B!"}
    with pytest.raises(ValueError):
        spot_fix_values(df, ["id"], ["v"], fixes=[(2, "x"), (2, "y")])


def test_most_frequent_modes(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "x"), (2, "y")],
        "k int, v string")
    out = most_frequent(df, ["k"], "v")
    assert dict(rows(out, "k", "v")) == {1: "a", 2: "x"}  # tie -> min value
    strict = most_and_more_frequent(df, ["k"], "v", min_frequency=0.6)
    assert dict(rows(strict, "k", "v")) == {1: "a", 2: None}


def test_unique_or_null(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "x"), (2, "y"), (3, None)],
        "k int, v string")
    out = unique_or_null(df, ["k"], "v")
    assert dict(rows(out, "k", "v")) == {1: "a", 2: None, 3: None}


def test_weighted_average_na_aware(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 1.0), (1, None, 100.0), (1, 20.0, 3.0)],
        "k int, x double, w double")
    out = weighted_average(df, "x", "w", by=["k"], out_col="wavg")
    # weights of null-x rows excluded from denominator
    assert rows(out, "wavg") == [((10.0 * 1 + 20.0 * 3) / 4.0,)]


def test_weighted_quantile_matches_numpy(spark):
    import numpy as np

    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    wts = [1.0, 1.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame(list(zip(vals, wts)), "x double, w double")
    got = weighted_quantile(df, "x", "w", 0.5).collect()[0][0]
    assert got == pytest.approx(np.median(vals))


def test_allocation_cases(spark):
    # ALL report
    df = spark.createDataFrame(
        [("g", 100.0, 30.0, 1.0), ("g", 100.0, 70.0, 1.0)],
        "grp string, total double, basis double, cap double")
    out = allocate_proportionally(df, ["grp"], "total", "basis", "cap")
    assert sorted(r["allocated"] for r in out.collect()) == [30.0, 70.0]
    # SOME report: reporter keeps 60, other gets remainder 40
    df2 = spark.createDataFrame(
        [("g", 100.0, 60.0, 1.0), ("g", 100.0, None, 3.0),
         ("g", 100.0, None, 1.0)],
        "grp string, total double, basis double, cap double")
    out2 = allocate_proportionally(df2, ["grp"], "total", "basis", "cap")
    assert sorted(r["allocated"] for r in out2.collect()) == [10.0, 30.0, 60.0]
    # NONE report: split by capacity
    df3 = spark.createDataFrame(
        [("g", 100.0, None, 1.0), ("g", 100.0, None, 4.0)],
        "grp string, total double, basis double, cap double")
    out3 = allocate_proportionally(df3, ["grp"], "total", "basis", "cap")
    assert sorted(r["allocated"] for r in out3.collect()) == [20.0, 80.0]
    # conservation on every case
    for o in (out, out2, out3):
        s = o.groupBy("grp").agg(F.sum("allocated").alias("s")).collect()
        assert s[0]["s"] == pytest.approx(100.0)


def test_make_changelog(spark):
    d = dt.date
    df = spark.createDataFrame(
        [(1, d(2020, 1, 1), "a"), (1, d(2020, 2, 1), "a"),
         (1, d(2020, 3, 1), "b"), (1, d(2020, 4, 1), "b")],
        "id int, report_date date, status string")
    out = make_changelog(df, ["id"], "report_date", ["status"])
    got = rows(out, "report_date", "status", "valid_until_date")
    assert got == [(d(2020, 1, 1), "a", d(2020, 3, 1)),
                   (d(2020, 3, 1), "b", None)]


def test_add_run_ids(spark):
    df = spark.createDataFrame(
        [(1, 1, "on"), (1, 2, "on"), (1, 3, "off"), (1, 4, "on")],
        "unit int, t int, state string")
    out = add_run_ids(df, ["unit"], "t", "state")
    assert [r["run_id"] for r in out.orderBy("t").collect()] == [1, 1, 2, 3]


def test_expand_timeseries_ffill(spark):
    d = dt.date
    df = spark.createDataFrame(
        [(1, d(2020, 1, 1), 10.0), (1, d(2020, 4, 1), 40.0)],
        "id int, month date, v double")
    out = expand_timeseries(df, ["id"], "month", freq="month")
    got = rows(out.orderBy("month"), "month", "v")
    assert got == [(d(2020, 1, 1), 10.0), (d(2020, 2, 1), 10.0),
                   (d(2020, 3, 1), 10.0), (d(2020, 4, 1), 40.0)]


def test_best_snapshot_and_apply_diffs(spark):
    df = spark.createDataFrame(
        [(1, 1, "a", None), (1, 2, None, "y"), (1, 3, "c", None)],
        "id int, filed int, c1 string, c2 string")
    best = best_snapshot(df, ["id"], "filed", ["c1", "c2"])
    # all rows have 1 non-null -> recency wins
    assert rows(best, "filed") == [(3,)]
    diffs = apply_diffs(df, ["id"], "filed", ["c1", "c2"])
    assert rows(diffs, "c1", "c2") == [("c", "y")]


def test_dedupe_on_category(spark):
    df = spark.createDataFrame(
        [(1, "low", 5), (1, "high", 9), (2, "low", 1)],
        "id int, prio string, v int")
    out = dedupe_on_category(df, ["id"], "prio", priority=["high", "low"],
                             tie_cols=["v"])
    assert dict(rows(out, "id", "prio")) == {1: "high", 2: "low"}


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src int, dst int")
    out = connected_components(edges)
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == 20
