"""Content/machinery boundary demonstrations (VERDICT r13 #7).

The reference's remaining dbt validation surface is ~11 TABLE-SPECIFIC
data tests (dbt/tests/data_tests/generic_tests/: expect_valid_hour_of_year.sql,
expect_unique_utility_id_eia.sql, expect_consistent_generator_ids.sql,
expect_complete_valid_ownership.sql, expect_nuclear_units_are_generators.sql,
expect_valid_plantparts_ownership_fraction.sql,
expect_matching_primary_fuel_by_cost_and_mmbtu.sql,
expect_fgd_cost_totals_to_agree.sql,
expect_bgas_show_low_differing_primary_fuels.sql, test_idle_capacity.sql).
Each is PUDL-data CONTENT — a specific predicate/key/threshold over a
specific PUDL table — expressible through the ported generic machinery
in `pudl_spark.validate`. This file demonstrates two of them end to end
on synthetic frames that mirror the reference semantics, so the
boundary claim in COVERAGE.md is executable, not asserted.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_unique_utility_id_composition(spark):
    """expect_unique_utility_id_eia (ref: dbt/tests/data_tests/
    generic_tests/expect_unique_utility_id_eia.sql) is EXACTLY
    `check_one_value_per_key` over the composite
    (report_date, plant_id, generator_id) key: the reference groups
    by the three key columns and fails rows where
    count(distinct operator_utility_id) > 1. The multi-column key
    composes as a struct column."""
    from pudl_spark.validate import check_one_value_per_key

    rows = [
        # one generator, one operator across years: passes
        ("2020-01-01", 1, "G1", 100), ("2021-01-01", 1, "G1", 100),
        # same (date, plant, gen) key reported under TWO operators:
        # the reference's violation shape
        ("2020-01-01", 2, "A", 200), ("2020-01-01", 2, "A", 201),
        # NULL key excluded, as in the generic macro
        (None, 3, "B", 300), (None, 3, "B", 301),
    ]
    df = spark.createDataFrame(
        rows, "report_date string, plant_id int, generator_id string, "
              "operator_utility_id int").withColumn(
        "k", F.when(F.col("report_date").isNotNull(), F.struct(
            "report_date", "plant_id", "generator_id")))
    v = check_one_value_per_key(df, "k", "operator_utility_id").collect()
    assert len(v) == 1
    assert v[0]["key_value"]["plant_id"] == 2
    assert v[0]["distinct_count"] == 2


def test_valid_hour_of_year_composition(spark):
    """expect_valid_hour_of_year (ref: expect_valid_hour_of_year.sql:
    WHERE datepart('hr', dt) + (datepart('dayofyear', dt)-1)*24 + 1
    != hour_of_year) is a violations-frame filter over the derived
    expression plus `assert_empty` — the machinery every check in
    validate.py returns into. Composed here with Spark's hour() /
    dayofyear() builtins; one planted off-by-one row is the only
    violation and assert_empty raises on it."""
    import pytest

    from pudl_spark.validate import ValidationError, assert_empty

    df = spark.createDataFrame(
        [("2020-01-01 00:00:00", 1),    # hour 1 of the year: ok
         ("2020-01-02 05:00:00", 30),   # 24 + 5 + 1 = 30: ok
         ("2020-03-01 12:00:00", 999)],  # planted mismatch
        "datetime_utc string, hour_of_year int").withColumn(
        "datetime_utc", F.to_timestamp("datetime_utc"))
    derived = (F.hour("datetime_utc")
               + (F.dayofyear("datetime_utc") - 1) * 24 + 1)
    violations = df.filter(derived != F.col("hour_of_year"))
    got = violations.collect()
    assert len(got) == 1 and got[0]["hour_of_year"] == 999
    with pytest.raises(ValidationError, match="hour_of_year"):
        assert_empty(violations, "hour_of_year")
    # and the passing frame passes
    assert_empty(df.filter(F.col("hour_of_year") != 999)
                 .filter(derived != F.col("hour_of_year")),
                 "hour_of_year")
