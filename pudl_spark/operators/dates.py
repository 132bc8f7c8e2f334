"""Date/time operators (ref: src/pudl/helpers.py date utilities and the
period machinery in src/pudl/metadata/dtypes.py:113-120).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def convert_to_date(df: DataFrame, year_col: str = "report_year",
                    month_col: str | None = None,
                    day_col: str | None = None,
                    date_col: str = "report_date",
                    month_value: int = 1, day_value: int = 1) -> DataFrame:
    """(year, month[, day]) integer columns -> a single date column
    (ref: helpers.py:1009,1082). Missing parts default to 1 (period
    start), matching the reference's year -> Jan-1 snap.
    """
    y = F.col(year_col).cast("int")
    m = F.col(month_col).cast("int") if month_col else F.lit(month_value)
    d = F.col(day_col).cast("int") if day_col else F.lit(day_value)
    return df.withColumn(date_col, F.make_date(y, m, d))


def normalize_year_fragments(df: DataFrame, col: str,
                             earliest_year: int = 1900) -> DataFrame:
    """2-digit years -> 4-digit via rolling century
    (ref: helpers.py:2553-2624). e.g. earliest 1900: '99'->1999, '05'->2005
    when 1905 < earliest... century chosen so result >= earliest_year.
    """
    raw = F.col(col).cast("string")
    digits = F.regexp_extract(raw, r"(\d{2,4})", 1)
    n = F.length(digits)
    century = earliest_year - earliest_year % 100
    two = digits.cast("int") + F.lit(century)
    two = F.when(two < earliest_year, two + 100).otherwise(two)
    out = (
        F.when(digits == "", None)
        .when(n == 4, digits.cast("int"))
        .when(n == 2, two)
        .otherwise(F.lit(None))
    )
    return df.withColumn(col, out)


def snap_to_period(col: Column | str, period: str) -> Column:
    """date -> period start (ref: metadata/dtypes.py:113-120 PERIODS;
    applied in Resource.match_primary_key classes.py:1952-2024).
    period in {year, quarter, month, day}.
    """
    return F.to_date(F.date_trunc(period, col))


def hours_in_period(start: Column, end: Column) -> Column:
    """Hours between two timestamps/dates — the denominator of capacity
    factor (ref: helpers.py:1741-1755).
    """
    return (F.unix_timestamp(end.cast("timestamp"))
            - F.unix_timestamp(start.cast("timestamp"))) / 3600.0
