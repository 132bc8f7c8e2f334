"""Numeric column operators (ref: src/pudl/transform/classes.py,
src/pudl/helpers.py). Pure Column arithmetic — codegen-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class UnitConversion:
    """y = multiplier * x + adder, with a column rename by unit pattern
    (ref: transform/classes.py:599-615).
    """

    multiplier: float = 1.0
    adder: float = 0.0
    from_unit: str = ""
    to_unit: str = ""

    def new_name(self, col: str) -> str:
        if self.from_unit and self.from_unit in col:
            return col.replace(self.from_unit, self.to_unit)
        return col


def convert_units(df: DataFrame, col: str, conv: UnitConversion) -> DataFrame:
    """Linear unit conversion + rename (ref: transform/classes.py:599-615)."""
    new = conv.new_name(col)
    out = df.withColumn(col, F.col(col) * F.lit(conv.multiplier)
                        + F.lit(conv.adder))
    if new != col:
        out = out.withColumnRenamed(col, new)
    return out


def nullify_outliers(df: DataFrame, col: str, lower_bound: float,
                     upper_bound: float) -> DataFrame:
    """Coerce to numeric; outside [lo, hi] -> NULL
    (ref: transform/classes.py:640-649).
    """
    c = F.col(col).cast("double")
    return df.withColumn(col, F.when(c.between(lower_bound, upper_bound), c))


def correct_units(df: DataFrame, data_col: str, cat_col: str, cat_val: str,
                  conversions: list[UnitConversion],
                  valid_range: tuple[float, float]) -> DataFrame:
    """For rows where ``cat_col == cat_val``, try each unit conversion in
    order; keep the first converted value landing inside ``valid_range``;
    values that were already valid stay; otherwise NULL
    (ref: transform/classes.py:735-786). A nested when-chain — no
    shuffle, no UDF.
    """
    lo, hi = valid_range
    c = F.col(data_col)
    expr = F.when(c.between(lo, hi), c)
    for conv in conversions:
        converted = c * F.lit(conv.multiplier) + F.lit(conv.adder)
        expr = expr.when(converted.between(lo, hi), converted)
    expr = expr.otherwise(F.lit(None))
    return df.withColumn(
        data_col, F.when(F.col(cat_col) == cat_val, expr).otherwise(c)
    )


def standardize_percentages_ratio(df: DataFrame, col: str) -> DataFrame:
    """Percentage (0-100] -> ratio (0-1] (ref: helpers.py:1671)."""
    c = F.col(col)
    return df.withColumn(col, F.when(c > 1.0, c / 100.0).otherwise(c))


def oob_to_nan(df: DataFrame, columns: list[str], lb: float | None,
               ub: float | None) -> DataFrame:
    """Out-of-bounds -> NULL (ref: helpers.py:429)."""
    updates = {}
    for col in columns:
        c = F.col(col).cast("double")
        cond = F.lit(True)
        if lb is not None:
            cond = cond & (c >= lb)
        if ub is not None:
            cond = cond & (c <= ub)
        updates[col] = F.when(cond, c)
    return df.withColumns(updates)


def oob_to_nan_with_dependent_cols(df: DataFrame, columns: list[str],
                                   dependent_cols: list[str],
                                   lb: float | None,
                                   ub: float | None) -> DataFrame:
    """oob_to_nan, cascading NULLs into dependent columns
    (ref: helpers.py:460).
    """
    out = oob_to_nan(df, columns, lb, ub)
    any_null = None
    for col in columns:
        cond = F.col(col).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    updates = {d: F.when(~any_null, F.col(d)) for d in dependent_cols}
    return out.withColumns(updates)
