"""Reshape operators — pivot/unpivot, PUDL's signature moves.

Ref: wide_to_tidy (src/pudl/transform/ferc1.py:344-393),
melt_hourx_columns_csv (src/pudl/transform/ferc714.py:826),
pivot/melt for the imputation matrix
(src/pudl/analysis/timeseries_cleaning.py:174,196).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unpivot(df: DataFrame, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable",
            value_name: str = "value") -> DataFrame:
    """Long-form melt via the native unpivot (Spark >= 3.4) — one
    narrow transform, no shuffle.
    """
    return df.unpivot(
        ids=[F.col(c) for c in id_cols],
        values=[F.col(c) for c in value_cols],
        variableColumnName=var_name,
        valueColumnName=value_name,
    )


def wide_to_tidy(df: DataFrame, id_cols: list[str],
                 value_types: list[str],
                 var_name: str = "xbrl_factoid") -> DataFrame:
    """Unpivot ``{factoid}_{value_type}`` columns to long, then widen
    the value_type back out (ref: src/pudl/transform/ferc1.py:344-393).

    Input columns like ``sales_dollar_value`` / ``sales_ending_balance``
    become rows keyed by factoid ``sales`` with one column per value
    type. Implemented as a single stack + conditional aggregation —
    one shuffle on (ids, factoid).
    """
    suffixes = {vt: f"_{vt}" for vt in value_types}
    melt_cols = [c for c in df.columns if c not in id_cols and any(
        c.endswith(s) for s in suffixes.values())]
    if not melt_cols:
        raise ValueError("wide_to_tidy: no matching value-type columns")
    long = unpivot(df, id_cols, melt_cols, var_name="__col",
                   value_name="__val")
    factoid = F.col("__col")
    vtype = F.lit(None).cast("string")
    for vt, s in suffixes.items():
        cond = F.col("__col").endswith(s)
        factoid = F.when(
            cond, F.expr(f"substring(__col, 1, length(__col) - {len(s)})")
        ).otherwise(factoid)
        vtype = F.when(cond, F.lit(vt)).otherwise(vtype)
    tagged = long.select(
        *id_cols, factoid.alias(var_name), vtype.alias("__vt"),
        F.col("__val"))
    return (
        tagged.groupBy(*id_cols, var_name)
        .pivot("__vt", value_types)
        .agg(F.first("__val"))
    )


def melt_hour_columns(df: DataFrame, id_cols: list[str], date_col: str,
                      hour_prefix: str = "hour",
                      ts_col: str = "datetime",
                      value_name: str = "value") -> DataFrame:
    """hour01..hour24 columns -> hourly rows with a real timestamp
    (ref: melt_hourx_columns_csv src/pudl/transform/ferc714.py:826).
    hourNN means the hour ENDING at NN, so hour01 -> 00:00.
    """
    hour_cols = sorted(
        c for c in df.columns
        if c.startswith(hour_prefix) and c[len(hour_prefix):].isdigit()
    )
    long = unpivot(df, id_cols + [date_col], hour_cols,
                   var_name="__hour", value_name=value_name)
    hour = F.substring(F.col("__hour"), len(hour_prefix) + 1, 2).cast("int") - 1
    return long.withColumn(
        ts_col,
        F.col(date_col).cast("timestamp")
        + F.make_interval(hours=hour),
    ).drop("__hour")


def multi_index_stack(df: DataFrame, id_cols: list[str],
                      sep: str = "__",
                      level_names: tuple[str, str] = ("group", "measure"),
                      value_name: str = "value") -> DataFrame:
    """Two-level column headers -> long rows (ref: multi_index_stack
    src/pudl/helpers.py:88 — the two-row Excel header case). Columns
    named ``{level0}{sep}{level1}`` unpivot to one row each, with the
    name split into two level columns. Single narrow unpivot, no
    shuffle; the split is constant-foldable per generated row.
    """
    stack_cols = [c for c in df.columns if c not in id_cols and sep in c]
    if not stack_cols:
        raise ValueError("multi_index_stack: no two-level columns found")
    long = unpivot(df, id_cols, stack_cols, var_name="__col",
                   value_name=value_name)
    lvl0 = F.substring_index(F.col("__col"), sep, 1)
    lvl1 = F.substring_index(F.col("__col"), sep, -1)
    return long.select(
        *id_cols, lvl0.alias(level_names[0]), lvl1.alias(level_names[1]),
        F.col(value_name))


def pivot_timeseries(df: DataFrame, ts_col: str, series_col: str,
                     value_col: str,
                     series_ids: list[str] | None = None) -> DataFrame:
    """Long -> (timestamp x series) matrix for the imputation island
    (ref: pivot_aligned_timeseries_dataframe
    src/pudl/analysis/timeseries_cleaning.py:174). Passing explicit
    ``series_ids`` skips the extra distinct-collect job.
    """
    g = df.groupBy(ts_col)
    p = g.pivot(series_col, series_ids) if series_ids else g.pivot(series_col)
    return p.agg(F.first(F.col(value_col)))


def melt_timeseries_matrix(df: DataFrame, ts_col: str,
                           series_col: str = "series_id",
                           value_col: str = "value") -> DataFrame:
    """(timestamp x series) matrix -> long
    (ref: melt_imputed_timeseries_matrix timeseries_cleaning.py:196).
    """
    series = [c for c in df.columns if c != ts_col]
    return unpivot(df, [ts_col], series, var_name=series_col,
                   value_name=value_col)
