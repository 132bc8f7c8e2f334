"""Generic DataFrame -> DataFrame operator library.

Mirrors the reference's declarative column/table transform vocabulary
(ref: src/pudl/transform/classes.py and src/pudl/helpers.py) as pure
functions over Spark DataFrames/Columns. Everything here stays inside
Catalyst/whole-stage-codegen — no Python row UDFs in the hot path.
"""

from pudl_spark.operators.strings import (
    normalize_strings, enforce_snake_case, strip_non_numeric_values,
    categorize_strings, replace_with_na, standardize_na_values,
    zero_pad_numeric_string, remove_leading_zeros_from_numeric_strings,
    simplify_strings, standardize_phone_column, fix_int_na,
    parse_address,
)
from pudl_spark.operators.numeric import (
    convert_units, nullify_outliers, correct_units,
    standardize_percentages_ratio, oob_to_nan,
    oob_to_nan_with_dependent_cols,
)
from pudl_spark.operators.dates import (
    convert_to_date, normalize_year_fragments, snap_to_period,
    hours_in_period,
)
from pudl_spark.operators.columns import (
    rename_columns, organize_cols, simplify_columns,
    drop_records_with_null_in_column, drop_invalid_rows, spot_fix_values,
    convert_col_to_bool,
)
from pudl_spark.operators.joins import (
    date_merge, full_timeseries_date_merge, scale_by_ownership,
    point_in_interval_join, add_codes_from_lookup,
)
from pudl_spark.operators.aggregate import (
    most_frequent, most_and_more_frequent, unique_or_null,
    weighted_average, sum_and_weighted_average_agg, sum_min_count,
    label_unique_source_or_mixed, dedupe_on_category, best_snapshot,
    apply_diffs, weighted_quantile, count_records,
)
from pudl_spark.operators.windows import (
    generate_rolling_avg, fillna_w_rolling_avg, make_changelog,
    add_run_ids, expand_timeseries, drop_ytd_for_annual_tables,
    freshest_records, flag_local_outlier, ramp_rates,
)
from pudl_spark.operators.reshape import (
    wide_to_tidy, pivot_timeseries, melt_hour_columns, unpivot,
    multi_index_stack,
)
from pudl_spark.operators.sets import (
    union_by_name, find_new_strings, set_difference_values,
)
from pudl_spark.operators.harvest import harvest
from pudl_spark.operators.allocate import allocate_proportionally
from pudl_spark.operators.graph import connected_components

__all__ = [n for n in dir() if not n.startswith("_")]
