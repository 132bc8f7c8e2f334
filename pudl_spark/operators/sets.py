"""Set operators (ref: pd.concat union-by-name everywhere, e.g.
src/pudl/extract/extractor.py:230-241; find_new_ferc1_strings
src/pudl/helpers.py:165; uncategorized-string detection
src/pudl/transform/classes.py:522).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """Vertical union with missing-column NULL-fill — the Spark analog
    of pd.concat (ref: extract/extractor.py:230-241).
    """
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def set_difference_values(df: DataFrame, col: str,
                          other: DataFrame, other_col: str) -> DataFrame:
    """Distinct values of df.col not present in other.other_col
    (ref: transform/classes.py:522 uncategorized detection).
    """
    left = df.select(F.col(col).alias("value")).distinct()
    right = other.select(F.col(other_col).alias("value")).distinct()
    return left.subtract(right)


def find_new_strings(df: DataFrame, col: str,
                     mapped: list[str]) -> DataFrame:
    """Unmapped-string detection against a literal vocabulary
    (ref: find_new_ferc1_strings helpers.py:165).
    """
    return (
        df.select(F.col(col).alias("value")).distinct()
        .filter(~F.col("value").isin(mapped) & F.col("value").isNotNull())
    )
