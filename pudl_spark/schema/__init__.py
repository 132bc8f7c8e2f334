"""Declared-schema model and enforcement operators.

Ref: src/pudl/metadata/classes.py (Field :635, Schema :992,
Resource :1554, format_df :2026, enforce_schema :2088).
"""

from pudl_spark.schema.model import Field, FieldConstraints, Resource, PERIODS
from pudl_spark.schema.enforce import (
    enforce_schema,
    format_df,
    check_primary_key,
    check_foreign_key,
    encode_column,
)

__all__ = [
    "Field", "FieldConstraints", "Resource", "PERIODS",
    "enforce_schema", "format_df", "check_primary_key",
    "check_foreign_key", "encode_column",
]
