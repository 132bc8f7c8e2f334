"""Resource/Field/Schema model — fixed, declared, never inferred.

The reference uses a deliberately tiny 8-type logical type system
(ref: src/pudl/metadata/classes.py:653-655 and
src/pudl/metadata/dtypes.py:66-89). We map it onto Spark types:

    string   -> StringType      integer -> LongType
    number   -> DoubleType      boolean -> BooleanType
    date     -> DateType        datetime -> TimestampType (us)
    year     -> DateType (snapped to Jan-1, ref classes.py:2056-2063)
    geometry -> BinaryType (WKB)

Enum-constrained strings stay StringType; the enum becomes a CHECK-style
validation (the reference's pandas CategoricalDtype is a storage-level
concern Parquet dictionary encoding covers automatically).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

PUDL_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "year": T.DateType(),
    "geometry": T.BinaryType(),
}

# Periodic primary-key column matching: a PK column `report_year` may be
# satisfied by a finer `report_date` snapped to period start
# (ref: src/pudl/metadata/dtypes.py:113-120, helpers.py:233,256).
# Maps period suffix -> Spark date_trunc unit.
PERIODS: dict[str, str] = {
    "year": "year",
    "quarter": "quarter",
    "month": "month",
    "date": "day",
}


@dataclass(frozen=True)
class FieldConstraints:
    """Per-field constraints (ref: metadata/classes.py:328)."""

    required: bool = False
    unique: bool = False
    minimum: float | None = None
    maximum: float | None = None
    enum: tuple[str, ...] | None = None
    pattern: str | None = None


@dataclass(frozen=True)
class Field:
    """Typed column with constraints (ref: metadata/classes.py:635)."""

    name: str
    type: str = "string"
    constraints: FieldConstraints = dc_field(default_factory=FieldConstraints)
    description: str = ""

    @property
    def spark_type(self) -> T.DataType:
        return PUDL_TO_SPARK[self.type]

    def to_struct_field(self) -> T.StructField:
        nullable = not self.constraints.required
        return T.StructField(self.name, self.spark_type, nullable)


@dataclass(frozen=True)
class Resource:
    """Named, schema'd table (ref: metadata/classes.py:1554,992-1058)."""

    name: str
    fields: tuple[Field, ...]
    primary_key: tuple[str, ...] = ()
    # foreign_keys: ((local_cols...), other_resource, (other_cols...))
    foreign_keys: tuple[tuple[tuple[str, ...], str, tuple[str, ...]], ...] = ()
    description: str = ""

    def field(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(f"{self.name}: no field {name!r}")

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def to_struct_type(self) -> T.StructType:
        return T.StructType([f.to_struct_field() for f in self.fields])
