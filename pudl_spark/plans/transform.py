"""Declarative per-table transform parameters — the reference's
central architecture, Spark-first.

The reference drives ALL of its generic cleaning through nested param
dicts: ``TableTransformParams.from_dict`` hydrates per-column models
(ref: src/pudl/transform/classes.py:993-1056) and
``AbstractTableTransformer`` applies them in a fixed stage order
(ref: classes.py:1113-1340); the per-dataset modules are then nothing
but data (e.g. src/pudl/transform/params/ferc1.py — 3.5 k lines of
dicts). This module is that layer over the Spark operator library:
every step resolves to the pure-Column operators in
``pudl_spark.operators``, so a full declarative pipeline is still ONE
narrow projection chain — Catalyst collapses the per-step
``withColumns`` into a single codegen stage, and a 100 TB table pays
one scan regardless of how many cleaning steps the dict declares.

Param spellings follow the reference's dict layout (multi-column
steps keyed by column name; table-level steps as lists), so a user's
existing params dictionaries port by renaming nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from pudl_spark.operators.columns import (
    drop_invalid_rows, rename_columns, spot_fix_values)
from pudl_spark.operators.numeric import (
    UnitConversion, convert_units, correct_units, nullify_outliers)
from pudl_spark.operators.strings import (
    categorize_strings, enforce_snake_case, normalize_strings,
    replace_with_na, strip_non_numeric_values)


def _conv(d: dict[str, Any]) -> UnitConversion:
    return UnitConversion(
        multiplier=d.get("multiplier", 1.0), adder=d.get("adder", 0.0),
        from_unit=d.get("from_unit", ""), to_unit=d.get("to_unit", ""))


@dataclass(frozen=True)
class TableTransformParams:
    """All generic transform params for one table
    (ref: classes.py:993-1035). Empty members are no-ops, exactly like
    the reference's defaults, so partial dicts are valid.
    """

    rename_columns: dict[str, str] = field(default_factory=dict)
    normalize_strings: dict[str, dict[str, Any]] = field(default_factory=dict)
    enforce_snake_case: list[str] = field(default_factory=list)
    strip_non_numeric_values: list[str] = field(default_factory=list)
    categorize_strings: dict[str, dict[str, list[str]]] = \
        field(default_factory=dict)
    convert_units: dict[str, dict[str, Any]] = field(default_factory=dict)
    nullify_outliers: dict[str, dict[str, float]] = field(default_factory=dict)
    replace_with_na: dict[str, list[str]] = field(default_factory=dict)
    correct_units: list[dict[str, Any]] = field(default_factory=list)
    drop_invalid_rows: list[dict[str, Any]] = field(default_factory=list)
    spot_fix_values: list[dict[str, Any]] = field(default_factory=list)

    @classmethod
    def from_dict(cls, params: dict[str, Any]) -> "TableTransformParams":
        """Hydrate from a table-level params dict
        (ref: classes.py:1029-1036). Unknown keys raise — a typo'd
        step name silently doing nothing is the failure mode this
        guards against.
        """
        known = {f for f in cls.__dataclass_fields__}
        unknown = set(params) - known
        if unknown:
            raise KeyError(
                f"TableTransformParams: unknown steps {sorted(unknown)}")
        return cls(**params)


class TableTransformer:
    """Apply a :class:`TableTransformParams` in the reference's stage
    order (ref: AbstractTableTransformer.transform_{start,main,end},
    classes.py:1212-1340): rename first (all later params address the
    renamed columns), string repair before categorization, unit work
    before range screens, row drops and spot fixes last.
    """

    def __init__(self, params: TableTransformParams | dict[str, Any]):
        if isinstance(params, dict):
            params = TableTransformParams.from_dict(params)
        self.params = params

    def transform(self, df: DataFrame) -> DataFrame:
        p = self.params
        if p.rename_columns:
            df = rename_columns(df, p.rename_columns)
        for col, kw in p.normalize_strings.items():
            df = normalize_strings(df, [col], **kw)
        if p.enforce_snake_case:
            df = enforce_snake_case(df, p.enforce_snake_case)
        if p.strip_non_numeric_values:
            df = strip_non_numeric_values(df, p.strip_non_numeric_values)
        for col, na in p.replace_with_na.items():
            df = replace_with_na(df, col, na)
        for col, cats in p.categorize_strings.items():
            df = categorize_strings(df, col, cats)
        for col, conv in p.convert_units.items():
            df = convert_units(df, col, _conv(conv))
        for col, rng in p.nullify_outliers.items():
            df = nullify_outliers(df, col, rng["lower_bound"],
                                  rng["upper_bound"])
        for cu in p.correct_units:
            df = correct_units(
                df, cu["data_col"], cu["cat_col"], cu["cat_val"],
                [_conv(c) for c in cu["conversions"]],
                tuple(cu["valid_range"]))
        for dr in p.drop_invalid_rows:
            df = drop_invalid_rows(df, dr["required_valid_cols"],
                                   dr["invalid_values"])
        for sf in p.spot_fix_values:
            df = spot_fix_values(
                df, sf["idx_cols"], sf["fix_cols"],
                [tuple(f) for f in sf["fixes"]],
                expect_unique=sf.get("expect_unique", True))
        return df


def transform_table(df: DataFrame,
                    params: dict[str, Any]) -> DataFrame:
    """One-shot convenience: ``transform_table(df, PARAMS["table"])``."""
    return TableTransformer(params).transform(df)
