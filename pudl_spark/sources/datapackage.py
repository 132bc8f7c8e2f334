"""Datapackage descriptor export (S13).

Ref: the frictionless datapackage.json emission over all outputs
(src/pudl/dagster/assets/core/datapackage.py; Package.to_frictionless
via src/pudl/metadata/classes.py:2311+). Pure metadata: a JSON
descriptor of every Resource — name, field types/constraints, primary
and foreign keys — so downstream consumers get the declared schema
without reading any Parquet footers.
"""

from __future__ import annotations

from typing import Any

from pudl_spark.schema.model import Resource


def _field_descriptor(f) -> dict[str, Any]:
    d: dict[str, Any] = {"name": f.name, "type": f.type}
    c = f.constraints
    constraints: dict[str, Any] = {}
    if c.required:
        constraints["required"] = True
    if c.unique:
        constraints["unique"] = True
    if c.minimum is not None:
        constraints["minimum"] = c.minimum
    if c.maximum is not None:
        constraints["maximum"] = c.maximum
    if c.enum is not None:
        constraints["enum"] = list(c.enum)
    if c.pattern is not None:
        constraints["pattern"] = c.pattern
    if constraints:
        d["constraints"] = constraints
    if f.description:
        d["description"] = f.description
    return d


def build_datapackage_descriptor(
        resources: list[Resource], name: str = "pudl-spark",
        version: str = "0.1.0") -> dict[str, Any]:
    """frictionless-style descriptor for a set of Resources."""
    out: list[dict[str, Any]] = []
    for r in resources:
        desc: dict[str, Any] = {
            "name": r.name,
            "profile": "tabular-data-resource",
            "path": f"{r.name}.parquet",
            "format": "parquet",
            "schema": {"fields": [_field_descriptor(f) for f in r.fields]},
        }
        if r.primary_key:
            desc["schema"]["primaryKey"] = list(r.primary_key)
        fks = []
        for local_cols, other, other_cols in r.foreign_keys:
            fks.append({
                "fields": list(local_cols),
                "reference": {"resource": other,
                              "fields": list(other_cols)},
            })
        if fks:
            desc["schema"]["foreignKeys"] = fks
        if r.description:
            desc["description"] = r.description
        out.append(desc)
    return {"profile": "data-package", "name": name, "version": version,
            "resources": out}
