"""Semi-structured (API payload) extraction.

Ref: the EIA API JSON response parse (src/pudl/extract/eiaapi.py:
24-117) pulls a nested records array out of a JSON document and
flattens it to rows. Spark-first: ``from_json`` with a declared schema
+ ``explode`` — both JVM-side, schema-on-read, no Python in the row
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def json_records_to_df(df: DataFrame, json_col: str,
                       record_schema: T.StructType | str,
                       records_path: str = "records",
                       keep_cols: list[str] | None = None) -> DataFrame:
    """Parse a JSON-document column holding ``{records_path: [...]}``
    into one row per record with the record fields as columns.
    """
    if isinstance(record_schema, str):
        record_schema = T._parse_datatype_string(record_schema)
    doc_schema = T.StructType([
        T.StructField(records_path, T.ArrayType(record_schema)),
    ])
    parsed = df.withColumn("__doc", F.from_json(F.col(json_col), doc_schema))
    rec = parsed.withColumn(
        "__rec", F.explode_outer(F.col(f"__doc.{records_path}")))
    keep = [F.col(c) for c in (keep_cols or [])]
    fields = [F.col(f"__rec.{f.name}").alias(f.name)
              for f in record_schema.fields]
    return rec.select(*keep, *fields)
