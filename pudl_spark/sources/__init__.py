"""Sources and sinks (SURVEY.md §2.1).

The reference's extract layer is partition-iterated file ingestion
(per-year CSV/Excel/Parquet pages concatenated into one table) and its
sink is schema-enforced Parquet. Spark-first: `spark.read` over a
partition glob replaces the extraction loop; `df.write.parquet` with
partitioning replaces the IO manager.
"""

from pudl_spark.sources.files import (
    extract_partitions, read_csv, write_parquet_table,
)
from pudl_spark.sources.dbf import dbf_struct_type, parse_dbf, read_dbf
from pudl_spark.sources.excel import (
    extract_excel_partitions, parse_xlsx, read_excel,
)
from pudl_spark.sources.json_records import json_records_to_df
from pudl_spark.sources.datapackage import build_datapackage_descriptor
from pudl_spark.sources.sqlite import (
    create_table_ddl, read_sqlite_table, write_sqlite_table,
)

__all__ = [
    "extract_partitions",
    "read_csv",
    "write_parquet_table",
    "dbf_struct_type",
    "parse_dbf",
    "read_dbf",
    "extract_excel_partitions",
    "parse_xlsx",
    "read_excel",
    "json_records_to_df",
    "build_datapackage_descriptor",
    "create_table_ddl",
    "read_sqlite_table",
    "write_sqlite_table",
]
