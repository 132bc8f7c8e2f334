"""pudl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of catalyst-cooperative/pudl.

The reference (PUDL) is a batch ETL + analytics pipeline over US energy
data built on pandas/Polars/Dagster. This package re-expresses its
operator semantics idiomatically in PySpark: declarative DataFrame/SQL
plans optimized by Catalyst, columnar Parquet storage, window functions
for its time-series math, and Arrow-batched pandas-UDF islands only
where built-in operators genuinely can't express the semantics.

Layout:
    session     SparkSession factory tuned for large-scale batch work
    catalog     table-name -> path/schema registry + pruned reads
    schema      declared (never inferred) Resource/Field schema model +
                enforcement operators (ref: src/pudl/metadata/classes.py)
    operators   generic DataFrame -> DataFrame operator library
                (ref: src/pudl/transform/classes.py, src/pudl/helpers.py)
    functions   text/dedup/similarity/multimodal column functions for
                training-data pipelines
    plans       composed headline queries used by bench + the driver
    streaming   Structured Streaming equivalents for event tables
"""

__version__ = "0.1.0"
