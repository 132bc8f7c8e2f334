"""Dynamic partition pruning: the scan-skipping mechanism that makes
dimension-filtered fact scans cheap at 100 TB. A hive-partitioned
fact joined to a FILTERED dimension on the partition column must plan
a dynamicpruning subquery inside the fact scan's PartitionFilters —
i.e. the fact directories are chosen at runtime from the dim rows,
never enumerated in full."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pudl_spark.catalog import read_parquet_table
from pudl_spark.sources.files import write_parquet_table


def test_dim_join_plans_dynamic_partition_pruning(spark, tmp_path):
    li = read_parquet_table(
        spark, "/root/testdata/sf0.001/lineitem.parquet")
    dest = str(tmp_path / "li_part")
    write_parquet_table(li, dest, partition_cols=["l_returnflag"])
    fact = spark.read.parquet(dest)
    # Filtered dim: the filter is what makes DPP profitable — the
    # runtime subquery reduces the fact scan to matching directories.
    dim = spark.createDataFrame(
        [("R", 1), ("A", 0)], "flag string, keep int").filter(
        F.col("keep") == 1)
    j = fact.join(F.broadcast(dim), fact.l_returnflag == dim.flag)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # And the pruning actually bounds the result to the R partition.
    assert j.select("l_returnflag").distinct().collect()[0][0] == "R"
