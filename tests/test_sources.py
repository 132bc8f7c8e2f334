"""Sources/sinks: CSV round-trip, partition extraction, partitioned
parquet sink, JSON records, datapackage descriptor."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F, types as T

from pudl_spark.schema import Field, FieldConstraints, Resource
from pudl_spark.sources import (
    build_datapackage_descriptor, extract_partitions, json_records_to_df,
    read_csv, write_parquet_table,
)

RES = Resource(
    name="plants",
    fields=(
        Field("plant_id", "integer", FieldConstraints(required=True)),
        Field("name", "string"),
        Field("capacity_mw", "number"),
    ),
    primary_key=("plant_id",),
    foreign_keys=((("plant_id",), "plants_entity", ("plant_id",)),),
)


def test_read_csv_declared_schema(spark, tmp_path):
    p = tmp_path / "plants.csv"
    p.write_text("plant_id,name,capacity_mw\n1,alpha,10.5\n2,beta,\n")
    df = read_csv(spark, str(p), resource=RES)
    assert df.schema["plant_id"].dataType == T.LongType()
    assert df.schema["capacity_mw"].dataType == T.DoubleType()
    rows = {r["plant_id"]: r for r in df.collect()}
    assert rows[2]["capacity_mw"] is None
    assert rows[1]["name"] == "alpha"


def test_extract_partitions_union_by_name(spark, tmp_path):
    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([(2, 3.5)], "id long, extra double")
    pa, pb = str(tmp_path / "y2020"), str(tmp_path / "y2021")
    a.write.parquet(pa)
    b.write.parquet(pb)
    out = extract_partitions(spark, [pa, pb])
    assert sorted(out.columns) == ["extra", "id", "name"]
    got = {r["id"]: (r["name"], r["extra"]) for r in out.collect()}
    assert got == {1: ("x", None), 2: (None, 3.5)}


def test_write_parquet_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, part int, val double")
    dest = str(tmp_path / "out")
    write_parquet_table(df, dest, partition_cols=["part"],
                        sort_cols=["id"])
    dirs = {d for d in os.listdir(dest) if d.startswith("part=")}
    assert dirs == {"part=0", "part=1", "part=2"}
    back = spark.read.parquet(dest)
    assert back.count() == 30
    assert back.filter(F.col("part") == 1).count() == 10


def test_json_records_to_df(spark):
    payload = json.dumps({"records": [
        {"period": "2020-01", "value": 1.5},
        {"period": "2020-02", "value": 2.5},
    ]})
    df = spark.createDataFrame([("docA", payload)], "doc_id string, body string")
    out = json_records_to_df(
        df, "body", "period string, value double", keep_cols=["doc_id"])
    rows = out.collect()
    assert [r["period"] for r in rows] == ["2020-01", "2020-02"]
    assert rows[1]["value"] == 2.5
    assert rows[0]["doc_id"] == "docA"


def test_datapackage_descriptor():
    d = build_datapackage_descriptor([RES])
    r = d["resources"][0]
    assert r["name"] == "plants"
    assert r["schema"]["primaryKey"] == ["plant_id"]
    assert r["schema"]["foreignKeys"][0]["reference"]["resource"] == \
        "plants_entity"
    f0 = r["schema"]["fields"][0]
    assert f0 == {"name": "plant_id", "type": "integer",
                  "constraints": {"required": True}}
    json.dumps(d)  # must be serializable


def test_sqlite_sink_roundtrip(spark, tmp_path):
    import sqlite3

    from pudl_spark.schema.model import Field, FieldConstraints, Resource
    from pudl_spark.sources.sqlite import (
        read_sqlite_table, write_sqlite_table,
    )

    res = Resource(
        name="balances",
        fields=(
            Field("entity_id", "integer",
                  FieldConstraints(required=True)),
            Field("report_year", "year"),
            Field("status", "string",
                  FieldConstraints(enum=("open", "closed"))),
            Field("amount", "number",
                  FieldConstraints(minimum=0.0)),
            Field("active", "boolean"),
        ),
        primary_key=("entity_id", "report_year"),
    )
    import datetime as dt
    df = spark.createDataFrame(
        [(1, dt.date(2020, 1, 1), "open", 10.5, True),
         (2, dt.date(2021, 1, 1), "closed", 0.0, None)],
        res.to_struct_type())
    db = str(tmp_path / "out.sqlite")
    assert write_sqlite_table(df, db, res) == 2

    back = read_sqlite_table(spark, db, res)
    assert back.schema == res.to_struct_type()
    rows = {r["entity_id"]: r for r in back.collect()}
    assert rows[1]["status"] == "open" and rows[1]["active"] is True
    assert rows[2]["amount"] == 0.0 and rows[2]["active"] is None

    # year-partition filtered read (S12 refine_report_year shape)
    only2021 = read_sqlite_table(spark, db, res, years=[2021],
                                 year_col="report_year")
    assert [r["entity_id"] for r in only2021.collect()] == [2]

    # CHECK constraints are real: enum violation raises
    bad = spark.createDataFrame(
        [(3, dt.date(2022, 1, 1), "limbo", 1.0, False)],
        res.to_struct_type())
    import pytest as _pytest
    with _pytest.raises(sqlite3.IntegrityError):
        write_sqlite_table(bad, db, res, if_exists="append")


def test_read_parquet_table_self_sufficient_on_nanos(spark, tmp_path):
    """read_parquet_table must not depend on the session builder having
    set spark.sql.legacy.parquet.nanosAsLong — a harness's plain
    SparkSession reading a TIMESTAMP(NANOS) parquet must work.
    Simulated by writing a nanos fixture and unsetting the conf at
    runtime before the read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pudl_spark.catalog import read_parquet_table

    path = str(tmp_path / "nanos.parquet")
    tbl = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000_001,
                        1_700_000_000_000_001_000,
                        1_700_000_100_000_000_000],
                       pa.timestamp("ns")),
    })
    pq.write_table(tbl, path)

    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    try:
        df = read_parquet_table(spark, path)
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() == 3
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, "true")


def test_read_parquet_table_normalizes_ntz_to_ltz(spark, sf_dir):
    """Driver-regenerated testdata stores tz-naive timestamp[us], which
    a plain session reads as TIMESTAMP_NTZ; the catalog must normalize
    to TimestampType so LTZ-only functions (unix_micros, windows over
    ts) and the DuckDB oracles keep working under any harness session."""
    from pudl_spark.catalog import read_parquet_table

    df = read_parquet_table(spark, os.path.join(sf_dir, "events.parquet"))
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_read_parquet_table_handles_spark_int96_timestamps(spark, tmp_path):
    """Spark's own parquet writer emits INT96 timestamps (by default),
    which pyarrow reports as timestamp[ns] — the same footer signature
    as the long-ns case. The repair must not fire for columns Spark
    already read as TIMESTAMP (regression: div-1000 on a TIMESTAMP is
    a type error, found by the 10x scale-stress harness reading its
    own Spark-written data)."""
    import datetime as dt

    from pudl_spark.catalog import read_parquet_table

    path = str(tmp_path / "int96")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.createDataFrame(
            [(1, dt.datetime(2024, 5, 1, 12, 30, 15))],
            "id long, ts timestamp").write.mode("overwrite").parquet(path)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    df = read_parquet_table(spark, path)
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.collect()[0]
    assert row["ts"] == dt.datetime(2024, 5, 1, 12, 30, 15)


def test_write_orc_partitioned_pruned(spark, tmp_path):
    from pudl_spark.sources.files import write_orc_table

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, part int, val double")
    dest = str(tmp_path / "out_orc")
    write_orc_table(df, dest, partition_cols=["part"], sort_cols=["id"])
    dirs = {d for d in os.listdir(dest) if d.startswith("part=")}
    assert dirs == {"part=0", "part=1", "part=2"}
    back = spark.read.orc(dest)
    assert back.count() == 30
    filtered = back.filter(F.col("part") == 1)
    assert filtered.count() == 10
    # The partition filter must resolve at planning time (directory
    # pruning), exactly like the parquet path.
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "part" in plan
    # Predicate pushdown on a data column reaches the ORC scan.
    pushed = back.filter(F.col("id") > 20)
    pplan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in pplan and "id" in pplan


def test_write_jsonl_partitioned_roundtrip(spark, tmp_path):
    from pudl_spark.sources.files import read_jsonl, write_jsonl_table

    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i)) for i in range(20)],
        "id long, part string, val double")
    dest = str(tmp_path / "out_jsonl")
    write_jsonl_table(df, dest, partition_cols=["part"])
    dirs = {d for d in os.listdir(dest) if d.startswith("part=")}
    assert dirs == {"part=A", "part=B"}
    back = read_jsonl(spark, dest, "id long, val double")
    assert back.count() == 20
    filtered = back.filter(F.col("part") == "B")
    assert filtered.count() == 10
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "part" in plan
    # Declared schema restores exact types (no inference drift).
    assert dict(back.dtypes)["id"] == "bigint"
    assert dict(back.dtypes)["val"] == "double"


def test_read_fixed_width_declared_types_and_nulls(spark, tmp_path):
    from pudl_spark.sources.files import read_fixed_width

    p = tmp_path / "fw.txt"
    p.write_text("1     alpha               10\n"
                 "2     beta                  \n"   # blank numeric -> NULL
                 "3           padded name   7 \n")
    df = read_fixed_width(spark, str(p), [
        ("id", 1, 6, "bigint"),
        ("name", 7, 20, "string"),
        ("val", 27, 4, "int"),
    ])
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["name"] == "alpha" and rows[1]["val"] == 10
    assert rows[2]["val"] is None
    # leading/trailing pad spaces trimmed, inner spaces preserved
    assert rows[3]["name"] == "padded name"
    assert dict(df.dtypes) == {"id": "bigint", "name": "string",
                               "val": "int"}
