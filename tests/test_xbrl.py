"""S6 XBRL converter: instance parsing, distributed extraction, the
wide pivot, and the filings -> SQLite -> read-back round trip."""

from __future__ import annotations

import os

from pudl_spark.sources.xbrl import (
    extract_xbrl_facts, parse_instance, pivot_facts,
)

SAMPLE = """<xbrl xmlns="http://www.xbrl.org/2003/instance"
  xmlns:t="http://example.com/test">
  <context id="d1"><entity><identifier>ENT1</identifier></entity>
    <period><startDate>2020-01-01</startDate>
      <endDate>2020-12-31</endDate></period></context>
  <context id="i1"><entity><identifier>ENT1</identifier></entity>
    <period><instant>2020-12-31</instant></period></context>
  <unit id="usd"><measure>iso4217:USD</measure></unit>
  <t:Revenue contextRef="d1" unitRef="usd" decimals="2">123.45</t:Revenue>
  <t:Assets contextRef="i1" unitRef="usd">1000</t:Assets>
  <t:Note contextRef="d1">not a number</t:Note>
  <t:Orphan contextRef="missing">9</t:Orphan>
</xbrl>"""


def test_parse_instance_contexts_units_and_types():
    rows = {r["concept"]: r for r in parse_instance(SAMPLE, "f1")}
    assert set(rows) == {"Revenue", "Assets", "Note"}  # orphan dropped
    rev = rows["Revenue"]
    assert rev["period_type"] == "duration"
    assert rev["start_date"] == "2020-01-01"
    assert rev["end_date"] == "2020-12-31"
    assert rev["instant_date"] is None
    assert rev["unit"] == "iso4217:USD"
    assert rev["decimals"] == "2"
    assert rev["value_num"] == 123.45
    ast = rows["Assets"]
    assert ast["period_type"] == "instant"
    assert ast["instant_date"] == "2020-12-31"
    assert ast["value_num"] == 1000.0
    note = rows["Note"]
    assert note["value_num"] is None
    assert note["value_text"] == "not a number"


def test_extract_and_pivot(spark):
    docs = spark.createDataFrame(
        [("f1", SAMPLE)], "filing string, xml string")
    facts = extract_xbrl_facts(docs)
    assert facts.count() == 3
    wide = pivot_facts(facts, "duration", ["Revenue"]).collect()
    assert len(wide) == 1
    assert wide[0]["Revenue"] == 123.45
    assert wide[0]["start_date"] == "2020-01-01"
    inst = pivot_facts(facts, "instant", ["Assets"]).collect()
    assert inst[0]["Assets"] == 1000.0


def test_generate_parse_identity(spark):
    from pyspark.sql import functions as F

    from pudl_spark.sources.xbrl import build_instance_xml

    base = spark.createDataFrame(
        [("E1", 10.5, 3), ("E2", 20.25, 7)],
        "ent string, rev double, cnt long")
    docs = base.select(
        F.col("ent").alias("filing"),
        build_instance_xml(
            F.col("ent"),
            duration_facts=[("Revenue", F.col("rev"))],
            instant_facts=[("OrderCount", F.col("cnt"))],
            start=F.lit("2021-01-01"), end=F.lit("2021-12-31"),
            instant=F.lit("2021-12-31")).alias("xml"))
    facts = extract_xbrl_facts(docs)
    got = {(r["entity_id"], r["concept"]): r["value_num"]
           for r in facts.collect()}
    assert got == {("E1", "Revenue"): 10.5, ("E1", "OrderCount"): 3.0,
                   ("E2", "Revenue"): 20.25, ("E2", "OrderCount"): 7.0}


def test_xbrl_to_sqlite_roundtrip(spark, tmp_path):
    """The full S6 path: filings -> facts -> wide table -> typed
    SQLite sink (S11) -> year-filtered read-back (S12)."""
    from pudl_spark.schema.model import Field, FieldConstraints, Resource
    from pudl_spark.sources.sqlite import read_sqlite_table, write_sqlite_table

    docs = spark.createDataFrame(
        [("f1", SAMPLE)], "filing string, xml string")
    wide = pivot_facts(extract_xbrl_facts(docs), "duration", ["Revenue"])
    wide = wide.withColumn(
        "report_year",
        wide["start_date"].substr(1, 4).cast("int"))
    res = Resource(
        name="xbrl_duration",
        fields=(
            Field("entity_id", "string",
                  FieldConstraints(required=True)),
            Field("filing", "string"),
            Field("start_date", "string"),
            Field("end_date", "string"),
            Field("Revenue", "number"),
            Field("report_year", "integer"),
        ),
        primary_key=("entity_id", "filing", "start_date"),
    )
    db = os.path.join(str(tmp_path), "xbrl.sqlite")
    n = write_sqlite_table(wide, db, res)
    assert n == 1
    back = read_sqlite_table(spark, db, res, years=[2020],
                             year_col="start_date").collect()
    assert len(back) == 1
    assert back[0]["Revenue"] == 123.45
    none_back = read_sqlite_table(spark, db, res, years=[1999],
                                  year_col="start_date").collect()
    assert none_back == []
