"""Minimal XBRL instance converter — the S6 extraction path.

Ref: the reference clones FERC XBRL filings into SQLite through the
external ``ferc_xbrl_extractor`` package
(src/pudl/extract/xbrl.py:90-140 ``convert_form`` -> ``run_main``);
the essential semantics are defined by the public XBRL 2.1 spec: an
instance document holds **contexts** (entity identifier + period,
which is either an ``instant`` date or a ``startDate``/``endDate``
duration), **units**, and **facts** (concept-named elements carrying
``contextRef``/``unitRef``/``decimals``). The extractor's output
shape is one *instant* table and one *duration* table per taxonomy
group, keyed by (entity, filing, period).

This module implements that pipeline Spark-first and taxonomy-free:

- :func:`parse_instance` — stdlib ElementTree parse of one instance
  into long-form fact rows (the generic, taxonomy-independent shape).
- :func:`extract_xbrl_facts` — the distributed entry point: a
  DataFrame of (filing_name, xml) documents is parsed executor-side
  via ``mapInPandas`` (filings are many small files; parsing is
  pure CPU, so it scales with partitions, never through the driver).
- :func:`pivot_facts` — long facts -> the wide instant/duration
  tables the reference's SQLite output has, one column per concept.

Compose with the S11/S12 SQLite sink (``sources/sqlite.py``) for the
full filings -> SQLite -> read-back path; ``tests/test_xbrl.py``
round-trips exactly that.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

XBRLI = "http://www.xbrl.org/2003/instance"

FACT_SCHEMA = (
    "filing string, entity_id string, period_type string, "
    "instant_date string, start_date string, end_date string, "
    "concept string, unit string, decimals string, "
    "value_text string, value_num double"
)

FACT_COLUMNS = [
    "filing", "entity_id", "period_type", "instant_date", "start_date",
    "end_date", "concept", "unit", "decimals", "value_text", "value_num",
]


def parse_instance(xml_text: str, filing_name: str = "") -> list[dict]:
    """Parse one XBRL instance document into long-form fact rows.

    Context resolution follows XBRL 2.1: a fact is any non-xbrli
    child element carrying ``contextRef``; its period comes from the
    referenced context (instant vs duration), its unit from the
    optional ``unitRef``. Facts with unknown contexts are dropped
    (malformed filing) rather than crashing the batch — the
    reference's extractor likewise skips unparseable facts.
    """
    root = ET.fromstring(xml_text)
    ns = f"{{{XBRLI}}}"
    contexts: dict[str, tuple] = {}
    for ctx in root.findall(f"{ns}context"):
        entity = ctx.findtext(f"{ns}entity/{ns}identifier")
        period = ctx.find(f"{ns}period")
        instant = start = end = None
        if period is not None:
            instant = period.findtext(f"{ns}instant")
            start = period.findtext(f"{ns}startDate")
            end = period.findtext(f"{ns}endDate")
        contexts[ctx.get("id")] = (entity, instant, start, end)
    units = {u.get("id"): u.findtext(f"{ns}measure")
             for u in root.findall(f"{ns}unit")}
    rows: list[dict] = []
    for el in root:
        cref = el.get("contextRef")
        if cref is None or el.tag.startswith(ns):
            continue
        ctx = contexts.get(cref)
        if ctx is None:
            continue
        entity, instant, start, end = ctx
        text = (el.text or "").strip()
        try:
            num = float(text)
        except ValueError:
            num = None
        rows.append({
            "filing": filing_name,
            "entity_id": entity,
            "period_type": "instant" if instant else "duration",
            "instant_date": instant,
            "start_date": start,
            "end_date": end,
            "concept": el.tag.split("}")[-1],
            "unit": units.get(el.get("unitRef")),
            "decimals": el.get("decimals"),
            "value_text": text,
            "value_num": num,
        })
    return rows


def extract_xbrl_facts(docs: DataFrame, filing_col: str = "filing",
                       xml_col: str = "xml") -> DataFrame:
    """Distributed instance parsing: (filing, xml) -> long fact rows.

    ``mapInPandas`` so each executor parses its partition of filings
    with zero driver involvement; a filing's facts never leave the
    task that parsed it until the next (caller-chosen) shuffle.
    """
    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for filing, xml in zip(pdf[filing_col], pdf[xml_col]):
                out.extend(parse_instance(xml, filing))
            yield (pd.DataFrame(out, columns=FACT_COLUMNS) if out
                   else pd.DataFrame(columns=FACT_COLUMNS))

    return docs.mapInPandas(_parse, FACT_SCHEMA)


def pivot_facts(facts: DataFrame, period_type: str,
                concepts: list[str]) -> DataFrame:
    """Long facts -> the wide per-period table the reference's SQLite
    output carries: one row per (entity, filing, period), one column
    per concept (ref: ferc_xbrl_extractor's instant/duration tables).
    An explicit concept list keeps the pivot deterministic and the
    schema declared (never data-dependent at plan time).
    """
    keyed = facts.filter(F.col("period_type") == period_type)
    if period_type == "instant":
        keys = ["entity_id", "filing", "instant_date"]
    else:
        keys = ["entity_id", "filing", "start_date", "end_date"]
    return (
        keyed.groupBy(*keys)
        .pivot("concept", concepts)
        .agg(F.first("value_num"))
    )


def build_instance_xml(entity_id, duration_facts, instant_facts,
                       start, end, instant) -> "F.Column":
    """Synthesize a minimal valid XBRL instance as a Column expression
    (used by the round-trip query and tests: generate -> parse must
    be the identity). ``duration_facts``/``instant_facts`` are
    (concept, value-Column) pairs; values render with their natural
    string form.
    """
    parts = [F.lit(
        '<xbrl xmlns="http://www.xbrl.org/2003/instance" '
        'xmlns:t="http://example.com/test">'
        '<context id="d"><entity><identifier>')]
    parts.append(entity_id)
    parts.append(F.lit('</identifier></entity><period><startDate>'))
    parts.append(start)
    parts.append(F.lit('</startDate><endDate>'))
    parts.append(end)
    parts.append(F.lit('</endDate></period></context>'
                       '<context id="i"><entity><identifier>'))
    parts.append(entity_id)
    parts.append(F.lit('</identifier></entity><period><instant>'))
    parts.append(instant)
    parts.append(F.lit('</instant></period></context>'
                       '<unit id="u"><measure>iso4217:USD</measure></unit>'))
    for concept, value in duration_facts:
        parts.append(F.lit(
            f'<t:{concept} contextRef="d" unitRef="u" decimals="2">'))
        parts.append(value.cast("string"))
        parts.append(F.lit(f'</t:{concept}>'))
    for concept, value in instant_facts:
        parts.append(F.lit(f'<t:{concept} contextRef="i">'))
        parts.append(value.cast("string"))
        parts.append(F.lit(f'</t:{concept}>'))
    parts.append(F.lit('</xbrl>'))
    return F.concat(*parts)
