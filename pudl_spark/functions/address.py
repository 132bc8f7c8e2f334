"""Probabilistic US-address tagging — the P23 messy-tail path.

Ref: the reference parses addresses with the ``usaddress`` CRF tagger
(src/pudl/helpers.py:2660-2699 ``parse_address``); the well-formed
"street, city, ST zip" shape is handled in pure codegen by
``operators/strings.py::parse_address``. This module covers the messy
tail the anchored regex can't: a Viterbi decoder over a
hand-weighted label HMM with lexicon/shape emissions — the same
token-label model family usaddress trains, with transparent weights
instead of a fitted CRF. Handles comma-less addresses, occupancy
units, pre/post directionals, multi-word street and city names.

Label set (usaddress names, so the assembly step mirrors the
reference's 1:1): AddressNumber, StreetNamePreDirectional,
StreetName, StreetNamePostType, StreetNamePostDirectional,
OccupancyType, OccupancyIdentifier, PlaceName, StateName, ZipCode.

Spark integration: per-row Python inside an Arrow-batched pandas UDF
(``tag_address_column``) — the kernel is a tiny Viterbi over ~10
states x n_tokens, map-side only, no shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# ------------------------------------------------------------ lexicons

_DIRECTIONALS = {
    "N", "S", "E", "W", "NE", "NW", "SE", "SW",
    "NORTH", "SOUTH", "EAST", "WEST", "NORTHEAST", "NORTHWEST",
    "SOUTHEAST", "SOUTHWEST",
}

_STREET_TYPES = {
    "ST", "STREET", "AVE", "AVENUE", "BLVD", "BOULEVARD", "RD", "ROAD",
    "DR", "DRIVE", "LN", "LANE", "CT", "COURT", "PL", "PLACE", "WAY",
    "HWY", "HIGHWAY", "PKWY", "PARKWAY", "CIR", "CIRCLE", "TER",
    "TERRACE", "TRL", "TRAIL", "SQ", "SQUARE", "LOOP", "RTE", "ROUTE",
}

_OCCUPANCY_TYPES = {
    "APT", "APARTMENT", "STE", "SUITE", "UNIT", "RM", "ROOM", "FL",
    "FLOOR", "BLDG", "BUILDING", "#", "LOT", "SPC", "SPACE", "DEPT",
}

_STATES = {
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI",
    "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI",
    "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC",
    "ND", "OH", "OK", "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT",
    "VT", "VA", "WA", "WV", "WI", "WY", "DC", "PR",
}

_ZIP_RE = re.compile(r"^\d{5}(-\d{4})?$")
_NUM_RE = re.compile(r"^\d+$")
_ALNUM_RE = re.compile(r"^\d+[A-Z]+$|^[A-Z]\d*$")

_LABELS = [
    "AddressNumber", "StreetNamePreDirectional", "StreetName",
    "StreetNamePostType", "StreetNamePostDirectional", "OccupancyType",
    "OccupancyIdentifier", "PlaceName", "StateName", "ZipCode",
]

_NEG = -100.0

# start scores: an address opens with its number, occasionally a
# street name (rural routes) — never a state or zip.
_START = {
    "AddressNumber": 0.0, "StreetName": -2.0, "PlaceName": -4.0,
    "StreetNamePreDirectional": -3.0,
}

_END = {"ZipCode": 0.0, "StateName": -1.0, "PlaceName": -2.0,
        "StreetName": -4.0, "StreetNamePostType": -4.0,
        "OccupancyIdentifier": -4.0,
        "StreetNamePostDirectional": -4.0}

# transition scores: the canonical ordering of US address components;
# anything not listed costs _NEG (effectively forbidden).
_TRANS: dict[str, dict[str, float]] = {
    "AddressNumber": {"StreetNamePreDirectional": 0.0, "StreetName": 0.0},
    "StreetNamePreDirectional": {"StreetName": 0.0},
    "StreetName": {"StreetName": -0.5, "StreetNamePostType": 0.0,
                   "PlaceName": -2.5},
    "StreetNamePostType": {"StreetNamePostDirectional": 0.0,
                           "OccupancyType": 0.0, "PlaceName": -0.5,
                           "OccupancyIdentifier": -2.0},
    "StreetNamePostDirectional": {"OccupancyType": 0.0,
                                  "PlaceName": -0.5},
    "OccupancyType": {"OccupancyIdentifier": 0.0},
    "OccupancyIdentifier": {"PlaceName": 0.0},
    "PlaceName": {"PlaceName": -0.3, "StateName": 0.0},
    "StateName": {"ZipCode": 0.0},
    "ZipCode": {},
}


def _emissions(token: str, boundary_before: bool) -> dict[str, float]:
    """Per-label emission scores for one normalized token.
    ``boundary_before`` marks a token that followed a comma — a
    strong hint that a new segment (city/state) starts here."""
    e: dict[str, float] = {}
    if _ZIP_RE.match(token):
        e["ZipCode"] = 2.0
        if len(token) == 5:
            e["AddressNumber"] = -1.0
            e["OccupancyIdentifier"] = -1.5
    elif _NUM_RE.match(token):
        e["AddressNumber"] = 1.0
        e["OccupancyIdentifier"] = 0.0
        e["StreetName"] = -2.0
    elif _ALNUM_RE.match(token):
        e["OccupancyIdentifier"] = 1.0
        e["StreetName"] = -2.0
    if token in _DIRECTIONALS:
        e["StreetNamePreDirectional"] = 1.5
        e["StreetNamePostDirectional"] = 1.5
        e.setdefault("StreetName", -0.5)
        e.setdefault("PlaceName", -1.0)
    if token in _STREET_TYPES:
        e["StreetNamePostType"] = 2.0
        e.setdefault("StreetName", -1.0)
        e.setdefault("PlaceName", -1.5)
    if token in _OCCUPANCY_TYPES:
        e["OccupancyType"] = 2.5
        e.setdefault("StreetName", -1.5)
    if token in _STATES:
        e["StateName"] = 2.5
        e.setdefault("StreetNamePreDirectional",
                     e.get("StreetNamePreDirectional", _NEG))
        e.setdefault("PlaceName", -1.0)
        e.setdefault("StreetName", -1.0)
    if token.isalpha() and token not in _STATES:
        e.setdefault("StreetName", 0.0)
        e.setdefault("PlaceName", 0.0)
    if not e:
        e = {"StreetName": -1.0, "PlaceName": -1.0,
             "OccupancyIdentifier": -1.0}
    if boundary_before:
        e = {k: v + (1.5 if k in ("PlaceName", "StateName") else 0.0)
             for k, v in e.items()}
    return e


def tag_address(addr: str) -> list[tuple[str, str]] | None:
    """Viterbi-decode one address into (token, label) pairs; None for
    empty/unparseable input."""
    if addr is None or not addr.strip():
        return None
    raw = addr.replace("#", " # ")
    originals: list[str] = []
    tokens: list[str] = []
    boundaries: list[bool] = []
    pending_boundary = False
    for piece in raw.replace(";", ",").split():
        had_comma = piece.endswith(",")
        tok = piece.strip(",.").strip()
        if not tok:
            pending_boundary = pending_boundary or had_comma
            continue
        originals.append(tok)
        tokens.append(tok.upper())
        boundaries.append(pending_boundary)
        pending_boundary = had_comma
    if not tokens:
        return None
    n = len(tokens)
    # Viterbi over the label lattice (tag on normalized tokens, emit
    # the original-case tokens like the reference's tagger)
    score: list[dict[str, float]] = [{} for _ in range(n)]
    back: list[dict[str, str | None]] = [{} for _ in range(n)]
    em0 = _emissions(tokens[0], boundaries[0])
    for lab in _LABELS:
        score[0][lab] = _START.get(lab, _NEG) + em0.get(lab, _NEG)
        back[0][lab] = None
    for i in range(1, n):
        em = _emissions(tokens[i], boundaries[i])
        for lab in _LABELS:
            best_prev, best_score = None, _NEG * 10
            for prev in _LABELS:
                t = _TRANS.get(prev, {}).get(lab, _NEG)
                s = score[i - 1][prev] + t
                if s > best_score:
                    best_prev, best_score = prev, s
            score[i][lab] = best_score + em.get(lab, _NEG)
            back[i][lab] = best_prev
    last = max(_LABELS,
               key=lambda lab: score[n - 1][lab] + _END.get(lab, -6.0))
    labels = [last]
    for i in range(n - 1, 0, -1):
        labels.append(back[i][labels[-1]])
    labels.reverse()
    return list(zip(originals, labels))


def parse_address_tagged(addr: str) -> tuple:
    """Tag then assemble the reference's four output components
    (street, city, state, zip) exactly like helpers.py:2660-2699:
    street concatenates number + directionals + name + type +
    occupancy; occupancy identifier only attaches when a type was
    tagged."""
    pairs = tag_address(addr)
    if pairs is None:
        return (None, None, None, None)
    by: dict[str, list[str]] = {}
    for tok, lab in pairs:
        by.setdefault(lab, []).append(tok)
    occ_type = " ".join(by.get("OccupancyType", []))
    occ_id = " ".join(by.get("OccupancyIdentifier", []))
    street_parts = [
        " ".join(by.get("AddressNumber", [])),
        " ".join(by.get("StreetNamePreDirectional", [])),
        " ".join(by.get("StreetName", [])),
        " ".join(by.get("StreetNamePostType", [])),
        " ".join(by.get("StreetNamePostDirectional", [])),
        occ_type,
        occ_id if occ_type else "",
    ]
    street = " ".join(p for p in street_parts if p).strip()
    city = " ".join(by.get("PlaceName", [])) or None
    state = " ".join(by.get("StateName", [])) or None
    zipc = " ".join(by.get("ZipCode", [])) or None
    return (street or None, city, state, zipc)


def tag_address_column(col: Column | str) -> Column:
    """The Spark surface: address string -> struct(street_address,
    city, state, zip_code) via an Arrow-batched pandas UDF (map-side
    only; the Viterbi lattice is ~10 labels x n_tokens per row)."""
    from pyspark.sql.functions import pandas_udf

    def _batch(s):
        import pandas as pd

        return pd.DataFrame(
            [parse_address_tagged(a) for a in s],
            columns=["street_address", "city", "state", "zip_code"])

    udf = pandas_udf(
        _batch,
        "street_address string, city string, state string, "
        "zip_code string")
    return udf(F.col(col) if isinstance(col, str) else col)


def parse_address_probabilistic(df: DataFrame, col: str,
                                out_cols=("street_address", "city",
                                          "state", "zip_code"),
                                drop: bool = False) -> DataFrame:
    """Drop-in replacement for operators.strings.parse_address that
    routes through the probabilistic tagger — same signature, same
    output columns, handles the comma-less/occupancy/directional tail
    the anchored regex nulls out."""
    tagged = df.withColumn("__addr", tag_address_column(col))
    out = tagged.withColumns({
        out_cols[0]: F.col("__addr.street_address"),
        out_cols[1]: F.col("__addr.city"),
        out_cols[2]: F.col("__addr.state"),
        out_cols[3]: F.col("__addr.zip_code"),
    }).drop("__addr")
    return out.drop(col) if drop else out
