"""S5 DBF extraction: stdlib dBase parser with FERC bad-numeric
cleanup. The writer below emits a dBase-III-layout file including the
malformed numerics the reference's custom parser handles."""

from __future__ import annotations

import struct

from pyspark.sql import types as T

from pudl_spark.sources.dbf import parse_dbf, read_dbf


def write_minimal_dbf(path: str, fields, records) -> None:
    """fields: [(name, type, length, decimals)]; records: list of
    (deleted: bool, [raw bytes per field])."""
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3xIHH20x", 0x03, len(records), header_size,
                       record_size)
    for name, ftype, length, decimals in fields:
        out += name.encode("ascii").ljust(11, b"\x00")
        out += ftype.encode("ascii")
        out += b"\x00" * 4
        out += struct.pack("BB", length, decimals)
        out += b"\x00" * 14
    out += b"\x0d"
    for deleted, raws in records:
        out += b"\x2a" if deleted else b"\x20"
        for (name, ftype, length, decimals), raw in zip(fields, raws):
            assert len(raw) == length, (name, raw)
            out += raw
    out += b"\x1a"
    with open(path, "wb") as fh:
        fh.write(out)


FIELDS = [
    ("RSPNDNT", "C", 8, 0),
    ("YEAR", "N", 4, 0),
    ("REVENUE", "N", 10, 2),
    ("ACTIVE", "L", 1, 0),
    ("RPT_DATE", "D", 8, 0),
]


def test_parse_dbf_ferc_bad_numerics(tmp_path):
    p = str(tmp_path / "f1.dbf")
    write_minimal_dbf(p, FIELDS, [
        (False, [b"alpha   ", b"2019", b"   1234.50", b"T", b"20190401"]),
        # FERC badness: leading zeros, bare '.', stars/nulls
        (False, [b"beta    ", b"0020", b"         .", b"F", b"        "]),
        (False, [b"gamma   ", b"2021", b"**\x00       ", b"?", b"20211231"]),
        (True,  [b"deleted ", b"9999", b"      9.99", b"T", b"19990101"]),
    ])
    fields, rows = parse_dbf(p)
    assert [f[0] for f in fields] == [f[0] for f in FIELDS]
    assert len(rows) == 3                      # deleted row skipped
    assert rows[0] == ("alpha", 2019, 1234.5, True,
                       __import__("datetime").date(2019, 4, 1))
    assert rows[1][1] == 20                    # leading zeros stripped
    assert rows[1][2] == 0.0                   # bare '.' -> 0
    assert rows[1][4] is None                  # blank date
    assert rows[2][2] is None                  # stars/nulls -> NULL
    assert rows[2][3] is None                  # '?' logical -> NULL


def test_read_dbf_spark_schema(spark, tmp_path):
    p = str(tmp_path / "f1.dbf")
    write_minimal_dbf(p, FIELDS, [
        (False, [b"alpha   ", b"2019", b"   1234.50", b"T", b"20190401"]),
        (False, [b"beta    ", b"0020", b"         .", b"F", b"        "]),
    ])
    df = read_dbf(spark, p)
    assert df.schema["rspndnt"].dataType == T.StringType()
    assert df.schema["year"].dataType == T.LongType()
    assert df.schema["revenue"].dataType == T.DoubleType()
    assert df.schema["active"].dataType == T.BooleanType()
    assert df.schema["rpt_date"].dataType == T.DateType()
    rows = {r["rspndnt"]: r for r in df.collect()}
    assert rows["alpha"]["revenue"] == 1234.5
    assert rows["beta"]["year"] == 20


def test_write_dbf_roundtrip():
    import datetime
    import tempfile

    from pudl_spark.sources.dbf import parse_dbf, write_dbf

    fields = [("KEY", "N", 8, 0), ("NAME", "C", 10, 0),
              ("BAL", "N", 10, 2), ("OK", "L", 1, 0),
              ("DAY", "D", 8, 0)]
    rows = [
        (7, "seven", -12.34, True, datetime.date(2020, 2, 29)),
        (None, None, 0.25, False, None),
        # the FERC parseN quirk: a literal 0 integer nulls on read
        (0, "zero", 0.0, True, datetime.date(1999, 1, 1)),
    ]
    with tempfile.TemporaryDirectory() as td:
        p = td + "/t.dbf"
        write_dbf(p, fields, rows)
        got_fields, got_rows = parse_dbf(p)
    assert [(f[0], f[1]) for f in got_fields] == [
        ("KEY", "N"), ("NAME", "C"), ("BAL", "N"), ("OK", "L"),
        ("DAY", "D")]
    assert got_rows[0] == (7, "seven", -12.34, True,
                           datetime.date(2020, 2, 29))
    assert got_rows[1] == (None, None, 0.25, False, None)
    assert got_rows[2] == (None, "zero", 0.0, True,
                           datetime.date(1999, 1, 1))
