"""FoxPro/dBase DBF extraction with a pure-stdlib parser (S5).

Ref: FercDbfReader / FercDbfExtractor (src/pudl/extract/dbf.py:294,403)
— the legacy FERC Form N archives are FoxPro DBF tables read row-wise
(dbfread) into DataFrames, with a custom numeric parser for bad FERC
data (FercFieldParser.parseN, dbf.py:229-252: strip nulls/stars/
leading zeros, bare '.' -> 0). Type mapping follows DBF_TYPES
(dbf.py:254-270).

Like the Excel path, parsing is DRIVER-SIDE: DBF is a pre-2021 archive
format whose per-file size is small; the reference converts it once to
SQLite and reads back. Here the parsed rows feed `createDataFrame`
directly, and the Parquet "raw vault" write (S10) is the scale path.

DBF layout (dBase III/FoxPro common subset): 32-byte header (record
count at offset 4, header size at 8, record size at 10), 32-byte field
descriptors (name 11B, type 1B, length at 16, decimals at 17)
terminated by 0x0D, then fixed-width records each prefixed with a
deletion flag (0x2A = deleted).
"""

from __future__ import annotations

import datetime
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pudl_spark.schema.model import Resource

_TYPE_MAP = {
    "C": T.StringType(),     # character
    "M": T.StringType(),     # memo block number, kept as string
    "D": T.DateType(),
    "L": T.BooleanType(),
    "F": T.DoubleType(),
    "N": T.DoubleType(),     # overridden to LongType when decimals == 0
    "I": T.LongType(),       # binary int32
}


def _clean_numeric(data: bytes) -> bytes:
    """FERC bad-numeric cleanup (ref: FercFieldParser.parseN,
    src/pudl/extract/dbf.py:229-252): strip whitespace, null and '*'
    characters, leading zeros; a bare '.' means zero."""
    data = data.strip().strip(b"*\x00").lstrip(b"0")
    if data == b".":
        data = b"0"
    return data


def _parse_value(ftype: str, raw: bytes, decimals: int,
                 encoding: str):
    if ftype in ("C", "M"):
        text = raw.rstrip(b"\x00 ").decode(encoding, errors="replace")
        return text if text else None
    if ftype == "D":
        s = raw.strip(b"\x00 ").decode("ascii", errors="replace")
        if len(s) != 8 or not s.isdigit():
            return None
        return datetime.date(int(s[:4]), int(s[4:6]), int(s[6:8]))
    if ftype == "L":
        ch = raw[:1].upper()
        if ch in (b"T", b"Y"):
            return True
        if ch in (b"F", b"N"):
            return False
        return None
    if ftype == "I":
        return struct.unpack("<i", raw)[0]
    if ftype in ("N", "F"):
        data = _clean_numeric(raw)
        if not data:
            return None
        try:
            if decimals == 0:
                # malformed '.' in an integer field truncates, like
                # the reference's cast-to-numeric recovery
                return int(float(data)) if b"." in data else int(data)
            return float(data)
        except ValueError:
            return None
    raise ValueError(f"unsupported DBF field type {ftype!r}")


def parse_dbf(path: str, encoding: str = "latin-1"):
    """-> (fields, rows): fields = [(name, type, length, decimals)],
    rows = tuples of parsed Python values (deleted records skipped)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    n_records, header_size, record_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        length = buf[off + 16]
        decimals = buf[off + 17]
        fields.append((name, ftype, length, decimals))
        off += 32
    rows = []
    off = header_size
    for _ in range(n_records):
        rec = buf[off:off + record_size]
        off += record_size
        if not rec or rec[0] == 0x2A:  # deleted
            continue
        vals, pos = [], 1
        for name, ftype, length, decimals in fields:
            vals.append(_parse_value(
                ftype, rec[pos:pos + length], decimals, encoding))
            pos += length
        rows.append(tuple(vals))
    return fields, rows


def dbf_struct_type(fields) -> T.StructType:
    """DBF field descriptors -> Spark schema (ref: DBF_TYPES,
    src/pudl/extract/dbf.py:254-270)."""
    out = []
    for name, ftype, _length, decimals in fields:
        dtype = _TYPE_MAP.get(ftype)
        if dtype is None:
            raise ValueError(f"unmapped DBF type {ftype!r} for {name}")
        if ftype == "N" and decimals == 0:
            dtype = T.LongType()
        out.append(T.StructField(name.lower(), dtype, True))
    return T.StructType(out)


def read_dbf(spark: SparkSession, path: str,
             resource: Resource | None = None,
             encoding: str = "latin-1") -> DataFrame:
    """One DBF table -> DataFrame with a declared schema; column names
    lower-cased like the reference's SQLite conversion."""
    fields, rows = parse_dbf(path, encoding=encoding)
    schema = (resource.to_struct_type() if resource is not None
              else dbf_struct_type(fields))
    if resource is not None:
        by_name = {f[0].lower(): i for i, f in enumerate(fields)}
        idx = [by_name[f.name.lower()] for f in schema.fields]
        rows = [tuple(r[i] for i in idx) for r in rows]
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------- writer

def write_dbf(path: str, fields, rows, encoding: str = "latin-1") -> None:
    """Minimal dBase III writer (round-trip scaffolding for the S5
    path). ``fields`` = [(name, type, length, decimals)] with the
    C/N/D/L types :func:`parse_dbf` decodes; values render in the
    fixed-width conventions FoxPro uses (C left-justified, N
    right-justified, D as YYYYMMDD, L as T/F, None as blanks).
    """
    import datetime as _dt

    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(f[2] for f in fields)
    buf = bytearray()
    buf += struct.pack(
        "<BBBBIHH20x", 0x03, 24, 1, 1, len(rows), header_size, record_size)
    for name, ftype, length, decimals in fields:
        desc = bytearray(32)
        desc[0:11] = name.encode("ascii")[:11].ljust(11, b"\x00")
        desc[11] = ord(ftype)
        desc[16] = length
        desc[17] = decimals
        buf += desc
    buf += b"\x0d"
    for row in rows:
        buf += b" "  # not-deleted flag
        for (name, ftype, length, decimals), v in zip(fields, row):
            if v is None:
                buf += b" " * length
            elif ftype == "C":
                buf += str(v).encode(encoding)[:length].ljust(length, b" ")
            elif ftype == "N":
                text = (f"{v:.{decimals}f}" if decimals
                        else str(int(v)))
                buf += text.encode("ascii")[:length].rjust(length, b" ")
            elif ftype == "D":
                d = v if isinstance(v, _dt.date) else _dt.date.fromisoformat(
                    str(v)[:10])
                buf += d.strftime("%Y%m%d").encode("ascii")
            elif ftype == "L":
                buf += b"T" if v else b"F"
            else:
                raise ValueError(f"unsupported DBF write type {ftype!r}")
    buf += b"\x1a"
    with open(path, "wb") as fh:
        fh.write(bytes(buf))
