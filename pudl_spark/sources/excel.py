"""Excel (xlsx) extraction with a pure-stdlib parser (S2).

Ref: ExcelExtractor (src/pudl/extract/excel.py:94,203-248) — per
(page, partition) sheet selection, skiprows/skipfooter trimming,
per-partition column maps renaming raw headers to standard names,
then concat-across-years (extract/extractor.py:230-241).

The reference parses Excel DRIVER-SIDE with pandas/calamine; spreadsheet
files are small (≤ a few MB) config-like inputs, so a distributed read
buys nothing. We do the same: parse on the driver, then
`spark.createDataFrame` with a DECLARED schema (never inferred, §1.3).
No excel library is needed — .xlsx is a zip of XML parts
(ECMA-376 SpreadsheetML); the stdlib `zipfile` + `xml.etree` cover the
subset PUDL's sources use (shared strings, inline strings, numbers,
booleans, dates stored as serial numbers).
"""

from __future__ import annotations

import datetime
import re
import zipfile
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pudl_spark.operators.sets import union_by_name
from pudl_spark.schema.model import Resource

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")
# Excel serial day 0 == 1899-12-30 (the 1900 leap-year bug is baked in).
_EXCEL_EPOCH = datetime.date(1899, 12, 30)


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 (base-26 bijective column letters)."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(cell, shared: list[str]):
    """Decode one <c> element to a Python value (str/float/bool/None)."""
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype in ("str", "e"):
        return v.text
    try:
        num = float(v.text)
    except ValueError:  # malformed numeric cell: keep raw text
        return v.text
    return num


def parse_xlsx(path: str) -> dict[str, list[list]]:
    """Parse an .xlsx file into {sheet_name: rows} with raw cell values.

    Rows are dense lists (missing cells -> None) so downstream header /
    column-map logic can index positionally, like pandas.read_excel.
    """
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_NS}t")))
        # sheet name -> relationship id -> worksheet part path
        rels = {}
        rel_root = ElementTree.fromstring(
            zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root:
            target = rel.get("Target", "")
            rels[rel.get("Id")] = (
                target if target.startswith("xl/")
                else "xl/" + target.lstrip("/"))
        wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
        sheets: dict[str, list[list]] = {}
        for sh in wb.iter(f"{_NS}sheet"):
            part = rels[sh.get(f"{_REL_NS}id")]
            sheet_root = ElementTree.fromstring(zf.read(part))
            rows: list[list] = []
            for row_el in sheet_root.iter(f"{_NS}row"):
                cells: list = []
                for cell in row_el.iter(f"{_NS}c"):
                    ref = cell.get("r")
                    if ref is not None:
                        m = _CELL_REF.match(ref)
                        col = _col_index(m.group(1)) if m else len(cells)
                    else:
                        col = len(cells)
                    while len(cells) < col:
                        cells.append(None)
                    val = _cell_value(cell, shared)
                    if len(cells) == col:
                        cells.append(val)
                    else:
                        cells[col] = val
                rows.append(cells)
            width = max((len(r) for r in rows), default=0)
            sheets[sh.get("name")] = [
                r + [None] * (width - len(r)) for r in rows]
    return sheets


def _coerce(value, dtype: T.DataType):
    """Driver-side cast of a raw xlsx cell to the declared field type."""
    if value is None or value == "":
        return None
    if isinstance(dtype, T.StringType):
        if isinstance(value, float) and value.is_integer():
            return str(int(value))  # xlsx stores ints as floats
        return str(value)
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return int(float(value))
    if isinstance(dtype, T.DoubleType):
        return float(value)
    if isinstance(dtype, T.BooleanType):
        if isinstance(value, bool):
            return value
        return str(value).strip().lower() in ("true", "1", "yes", "y")
    if isinstance(dtype, T.DateType):
        if isinstance(value, (int, float)):  # Excel serial date number
            return _EXCEL_EPOCH + datetime.timedelta(days=int(value))
        return datetime.date.fromisoformat(str(value)[:10])
    raise TypeError(f"unsupported excel field type: {dtype}")


def read_excel(spark: SparkSession, path: str, sheet_name: str | int = 0,
               skiprows: int = 0, skipfooter: int = 0,
               column_map: dict[str, str] | None = None,
               resource: Resource | None = None,
               schema: T.StructType | None = None) -> DataFrame:
    """One sheet -> DataFrame (ref: excel.py:203-248 load_source).

    First row after ``skiprows`` is the header; ``column_map`` renames
    raw headers to standard names (ref: get_column_map, process_raw
    excel.py:142-147); unmapped columns keep their raw (snake-trimmed)
    names. Schema is declared via ``resource``/``schema``; unlisted
    columns land as strings.
    """
    sheets = parse_xlsx(path)
    if isinstance(sheet_name, int):
        sheet_name = list(sheets)[sheet_name]
    rows = sheets[sheet_name][skiprows:]
    if skipfooter:
        rows = rows[:-skipfooter]
    if not rows:
        raise ValueError(f"sheet {sheet_name!r} empty after trimming")
    header = [str(h).strip() if h is not None else f"col_{i}"
              for i, h in enumerate(rows[0])]
    if column_map:
        header = [column_map.get(h, h) for h in header]
    if resource is not None:
        schema = resource.to_struct_type()
    declared = {f.name: f.dataType for f in schema.fields} if schema else {}
    out_schema = T.StructType([
        T.StructField(h, declared.get(h, T.StringType()), True)
        for h in header])
    data = [tuple(_coerce(v, out_schema[i].dataType)
                  for i, v in enumerate(r[:len(header)]))
            for r in rows[1:]]
    return spark.createDataFrame(data, out_schema)


def extract_excel_partitions(
        spark: SparkSession, partitions: dict[object, str],
        sheet_name: str | int = 0, skiprows: int = 0, skipfooter: int = 0,
        column_maps: dict[object, dict[str, str]] | None = None,
        partition_col: str = "report_year",
        resource: Resource | None = None,
        schema: T.StructType | None = None) -> DataFrame:
    """Partition-iterated Excel extraction -> one table (S1 ∘ S2).

    ``partitions`` maps partition value (e.g. year) -> xlsx path;
    ``column_maps`` gives the per-partition raw->standard rename (the
    reference's per-year column maps, excel.py:142-147). Frames concat
    via unionByName with NULL-fill for columns absent in some years
    (ref: extractor.py:230-241).
    """
    frames = []
    for part, path in partitions.items():
        df = read_excel(
            spark, path, sheet_name=sheet_name, skiprows=skiprows,
            skipfooter=skipfooter,
            column_map=(column_maps or {}).get(part),
            resource=resource, schema=schema)
        frames.append(df.withColumn(partition_col, F.lit(part)))
    return union_by_name(frames)


# ---------------------------------------------------------- writer

def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Minimal valid .xlsx writer (round-trip scaffolding for the S2
    path: generate -> parse must be the identity; also handy for
    emitting small report workbooks). Strings become inline strings,
    ints/floats numeric cells, bools boolean cells, None skipped —
    exactly the cell types :func:`parse_xlsx` decodes.
    """
    import xml.sax.saxutils as sx

    def _cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t>'
                f'{sx.escape(str(v))}</t></is></c>')

    def _col_letters(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets)))
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/'
        'officeDocument" Target="xl/workbook.xml"/></Relationships>')
    wb_sheets = "".join(
        f'<sheet name="{sx.escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(sheets))
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships"><sheets>'
        + wb_sheets + "</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets)))
        + "</Relationships>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (name, rows) in enumerate(sheets.items()):
            body = []
            for r, row in enumerate(rows, start=1):
                cells = "".join(
                    _cell(f"{_col_letters(c)}{r}", v)
                    for c, v in enumerate(row))
                body.append(f'<row r="{r}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(body) + "</sheetData></worksheet>")
