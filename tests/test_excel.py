"""S2 Excel extraction: stdlib xlsx parser + per-year column maps.

The writer below emits a minimal ECMA-376 workbook (shared strings,
inline strings, numeric and boolean cells, sparse cell refs) so the
parser is exercised without any excel library in the container.
"""

from __future__ import annotations

import zipfile

from pyspark.sql import types as T

from pudl_spark.sources.excel import (
    extract_excel_partitions, parse_xlsx, read_excel,
)

_CT = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels"
  ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell(ref: str, value, shared: list) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    if str(value).startswith("INLINE:"):
        return (f'<c r="{ref}" t="inlineStr"><is><t>{str(value)[7:]}</t>'
                "</is></c>")
    if value not in shared:
        shared.append(value)
    return f'<c r="{ref}" t="s"><v>{shared.index(value)}</v></c>'


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_minimal_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    shared: list = []
    sheet_xml = {}
    for idx, (name, rows) in enumerate(sheets.items(), start=1):
        body = []
        for rn, row in enumerate(rows, start=1):
            cells = "".join(
                _cell(f"{_col_letter(cn)}{rn}", v, shared)
                for cn, v in enumerate(row))
            body.append(f'<row r="{rn}">{cells}</row>')
        sheet_xml[f"xl/worksheets/sheet{idx}.xml"] = (
            '<?xml version="1.0"?><worksheet xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>')
    wb_sheets = "".join(
        f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, start=1))
    workbook = (
        '<?xml version="1.0"?><workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        f'relationships"><sheets>{wb_sheets}</sheets></workbook>')
    wb_rels = "".join(
        f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(sheets) + 1))
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
        'openxmlformats.org/package/2006/relationships">' + wb_rels +
        '<Relationship Id="rIdS" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/></Relationships>')
    sst = "".join(f"<si><t>{s}</t></si>" for s in shared)
    sst = ('<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats'
           f'.org/spreadsheetml/2006/main" count="{len(shared)}" '
           f'uniqueCount="{len(shared)}">{sst}</sst>')
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for part, xml in sheet_xml.items():
            zf.writestr(part, xml)


def test_parse_xlsx_cell_kinds(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_minimal_xlsx(p, {"Data": [
        ["name", "mw", "ok"],
        ["alpha", 10.5, True],
        [None, 3, "INLINE:in-line"],   # sparse ref: col A missing
    ]})
    sheets = parse_xlsx(p)
    assert list(sheets) == ["Data"]
    rows = sheets["Data"]
    assert rows[0] == ["name", "mw", "ok"]
    assert rows[1] == ["alpha", 10.5, True]
    assert rows[2] == [None, 3.0, "in-line"]


def test_read_excel_header_skip_and_types(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_minimal_xlsx(p, {"S": [
        ["EIA form 860 — junk banner"],
        ["Plant Code", "Plant Name", "Nameplate Capacity (MW)", "Retired"],
        [42, "alpha", 10.5, False],
        [7, "beta", 3.25, True],
        ["totals footer", None, 13.75, None],
    ]})
    schema = T.StructType([
        T.StructField("plant_id", T.LongType()),
        T.StructField("capacity_mw", T.DoubleType()),
        T.StructField("retired", T.BooleanType()),
    ])
    df = read_excel(
        spark, p, sheet_name="S", skiprows=1, skipfooter=1,
        column_map={"Plant Code": "plant_id", "Plant Name": "plant_name",
                    "Nameplate Capacity (MW)": "capacity_mw",
                    "Retired": "retired"},
        schema=schema)
    assert df.schema["plant_id"].dataType == T.LongType()
    assert df.schema["plant_name"].dataType == T.StringType()
    rows = {r["plant_id"]: r for r in df.collect()}
    assert len(rows) == 2
    assert rows[42]["capacity_mw"] == 10.5
    assert rows[7]["retired"] is True


def test_extract_excel_partitions_per_year_maps(spark, tmp_path):
    p1 = str(tmp_path / "y2020.xlsx")
    p2 = str(tmp_path / "y2021.xlsx")
    # 2020 uses an old header and lacks the county column.
    write_minimal_xlsx(p1, {"S": [
        ["PLNTCODE", "MW"], [1, 5.0], [2, 6.0]]})
    write_minimal_xlsx(p2, {"S": [
        ["Plant Id", "Capacity", "County"], [3, 7.0, "kent"]]})
    schema = T.StructType([
        T.StructField("plant_id", T.LongType()),
        T.StructField("capacity_mw", T.DoubleType()),
    ])
    df = extract_excel_partitions(
        spark, {2020: p1, 2021: p2},
        column_maps={
            2020: {"PLNTCODE": "plant_id", "MW": "capacity_mw"},
            2021: {"Plant Id": "plant_id", "Capacity": "capacity_mw",
                   "County": "county"},
        },
        schema=schema)
    assert df.count() == 3
    got = {r["plant_id"]: r for r in df.collect()}
    assert got[1]["county"] is None           # NULL-filled missing column
    assert got[3]["county"] == "kent"
    assert got[3]["report_year"] == 2021


def test_write_xlsx_roundtrip(spark, tmp_path):
    from pyspark.sql import types as T

    from pudl_spark.sources.excel import read_excel, write_xlsx

    p = str(tmp_path / "rt.xlsx")
    write_xlsx(p, {"s1": [
        ["id", "name", "score", "flag"],
        [1, "alpha", 1.5, True],
        [2, "be&<to>", -2.0, False],
        [3, None, None, None],
    ]})
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("flag", T.BooleanType()),
    ])
    got = {r["id"]: r for r in read_excel(spark, p, schema=schema).collect()}
    assert got[1]["name"] == "alpha" and got[1]["score"] == 1.5
    assert got[1]["flag"] is True
    assert got[2]["name"] == "be&<to>"      # XML escaping round-trips
    assert got[2]["flag"] is False
    assert got[3]["name"] is None and got[3]["score"] is None
