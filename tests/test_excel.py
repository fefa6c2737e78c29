"""S5 Excel interchange: stdlib OOXML reader/writer (sources/excel_io)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_data_pipeline_spark.sources import excel_io


def test_excel_roundtrip_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5, True), (2, "beta & <co>", -2.0, False), (3, None, 0.0, True)],
        "id int, name string, score double, flag boolean",
    )
    path = str(tmp_path / "t.xlsx")
    excel_io.write_excel(df, path)
    back = excel_io.read_excel(spark, path)
    rows = {r["id"]: (r["name"], r["score"], r["flag"]) for r in back.collect()}
    assert rows == {
        1: ("alpha", 1.5, True),
        2: ("beta & <co>", -2.0, False),
        3: (None, 0.0, True),
    }


def test_excel_no_header_and_dir_union(spark, tmp_path):
    df1 = spark.createDataFrame([(1, "a")], "x int, y string")
    df2 = spark.createDataFrame([(2, "b")], "x int, y string")
    p1, p2 = str(tmp_path / "a.xlsx"), str(tmp_path / "b.xlsx")
    excel_io.write_excel(df1, p1)
    excel_io.write_excel(df2, p2)
    merged = excel_io.read_excel_dir(spark, [p1, p2])
    assert sorted((r["x"], r["y"]) for r in merged.collect()) == [(1, "a"), (2, "b")]
    noh = excel_io.read_excel(spark, p1, header=False)
    assert noh.columns == ["col_0", "col_1"]
    assert noh.count() == 2  # header row becomes data


def test_excel_write_refuses_oversize(spark, tmp_path):
    df = spark.range(20).select(F.col("id"))
    with pytest.raises(ValueError, match="refused"):
        excel_io.write_excel(df, str(tmp_path / "big.xlsx"), max_rows=10)


def test_excel_column_letters():
    assert excel_io._col_letters(0) == "A"
    assert excel_io._col_letters(25) == "Z"
    assert excel_io._col_letters(26) == "AA"
    assert excel_io._col_index("AA1") == 26
    assert excel_io._col_index("Z9") == 25


def test_r10_excel_robustness(spark, tmp_path):
    """r10 review: numeric sheet ordering (sheet10 after sheet2), error
    cells -> NULL, overwide rows truncated, header-only sheet -> empty
    frame with the header's columns."""
    import zipfile

    from ml_data_pipeline_spark.sources.excel_io import _sheet_parts, read_excel

    # order: synthesize a zip with 11 sheet part names
    zp = tmp_path / "order.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for i in range(1, 12):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", "<x/>")
    with zipfile.ZipFile(zp) as zf:
        parts = _sheet_parts(zf)
    assert parts[1].endswith("sheet2.xml") and parts[10].endswith("sheet11.xml")

    # error cell + wide row + header-only via a handcrafted workbook
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c>
             <c r="B1" t="inlineStr"><is><t>h2</t></is></c></row>
  <row r="2"><c r="A2"><v>1</v></c><c r="B2" t="e"><v>#DIV/0!</v></c>
             <c r="C2"><v>9</v></c></row>
 </sheetData>
</worksheet>"""
    wb = tmp_path / "t.xlsx"
    with zipfile.ZipFile(wb, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    df = read_excel(spark, str(wb))
    assert df.columns == ["h1", "h2"]  # overwide C2 truncated
    row = df.collect()[0]
    assert row["h1"] == 1 and row["h2"] is None  # error cell -> NULL

    header_only = sheet.replace(
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="e"><v>#DIV/0!</v></c>\n             <c r="C2"><v>9</v></c></row>',
        "",
    )
    wb2 = tmp_path / "h.xlsx"
    with zipfile.ZipFile(wb2, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", header_only)
    empty = read_excel(spark, str(wb2))
    assert empty.columns == ["h1", "h2"] and empty.count() == 0
