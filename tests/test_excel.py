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
