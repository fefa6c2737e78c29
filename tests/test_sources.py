"""Versioned dataset layer + CSV ingest + META interchange (SURVEY.md §1.2, §2.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.sources import csv_io, meta_csv
from ml_data_pipeline_spark.sources.versioned import (
    VersionedDataset,
    check_paired_versions,
    parse_file_version,
    strip_file_version,
)


def test_read_csv_null_spellings(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "# META: v0: imported\n"
        "a,b,c\n"
        "1,NA,x\n"
        "2,?,N/A\n"
        "3,hello,null\n"
    )
    df = csv_io.read_csv(spark, str(p))
    rows = {r["a"]: (r["b"], r["c"]) for r in df.collect()}
    assert rows == {1: (None, "x"), 2: (None, None), 3: ("hello", None)}


def test_read_csv_as_strings(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,\n2,x\n")
    rows = {r["a"]: r["b"] for r in csv_io.read_csv_as_strings(spark, str(p)).collect()}
    assert rows == {"1": "", "2": "x"}  # dtype=str + fillna("") semantics


def test_versioned_dataset_roundtrip(spark, tmp_path):
    vd = VersionedDataset(spark, str(tmp_path), "cust")
    assert vd.latest_version() is None
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    info0 = vd.write_version(df, ["imported"])
    assert (info0.version, info0.parent) == (0, None)
    info1 = vd.write_version(df.where(F.col("id") == 1), ["filtered id=1"])
    assert (info1.version, info1.parent) == (1, 0)
    assert vd.versions() == [0, 1]
    assert vd.read().count() == 1          # latest
    assert vd.read(0).count() == 2         # explicit
    hist = vd.history()
    assert [h.changes for h in hist] == [["imported"], ["filtered id=1"]]
    assert vd.meta().base == "cust"


def test_file_version_parse():
    assert parse_file_version("data_v3.csv") == 3
    assert parse_file_version("data.csv") is None
    assert strip_file_version("/x/y/housing_train_v2.csv") == "housing_train"


def test_paired_version_gate():
    ok, _ = check_paired_versions("h_train_v2.csv", "h_test_v2.csv")
    assert ok
    bad, msg = check_paired_versions("h_train_v2.csv", "h_test_v3.csv")
    assert not bad and "mismatch" in msg
    bad2, _ = check_paired_versions("h_train_v2.csv", "other_test_v2.csv")
    assert not bad2


def test_meta_csv_roundtrip(tmp_path):
    hist = {0: ["imported"], 1: ["dropped x", "imputed mean y"]}
    text = meta_csv.format_meta_lines(hist)
    assert text == "# META: v0: imported\n# META: v1: dropped x, imputed mean y\n"
    p = tmp_path / "d_v1.csv"
    p.write_text(text + "a,b\n1,2\n")
    assert meta_csv.load_meta_header(str(p)) == hist
    assert meta_csv.max_version(hist) == 1


def test_description_sidecar(tmp_path, spark):
    p = tmp_path / "desc.txt"
    p.write_text("age: years since birth\nbad line\nincome: usd / year\n")
    d = meta_csv.load_description_sidecar(str(p))
    assert d == {"age": "years since birth", "income": "usd / year"}
    df = spark.createDataFrame([(1, 2)], "age int, income int")
    out = meta_csv.apply_descriptions(df, d)
    assert out.schema["age"].metadata["comment"] == "years since birth"


def test_job_group_scope(spark):
    from ml_data_pipeline_spark.session import job_group

    with job_group(spark, "t-group", "test jobs") as jg:
        assert spark.createDataFrame([(1,)], "a int").count() == 1
        jg.cancel()  # no running jobs — must be a no-op, not an error


def test_merge_upsert(spark):
    from ml_data_pipeline_spark.sources import scd

    cur = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    got = {r["id"]: r["v"] for r in scd.merge_upsert(cur, upd, "id").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_scd2_history_and_snapshot(spark):
    from ml_data_pipeline_spark.sources import scd

    base = spark.createDataFrame([(1, "a", "2024-01-01"), (2, "b", "2024-01-01")],
                                 "id int, v string, ts string")
    hist = scd.scd2_init(base, "ts")
    upd = spark.createDataFrame([(1, "A", "2024-06-01")], "id int, v string, ts string")
    hist2 = scd.scd2_apply(hist, upd, "id", "ts")
    # key 1 has two versions, key 2 one
    assert hist2.count() == 3
    old = {r["id"]: r["v"] for r in scd.scd2_snapshot(hist2, "2024-03-01").collect()}
    new = {r["id"]: r["v"] for r in scd.scd2_snapshot(hist2, "2024-07-01").collect()}
    assert old == {1: "a", 2: "b"}
    assert new == {1: "A", 2: "b"}
