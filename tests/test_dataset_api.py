"""Dataset lineage API (SURVEY.md §3.1): apply-chain + versioned save/load."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import filters as FL
from ml_data_pipeline_spark.operators import imputation as I
from ml_data_pipeline_spark.plans import Dataset


def test_apply_chain_records_changes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, 5.0, "y"), (3, 7.0, "z")], "id int, v double, junk string"
    )
    ds = (
        Dataset.from_df(df)
        .apply(FL.drop_columns, ["junk"], describe="dropped junk")
        .apply(I.impute_mean, "v", describe="imputed mean v")
    )
    assert ds.changes == ("dropped junk", "imputed mean v")
    assert ds.df.columns == ["id", "v"]
    assert ds.df.where(F.col("v").isNull()).count() == 0


def test_save_load_roundtrip_with_lineage(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    ds = Dataset.from_df(df).transform(lambda d: d.where(F.col("id") == 1), "kept id=1")
    info = ds.save(str(tmp_path), "t")
    assert info.version == 0 and info.changes == ["kept id=1"]
    back = Dataset.load(spark, str(tmp_path), "t")
    assert back.df.count() == 1 and back.base_version == 0
    # second commit bumps the version and keeps its own change list
    info2 = ds.apply(FL.drop_columns, ["s"], describe="dropped s").save(str(tmp_path), "t")
    assert info2.version == 1 and info2.parent == 0
    assert Dataset.load(spark, str(tmp_path), "t").df.columns == ["id"]


def test_save_pair_lockstep(spark, tmp_path):
    train = spark.createDataFrame([(1,)], "id int")
    test = spark.createDataFrame([(2,)], "id int")
    ds = Dataset.from_df(train)
    it, ie = ds.save_pair(str(tmp_path), "p", test)
    assert it.version == ie.version == 0
    it2, ie2 = ds.save_pair(str(tmp_path), "p", test)
    assert it2.version == ie2.version == 1


def test_apply_rejects_non_dataframe(spark):
    ds = Dataset.from_df(spark.createDataFrame([(1,)], "id int"))
    with pytest.raises(TypeError):
        ds.apply(lambda d: (d, d), describe="bad")
