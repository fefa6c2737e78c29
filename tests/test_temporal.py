"""As-of / range joins (scale-extension temporal family)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import temporal as TP


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 10.0), ("b", 3.0), ("c", 1.0)],
        "k string, lt double",
    )
    right = spark.createDataFrame(
        [("a", 0.0, 100.0), ("a", 5.0, 200.0), ("a", 7.0, 300.0), ("b", 4.0, 400.0)],
        "k string, rt double, v double",
    )
    return left, right


def test_asof_join_matches_pandas(spark, frames):
    left, right = frames
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in TP.asof_join(left, right, "k", "lt", "rt").collect()
    }
    lp = left.toPandas().sort_values("lt")
    rp = right.toPandas().sort_values("rt")
    exp = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k")
    for _, row in exp.iterrows():
        e = None if pd.isna(row["v"]) else row["v"]
        assert got[(row["k"], row["lt"])] == e
    # spot-check semantics: lt=5 matches rt=5 (<=); b@3 has no earlier row
    assert got[("a", 5.0)] == 200.0 and got[("b", 3.0)] is None


def test_asof_join_strict(spark, frames):
    left, right = frames
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in TP.asof_join(left, right, "k", "lt", "rt", strict=True).collect()
    }
    assert got[("a", 5.0)] == 100.0  # strict <: the rt=5 row no longer matches


def test_asof_join_tolerance(spark, frames):
    left, right = frames
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in TP.asof_join(left, right, "k", "lt", "rt", tolerance_seconds=2.0).collect()
    }
    assert got[("a", 10.0)] is None  # rt=7 is 3s stale > tolerance
    assert got[("a", 5.0)] == 200.0


def test_range_join_interval(spark):
    left = spark.createDataFrame([("a", 5.0), ("a", 15.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 0.0, 10.0, "early"), ("a", 10.0, 20.0, "late")],
        "k string, s double, e double, label string",
    )
    got = {r["t"]: r["label"] for r in TP.range_join_interval(left, right, "k", "t", "s", "e").collect()}
    assert got == {5.0: "early", 15.0: "late"}
