from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.skew import plan_compaction


def _inv(spark):
    rows = [
        ("a", "f1", 40),
        ("a", "f2", 40),
        ("a", "f3", 40),  # 40+40=80 >= target 100 at f3's start? no: 80 < 100
        ("a", "f4", 300),  # oversized file
        ("a", "f5", 10),
        ("b", "f1", 10),
    ]
    return spark.createDataFrame(rows, ["part", "file", "size"])


def test_bins_fill_to_target_then_roll(spark):
    out = {
        (r["part"], r["file"]): r["bin"]
        for r in plan_compaction(
            _inv(spark), "size", 100, file_col="file", partition_cols=["part"]
        ).collect()
    }
    # prefix sums (exclusive): f1=0, f2=40, f3=80, f4=120, f5=420
    assert out[("a", "f1")] == 0
    assert out[("a", "f2")] == 0
    assert out[("a", "f3")] == 0
    assert out[("a", "f4")] == 1  # starts a new bin
    assert out[("a", "f5")] == 4  # pushed past the oversized file
    assert out[("b", "f1")] == 0  # partitions plan independently


def test_total_bytes_preserved_and_deterministic(spark):
    planned = plan_compaction(
        _inv(spark).repartition(4), "size", 100, file_col="file", partition_cols=["part"]
    )
    assert planned.agg(F.sum("size")).collect()[0][0] == 440
    again = plan_compaction(
        _inv(spark), "size", 100, file_col="file", partition_cols=["part"]
    )
    assert sorted(map(tuple, planned.collect())) == sorted(map(tuple, again.collect()))
