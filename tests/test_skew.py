"""Skew/shuffle management: salted joins and bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import skew as SK


def test_salted_join_matches_plain_join(spark):
    # heavily skewed big side: 900 rows of key 'hot', 100 spread
    big = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(100)], "k string, w double"
    )
    plain = big.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    ).first()
    salted = SK.salted_join(big, small, "k", salt=4).agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    ).first()
    assert (plain["n"], plain["sw"]) == (salted["n"], salted["sw"])


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    small = spark.createDataFrame([("a", 9.0)], "k string, w double")
    rows = {r["k"]: r["w"] for r in SK.salted_join(big, small, "k", salt=3, how="left").collect()}
    assert rows == {"a": 9.0, "b": None}


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    df1 = spark.createDataFrame([(i, f"a{i}") for i in range(100)], "id long, a string")
    df2 = spark.createDataFrame([(i, f"b{i}") for i in range(100)], "id long, b string")
    SK.write_bucketed(df1, "t_left", "id", 4, path=str(tmp_path / "l"))
    SK.write_bucketed(df2, "t_right", "id", 4, path=str(tmp_path / "r"))
    joined = SK.bucketed_join_ready(spark, "t_left", "t_right", "id")
    # co-located: same bucket spec on both sides -> NO shuffle exchange
    assert not SK.explain_has_exchange(joined)
    assert joined.count() == 100
    # control: the same join on plain (non-bucketed) frames DOES shuffle
    # (or broadcasts; force shuffle-hash off broadcast by size threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = df1.join(df2, "id")
        assert SK.explain_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_write_sorted_files_have_disjoint_ranges(spark, tmp_path):
    """Range-partitioned sorted layout: per-file key spans must be (nearly)
    disjoint, so predicate scans can skip whole files on row-group stats."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from ml_data_pipeline_spark.operators.skew import write_sorted

    df = spark.range(100_000).select(
        (F.col("id") * 37 % 100_000).alias("k"), F.col("id").alias("payload")
    )
    out = str(tmp_path / "sorted")
    write_sorted(df, out, ["k"], num_files=8)

    spans = []
    for f in sorted(Path(out).glob("*.parquet")):
        md = pq.read_metadata(str(f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 4
    # consecutive files overlap at most at the boundary value
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2 + 1
    # and a point-filter scan reads back correctly
    got = spark.read.parquet(out).where("k = 12345").count()
    assert got == df.where("k = 12345").count()


def test_auto_salted_join_parity_both_paths(spark):
    from ml_data_pipeline_spark.operators.skew import auto_salted_join

    # skewed: key 0 holds 5000 rows; threshold 1000 -> salting engages
    big = spark.range(10_000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 10_000, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    salted = auto_salted_join(big, small, "k", rows_per_task=1000).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    as_map = lambda d: {r["k"]: (r["n"], r["s"]) for r in d.collect()}
    assert as_map(plain) == as_map(salted)

    # uniform: stays a plain join (no salt column side effects)
    uni = spark.range(10_000).select(F.col("id").alias("k"), F.lit(1).alias("payload"))
    out = auto_salted_join(uni, small, "k", rows_per_task=1000)
    assert out.columns == ["k", "payload", "dim"]
    assert out.count() == small.count()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A hive-partitioned parquet layout + an equality filter on the
    partition column must show PartitionFilters in the scan (the physical
    skip-most-of-the-data mechanism the IVF/LSH write paths rely on —
    at 100 TB the filter decides how many files exist for the job,
    not how many rows survive a full read)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "part_events")
    df = spark.range(1000).select(
        "id", (F.col("id") % 7).alias("bucket"), F.rand(1).alias("x")
    )
    df.write.mode("overwrite").partitionBy("bucket").parquet(out)
    back = spark.read.parquet(out).where(F.col("bucket") == 3)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan or "PartitionFilters: [" in plan
    # the pruned read returns exactly the one bucket
    assert back.count() == df.where(F.col("id") % 7 == 3).count()
    # and the plan's partition filter actually references the bucket value
    assert "bucket" in plan.split("PartitionFilters")[1][:120]


def test_zorder_key_locality_rectangles(spark):
    """The data-skipping property, exactly: every aligned run of 2^(2k)
    consecutive z-keys is confined to a 2^k x 2^k rectangle in (x, y) —
    here the 4 quarters of the 8-bit key space each span at most half of
    each dimension. A single-column sort cannot bound the second dim."""
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.operators.skew import zorder_key

    grid = (
        spark.range(256 * 256)
        .select((F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y"))
    )
    keyed = zorder_key(grid, "x", "y", bits=8)
    quarters = (
        keyed.groupBy((F.col("zkey") / 16384).cast("long").alias("q"))
        .agg(
            F.min("x").alias("xmin"), F.max("x").alias("xmax"),
            F.min("y").alias("ymin"), F.max("y").alias("ymax"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(quarters) == 4
    for r in quarters:
        assert r["xmax"] - r["xmin"] == 127, r  # half the 256-wide domain
        assert r["ymax"] - r["ymin"] == 127, r
        assert r["n"] == 16384


def test_zorder_key_bijective_on_grid(spark):
    """bits-masked interleave is a bijection: 65536 grid points -> 65536
    distinct keys in [0, 65536)."""
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.operators.skew import zorder_key

    grid = (
        spark.range(256 * 256)
        .select((F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y"))
    )
    keyed = zorder_key(grid, "x", "y", bits=8)
    row = keyed.agg(
        F.countDistinct("zkey").alias("d"), F.min("zkey").alias("lo"), F.max("zkey").alias("hi")
    ).first()
    assert row["d"] == 65536 and row["lo"] == 0 and row["hi"] == 65535


def test_bloom_prejoin_no_false_negatives_and_prunes(spark):
    from ml_data_pipeline_spark.operators.skew import bloom_prejoin

    fact = spark.createDataFrame([(i, i % 7) for i in range(2000)], ["k", "g"])
    keys = spark.createDataFrame([(i,) for i in range(0, 2000, 100)], ["key"])
    passed = bloom_prejoin(fact, keys, "k", "key", n_bits=1024)
    got = {r["k"] for r in passed.select("k").collect()}
    true_keys = set(range(0, 2000, 100))
    assert true_keys <= got  # bloom never drops a real match
    assert len(got) < 2000  # and actually prunes non-matching rows
    # deterministic across partition layouts
    again = {
        r["k"]
        for r in bloom_prejoin(fact.repartition(9), keys, "k", "key", n_bits=1024)
        .select("k")
        .collect()
    }
    assert got == again


def test_join_size_estimate_exact_on_multiset_keys(spark):
    from ml_data_pipeline_spark.operators.skew import join_size_estimate

    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(1,), (1,), (1,), (2,), (9,)], ["j"])
    r = join_size_estimate(a, "k", b, "j").collect()[0]
    # key 1: 2*3=6; key 2: 1*1=1; keys 3 and 9 do not match
    assert r["predicted_rows"] == 7
    assert r["max_key_rows"] == 6
    assert r["n_matching_keys"] == 2
    actual = a.join(b, a["k"] == b["j"]).count()
    assert actual == r["predicted_rows"]
