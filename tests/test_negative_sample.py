from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.sampling import negative_sample


def _frames(spark):
    anchors = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    pool = spark.createDataFrame([(100 + i,) for i in range(50)], ["id"])
    return anchors, pool


def test_k_negatives_per_anchor_from_pool(spark):
    anchors, pool = _frames(spark)
    out = negative_sample(anchors, pool, k=3, id_col="id", n_buckets=8)
    rows = out.collect()
    assert len(rows) == 30  # every (anchor, j) draw lands (no empty buckets)
    assert set(r["j"] for r in rows) == {1, 2, 3}
    assert all(100 <= r["neg_id"] < 150 for r in rows)
    per_anchor = out.groupBy("anchor_id").count().collect()
    assert all(r["count"] == 3 for r in per_anchor)


def test_deterministic_across_runs_and_layouts(spark):
    anchors, pool = _frames(spark)
    a = set(map(tuple, negative_sample(anchors, pool, 3, "id", 8).collect()))
    b = set(
        map(
            tuple,
            negative_sample(
                anchors.repartition(7), pool.repartition(5), 3, "id", 8
            ).collect(),
        )
    )
    assert a == b


def test_draws_spread_over_pool(spark):
    anchors, pool = _frames(spark)
    out = negative_sample(anchors, pool, k=3, id_col="id", n_buckets=8)
    distinct_negs = out.select("neg_id").distinct().count()
    assert distinct_negs >= 15  # hashes actually spread the draws


def test_tiny_pool_with_empty_buckets_still_yields_k(spark):
    # 5-row pool, 64 buckets: most buckets are empty — the non-empty-bucket
    # indexing must still produce exactly k draws per anchor
    anchors = spark.createDataFrame([(i,) for i in range(20)], ["id"])
    pool = spark.createDataFrame([(100 + i,) for i in range(5)], ["id"])
    out = negative_sample(anchors, pool, k=4, id_col="id", n_buckets=64)
    per_anchor = out.groupBy("anchor_id").count().collect()
    assert len(per_anchor) == 20
    assert all(r["count"] == 4 for r in per_anchor)
