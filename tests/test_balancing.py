"""Balancing operators (SURVEY.md §2.7) — exact count contracts + invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import balancing as B


def _counts(df, target="cls"):
    return {r[target]: r["n"] for r in df.groupBy(target).agg(F.count("*").alias("n")).collect()}


def _toy(spark, na=12, nb=4, nc=6):
    data = (
        [("a", float(i), float(i % 5)) for i in range(na)]
        + [("b", 100.0 + i, float(i % 3)) for i in range(nb)]
        + [("c", 200.0 + i, float(i % 4)) for i in range(nc)]
    )
    return spark.createDataFrame(data, "cls string, x double, y double")


def test_random_undersample_counts(spark):
    out = B.random_undersample(_toy(spark), "cls", seed=7)
    assert _counts(out) == {"a": 4, "b": 4, "c": 4}


def test_random_oversample_counts(spark):
    out = B.random_oversample(_toy(spark), "cls", seed=7)
    assert _counts(out) == {"a": 12, "b": 12, "c": 12}
    # oversampling duplicates existing rows only
    orig = {(r["cls"], r["x"], r["y"]) for r in _toy(spark).collect()}
    assert {(r["cls"], r["x"], r["y"]) for r in out.collect()} <= orig


def test_smote_counts_and_ranges(spark):
    df = _toy(spark)
    out = B.smote(df, "cls", ["x", "y"], k=3, method="exact", seed=1)
    assert _counts(out) == {"a": 12, "b": 12, "c": 12}
    # synthetic rows interpolate within the class's convex hull per feature
    b = out.where(F.col("cls") == "b").agg(F.min("x"), F.max("x")).first()
    assert 100.0 <= b[0] and b[1] <= 103.0


def test_cluster_centroids_counts(spark):
    out = B.cluster_centroids(_toy(spark), "cls", ["x", "y"], seed=1)
    assert _counts(out) == {"a": 4, "b": 4, "c": 4}


def test_nearmiss_counts_and_selection(spark):
    # majority 'a' rows at x=0..11; minority 'b' clustered at x=100.
    # NearMiss-1 must keep the 4 'a' rows CLOSEST to b: x=8,9,10,11.
    out = B.nearmiss(_toy(spark, na=12, nb=4, nc=4), "cls", ["x", "y"], k=2, method="exact")
    assert _counts(out) == {"a": 4, "b": 4, "c": 4}
    kept_a = sorted(r["x"] for r in out.where(F.col("cls") == "a").collect())
    assert kept_a == [8.0, 9.0, 10.0, 11.0]


def test_adasyn_counts(spark):
    out = B.adasyn(_toy(spark), "cls", ["x", "y"], k=3, method="exact", seed=1)
    assert _counts(out) == {"a": 12, "b": 12, "c": 12}


def test_borderline_smote_counts(spark):
    out = B.borderline_smote(_toy(spark), "cls", ["x", "y"], k=3, method="exact", seed=1)
    assert _counts(out) == {"a": 12, "b": 12, "c": 12}


def test_tomek_links_found(spark):
    # two rows of different classes adjacent at x=5,6; everything else far
    data = [("a", 5.0), ("b", 6.0), ("a", 100.0), ("a", 101.0), ("b", 200.0), ("b", 201.0)]
    df = spark.createDataFrame(data, "cls string, x double")
    links = B.tomek_links(df, "cls", ["x"], method="exact").collect()
    assert len(links) == 1  # exactly the (5.0, 6.0) cross-class mutual-NN pair


def test_r11_tomek_and_danger_reject_null_labels(spark):
    """ADVICE r10: tomek_links / borderline_danger missed the shared
    _require_nonnull_target guard — a NULL class label made the
    null-unsafe __cls != __ncls filter evaluate to NULL, so links touching
    NULL-label rows silently vanished instead of failing loudly."""
    import pytest

    df = spark.createDataFrame(
        [("a", 5.0), (None, 6.0), ("b", 7.0)], "cls string, x double"
    )
    with pytest.raises(ValueError, match="non-NULL"):
        B.tomek_links(df, "cls", ["x"], method="exact")
    with pytest.raises(ValueError, match="non-NULL"):
        B.borderline_danger(df, "cls", ["x"], method="exact")


def test_smote_enn_no_worse_than_smote(spark):
    df = _toy(spark)
    sm = B.smote(df, "cls", ["x", "y"], k=3, method="exact", seed=1)
    enn = B.smote_enn(df, "cls", ["x", "y"], k=3, method="exact", seed=1)
    # ENN only removes rows
    assert enn.count() <= sm.count()
    # toy classes are far apart → nothing is misclassified → nothing removed
    assert enn.count() == sm.count()


def test_nearmiss_single_plan_selection_parity(spark):
    """Loop-free NearMiss must pick the same survivors as the per-class
    definition: with method='exact' the kept majority rows are exactly the
    min_n with smallest mean distance to the k nearest minority rows."""
    rows = []
    # minority class m at (0,0)..(2,0); majority A spread along x; majority B along y
    for i in range(3):
        rows.append((float(i), 0.0, "m"))
    for i in range(8):
        rows.append((float(i), 1.0, "A"))
    for i in range(8):
        rows.append((10.0, float(i), "B"))
    df = spark.createDataFrame(rows, "x double, y double, cls string")
    out = B.nearmiss(df, "cls", ["x", "y"], k=2, method="exact")
    counts = {r["cls"]: r["n"] for r in
              out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"m": 3, "A": 3, "B": 3}
    # class A: nearest-to-minority rows are x=0,1,2 on the y=1 line
    kept_a = sorted(r["x"] for r in out.where(F.col("cls") == "A").collect())
    assert kept_a == [0.0, 1.0, 2.0]
    # class B: all at x=10, closest mean distance to minority = smallest y
    kept_b = sorted(r["y"] for r in out.where(F.col("cls") == "B").collect())
    assert kept_b == [0.0, 1.0, 2.0]


def test_borderline_danger_selects_boundary_rows(spark):
    """Danger rows are minority rows with >= k/2 (but < k) other-class
    neighbors — interior minority rows must NOT seed."""
    rows = []
    # tight minority cluster far from majority: interior rows are safe
    # (k-NN all minority -> 0 other-class votes)
    for i in range(6):
        rows.append((0.0 + i * 0.01, 0.0, "min"))
    # a PAIR of minority rows near the majority mass: each sees its partner
    # plus 3 majority in its 4-NN -> 3/4 other-class = danger (a lone row
    # with 4/4 other-class would be NOISE, which borderline-SMOTE excludes)
    rows.append((4.0, 0.0, "min"))
    rows.append((4.05, 0.0, "min"))
    for i in range(20):
        rows.append((5.0 + i * 0.005, 0.0, "maj"))
    df = spark.createDataFrame(rows, "x double, y double, cls string")
    danger = B.borderline_danger(df, "cls", ["x", "y"], k=4, method="exact")
    got = sorted((r["x"], r["cls"]) for r in danger.collect())
    assert got == [(4.0, "min"), (4.05, "min")]


def test_r10_balancing_null_contract_and_enn_recall(spark):
    """r10 review: NULL class labels corrupted every balancer differently
    (rows vanished from oversample/nearmiss, empty class frames in
    centroids) — all balancers now raise loudly, matching imblearn's
    NaN-label rejection. smote_enn keeps rows the LSH search found no
    candidates for (no disagreement evidence), and negative_sample never
    returns an anchor as its own negative."""
    import pytest

    from ml_data_pipeline_spark.operators import balancing as B
    from ml_data_pipeline_spark.operators import sampling as SA

    df = spark.createDataFrame(
        [(1.0, 2.0, "a"), (2.0, 3.0, "b"), (3.0, 4.0, None)],
        "x double, y double, cls string",
    )
    for fn in (B.random_oversample, B.random_undersample):
        with pytest.raises(ValueError, match="non-NULL class labels"):
            fn(df, "cls")
    with pytest.raises(ValueError, match="non-NULL class labels"):
        B.smote(df, "cls", ["x", "y"], k=1)
    with pytest.raises(ValueError, match="non-NULL class labels"):
        B.nearmiss(df, "cls", ["x", "y"])
    with pytest.raises(ValueError, match="non-NULL class labels"):
        B.cluster_centroids(df, "cls", ["x", "y"])
    # self-negative exclusion: anchors ARE the pool; no (a, j, a) pair
    pool = spark.createDataFrame([(i,) for i in range(30)], "id long")
    pairs = SA.negative_sample(pool, pool, k=3, n_buckets=4).collect()
    assert pairs and all(r["neg_id"] != r["anchor_id"] for r in pairs)
