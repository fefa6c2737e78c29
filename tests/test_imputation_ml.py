"""Neighbor/model-based imputation (SURVEY.md §2.6 I5-I7, I9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import imputation_ml as IM


def _df(spark):
    # y = 2x exactly; two holes at x=3 (y null) and x=7
    rows = [(float(i), 2.0 * i if i not in (3, 7) else None, "g1" if i < 5 else "g2")
            for i in range(10)]
    return spark.createDataFrame(rows, "x double, y double, g string")


def test_impute_knn_fills_close(spark):
    out = IM.impute_knn(_df(spark), "y", ["x"], k=2, method="exact")
    assert out.where(F.col("y").isNull()).count() == 0
    got = {r["x"]: r["y"] for r in out.collect()}
    # neighbors of x=3 are x=2,4 → mean(4,8)=6 = true value
    assert abs(got[3.0] - 6.0) < 1e-9
    assert abs(got[7.0] - 14.0) < 1e-9
    assert out.count() == 10


def test_impute_hot_deck_copies_donor(spark):
    out = IM.impute_hot_deck(_df(spark), "y", ["x"], ["g"], k_candidates=3, method="exact")
    assert out.where(F.col("y").isNull()).count() == 0
    got = {r["x"]: r["y"] for r in out.collect()}
    # donor values are COPIED, so fills are existing values (multiples of 2
    # from the complete set)
    assert got[3.0] in {0.0, 2.0, 4.0, 8.0, 10.0, 12.0, 16.0, 18.0}
    # nearest donor of x=3 by scaled distance is x=2 or x=4, same group g1
    assert got[3.0] in {4.0, 8.0}


def test_impute_by_model_linear(spark):
    out = IM.impute_by_model(_df(spark), "y", "linear_regression", ["x"])
    got = {r["x"]: r["y"] for r in out.collect()}
    # exact linear data → linear model recovers y=2x
    assert abs(got[3.0] - 6.0) < 0.5
    assert abs(got[7.0] - 14.0) < 0.5
    assert out.count() == 10


def test_impute_mice_converges(spark):
    rows = []
    for i in range(40):
        a = float(i)
        b = 3.0 * i + 1.0
        rows.append((a if i % 11 != 3 else None, b if i % 7 == 5 else b))
    # knock holes in 'a' only (keep it simple/deterministic)
    df = spark.createDataFrame(rows, "a double, b double")
    out = IM.impute_mice(df, ["a"], max_iter=2)
    assert out.where(F.col("a").isNull()).count() == 0
    # a = (b-1)/3 exactly; regression should land very close
    vals = {r["b"]: r["a"] for r in out.collect()}
    for b, a in vals.items():
        assert abs(a - (b - 1.0) / 3.0) < 0.5
    # row-count preservation of the multi-sweep path (review r8: this
    # assertion was accidentally absorbed into the RF test when it was
    # spliced in — a handleInvalid='skip' row-drop regression must fail HERE)
    assert out.count() == 40


def test_impute_mice_random_forest_estimator(spark):
    """The reference's RandomForestRegressor(n=10, depth=10) MICE option:
    fills land near the monotone relation (tree averaging is coarser than
    the regression line, so the tolerance is wider), never outside the
    observed range, and an unknown estimator name raises."""
    import pytest

    rows = []
    for i in range(40):
        a = float(i)
        b = 3.0 * i + 1.0
        rows.append((a if i % 11 != 3 else None, b))
    df = spark.createDataFrame(rows, "a double, b double")
    out = IM.impute_mice(df, ["a"], max_iter=1, estimator="random_forest")
    assert out.where(F.col("a").isNull()).count() == 0
    vals = {r["b"]: r["a"] for r in out.collect()}
    for b, a in vals.items():
        assert abs(a - (b - 1.0) / 3.0) < 4.0
        assert 0.0 <= a <= 39.0  # clip to observed bounds
    with pytest.raises(ValueError):
        IM.impute_mice(df, ["a"], max_iter=1, estimator="gradient_descent")
    assert out.count() == 40


def test_knn_join_null_features_never_rank_as_neighbors(spark):
    """r10 review: NULL distances (a null feature element on either side)
    ranked FIRST under Spark's NULLS-FIRST asc ordering, making the
    null-feature donors the k 'nearest' for every query."""
    from ml_data_pipeline_spark.operators.neighbors import knn_join

    left = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, x double, y double")
    right = spark.createDataFrame(
        [(10, 0.1, 0.1), (11, None, 5.0), (12, 9.0, 9.0)],
        "rid long, x double, y double",
    )
    nn = knn_join(left, right, ["x", "y"], k=2, left_id="lid", right_id="rid",
                  method="exact", exclude_self=False).collect()
    got = [r["rid"] for r in sorted(nn, key=lambda r: r["rk"])]
    assert got == [10, 12]  # the null-feature donor 11 never ranks


def test_hot_deck_null_categoricals_do_not_win(spark):
    """r10 review: a NULL categorical made the mismatch term NULL, so
    NULLS-FIRST ordering crowned that donor 'best' regardless of
    distance. eqNullSafe scoring now counts NULL-vs-value as a mismatch
    and NULL-vs-NULL as a match."""
    from ml_data_pipeline_spark.operators import imputation_ml as IM

    df = spark.createDataFrame(
        [
            (1, None, 1.0, "a"),       # receiver, cat 'a'
            (2, 100.0, 1.1, "a"),      # near donor, matching cat
            (3, 999.0, 50.0, None),    # far donor with NULL cat
        ],
        "id long, v double, x double, cat string",
    )
    out = IM.impute_hot_deck(df, "v", numeric_cols=["x"], categorical_cols=["cat"],
                             method="exact")
    filled = {r["id"]: r["v"] for r in out.collect()}
    assert filled[1] == 100.0  # nearest matching donor, not the NULL-cat one


def test_impute_by_model_keeps_unpredictable_rows(spark):
    """r10 review: missing rows whose features contain nulls were silently
    DROPPED (VectorAssembler skip); they now pass through with the target
    still null, preserving row count."""
    from ml_data_pipeline_spark.operators import imputation_ml as IM

    df = spark.createDataFrame(
        [(1, None, None, 3.0), (2, None, 2.0, 3.0)]
        + [(10 + i, float(i), float(i), float(i)) for i in range(8)],
        "id long, y double, f1 double, f2 double",
    )
    out = IM.impute_by_model(df, "y", model_type="linear_regression")
    rows = {r["id"]: r["y"] for r in out.collect()}
    assert len(rows) == 10            # nothing vanished
    assert rows[1] is None            # unpredictable: passed through
    assert rows[2] is not None        # predictable: filled


def test_impute_mice_keeps_rows_with_null_aux_features(spark):
    """r10 review: a null in a numeric feature OUTSIDE `columns` made the
    assembler skip the hole row, which then never rejoined the output.
    Aux features are now mean-initialized for modeling and their original
    NULLs restored afterwards."""
    from ml_data_pipeline_spark.operators import imputation_ml as IM

    df = spark.createDataFrame(
        [(1, None, None, 1.0)]
        + [(10 + i, float(i), float(i % 3), 1.0) for i in range(9)],
        "id long, a double, z double, w double",
    )
    out = IM.impute_mice(df, ["a"], max_iter=1)
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 10                    # the aux-null row survived
    assert rows[1]["a"] is not None           # and got imputed
    assert rows[1]["z"] is None               # aux NULL restored, not invented


def test_r11_adaptive_lsh_minority_partition_recall(spark):
    """r11 review: the adaptive LSH width must be sized from each
    partition_cols GROUP's donor count, not the global corpus — a global
    width gives a minority class holding share s of the rows occupancy
    ~256*s, which at real imbalance rounds to zero in-bucket donors, and
    SMOTE-family callers would silently degenerate to duplication. With
    per-partition widths, nearly every minority seed finds its full k
    within-class neighbors despite a 50:1 majority."""
    import random

    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.operators import neighbors as NB

    rng = random.Random(7)
    rows = [("maj", rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(5000)]
    rows += [("min", rng.uniform(40, 60), rng.uniform(40, 60)) for _ in range(100)]
    df = spark.createDataFrame(rows, "cls string, x double, y double").withColumn(
        "__id", F.monotonically_increasing_id()
    ).cache()
    nn = NB.knn_join(
        df.where(F.col("cls") == "min").select("__id", "x", "y", "cls"),
        df.select(F.col("__id").alias("__nid"), "x", "y", "cls"),
        ["x", "y"],
        k=5,
        left_id="__id",
        right_id="__nid",
        partition_cols=["cls"],
    )
    full = (
        nn.groupBy("__id").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 5)
        .count()
    )
    # with the global-count width this was ~16/100 (and dozens of seeds
    # found ZERO neighbors); per-partition widths restore near-full recall
    assert full >= 95, full


def test_r11_null_featured_donors_do_not_poison_calibration(spark):
    """r11 review (confirmed by experiment): donors carrying a NULL
    feature project to a NULL LSH bucket, which can never match the
    candidate equi-join — but counted in the occupancy measurement they
    pooled into one giant pseudo-cell that inflated w ~8x, drove the
    calibrated width to the floor, and collapsed recall for the CLEAN
    donors. The measurement now excludes NULL buckets exactly as the
    join does."""
    import random

    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.operators import neighbors as NB

    rng = random.Random(11)
    clean = [(float(i), rng.gauss(0, 1), rng.gauss(0, 1)) for i in range(800)]
    nulled = [(float(1000 + i), None, rng.gauss(0, 1)) for i in range(1200)]
    df = spark.createDataFrame(clean + nulled, "id double, x double, y double").cache()
    probes = spark.createDataFrame(clean[:50], "pid double, x double, y double")
    nn = NB.knn_join(
        probes.select("pid", "x", "y"),
        df.select(F.col("id").alias("did"), "x", "y"),
        ["x", "y"],
        k=5,
        left_id="pid",
        right_id="did",
    )
    full = (
        nn.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 5)
        .count()
    )
    assert full >= 45, full  # was ~4/50 with the poisoned width


def test_r11_first_common_table_dedup_equals_exact_pairs(spark):
    """r11 regression pin for the map-side first-common-table pair dedup
    (neighbors.py: the dropDuplicates((lid, rid)) shuffle of the candidate
    set — the largest frame in the kNN plan — was replaced by a codegen
    predicate keeping a pair only at its FIRST common hash table). Tight
    clusters make every within-cluster pair collide in ALL tables, so

    - a predicate that keeps per-table copies yields duplicate (lid, rid)
      rows, which row_number() ranking turns into displaced genuine
      neighbors;
    - a predicate that over-drops loses pairs and recall falls below the
      cluster size.

    Both corruption modes collapse the same assertion: the LSH pair set
    must EQUAL the exact ground-truth pair set (k = cluster size - 1,
    clusters far apart, so exact top-k is exactly the cluster mates)."""
    import random

    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.operators import neighbors as NB

    rng = random.Random(23)
    rows = []
    for c in range(4):
        cx, cy, cz = c * 100.0, c * -50.0, c * 25.0
        for i in range(12):
            rows.append(
                (
                    c * 12 + i,
                    cx + rng.gauss(0, 1e-3),
                    cy + rng.gauss(0, 1e-3),
                    cz + rng.gauss(0, 1e-3),
                )
            )
    df = spark.createDataFrame(rows, "id bigint, x double, y double, z double").cache()
    donors = df.select(F.col("id").alias("nid"), "x", "y", "z")
    common = dict(
        feature_cols=["x", "y", "z"], k=11, left_id="id", right_id="nid"
    )
    lsh = NB.knn_join(df, donors, method="lsh", num_hash_tables=6, **common)
    exact = NB.knn_join(df, donors, method="exact", **common)

    # no duplicate (lid, rid) survives the first-common predicate
    dup = lsh.groupBy("id", "nid").count().where(F.col("count") > 1).count()
    assert dup == 0, f"{dup} duplicated candidate pairs leaked through"

    lsh_pairs = {(r["id"], r["nid"]) for r in lsh.select("id", "nid").collect()}
    exact_pairs = {(r["id"], r["nid"]) for r in exact.select("id", "nid").collect()}
    assert lsh_pairs == exact_pairs, (
        f"only-in-lsh={sorted(lsh_pairs - exact_pairs)[:5]} "
        f"only-in-exact={sorted(exact_pairs - lsh_pairs)[:5]}"
    )


def test_legacy_fixed_width_lsh_path_still_fills(spark):
    """Coverage for the legacy fixed-width LSH tables (explicit
    bucket_length + single-projection hash tables) after the i7 gate moved
    to the density-adaptive default (late r11): the pinned-width code path
    in knn_join/impute_hot_deck must keep producing donor-copied fills.
    Gaussian data at width 0.25 keeps bucket occupancy sane, so every
    missing row should find candidates and be filled with an observed
    value (the hot-deck invariant the gate checks at scale)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(31)
    rows = []
    for i in range(400):
        x = rng.gauss(0, 1)
        v = None if i % 10 == 0 else round(2.0 * x + rng.gauss(0, 0.1), 3)
        rows.append((i, x, v, "a" if x > 0 else "b"))
    df = spark.createDataFrame(rows, "id bigint, x double, v double, g string")
    out = IM.impute_hot_deck(
        df, "v", ["x"], ["g"], k_candidates=5,
        num_hash_tables=1, bucket_length=0.25,
    )
    got = out.collect()
    assert len(got) == 400
    assert all(r["v"] is not None for r in got)
    observed = {r[2] for r in rows if r[2] is not None}
    filled = {r["v"] for r in got if r["id"] % 10 == 0}
    assert filled <= observed, "a fill was not a copy of an observed value"


def test_r12_group_ceiling_guard_on_per_group_widths(spark):
    """VERDICT r11 item 2: the adaptive per-group width path collects one
    width per partition_cols group to the driver under a 'class-like key'
    contract. A high-cardinality key must raise LOUDLY (like EXACT_CEILING)
    instead of silently materializing a driver-sized dict; the limit(G+1)
    probe also caps the collect itself, so the guard is memory-safe. Pinned
    at the boundary: GROUP_CEILING+1 distinct groups raises (the pass side
    is covered by every existing i5/i7/b-family gate, all class-like keys)."""
    import pytest

    from ml_data_pipeline_spark.operators import neighbors as NB

    n = NB.GROUP_CEILING + 1
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("rid"),
            (F.col("id") % 97).cast("double").alias("x"),
            F.col("id").cast("string").alias("grp"),  # n distinct groups
        )
    )
    with pytest.raises(ValueError, match="GROUP_CEILING"):
        NB.knn_join(
            df.select(F.col("rid").alias("lid"), "x", "grp"),
            df,
            ["x"],
            k=1,
            left_id="lid",
            right_id="rid",
            method="lsh",
            partition_cols=["grp"],
        ).count()
