"""Model/neighbor-based imputation (SURVEY.md §2.6 I5-I7, I9).

These are the reference's expensive imputers — KNNImputer, IterativeImputer
(MICE), hot deck's O(missing x donors) Python loop, and joblib-model predict
(ref /root/reference/preprocessing/dataset_processing_check_nan_logic.py:66-86,
90-226; /root/reference/preprocessing/repair_nan_methods/mice_method.py:25-144;
/root/reference/preprocessing/imputation_by_model_ui.py:240-294).

Spark shape:
- KNN / hot deck ride the shared LSH knn_join (operators/neighbors.py):
  missing rows join complete donors through hash buckets — never a nested
  loop, never a crossJoin at scale.
- Model-based: fit MLlib on complete rows, transform the missing partition,
  unionByName back — the "write predictions into the holes" index alignment
  is a join-free union because the two partitions are disjoint by
  construction (F6 null-partition split).
- MICE: driver loop over (column, iteration); each step is a distributed
  regression fit + transform. Expensive but mechanical — and each iteration
  is linear scans, no shuffled state carried between iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from .neighbors import knn_join


def _numeric_cols(df: DataFrame, exclude: list[str]) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name not in exclude
    ]


def impute_knn(
    df: DataFrame,
    column: str,
    feature_cols: list[str] | None = None,
    k: int = 5,
    method: str = "lsh",
    seed: int = 42,
    num_hash_tables: int = 2,
    # None = density-adaptive composite LSH (see knn_join) — the corpus-
    # linear candidate scheme; a float pins the legacy fixed-width tables
    bucket_length: float | None = None,
) -> DataFrame:
    """I5 — KNN imputation: each missing value becomes the mean of the k
    nearest complete rows (z-scaled euclidean over the other numeric
    columns), mirroring sklearn KNNImputer(k=5)
    (ref dataset_processing_check_nan_logic.py:66-86)."""
    feats = feature_cols or _numeric_cols(df, [column])
    from ml_data_pipeline_spark.cache import tracked_cache

    # cache: __rid must be assigned ONCE (monotonically_increasing_id is
    # partition-dependent) and tagged feeds 4+ branches — uncached, every
    # branch re-scans the source (plan_audit: lineitem x5)
    tagged = tracked_cache(df.withColumn("__rid", F.monotonically_increasing_id()))
    missing = tagged.where(F.col(column).isNull())
    complete = tagged.where(F.col(column).isNotNull())
    nn = knn_join(
        missing.select("__rid", *feats),
        complete.select(F.col("__rid").alias("__did"), *feats),
        feats,
        k=k,
        left_id="__rid",
        right_id="__did",
        method=method,
        seed=seed,
        exclude_self=False,
        num_hash_tables=num_hash_tables,
        bucket_length=bucket_length,
    )
    donor_vals = complete.select(F.col("__rid").alias("__did"), F.col(column).alias("__dv"))
    from ml_data_pipeline_spark.cache import lazy_local_checkpoint

    # checkpoint the fill vector (r13, same pattern as hot_deck below):
    # missing-row-sized (two columns), but its lineage is the whole donor
    # kNN — untruncated, the output plan re-printed the source scan under
    # the join-back (plan_audit: lineitem x5 cached re-derivations).
    fills = lazy_local_checkpoint(
        nn.join(donor_vals, "__did")
        .groupBy("__rid")
        .agg(F.avg("__dv").alias("__fill"))
    )
    # rows whose LSH buckets held no donor fall back to the global mean —
    # recall shortfalls degrade fill quality, never completeness
    mean_val = complete.agg(F.avg(column)).first()[0]
    if mean_val is None:
        raise ValueError(
            f"impute_knn: column {column!r} has no observed values — "
            "there is nothing to average for fills"
        )
    filled_missing = (
        missing.join(fills, "__rid", "left")
        .withColumn(column, F.coalesce(F.col("__fill"), F.lit(mean_val)))
        .drop("__fill")
    )
    return filled_missing.unionByName(complete).drop("__rid")


def impute_hot_deck(
    df: DataFrame,
    column: str,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    k_candidates: int = 10,
    method: str = "lsh",
    seed: int = 42,
    num_hash_tables: int = 2,
    # None = density-adaptive composite LSH (see knn_join) — the corpus-
    # linear candidate scheme; a float pins the legacy fixed-width tables
    bucket_length: float | None = None,
) -> DataFrame:
    """I7 — hot deck: copy the value from the single nearest DONOR by mixed
    distance = z-scaled numeric euclidean + categorical mismatch count
    (ref dataset_processing_check_nan_logic.py:90-226, distance core 181-217).

    The reference nests Python loops (O(missing x donors)); here the numeric
    part prunes to k_candidates via the LSH join, then the categorical
    mismatch re-ranks the candidate set only."""
    feats = numeric_cols or _numeric_cols(df, [column])
    cats = categorical_cols or []
    from ml_data_pipeline_spark.cache import tracked_cache

    # cache: same __rid-stability + multi-branch reuse note as impute_knn
    # (plan_audit: lineitem x7 uncached)
    tagged = tracked_cache(df.withColumn("__rid", F.monotonically_increasing_id()))
    missing = tagged.where(F.col(column).isNull())
    complete = tagged.where(F.col(column).isNotNull())
    nn = knn_join(
        missing.select("__rid", *feats),
        complete.select(F.col("__rid").alias("__did"), *feats),
        feats,
        k=k_candidates,
        left_id="__rid",
        right_id="__did",
        method=method,
        seed=seed,
        exclude_self=False,
        num_hash_tables=num_hash_tables,
        bucket_length=bucket_length,
    )
    donor_side = complete.select(
        F.col("__rid").alias("__did"),
        F.col(column).alias("__dv"),
        *[F.col(c).alias(f"__dc_{c}") for c in cats],
    )
    recv_side = missing.select("__rid", *[F.col(c).alias(f"__mc_{c}") for c in cats])
    cand = nn.join(donor_side, "__did").join(recv_side, "__rid")
    # null-safe mismatch (r10 review): a NULL categorical on either side
    # made the != term NULL, so __mixed went NULL and NULLS-FIRST ordering
    # crowned that donor 'best' regardless of distance. eqNullSafe treats
    # NULL==NULL as a match (0 mismatch) and NULL-vs-value as a mismatch.
    mismatch = sum(
        [F.lit(0)]
        + [
            (~F.col(f"__mc_{c}").eqNullSafe(F.col(f"__dc_{c}"))).cast("int")
            for c in cats
        ]
    )
    # mixed distance: numeric dist + 1.0 per categorical mismatch (the
    # reference's unit-weight mismatch term)
    scored = cand.withColumn("__mixed", F.col("dist") + mismatch.cast("double"))
    w = Window.partitionBy("__rid").orderBy(F.asc("__mixed"), F.asc("__did"))
    best = scored.withColumn("__rk2", F.row_number().over(w)).where(F.col("__rk2") == 1)
    from ml_data_pipeline_spark.cache import lazy_local_checkpoint

    # checkpoint the fill vector (VERDICT r12 item 1 generalized): it is
    # missing-row-sized (two columns) but its lineage is the whole donor
    # kNN + mixed-distance re-rank, which the output plan re-printed under
    # the join-back (plan audit: lineitem x7 cached re-derivations). The
    # RAW input stays a tracked_cache (recomputable) — see the i9 note.
    fills = lazy_local_checkpoint(best.select("__rid", F.col("__dv").alias("__fill")))
    # no-candidate fallback: the global mode (still an observed value, so the
    # hot-deck "fills are copies" invariant holds)
    mode_row = (
        complete.groupBy(column).count().orderBy(F.desc("count"), F.asc(column)).first()
    )
    if mode_row is None:
        raise ValueError(
            f"impute_hot_deck: column {column!r} has no observed values — "
            "there are no donors to copy from"
        )
    mode_val = mode_row[0]
    filled_missing = (
        missing.join(fills, "__rid", "left")
        .withColumn(column, F.coalesce(F.col("__fill"), F.lit(mode_val)))
        .drop("__fill")
    )
    return filled_missing.unionByName(complete).drop("__rid")


def impute_by_model(
    df: DataFrame,
    column: str,
    model_type: str = "random_forest",
    feature_cols: list[str] | None = None,
    params: dict | None = None,
) -> DataFrame:
    """I9 — model-based: fit on complete rows (features = other numeric
    cols), predict the missing partition, union back
    (ref imputation_by_model_ui.py:240-294). Train is the MLlib pipeline;
    the reference's feature-count validation becomes the assembler schema."""
    from ..ml.pipeline import build_pipeline

    feats = feature_cols or _numeric_cols(df, [column])
    # one materialization feeds all four references (fit, predict,
    # pass-through, union-back) — without it the output plan re-derives
    # the input from the source scan 3× (r10 plan_audit NEW flag), which
    # at 100 TB is three full passes where one suffices. A tracked CACHE,
    # not localCheckpoint (r11 review): checkpointing the raw input
    # copies the full dataset into executor-local storage AND severs
    # lineage, so one executor loss mid-fit kills the job; a cache keeps
    # reads local while staying recomputable. The lazy-cache
    # double-compute-cold hazard doesn't apply — pipe.fit below is a
    # synchronous action that populates the cache before any
    # concurrently-scheduled union branch reads it.
    from ml_data_pipeline_spark.cache import tracked_cache

    df = tracked_cache(df)
    complete = df.where(F.col(column).isNotNull())
    missing = df.where(F.col(column).isNull())
    pipe, _, _ = build_pipeline(
        complete, column, model_type, params, feature_cols=feats, task="regression"
    )
    model = pipe.fit(complete)
    # rows the assembler cannot vectorize (a NULL/NaN in a feature) are
    # SKIPPED by model.transform (handleInvalid='skip') — without the
    # explicit pass-through below they would silently vanish from the
    # output (r10 review: an imputer that deletes exactly the
    # hardest-to-impute rows)
    from pyspark.sql.types import DoubleType, FloatType

    def _invalid(f):
        cond = F.col(f).isNull()
        if isinstance(df.schema[f].dataType, (DoubleType, FloatType)):
            cond = cond | F.isnan(F.col(f))
        return cond

    bad = None
    for f in feats:
        bad = _invalid(f) if bad is None else (bad | _invalid(f))
    unpredictable = missing.where(bad).select(*df.columns)
    predictable = missing.where(~F.coalesce(bad, F.lit(False)))
    preds = model.transform(predictable)
    filled = preds.withColumn(column, F.col("prediction")).select(*df.columns)
    return filled.unionByName(unpredictable).unionByName(complete.select(*df.columns))


def impute_mice(
    df: DataFrame,
    columns: list[str],
    max_iter: int = 3,
    feature_cols: list[str] | None = None,
    clip: bool = True,
    seed: int = 42,
    estimator: str = "linear",
) -> DataFrame:
    """I6 — MICE: chained-equations imputation. Initialize with column means,
    then per sweep re-impute each target column from a per-column estimator
    fit on the other columns, using ONLY originally-complete rows as
    training (ref mice_method.py:25-144: IterativeImputer with an
    estimator choice of BayesianRidge or RandomForestRegressor(
    n_estimators=10, max_depth=10), initial_strategy='mean', then clip to
    observed min/max).

    `estimator` mirrors that choice:
    - "linear" (default): LinearRegression, regParam=1e-6 — the
      BayesianRidge stand-in (a ridge with weakly-informative priors
      collapses to near-OLS on real data);
    - "ridge": LinearRegression, regParam=1.0 — the regularized point on
      the same spectrum when columns are collinear;
    - "random_forest": MLlib RandomForestRegressor(numTrees=10,
      maxDepth=10, seed=seed) — the reference's non-linear option.

    Driver loop over sweeps x columns; every fit/transform is distributed.
    The null masks are materialized once as __was_null_{c} flags."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression, RandomForestRegressor

    def _make_estimator(label_col: str):
        if estimator == "linear":
            return LinearRegression(featuresCol="__feat_vec", labelCol=label_col, regParam=1e-6)
        if estimator == "ridge":
            return LinearRegression(featuresCol="__feat_vec", labelCol=label_col, regParam=1.0)
        if estimator == "random_forest":
            return RandomForestRegressor(
                featuresCol="__feat_vec",
                labelCol=label_col,
                numTrees=10,
                maxDepth=10,
                seed=seed,
            )
        raise ValueError(
            f"estimator={estimator!r}: expected 'linear', 'ridge' or 'random_forest'"
        )

    all_feats = feature_cols or _numeric_cols(df, [])
    work = df
    for c in columns:
        work = work.withColumn(f"__was_null_{c}", F.col(c).isNull())
    # AUXILIARY features (in all_feats but not imputed): mean-init them for
    # MODELING only and restore their original NULLs at the end (r10
    # review: a NULL in any aux feature made VectorAssembler's
    # handleInvalid='skip' drop the hole row from preds, and the row never
    # rejoined `work` — the operator silently returned fewer rows)
    aux = [f for f in all_feats if f not in columns]
    for f in aux:
        work = work.withColumn(f"__aux_null_{f}", F.col(f).isNull())
    # bounds for clip (observed values only), then mean-init
    bounds = {}
    for c in columns:
        r = work.agg(
            F.avg(c).alias("mu"), F.min(c).alias("lo"), F.max(c).alias("hi")
        ).first()
        bounds[c] = (r["lo"], r["hi"])
        work = work.withColumn(c, F.coalesce(F.col(c), F.lit(r["mu"])))
    if aux:
        means = work.agg(*[F.avg(f).alias(f) for f in aux]).first()
        for f in aux:
            work = work.withColumn(
                f, F.coalesce(F.col(f), F.lit(means[f] if means[f] is not None else 0.0))
            )
    work = work.localCheckpoint()
    for _ in range(max_iter):
        for c in columns:
            feats = [f for f in all_feats if f != c]
            train = work.where(~F.col(f"__was_null_{c}"))
            holes = work.where(F.col(f"__was_null_{c}"))
            assembler = VectorAssembler(inputCols=feats, outputCol="__feat_vec", handleInvalid="skip")
            model = _make_estimator(c).fit(assembler.transform(train))
            preds = model.transform(assembler.transform(holes))
            fill = F.col("prediction")
            if clip:
                lo, hi = bounds[c]
                fill = F.greatest(F.lit(lo), F.least(F.lit(hi), fill))
            holes_filled = preds.withColumn(c, fill).select(*work.columns)
            work = holes_filled.unionByName(train.select(*work.columns))
        # truncate lineage once per sweep (r10 review: a single pre-loop
        # cache let each of the max_iter x len(columns) fits replay every
        # prior union/transform layer — O(sweeps^2) recompute and a plan
        # whose analysis time grew with the chain)
        work = work.localCheckpoint()
    for f in aux:
        work = work.withColumn(
            f, F.when(F.col(f"__aux_null_{f}"), F.lit(None)).otherwise(F.col(f))
        )
    return work.drop(
        *[f"__was_null_{c}" for c in columns], *[f"__aux_null_{f}" for f in aux]
    )
