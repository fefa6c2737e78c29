"""ML pipeline operators (SURVEY.md §2.8 M1-M3, M11-M13).

The reference trains sklearn estimators on a numeric matrix after
StandardScaler (fit on train only) — ref /root/reference/researching_models/
model_evaluation_logic.py:27-79. Spark-native shape: one MLlib ``Pipeline``
of VectorAssembler → StandardScaler → estimator; evaluation via MLlib
evaluators composed to reproduce sklearn's metric suite (weighted averaging
for multiclass, binary otherwise — ref model_evaluation_logic.py:40-61).

Scale: fit/transform are distributed MLlib jobs; the driver only holds
hyperparameters and metric scalars. GBT multiclass (sklearn supports it,
Spark's GBTClassifier is binary-only) falls back to OneVsRest — documented
divergence (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    OneVsRest,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

LABEL, FEATURES = "label", "features"


def numeric_feature_cols(df: DataFrame, target: str) -> list[str]:
    """F2/F12 — numeric projection, excluding the target
    (ref /root/reference/selection_of_parameters/selection_parameters_parameter_tuning_worker.py:103-105)."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name != target
    ]


def detect_task_type(df: DataFrame, target: str, class_threshold: int = 20) -> str:
    """Auto task-type: string target or few distinct values → classification
    (ref selection_parameters_parameter_tuning_worker.py:125-130)."""
    if isinstance(df.schema[target].dataType, StringType):
        return "classification"
    n = df.select(target).distinct().limit(class_threshold + 1).count()
    return "classification" if n <= class_threshold else "regression"


def make_estimator(model_type: str, task: str, params: dict[str, Any] | None = None):
    """M2 — model zoo keyed the reference's way
    (ref /root/reference/researching_models/model_evaluation_logic.py:172-237)."""
    p = dict(params or {})
    p.setdefault("seed", 42)  # dropped below for estimators without a seed param
    key = (model_type.lower().replace(" ", "_"), task)
    if key[1] == "classification":
        zoo = {
            "random_forest": RandomForestClassifier,
            "gradient_boosting": GBTClassifier,
            "logistic_regression": LogisticRegression,
        }
    else:
        zoo = {
            "random_forest": RandomForestRegressor,
            "gradient_boosting": GBTRegressor,
            "linear_regression": LinearRegression,
        }
    for name, cls in zoo.items():
        if name in key[0]:
            allowed = {x.name for x in cls().params}
            return cls(
                labelCol=LABEL,
                featuresCol=FEATURES,
                **{k: v for k, v in p.items() if k in allowed},
            )
    raise ValueError(f"unknown model_type {model_type!r} for task {task!r}")


def build_pipeline(
    df: DataFrame,
    target: str,
    model_type: str,
    params: dict[str, Any] | None = None,
    feature_cols: list[str] | None = None,
    scale: bool = True,
    task: str | None = None,
) -> tuple[Pipeline, list[str], str]:
    """M1/M11 — assembler → scaler → estimator (+ StringIndexer for string
    targets, alphabetic order = sklearn LabelEncoder parity)."""
    task = task or detect_task_type(df, target)
    feats = feature_cols or numeric_feature_cols(df, target)
    stages = []
    if isinstance(df.schema[target].dataType, StringType):
        stages.append(
            # handleInvalid='keep' (r10 review): with the default 'error',
            # scoring a test/CV split containing a label unseen in train
            # crashed the whole train-and-evaluate path ('Unseen label');
            # 'keep' maps such rows to an extra index so the evaluator
            # counts them as honest misclassifications instead
            StringIndexer(
                inputCol=target,
                outputCol=LABEL,
                stringOrderType="alphabetAsc",
                handleInvalid="keep",
            )
        )
        est_label = LABEL
    else:
        est_label = target
    stages.append(VectorAssembler(inputCols=feats, outputCol="__raw", handleInvalid="skip"))
    if scale:
        stages.append(
            StandardScaler(inputCol="__raw", outputCol=FEATURES, withMean=True, withStd=True)
        )
    else:
        stages.append(VectorAssembler(inputCols=["__raw"], outputCol=FEATURES))
    est = make_estimator(model_type, task, params)
    est.setLabelCol(est_label)
    # GBT is binary-only in Spark; multiclass → OneVsRest (documented)
    if task == "classification" and isinstance(est, GBTClassifier):
        n_classes = df.select(target).distinct().count()
        if n_classes > 2:
            est = OneVsRest(classifier=est, labelCol=est_label, featuresCol=FEATURES)
    stages.append(est)
    return Pipeline(stages=stages), feats, task


def evaluate_classification(predictions: DataFrame, label_col: str = LABEL) -> dict[str, float]:
    """M3 metric suite: accuracy, weighted precision/recall/F1, ROC-AUC
    (binary: areaUnderROC; multiclass: one-vs-rest weighted average — ref
    model_evaluation_logic.py:40-61 / M13 scorer adaptation).

    ONE pass over the predictions: the four headline metrics all derive
    from the multiclass confusion matrix — classes² tiny rows from a single
    groupBy — where the previous shape ran four evaluator scans plus a
    distinct scan per call (per FOLD under CV: cross_val_scores and the
    tuning loops call this dozens of times, and permutation importance once
    per feature — at 100 TB of predictions those were five full rescans).
    Formulas are MulticlassMetrics' exactly (per-class metric weighted by
    TRUE-label support; 0 on 0/0) — hash-pinned against first-principles
    DuckDB by the m24_confusion_matrix gate."""
    cm = predictions.groupBy(label_col, "prediction").count().collect()
    tp: dict[float, float] = {}
    support: dict[float, float] = {}  # true-label counts
    predicted: dict[float, float] = {}  # predicted-label counts
    n = 0.0
    for r in cm:
        y, p, c = float(r[label_col]), float(r["prediction"]), float(r["count"])
        n += c
        support[y] = support.get(y, 0.0) + c
        predicted[p] = predicted.get(p, 0.0) + c
        if y == p:
            tp[y] = tp.get(y, 0.0) + c
    classes = sorted(support)  # MulticlassMetrics: labels come from y only
    if not n:
        return {"accuracy": 0.0, "precision": 0.0, "recall": 0.0, "f1": 0.0}
    out = {}
    out["accuracy"] = sum(tp.values()) / n
    wp = wr = wf = 0.0
    for c in classes:
        t = tp.get(c, 0.0)
        prec = t / predicted[c] if predicted.get(c) else 0.0
        rec = t / support[c]  # support[c] > 0 by construction
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        wp += support[c] * prec
        wr += support[c] * rec
        wf += support[c] * f1
    out["precision"] = wp / n
    out["recall"] = wr / n
    out["f1"] = wf / n
    # AUC needs scores; a hard-prediction-only frame (e.g. OneVsRest output)
    # gets the 4 confusion-matrix metrics and no roc_auc key
    if "rawPrediction" in predictions.columns:
        # arity comes from the MODEL's rawPrediction vector, not from the
        # classes observed in THIS test slice (r10 review: a 3-class model
        # scored on a fold that happens to contain only 2 observed classes
        # fed its 3-length rawPrediction to the binary evaluator, which
        # read the class-1 margin as the score — a meaningless-but-in-
        # range roc_auc flowing silently into CV means)
        first_raw = predictions.select("rawPrediction").first()
        arity = len(first_raw["rawPrediction"]) if first_raw else 0
        if arity == 2 and set(classes) <= {0.0, 1.0}:
            out["roc_auc"] = BinaryClassificationEvaluator(
                labelCol=label_col, rawPredictionCol="rawPrediction"
            ).evaluate(predictions)
        else:
            out["roc_auc"] = _ovr_weighted_auc(predictions, label_col, classes)
    return out


def _ovr_weighted_auc(
    predictions: DataFrame,
    label_col: str,
    classes: list[float],
    num_bins: int = 10_000,
) -> float:
    """Support-weighted one-vs-rest ROC-AUC in a FIXED number of Spark jobs
    (3) regardless of class count — replaces the per-class evaluator loop
    (1 count + ~3 jobs PER class, each re-scanning predictions).

    Per class c the score is rawPrediction[c]; AUC is the tie-adjusted
    Mann-Whitney statistic over a num_bins histogram of the score
    (equivalent to trapezoidal ROC area with all scores in a bin tied).
    Binning is what MLlib's BinaryClassificationMetrics does too (its curve
    is downsampled to numBins=1000); exact per-row ranking would need a
    per-class global sort — one task per class at any data size — which is
    exactly the shape that dies at 100 TB. Error is O(1/num_bins).

    Plan: explode to (cls, score, is_pos) — one row per (input row, class);
    job 1: per-class min/max agg; job 2: (cls, bin) histogram groupBy
    (map-side combinable, <= k*num_bins groups); the mid-rank cumsum runs
    in a window over that tiny binned table and lands in job 3's collect.
    """
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    cls_idx = sorted(int(c) for c in classes)
    arr = predictions.select(
        F.col(label_col).alias("__y"), vector_to_array("rawPrediction").alias("__raw")
    )
    pairs = arr.select(
        "__y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(c)).alias("cls"),
                        F.col("__raw").getItem(c).alias("score"),
                    )
                    for c in cls_idx
                ]
            )
        ).alias("p"),
    ).select(
        F.col("p.cls").alias("cls"),
        F.col("p.score").alias("score"),
        (F.col("__y") == F.col("p.cls")).cast("double").alias("pos"),
    )
    ranges = {
        r["cls"]: (r["lo"], r["hi"])
        for r in pairs.groupBy("cls")
        .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
        .collect()
    }
    lo = F.create_map(*[F.lit(v) for c, (l, _) in ranges.items() for v in (c, l)])[F.col("cls")]
    hi = F.create_map(*[F.lit(v) for c, (_, h) in ranges.items() for v in (c, h)])[F.col("cls")]
    width = F.when(hi > lo, (hi - lo) / num_bins).otherwise(F.lit(1.0))
    binned = (
        pairs.withColumn(
            "bin",
            F.least(F.floor((F.col("score") - lo) / width), F.lit(num_bins - 1)).cast("int"),
        )
        .groupBy("cls", "bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("np"))
    )
    w = Window.partitionBy("cls").orderBy("bin")
    cum_before = F.coalesce(
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    mid = cum_before + (F.col("n") + 1) / 2.0
    stats = (
        binned.withColumn("rpos_part", F.col("np") * mid)
        .groupBy("cls")
        .agg(
            F.sum("rpos_part").alias("rpos"),
            F.sum("np").alias("n_pos"),
            F.sum("n").alias("n_all"),
        )
        .collect()
    )
    total = stats[0]["n_all"] if stats else 0
    auc = 0.0
    for r in stats:
        n_pos, n_neg = r["n_pos"], r["n_all"] - r["n_pos"]
        c_auc = (
            (r["rpos"] - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
            if n_pos > 0 and n_neg > 0
            else 0.5
        )
        auc += c_auc * (n_pos / total)
    return auc


def evaluate_regression(predictions: DataFrame, label_col: str) -> dict[str, float]:
    """M3 regression metrics: R², MSE, MAE (ref model_evaluation_logic.py:63-76)."""
    return {
        name: RegressionEvaluator(
            labelCol=label_col, predictionCol="prediction", metricName=metric
        ).evaluate(predictions)
        for metric, name in [("r2", "r2"), ("mse", "mse"), ("mae", "mae")]
    }


def train_and_evaluate(
    train: DataFrame,
    test: DataFrame,
    target: str,
    model_type: str,
    params: dict[str, Any] | None = None,
    feature_cols: list[str] | None = None,
    task: str | None = None,
) -> tuple[PipelineModel, dict[str, float]]:
    """M3/M11 — fit on train, metric suite on test (fit-on-train-only
    including the scaler, ref model_evaluation_logic.py:31-33).

    Pass ``task`` when looping (CV folds, trials, learning-curve points):
    re-detection per call costs a distinct-count job each time AND can
    FLIP on a subsample (r10 review: a regression target with ~22
    distinct values classifies as regression on the full frame but
    classification on a 10% sample — mismatched metrics or a classifier
    crash mid-loop)."""
    pipe, feats, task = build_pipeline(
        train, target, model_type, params, feature_cols, task=task
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    if task == "classification":
        label_col = LABEL if isinstance(train.schema[target].dataType, StringType) else target
        metrics = evaluate_classification(preds, label_col)
    else:
        metrics = evaluate_regression(preds, target)
    return model, metrics


def save_model(model: PipelineModel, path: str) -> None:
    """S10 — PipelineModel directory format (replaces joblib .pkl,
    ref /root/reference/load_params_and_train_final_model.py:306-339)."""
    model.write().overwrite().save(path)


def load_model(spark, path: str) -> PipelineModel:
    return PipelineModel.load(path)


def save_params_json(
    path: str,
    model_type: str,
    target: str,
    task: str,
    best_params: dict[str, Any],
    primary_metric: tuple[str, float],
) -> None:
    """S11 — hyperparameter artifact, same JSON shape as the reference
    (ref /root/reference/selection_of_parameters/selection_parameters_parameter_tuning_window.py:417-432)."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "model_type": model_type,
                "target_variable": target,
                "task_type": task,
                "best_params": best_params,
                "primary_metric": {"name": primary_metric[0], "value": primary_metric[1]},
            },
            f,
            indent=2,
        )


def load_params_json(path: str) -> dict[str, Any]:
    """S11 scan (ref /root/reference/load_params_and_train_final_model.py:114-145)."""
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def predict_single_row(model: PipelineModel, spark, row: dict[str, Any], schema) -> float:
    """M12 — single-row inference: build a 1-row DF, transform, first()
    (ref /root/reference/inference_models/inference_trained_models.py:347-457).
    A row the assembler cannot vectorize (missing/NULL feature) raises a
    clear ValueError (r10 review — handleInvalid='skip' silently dropped
    it and first()[0] was an inscrutable NoneType TypeError)."""
    df = spark.createDataFrame([row], schema=schema)
    got = model.transform(df).select("prediction").first()
    if got is None:
        # the assembler runs handleInvalid='skip': a row carrying a NULL /
        # missing feature is silently dropped, and first() would have been
        # None[0] → an inscrutable TypeError (r10 review)
        raise ValueError(
            "predict_single_row: the row was dropped by the feature "
            "assembler — a required feature is missing or NULL"
        )
    return got[0]


def predict_single_row_local(model: PipelineModel, row: dict[str, Any]) -> float:
    """M12, interactive path — score ONE row on the driver with NO Spark
    job (SURVEY §7.4: 'interactive single-row inference latency: a Spark
    job per question-answer is wasteful; keep a driver-local scoring
    path'). Replays the fitted pipeline stages in pure Python:
    VectorAssembler = dict lookup in input order, StandardScaler honors
    the fitted withMean/withStd flags exactly as MLlib's transform does
    (shift only when withMean; scale by 1/std only when withStd, with a
    ZERO multiplier for a zero-std feature — MLlib zeroes constant
    features, it does not pass them through), linear models = dot product
    (+ sigmoid-free argmax via the raw margin for LogisticRegression —
    binary and multinomial both reduce to argmax over class margins).

    Supports the linear family (LinearRegression, LogisticRegression) —
    closed-form scorable from coefficients; tree ensembles raise with a
    pointer to predict_single_row (their traversal state lives JVM-side).
    Parity with transform() is pinned by test (same doubles, same argmax).
    """
    from pyspark.ml.classification import LogisticRegressionModel
    from pyspark.ml.feature import StandardScalerModel
    from pyspark.ml.regression import LinearRegressionModel

    vec: list[float] | None = None
    for stage in model.stages:
        # only the FIRST assembler reads input columns; build_pipeline's
        # scale=False path appends a second pass-through assembler over the
        # first one's output, which is an identity here
        if type(stage).__name__ == "VectorAssembler" and vec is None:
            vec = [float(row[c]) for c in stage.getInputCols()]
        elif isinstance(stage, StandardScalerModel):
            mean, std = stage.mean.toArray(), stage.std.toArray()
            assert vec is not None, "scaler before assembler in pipeline"
            wm, ws = stage.getWithMean(), stage.getWithStd()
            vec = [
                ((x - m) if wm else x) * ((1.0 / s if s != 0.0 else 0.0) if ws else 1.0)
                for x, m, s in zip(vec, mean, std)
            ]
        elif isinstance(stage, LinearRegressionModel):
            assert vec is not None
            co = stage.coefficients.toArray()
            return float(sum(c * x for c, x in zip(co, vec)) + stage.intercept)
        elif isinstance(stage, LogisticRegressionModel):
            assert vec is not None
            cm = stage.coefficientMatrix.toArray()
            iv = stage.interceptVector.toArray()
            if cm.shape[0] == 1:  # binary: one margin, threshold at 0
                margin = sum(c * x for c, x in zip(cm[0], vec)) + iv[0]
                return 1.0 if margin > 0.0 else 0.0
            margins = [
                sum(c * x for c, x in zip(cm[k], vec)) + iv[k]
                for k in range(cm.shape[0])
            ]
            return float(max(range(len(margins)), key=margins.__getitem__))
    raise NotImplementedError(
        "local scoring supports the linear family only; use "
        "predict_single_row (Spark transform) for tree ensembles"
    )

def lift_table(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Lift / gains table: rank rows by score descending, cut into n_bins
    score-quantile bins, and report per-bin positive rate, lift over the base
    rate, and cumulative capture of positives — the standard targeting-model
    evaluation table.

    Binning uses ceil(cume_dist * n_bins), so tied scores land in the same
    bin on any engine (row_number/ntile would split ties arbitrarily).

    r14: cume_dist of a row IS (inclusive descending cumulative count of
    its distinct score) / total, so rows collapse to per-distinct-score
    (count, positives) FIRST and the cumulative runs on ranged_cumsum —
    the former row-level global sort (the family's one true row-scale
    single task) is gone, and the arithmetic is the identical
    long-count-over-long-total division, so values hash-match the window
    formulation. The bin-level cumulative stays a plain window over the
    n_bins-row frame.
    """
    from pyspark.sql import Window

    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    y = F.col(label_col).cast("int")
    per_score = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(y).cast("long").alias("__p"),
    )
    cum = ranged_cumsum(per_score, ["__s"], ["__c"], descending=True)
    stot = cum.agg(F.sum("__c").cast("double").alias("__stot"))
    binned = cum.crossJoin(F.broadcast(stot)).select(
        "__c",
        "__p",
        F.ceil(F.col("__cum___c") / F.col("__stot") * n_bins)
        .cast("int")
        .alias("bin"),
    )
    per = binned.groupBy("bin").agg(
        F.sum("__c").cast("long").alias("n"), F.sum("__p").cast("long").alias("n_pos")
    )
    totals = per.agg(
        F.sum("n").cast("double").alias("tot"), F.sum("n_pos").cast("double").alias("tot_pos")
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(totals))
        .withColumn("cum_pos", F.sum("n_pos").over(wcum))
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(F.col("n_pos") / F.col("n"), 6).alias("pos_rate"),
            # nullif on tot_pos (r10 review): a zero-positive input is a
            # NULL lift/capture, not an ANSI DIVIDE_BY_ZERO crash — the
            # same degenerate-input contract as roc_points/exact_auc
            F.round(
                (F.col("n_pos") / F.col("n"))
                / F.nullif(F.col("tot_pos") / F.col("tot"), F.lit(0.0)),
                6,
            ).alias("lift"),
            F.round(
                F.col("cum_pos") / F.nullif(F.col("tot_pos"), F.lit(0.0)), 6
            ).alias("cum_capture"),
        )
        .orderBy("bin")
    )

def roc_points(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """ROC curve points: one (fpr, tpr) per distinct score threshold,
    descending (predict positive when score >= threshold).

    Scale shape: rows collapse to per-score (count, positives) FIRST — one
    map-side-combinable groupBy — and the cumulative window runs over
    DISTINCT SCORES, not rows: the sort is bounded by score cardinality
    (scores rounded upstream bound it explicitly), the same
    aggregate-then-window trick as profiling.histogram.

    r14: the cumulative pass runs on ranged_cumsum (descending — per-range
    parallel prefixes + P-row carry), so a CONTINUOUS score column no
    longer serializes into one ordered task. Totals are a one-row
    broadcast aggregate over the kernel's CACHED per-score frame — fresh
    aggregate attributes, so the round-2 AMBIGUOUS_REFERENCE self-lineage
    trap does not apply, and no second corpus scan runs.

    Two-class precondition: with a single class the positive or negative
    total is 0 and fpr/tpr are deliberately NULL (nullif guard), never a
    divide-crash.

    Naming note: total columns are __tot_p/__tot_n, NOT __P/__N — Spark
    resolves column names case-insensitively, so withColumn("__P", ...)
    silently REPLACES an existing __p (that collision was the round-2
    AMBIGUOUS_REFERENCE crash in the crossJoin formulation, and corrupts
    downstream expressions in the window formulation).
    """
    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    per_score = df.groupBy(F.col(score_col).alias("score")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col(label_col).cast("long")).alias("__p"),
        (F.count(F.lit(1)) - F.sum(F.col(label_col).cast("long"))).alias("__n"),
    )
    cum = ranged_cumsum(per_score, ["score"], ["__p", "__n"], descending=True)
    tot = cum.agg(
        F.sum("__p").alias("__tot_p"), F.sum("__n").alias("__tot_n")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            F.round(
                F.col("__cum___n") / F.nullif(F.col("__tot_n"), F.lit(0)), 6
            ).alias("fpr"),
            F.round(
                F.col("__cum___p") / F.nullif(F.col("__tot_p"), F.lit(0)), 6
            ).alias("tpr"),
        )
        .orderBy(F.desc("threshold"))
    )

def exact_auc(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank statistic with tie-averaged
    ranks: AUC = (R+ - P(P+1)/2) / (P*N), where R+ is the sum of average
    ranks of the positives. Equals sklearn's roc_auc_score to float
    precision — this is the hash-level gate for the metric-suite math
    (M3's evaluator AUCs are rows-only; this pins the same quantity
    exactly).

    Same aggregate-then-window shape as roc_points: ranks are computed per
    DISTINCT score (avg rank of a tie group = #smaller + (ties+1)/2), so
    nothing row-level is ever sorted.

    Two-class precondition: a single-class input has __P*__N = 0; the
    nullif guard makes auc deliberately NULL instead of a silent
    divide-by-zero, so a downstream gate sees an explicit missing value.
    """
    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    per_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col(label_col).cast("long")).alias("__p"),
    )
    # exclusive prefix = inclusive ranged cumsum minus own tie size (r14:
    # parallel per-range prefixes — continuous scores no longer serialize
    # the rank pass into one ordered task; integer sums, bit-identical)
    ranked = ranged_cumsum(per_score, ["s"], ["__c"]).withColumn(
        "__before", F.col("__cum___c") - F.col("__c")
    )
    avg_rank = F.col("__before") + (F.col("__c") + 1) / 2.0
    agg = ranked.agg(
        F.sum(F.col("__p") * avg_rank).alias("__rpos"),
        F.sum("__p").alias("__P"),
        (F.sum("__c") - F.sum("__p")).alias("__N"),
    )
    return agg.select(
        F.round(
            (F.col("__rpos") - F.col("__P") * (F.col("__P") + 1) / 2.0)
            / F.nullif(F.col("__P") * F.col("__N"), F.lit(0)),
            6,
        ).alias("auc"),
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
    )

def pr_points(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """Precision-recall curve points: one (precision, recall) per distinct
    score threshold, descending (predict positive when score >= threshold).
    Companion to roc_points for imbalanced-label evaluation, where ROC
    flatters the majority class.

    Same aggregate-then-ranged-cumsum shape as roc_points (r14: rows
    collapse to per-distinct-score counts first; the descending prefix
    runs as per-range parallel sums — continuous scores never serialize
    into one task), and the same __tot_* naming discipline — Spark
    column resolution is case-insensitive, so __P would silently collide
    with __p. Single-class input yields explicit NULL recall via nullif;
    precision is always well-defined (cum_p + cum_n >= 1 at every
    threshold).
    """
    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    per_score = df.groupBy(F.col(score_col).alias("score")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col(label_col).cast("long")).alias("__p"),
    )
    cum = ranged_cumsum(per_score, ["score"], ["__p", "__c"], descending=True)
    tot = cum.agg(F.sum("__p").alias("__tot_p"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            F.round(F.col("__cum___p") / F.col("__cum___c"), 6).alias("precision"),
            F.round(
                F.col("__cum___p") / F.nullif(F.col("__tot_p"), F.lit(0)), 6
            ).alias("recall"),
        )
        .orderBy(F.desc("threshold"))
    )

def probability_score_metrics(
    df: DataFrame, label_col: str, prob_col: str, eps: float = 1e-6
) -> DataFrame:
    """Proper-scoring-rule metrics for probabilistic predictions, exact and
    oracle-checkable: Brier score avg((p - y)^2) and log loss
    -avg(y*ln(p) + (1-y)*ln(1-p)). Probabilities are clamped to
    [eps, 1-eps] BEFORE scoring (standard log-loss practice — sklearn does
    the same) so out-of-range or saturated scores cannot produce ±inf.
    One aggregate pass; returns (brier, log_loss, n_rows).
    """
    y = F.col(label_col).cast("double")
    p = F.greatest(F.lit(eps), F.least(F.lit(1.0 - eps), F.col(prob_col).cast("double")))
    base = df.where(F.col(label_col).isNotNull() & F.col(prob_col).isNotNull())
    return base.agg(
        F.round(F.avg((p - y) * (p - y)), 6).alias("brier"),
        F.round(-F.avg(y * F.log(p) + (1 - y) * F.log(1 - p)), 6).alias("log_loss"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )

def isotonic_calibration(
    df: DataFrame, label_col: str, score_col: str, n_bins: int = 100
) -> DataFrame:
    """Isotonic (PAV) probability calibration of a score column: fit
    MLlib IsotonicRegression on binned (score, positive-rate) aggregates
    and return the monotone calibration map (score_bin_center ->
    calibrated_p). Companion to the reliability table (m17): that one
    REPORTS miscalibration, this one produces the correcting map.

    Scale shape: raw rows collapse to <= n_bins weighted aggregate points
    BEFORE the driver-side PAV fit (the classic binned-isotonic trick —
    PAV on pre-pooled bins equals PAV on rows when bins preserve score
    order, and n_bins points on the driver is metadata, not data). The
    returned map is tiny; applying it to a corpus is one broadcast range
    join. Deterministic given deterministic input: PAV's solution is
    unique, so this is reproducible across partitionings — the gate
    enforces the defining property (calibrated_p non-decreasing in score)
    in-query.
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    binned = (
        df.where(y.isNotNull() & s.isNotNull())
        .groupBy(F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).alias("__b"))
        .agg(
            F.avg(s).alias("score_center"),
            F.avg(y).alias("pos_rate"),
            F.count(F.lit(1)).cast("double").alias("weight"),
        )
    )
    vec = VectorAssembler(inputCols=["score_center"], outputCol="__f").transform(binned)
    model = IsotonicRegression(
        featuresCol="__f", labelCol="pos_rate", weightCol="weight"
    ).fit(vec)
    out = model.transform(vec)
    return out.select(
        F.round("score_center", 6).alias("score_center"),
        F.round("pos_rate", 6).alias("raw_pos_rate"),
        F.round(F.col("prediction"), 6).alias("calibrated_p"),
    ).orderBy("score_center")


def ridge_path(df, x1_col: str, x2_col: str, y_col: str, lambdas: list[float]):
    """Closed-form ridge regularization path for two features (no
    intercept): solves (X'X + lam*I) b = X'y by Cramer's rule from ONE
    moment aggregate — five sums in a single corpus pass, then the whole
    lambda path is arithmetic on that one broadcast row (explode over
    literal lambdas). The distributed cost is independent of path length.

    Extends m2's OLS (ml/pipeline.py m2 gate, MLlib normal solver) with
    regularization while staying oracle-exact: the identical algebra runs
    in SQL on the same five sums.
    """
    x1, x2, y = F.col(x1_col), F.col(x2_col), F.col(y_col)
    mom = df.agg(
        F.sum(x1 * x1).alias("sxx"),
        F.sum(x1 * x2).alias("sxz"),
        F.sum(x2 * x2).alias("szz"),
        F.sum(x1 * y).alias("sxy"),
        F.sum(x2 * y).alias("szy"),
    )
    lam = F.explode(F.array(*[F.lit(float(l)) for l in lambdas])).alias("lam")
    path = mom.select(lam, "sxx", "sxz", "szz", "sxy", "szy")
    # nullif (r10 review): lam=0 with exactly-collinear features makes
    # det 0 — NULL coefficients for that path point, never an ANSI crash
    # that kills the computable lam>0 rows sharing the plan
    det = F.nullif(
        (F.col("sxx") + F.col("lam")) * (F.col("szz") + F.col("lam"))
        - F.col("sxz") * F.col("sxz"),
        F.lit(0.0),
    )
    b1 = ((F.col("szz") + F.col("lam")) * F.col("sxy") - F.col("sxz") * F.col("szy")) / det
    b2 = ((F.col("sxx") + F.col("lam")) * F.col("szy") - F.col("sxz") * F.col("sxy")) / det
    return path.select(
        "lam", F.round(b1, 4).alias("b1"), F.round(b2, 4).alias("b2")
    )


def split_conformal_ols(
    df,
    x_col: str,
    y_col: str,
    key_cols: list[str],
    alpha: float = 0.1,
):
    """Split-conformal prediction intervals (Vovk et al.; Lei et al. 2018,
    public literature) around a closed-form 1-feature OLS fit — the
    distribution-free coverage guarantee P(|y - yhat| <= qhat) >= 1-alpha.

    Everything is engine-exact: membership is the md5 hash-split (50%
    train / 30% calibration / 20% test, stable across engines and corpus
    growth), the fit is closed-form sums ROUNDED to 4dp before residuals
    (so the score function is identical arithmetic in any engine), and
    qhat is the ceil((1-alpha)(n+1))-th smallest calibration |residual|
    at 6dp — a kth order statistic, deterministic under ties because
    order statistics depend only on the multiset.

    Scale: the fit and coverage are one aggregate each; the kth-order-
    statistic rank window sorts only the CALIBRATION split, which is a
    small fixed fraction by construction (swap in percentile_approx when
    even that split outgrows a sort).
    """
    from pyspark.sql import Window

    b = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    keyed = df.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"), b.alias("__b")
    )
    train = keyed.where(F.col("__b") < 5000)
    fit = train.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
            ),
            4,
        ).alias("slope"),
        "sx",
        "sy",
    )
    fit = fit.select(
        F.col("n").alias("n_train"),
        "slope",
        F.round((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    )
    calib = keyed.where((F.col("__b") >= 5000) & (F.col("__b") < 8000)).crossJoin(
        F.broadcast(fit)
    )
    res = F.round(
        F.abs(F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))), 6
    )
    # checkpoint the calibration residuals: n_cal and the rank window both
    # branch from this frame, and untruncated each branch re-runs the train
    # aggregate AND re-scans the source (plan_audit: lineitem x5). The
    # materialized frame is the calibration split x 4 narrow columns — the
    # same "the calibration split is sortable" size assumption the rank
    # window already makes.
    calib = calib.select("n_train", "slope", "intercept", res.alias("r")).localCheckpoint()
    n_cal = calib.groupBy("n_train", "slope", "intercept").agg(
        F.count(F.lit(1)).alias("n_cal")
    )
    # r14: the k-th-smallest-residual rank runs on ranged_rank (parallel
    # range sort + P-row carry) instead of one global row_number task —
    # ties on equal |residual| rank arbitrarily in both plans, but the
    # SELECTED value at rank k is the tied residual either way, so qhat
    # is deterministic and unchanged
    from ml_data_pipeline_spark.operators.profiling import ranged_rank

    ranked = ranged_rank(calib, ["r"], out_col="__rn")
    k_expr = F.least(
        F.ceil(F.lit(1.0 - alpha) * (F.col("n_cal") + 1)).cast("long"), F.col("n_cal")
    )
    qhat = (
        ranked.drop("n_train", "slope", "intercept")
        .crossJoin(F.broadcast(n_cal))
        .where(F.col("__rn") == k_expr)
        .select("n_train", "slope", "intercept", "n_cal", F.col("r").alias("qhat"))
    )
    test = keyed.where(F.col("__b") >= 8000).crossJoin(F.broadcast(qhat))
    t_res = F.round(
        F.abs(F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))), 6
    )
    return test.groupBy("n_train", "slope", "intercept", "n_cal", "qhat").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(
            F.avg(F.when(t_res <= F.col("qhat"), 1.0).otherwise(0.0)), 6
        ).alias("coverage"),
    )


def binary_classification_report(
    df, label_col: str, pred_col: str, group_cols: list[str] | None = None
):
    """Full binary metric suite from ONE confusion aggregate: tp/fp/fn/tn
    and the closed-form metrics over them — precision, recall, f1,
    accuracy, balanced accuracy, Matthews correlation, Cohen's kappa.
    All pure integer-count algebra (deterministic in any engine), the
    hash-verifiable twin of evaluate_classification above (m3's MLlib
    path stays for model pipelines; this pins the metric MATH itself).
    Degenerate single-class inputs yield explicit NULLs via nullif.

    `group_cols` turns it into SLICED evaluation — one metric row per
    segment (language, source, cohort), the per-slice QA/fairness view;
    the confusion aggregate stays one map-side-combinable groupBy."""
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    grouped = df.groupBy(*group_cols) if group_cols else df
    cm = grouped.agg(
        F.sum(F.when((y == 1) & (p == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((y == 0) & (p == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((y == 1) & (p == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((y == 0) & (p == 0), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    n = tp + fp + fn + tn
    prec = tp / F.nullif(tp + fp, F.lit(0.0))
    rec = tp / F.nullif(tp + fn, F.lit(0.0))
    spec = tn / F.nullif(tn + fp, F.lit(0.0))
    acc = (tp + tn) / n
    po = acc
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    mcc = (tp * tn - fp * fn) / F.nullif(
        F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)), F.lit(0.0)
    )
    return cm.select(
        *(group_cols or []),
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(2 * prec * rec / F.nullif(prec + rec, F.lit(0.0)), 6).alias("f1"),
        F.round(acc, 6).alias("accuracy"),
        F.round((rec + spec) / 2, 6).alias("balanced_accuracy"),
        F.round(mcc, 6).alias("mcc"),
        F.round((po - pe) / F.nullif(1 - pe, F.lit(0.0)), 6).alias("cohens_kappa"),
    )


def best_f1_threshold(df, label_col: str, score_col: str):
    """Operating-point selection: the score threshold maximizing F1 when
    predicting positive at score >= t — the deployment decision every
    classifier needs after calibration. Candidates are the distinct
    scores (predicting at each observed value); TP/FP come from
    cumulative counts over the score-sorted aggregate (same
    aggregate-then-window shape as roc_points above), all exact integer
    counts until the final F1 division. Ties on F1 break toward the
    HIGHER threshold (fewer flagged rows for the same F1 — the
    conservative operating point), then deterministic everywhere.
    NULL-score rows are excluded up front — an unscored row can satisfy
    no threshold, and keeping them would emit a spurious NULL-threshold
    candidate (same precondition style as roc_points above). The
    per-score cumulative scaffold deliberately mirrors roc_points /
    exact_auc rather than sharing code: all three are pinned by
    driver-verified hash gates, and each output shape differs.

    r14: the cumulative runs on ranged_cumsum (descending, parallel),
    the positives total is a broadcast aggregate over the kernel's
    cached frame, and the argmax is orderBy().limit(1) —
    TakeOrderedAndProject (per-partition top-1 + driver merge), never a
    global sort or an unpartitioned rank window."""
    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    per = df.where(F.col(score_col).isNotNull()).groupBy(
        F.col(score_col).alias("s")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col(label_col).cast("long")).alias("p"),
        (F.count(F.lit(1)) - F.sum(F.col(label_col).cast("long"))).alias("__neg"),
    )
    cumr = ranged_cumsum(per, ["s"], ["p", "__neg"], descending=True)
    post = cumr.agg(F.sum("p").alias("pos"))
    cum = cumr.crossJoin(F.broadcast(post)).select(
        "s",
        F.col("__cum_p").alias("tp"),
        F.col("__cum___neg").alias("fp"),
        "pos",
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = (F.col("pos") - F.col("tp")).cast("double")
    f1 = 2 * tp / F.nullif(2 * tp + fp + fn, F.lit(0.0))
    scored = cum.select(
        F.col("s").alias("threshold"),
        F.col("tp"),
        F.col("fp"),
        (F.col("pos") - F.col("tp")).alias("fn"),
        F.round(f1, 6).alias("f1"),
    )
    return scored.orderBy(F.desc("f1"), F.desc("threshold")).limit(1)


def isotonic_fit_minimax(
    df, label_col: str, score_col: str, n_bins: int = 50
):
    """Exact isotonic calibration via the PAV minimax identity
    (Robertson, Wright & Dykstra 1988, public statistics):
    fitted[k] = max_{i<=k} min_{j>=k} weightedAvg(pos_rate[i..j]) — the
    unique PAV solution, computed in closed form instead of MLlib's
    iterative pooling. Same binned-aggregate front as
    isotonic_calibration (rows collapse to <= n_bins weighted points
    before any driver work); the minimax runs on the COLLECTED bins
    (metadata: <= n_bins rows) in O(n_bins³) — trivial at any corpus
    size because n_bins is fixed.

    Why this variant exists: every arithmetic step (sequential prefix
    sums, one ratio, min/max comparisons) is reproducible verbatim in
    SQL, so the calibration map is ORACLE-CHECKABLE — MLlib's float path
    is not. Returns (score_center, raw_pos_rate, calibrated_p) rows
    ordered by score, same schema as isotonic_calibration.
    """
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    binned = (
        df.where(y.isNotNull() & s.isNotNull())
        .groupBy(F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).alias("__b"))
        .agg(
            F.avg(s).alias("sc"),
            F.avg(y).alias("pr"),
            F.count(F.lit(1)).cast("double").alias("w"),
        )
        .orderBy("__b")
        .collect()
    )
    sc = [r["sc"] for r in binned]
    pr = [r["pr"] for r in binned]
    w = [r["w"] for r in binned]
    n = len(binned)
    # sequential prefix sums — the SAME order a SQL cumulative window uses,
    # so every downstream double is bit-identical cross-engine
    cwy = [0.0] * (n + 1)
    cw = [0.0] * (n + 1)
    for t in range(n):
        cwy[t + 1] = cwy[t] + w[t] * pr[t]
        cw[t + 1] = cw[t] + w[t]
    fitted = []
    for k in range(n):
        best = None
        for i in range(k + 1):
            worst = None
            for j in range(k, n):
                a = (cwy[j + 1] - cwy[i]) / (cw[j + 1] - cw[i])
                if worst is None or a < worst:
                    worst = a
            if best is None or worst > best:
                best = worst
        fitted.append(best)
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(sc[t], pr[t], fitted[t]) for t in range(n)],
        "score_center double, raw_pos_rate double, calibrated_p double",
    )
    return out.select(
        F.round("score_center", 6).alias("score_center"),
        F.round("raw_pos_rate", 6).alias("raw_pos_rate"),
        F.round("calibrated_p", 6).alias("calibrated_p"),
    ).orderBy("score_center")
