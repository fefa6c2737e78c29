"""Experiment / observational-analysis pipeline, end to end:

arm assignment audit → CUPED power check → mean/rank/shape two-sample
tests on the primary metric → difference-in-differences on the
pre/post frame → propensity-score-matched ATT for the observational
cut → survival comparison (Kaplan-Meier curves + log-rank) → Qini
curve for the targeting model.

This is the "did the change work" workload the round-4/5 operator
families exist for. Every stage is the same operator the gate queries
exercise; the arm here is a hash bucket of user_id (exactly how real
experiment platforms assign), the metric is per-user event value.

All stats stay aggregate-shaped: contingency/moment aggregates,
aggregate-then-window rank math, per-time risk-set tables — nothing
scales past the arm/time/value cardinality after the first groupBy.

Run: python examples/experiment_analysis.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.catalog import load_table
from ml_data_pipeline_spark.operators import causal as C
from ml_data_pipeline_spark.operators import profiling as P
from ml_data_pipeline_spark.operators.temporal import (
    kaplan_meier,
    logrank_test,
)
from ml_data_pipeline_spark.session import get_spark


def main(sf: str) -> None:
    spark = get_spark("experiment-analysis")
    ev = load_table(spark, sf, "events")
    cut = F.lit("2024-01-16").cast("timestamp")

    # per-user frame: arm (hash bucket), pre/post metric, engagement
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cut, F.col("value"))), F.lit(0.0)).alias("x_pre"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cut, F.col("value"))), F.lit(0.0)).alias("y_post"),
        F.count(F.lit(1)).alias("n_events"),
    ).withColumn("arm", (F.col("user_id") % 2 == 0).cast("int"))

    print("== arm balance (SRM check)")
    per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("x_pre"), 2).alias("mean_pre"),
    ).orderBy("arm").show()

    print("== CUPED: how much variance does the pre-period explain?")
    P.cuped_adjustment(per_user, "y_post", "x_pre").show()

    print("== two-sample tests on the post metric (arm 1 vs arm 0)")
    P.welch_ttest(per_user, "y_post", "arm", 0, 1).show()
    P.mann_whitney_u(per_user, "y_post", "arm", 0, 1).show()
    P.ks_statistic(per_user, "y_post", "arm", 0, 1).show()

    print("== difference-in-differences (pre/post x arm)")
    long = per_user.selectExpr(
        "arm", "0 AS post", "x_pre AS y"
    ).unionByName(per_user.selectExpr("arm", "1 AS post", "y_post AS y"))
    C.did_estimate(long, "arm", "post", "y").show()

    print("== PSM ATT: engagement-matched treated-vs-control outcome")
    scored = per_user.withColumn(
        "propensity", F.round(F.col("n_events") / (F.col("n_events") + 50.0), 4)
    )
    C.psm_att(scored, "arm", "propensity", "user_id", "y_post").show()

    print("== survival: time to first error per arm + log-rank")
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    first_err = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.min("ts").alias("err_ts"))
    )
    subjects = spans.join(first_err, "user_id", "left").select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.floor(
            (F.unix_micros(F.coalesce("err_ts", "last_ts")) - F.unix_micros("first_ts"))
            / 3600000000.0
        ).cast("long").alias("duration"),
        F.col("err_ts").isNotNull().cast("int").alias("event"),
    )
    kaplan_meier(subjects.where(F.col("arm") == 1), "duration", "event").show(5)
    logrank_test(subjects, "duration", "event", "arm", 0, 1).show()

    print("== Qini: is the 'propensity' a useful targeting score?")
    C.qini_curve(
        per_user.withColumn("uplift_score", F.col("x_pre")),
        "arm", "uplift_score", "y_post", "user_id", n_bins=5,
    ).show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
