"""The SURVEY §7.3 minimum end-to-end slice, as a runnable example:

load → profile (P2/P6) → impute mean (I1) → label-encode (E2) → stratified
split (T1) → train LogisticRegression (M2) → metric suite (M3) → versioned
artifacts (S6/S10) — every layer of the engine in one pipeline.

Run: python examples/end_to_end.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.catalog import load_table
from ml_data_pipeline_spark.ml import pipeline as MP
from ml_data_pipeline_spark.operators import encoding as E
from ml_data_pipeline_spark.operators import imputation as I
from ml_data_pipeline_spark.operators import profiling as P
from ml_data_pipeline_spark.operators import sampling as SA
from ml_data_pipeline_spark.plans import Dataset
from ml_data_pipeline_spark.session import get_spark


def run(spark, sf_dir: str, out_dir: str) -> dict:
    # 1. load + synthetic holes (the test tables are complete)
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 11 == 4, None).otherwise(F.col("c_acctbal")),
    )

    # 2. profile
    missing = {r["column"]: r["n_missing"] for r in P.missing_counts(cust).collect()}
    seg_counts = {r["c_mktsegment"]: r["count"] for r in P.value_counts(cust, "c_mktsegment").collect()}

    # 3. clean + encode through the lineage API (one Catalyst plan)
    ds = (
        Dataset.from_df(cust)
        .apply(I.impute_mean, "c_acctbal", describe="imputed mean c_acctbal")
        .apply(E.label_encode, "c_mktsegment", "segment_code", describe="label-encoded segment")
    )

    # 4. stratified split on the encoded label
    train, test = SA.stratified_split(ds.df, "c_mktsegment", test_size=0.2, seed=42)

    # 5. train + evaluate (predict segment from balance+nation — weak
    # features by design; the point is the plumbing)
    model, metrics = MP.train_and_evaluate(
        train, test, "c_mktsegment", "logistic_regression",
        feature_cols=["c_acctbal", "c_nationkey"],
    )

    # 6. versioned artifacts: data version with lineage + model directory
    info = ds.save(out_dir, "customer_prepared")
    MP.save_model(model, f"{out_dir}/models/segment_lr")
    MP.save_params_json(
        f"{out_dir}/segment_lr_params.json", "logistic_regression", "c_mktsegment",
        "classification", {}, ("f1", metrics["f1"]),
    )
    return {
        "missing": missing,
        "segments": seg_counts,
        "version": info.version,
        "changes": info.changes,
        "metrics": metrics,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdp_example_out"
    result = run(get_spark("end_to_end_example"), sf, out)
    for k, v in result.items():
        print(f"{k}: {v}")
