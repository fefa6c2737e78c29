"""DSIR-style importance weights (operators/importance.py)."""

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.importance import dsir_select, dsir_weights

DOCS = [
    # target docs (flag=1) use 'alpha/beta'; out-of-domain use 'gamma/delta'
    (1, 1, "alpha beta alpha beta alpha"),
    (2, 1, "beta alpha beta alpha"),
    (3, 0, "gamma delta gamma delta gamma"),
    (4, 0, "delta gamma delta"),
    (5, 0, "alpha beta gamma delta"),  # mixed: between the two groups
    (6, 0, ""),  # zero tokens
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "flag", "text"])


def test_weights_order_and_coverage(spark):
    out = dsir_weights(_df(spark), is_target=F.col("flag") == 1).orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 2, 3, 4, 5, 6]
    by_id = {r["id"]: r for r in out}
    # in-domain docs score above the mixed doc, which scores above ood docs
    assert by_id[1]["avg_log_ratio"] > by_id[5]["avg_log_ratio"] > by_id[3]["avg_log_ratio"]
    # zero-token doc: explicit NULL weight, zero count, still present
    assert by_id[6]["n_tokens"] == 0 and by_id[6]["avg_log_ratio"] is None


def test_select_topk_deterministic(spark):
    out = dsir_select(_df(spark), is_target=F.col("flag") == 1, k=3).collect()
    by_id = {r["id"]: r for r in out}
    assert {i for i, r in by_id.items() if r["selected"]} == {1, 2, 5}
    # nulls rank last
    assert by_id[6]["rank"] == 6
    # ranks are a permutation
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5, 6]


def test_weights_match_hand_computation(spark):
    import math

    rows = [(1, 1, "a a b"), (2, 0, "b b")]
    df = spark.createDataFrame(rows, ["doc_id", "flag", "text"])
    out = {r["id"]: r for r in dsir_weights(df, F.col("flag") == 1).collect()}
    # vocab = {a, b}, V=2; target: a=2, b=1, Nt=3; raw: a=2, b=3, Nr=5
    lr_a = math.log((2 + 1) / (3 + 2)) - math.log((2 + 1) / (5 + 2))
    lr_b = math.log((1 + 1) / (3 + 2)) - math.log((3 + 1) / (5 + 2))
    exp1 = (2 * lr_a + lr_b) / 3
    assert abs(out[1]["avg_log_ratio"] - exp1) < 1e-9
    assert abs(out[2]["avg_log_ratio"] - lr_b) < 1e-9
