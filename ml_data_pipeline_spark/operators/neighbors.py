"""Shared k-nearest-neighbor join — the foundation for SMOTE-family balancing
(SURVEY.md §2.7 B1/B4/B6-B9), KNN imputation (§2.6 I5) and hot-deck (§2.6 I7).

Two physical strategies behind one logical contract
``knn_join(left, right, feature_cols, k) -> (left_id, right_id, dist, rk)``:

- ``method='lsh'`` (the 100 TB path): MLlib BucketedRandomProjectionLSH.
  Candidates come from OR-amplified hash-bucket equi-joins
  (approxSimilarityJoin) — work scales with corpus x bucket occupancy, never
  O(n^2). Recall is tunable via num_hash_tables / bucket_length.
- ``method='exact'`` (small side / oracle baseline): plain crossJoin +
  per-left top-k window. Only valid when one side fits comfortably in a
  broadcast — guarded by a row-count ceiling.

Features are z-scaled before distance (the reference scales before KNN /
hot-deck: ref /root/reference/preprocessing/dataset_processing_check_nan_logic.py:66-86,181-217)
so no single wide-range column dominates the euclidean metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EXACT_CEILING = 200_000  # crossJoin guard: beyond this, refuse 'exact'


def zscale(df: DataFrame, feature_cols: list[str], stats: DataFrame | None = None):
    """Append ``__feat`` array<double> of z-scaled features. Stats (mean/std)
    are computed once and folded in as literals — one tiny aggregate, no join.
    Returns (df_with___feat, stats_row_dict) so train-fitted stats can be
    reused on another frame (fit-on-train-only semantics, M1)."""
    if stats is None:
        aggs = []
        for c in feature_cols:
            aggs += [F.avg(F.col(c)).alias(f"mu_{c}"), F.stddev(F.col(c)).alias(f"sd_{c}")]
        row = df.agg(*aggs).first()
        stats_d = {c: (row[f"mu_{c}"] or 0.0, row[f"sd_{c}"] or 1.0) for c in feature_cols}
    else:
        stats_d = stats
    arr = F.array(
        *[
            ((F.col(c).cast("double") - F.lit(stats_d[c][0])) / F.lit(stats_d[c][1] or 1.0))
            for c in feature_cols
        ]
    )
    return df.withColumn("__feat", arr), stats_d


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    feature_cols: list[str],
    k: int,
    left_id: str,
    right_id: str,
    method: str = "lsh",
    num_hash_tables: int = 3,
    # z-scaled features live in ~[-4, 4]; 0.25 gives ~30 buckets per random
    # projection. 2.0 (the MLlib example default) collapses everything into a
    # handful of buckets → the candidate join goes quadratic (measured: the
    # sf0.01 KNN-impute join never finished with 2.0, ~20s with 0.25).
    bucket_length: float = 0.25,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """(left_id, right_id, dist, rk<=k): for each left row, its k nearest
    right rows by euclidean distance over z-scaled feature_cols.

    Ties broken by right_id so the result is deterministic given the
    candidate set (LSH candidates themselves are seed-stable).
    """
    if left_id == right_id:
        raise ValueError("left_id and right_id must differ (they name output columns)")
    scaled_l, stats = zscale(left, feature_cols)
    scaled_r, _ = zscale(right, feature_cols, stats)

    if method == "exact":
        a = scaled_l.select(F.col(left_id).alias("__lid"), F.col("__feat").alias("__fa"))
        b = scaled_r.select(F.col(right_id).alias("__rid"), F.col("__feat").alias("__fb"))
        pairs = a.crossJoin(F.broadcast(b))
    elif method == "lsh":
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector

        a = scaled_l.select(
            F.col(left_id).alias("__lid"), array_to_vector("__feat").alias("__v")
        )
        b = scaled_r.select(
            F.col(right_id).alias("__rid"), array_to_vector("__feat").alias("__v")
        )
        lsh = BucketedRandomProjectionLSH(
            inputCol="__v",
            outputCol="__h",
            numHashTables=num_hash_tables,
            bucketLength=bucket_length,
            seed=seed,
        ).fit(b)
        joined = lsh.approxSimilarityJoin(a, b, float("inf"), distCol="__d")
        pairs = joined.select(
            F.col("datasetA.__lid").alias("__lid"),
            F.col("datasetB.__rid").alias("__rid"),
            F.col("__d").alias("dist"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    if method == "exact":
        pairs = pairs.select(
            "__lid", "__rid", F.sqrt(_sq_dist(F.col("__fa"), F.col("__fb"))).alias("dist")
        )
    if exclude_self:
        pairs = pairs.where(F.col("__lid") != F.col("__rid"))
    w = Window.partitionBy("__lid").orderBy(F.asc("dist"), F.asc("__rid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("dist"),
            F.col("rk"),
        )
    )
