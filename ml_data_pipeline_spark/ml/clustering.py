"""Deterministic distributed KMeans (Lloyd's) with engine-exact updates.

MLlib KMeans (used inside B3's cluster_centroids, balancing.py:292) is
seeded but its k-means|| init and float reductions are partitioning-
sensitive — fine for balancing, unusable for a hash-level gate. This
module implements the textbook Lloyd iteration as plain DataFrame ops
with a determinism contract strong enough for a DuckDB oracle to replay
bit-for-bit (same design recipe as the PageRank gate in graph.py: fixed
iterations, rounding at the points where float summation order could
diverge, hash-based deterministic init):

- init: the k rows with the smallest (md5(id), id) — a pure function of
  the data, reproducible in any engine;
- assignment: squared distances to LITERAL centroid values (codegen-fused
  projection, zero shuffle), argmin ties broken toward the lower cluster
  index via a first-match-wins CASE chain;
- update: per-cluster means from EXACT integer sums (callers feed
  integer-valued features — e.g. cents), one correctly-rounded IEEE
  division injected back as the literal centroid — NO decimal rounding
  in the loop (review pass r3: Python round() is correctly-rounded
  decimal, DuckDB round() is multiply-then-round; they disagree at 6dp
  for cents-magnitude values, so rounding anywhere in the trajectory
  made the gate data-dependently flaky). Exactness holds while the
  integer sums stay below 2^53 (document/rescale beyond);
- empty clusters keep their previous centroid (documented, replayed).

The driver holds only k×dim centroid scalars per iteration (metadata,
rule 5 of README's scale design); each iteration is one groupBy over the
points — the canonical distributed KMeans cost. Features are 2-D here
(the gate's shape); the pattern extends to any fixed dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    k: int = 3,
    iters: int = 4,
) -> DataFrame:
    """Fixed-iteration 2-D Lloyd's. x_col/y_col must be integer-valued
    (exactness contract — see module docstring). Returns one row per
    cluster: (cluster, cx, cy, n_points) with exact-quotient centroids."""
    # localCheckpoint: init + every iteration aggregate + the final count
    # all re-read base otherwise (iters+2 source scans)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).localCheckpoint()
    init_rows = (
        base.withColumn("__h", F.md5(F.col("id").cast("string")))
        .orderBy("__h", "id")
        .limit(k)
        .collect()
    )
    cents = [(float(r["x"]), float(r["y"])) for r in init_rows]

    def dist(j: int):
        cx, cy = cents[j]
        return (F.col("x") - F.lit(cx)) * (F.col("x") - F.lit(cx)) + (
            F.col("y") - F.lit(cy)
        ) * (F.col("y") - F.lit(cy))

    assigned = None
    for _ in range(iters):
        # F.least needs >= 2 args; k=1 degenerates to the single distance
        m = F.least(*[dist(j) for j in range(k)]) if k > 1 else dist(0)
        cl = F.when(dist(0) == m, 0)
        for j in range(1, k):
            cl = cl.when(dist(j) == m, j)
        assigned = base.withColumn("cluster", cl)
        stats = {
            r["cluster"]: r
            for r in assigned.groupBy("cluster")
            .agg(
                F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        # Python int/int true division == DuckDB's CAST-to-double /
        # count while the sums stay below 2^53 — exact parity, no round()
        cents = [
            (stats[j]["sx"] / stats[j]["n"], stats[j]["sy"] / stats[j]["n"])
            if j in stats
            else cents[j]  # empty cluster keeps its previous centroid
            for j in range(k)
        ]
    out = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_points"))
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(j, cents[j][0], cents[j][1]) for j in range(k)],
        "cluster int, cx double, cy double",
    )
    return cent_df.join(out, "cluster", "left").select(
        "cluster",
        "cx",
        "cy",
        F.coalesce("n_points", F.lit(0)).alias("n_points"),
    )
