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
    if len(cents) < k:
        raise ValueError(
            f"kmeans_fit_2d: k={k} exceeds the {len(cents)} distinct "
            "available init rows — reduce k or supply more data"
        )
    if iters < 1:
        raise ValueError("kmeans_fit_2d: iters must be >= 1")

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


def dbscan_labels(
    points: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    min_pts: int = 4,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """DBSCAN (Ester et al., KDD 1996 — public literature) over a
    PRECOMPUTED eps-neighbor pair frame — the density-clustering member
    the engine's clustering family (KMeans, silhouette/DB eval) lacked:
    finds arbitrarily-shaped clusters and, unlike KMeans, says "noise"
    instead of forcing every outlier into a centroid.

    Decoupling neighbor generation from labeling is the scale design:
    ``pairs`` is whatever candidate join fits the data —
    similarity.brute_force_cosine_pairs under the exact ceiling,
    cosine_pairs_lsh / ivf buckets at corpus scale — and this function is
    pure graph algebra on (id_a, id_b):

    1. symmetrize + degree count (one groupBy);
    2. core = degree + 1 >= min_pts (sklearn's min_samples convention —
       the point itself counts);
    3. clusters = connected components over CORE-CORE edges
       (components.connected_components, Large-Star/Small-Star O(log n));
       a core point with no core neighbor keeps its own id as label;
    4. border = non-core with >= 1 core neighbor, assigned the MINIMUM
       core-neighbor label (classic DBSCAN is insertion-order-dependent
       here; the min rule makes the labeling a pure function of the
       data — deterministic, oracle-checkable);
    5. everything else is noise: label NULL.

    Returns (id_col, label, is_core) for every input point. Requires
    ``min_pts >= 2``: a point absent from ``pairs`` has no neighbors and
    is always noise here, which matches DBSCAN for min_pts >= 2 but not
    the degenerate min_pts=1 every-point-is-a-singleton case.
    """
    if min_pts < 2:
        raise ValueError("dbscan_labels requires min_pts >= 2")
    from ml_data_pipeline_spark.operators.components import connected_components

    p = pairs.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).where(F.col("u") != F.col("v"))  # a (u,u) self-pair would inflate the
    # degree and misclassify a non-core point as core (r10 review;
    # connected_components drops self-edges independently)
    sym = p.union(p.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # materialize once: degree count, core-core edge filter and the border
    # assignment all read this frame (the re-derivation lesson)
    sym = sym.localCheckpoint()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("__deg"))
    core = deg.where(F.col("__deg") + 1 >= min_pts).select(F.col("u").alias("__cid"))
    cc_edges = (
        sym.join(core.select(F.col("__cid").alias("u")), "u")
        .join(core.select(F.col("__cid").alias("v")), "v")
        .where(F.col("u") < F.col("v"))
        .select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
    )
    comp = connected_components(cc_edges)  # (id, component); isolated cores absent
    core_labels = core.join(
        comp.select(F.col("id").alias("__cid"), "component"), "__cid", "left"
    ).select(
        F.col("__cid").alias("__id"),
        F.coalesce("component", F.col("__cid")).alias("label"),
        F.lit(True).alias("is_core"),
    )
    border = (
        sym.join(core_labels.select(F.col("__id").alias("v"), F.col("label")), "v")
        .join(core_labels.select(F.col("__id").alias("u")), "u", "left_anti")
        .groupBy("u")
        .agg(F.min("label").alias("label"))
        .select(F.col("u").alias("__id"), "label", F.lit(False).alias("is_core"))
    )
    labels = core_labels.unionByName(border)
    return (
        points.select(F.col(id_col))
        .join(labels, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            "label",
            F.coalesce("is_core", F.lit(False)).alias("is_core"),
        )
        .orderBy(id_col)
    )
