"""Distributed PCA over an embedding column.

The reference's dimensionality story stops at correlation heatmaps
(preprocessing/correlation_graph_logic.py); a 100 TB embedding corpus
needs the real thing — PCA for whitening/compaction ahead of the
semantic-dedup and ANN stages (operators/similarity.py).

Scale shape (the classic tall-skinny decomposition):
1. second-moment sufficient statistics (n, sum x, sum x x^T) are
   accumulated PER ARROW BATCH with one numpy matmul inside
   ``mapInPandas`` — the only thing crossing the wire per partition is a
   (1 + d + d*d)-float row, d=64 => ~33 KB;
2. the <=numPartitions partial rows reduce on the driver (a
   partition-count-sized collect, the same documented driver surface as
   profiling's scalar aggregates);
3. the d x d covariance eigendecomposition runs on the driver with
   numpy — O(d^3) on a 64x64 matrix is microseconds and has no
   distributed equivalent worth the complexity;
4. projection back over the data is a LITERAL-matrix linear map (same
   codegen-fused zip_with/aggregate shape as similarity.random_project)
   — zero shuffle, zero Python.

Eigenvector sign is fixed deterministically (largest-|.|-component
positive) so repeated fits produce identical projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
) -> dict:
    """Fit PCA; returns {n, dim, mean, components (k x d, row-major),
    explained_variance (len k), total_variance}. Population (1/n)
    covariance, matching var_pop in SQL engines."""
    import numpy as np

    first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:
        raise ValueError(
            "pca_fit: no non-null vectors to fit on (empty frame or "
            "all-NULL embedding column)"
        )
    d = len(first[0])
    # NULL vector rows would crash np.stack deep in an executor — they
    # carry no signal for the moments, so they are excluded up front
    # (r10 review)
    df = df.where(F.col(vec_col).isNotNull())

    def moments(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        yield pd.DataFrame(
            {"n": [float(n)], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    parts = (
        df.select(vec_col)
        .mapInPandas(moments, schema="n double, s array<double>, g array<double>")
        .collect()
    )
    n = sum(p["n"] for p in parts)
    s = np.sum([p["s"] for p in parts], axis=0)
    g = np.sum([p["g"] for p in parts], axis=0).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:  # deterministic sign
            v = -v
        comps.append(v)
    return {
        "n": int(n),
        "dim": d,
        "mean": mean.tolist(),
        "components": [c.tolist() for c in comps],
        "explained_variance": [float(evals[i]) for i in order],
        "total_variance": float(np.trace(cov)),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Append the k principal scores: pc_j = (x - mean) . comp_j.
    Mean and components are literal arrays — codegen-fused, no shuffle."""
    cols = []
    for comp in model["components"]:
        # fold mean subtraction into a constant offset: (x-m).c = x.c - m.c
        offset = sum(m * c for m, c in zip(model["mean"], comp))
        signs = F.array(*[F.lit(float(c)) for c in comp])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), signs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(dot - F.lit(float(offset)))
    return df.withColumn(out_col, F.array(*cols))
