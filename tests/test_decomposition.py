"""Distributed PCA (ml/decomposition.py)."""

import math

import numpy as np
import pytest

from ml_data_pipeline_spark.ml.decomposition import pca_fit, pca_project


def _planar_df(spark):
    """Deterministic 2D-structure data embedded in 4D: x along (1,1,0,0),
    y along (0,0,1,-1), tiny dim-4 jitter so eigenvalues are distinct."""
    rows = []
    for i in range(200):
        x = (i % 20) - 9.5  # var along first direction
        y = ((i // 20) % 10) - 4.5  # smaller var along second
        rows.append((i, [x + 0.0, x + 0.0, y * 0.5, -y * 0.5]))
    return spark.createDataFrame(rows, ["id", "embedding"])


def test_fit_matches_numpy(spark):
    df = _planar_df(spark)
    m = pca_fit(df, "embedding", k=2)
    X = np.array([r["embedding"] for r in df.orderBy("id").collect()])
    cov = np.cov(X, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert m["n"] == 200 and m["dim"] == 4
    assert m["total_variance"] == pytest.approx(np.trace(cov), rel=1e-9)
    assert m["explained_variance"][0] == pytest.approx(evals[0], rel=1e-9)
    assert m["explained_variance"][1] == pytest.approx(evals[1], rel=1e-9)
    # components orthonormal
    C = np.array(m["components"])
    assert np.abs(C @ C.T - np.eye(2)).max() < 1e-9


def test_projection_variance_equals_eigenvalue(spark):
    df = _planar_df(spark)
    m = pca_fit(df, "embedding", k=2)
    pcs = np.array([r["pc"] for r in pca_project(df, m, "embedding").collect()])
    for j in range(2):
        assert np.var(pcs[:, j]) == pytest.approx(m["explained_variance"][j], rel=1e-9)
    # scores are centered
    assert abs(pcs.mean(axis=0)).max() < 1e-9


def test_deterministic_sign(spark):
    df = _planar_df(spark)
    m1 = pca_fit(df, "embedding", k=2)
    m2 = pca_fit(df.repartition(7), "embedding", k=2)
    for a, b in zip(m1["components"], m2["components"]):
        assert math.dist(a, b) < 1e-9
