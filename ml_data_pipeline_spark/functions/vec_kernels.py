"""Arrow-vectorized numeric kernels (pandas UDFs).

NOTE: no ``from __future__ import annotations`` here on purpose —
pandas_udf resolves the type hints at decoration time, and PEP-563 string
annotations break that resolution.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def pair_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Row-wise dot product of two array<double> columns — one numpy einsum
    per Arrow batch. For L2-normalized inputs this IS the cosine."""
    import numpy as np

    if len(va) == 0:
        return pd.Series([], dtype=float)
    ma = np.stack(va.to_numpy())
    mb = np.stack(vb.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", ma, mb))


@pandas_udf("double")
def pair_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Row-wise cosine of two RAW (unnormalized) array<double> columns —
    dots and norms in one numpy pass per Arrow batch. A zero-norm side
    yields NaN (never a DIVIDE_BY_ZERO crash under ANSI, never a
    null-element array): NaN fails any >= threshold filter, so zero
    vectors drop out of pair outputs naturally."""
    import numpy as np

    if len(va) == 0:
        return pd.Series([], dtype=float)
    ma = np.stack(va.to_numpy())
    mb = np.stack(vb.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb)
    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(den > 0, dots / den, np.nan)
    return pd.Series(out)


def nearest_cells_udf(centroids, nprobe):
    """Factory: pandas UDF mapping an array<double> vector column to the
    indices of its `nprobe` nearest centroids (squared L2; stable argsort
    = lowest-index tie-break). The centroid matrix rides the closure —
    k x d floats, broadcast with the task, tiny by IVF construction.

    The multiprobe-assignment kernel for similarity.ivf_candidate_pairs:
    one (batch x k) GEMM per Arrow batch instead of k interpreted
    per-element expression folds."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)  # (k, d)
    cn = (C * C).sum(axis=1)
    p = min(int(nprobe), C.shape[0])

    @pandas_udf("array<int>")
    def _nearest(v: pd.Series) -> pd.Series:
        import numpy as np

        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy()).astype(np.float64)
        d2 = (X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ C.T) + cn
        idx = np.argsort(d2, axis=1, kind="stable")[:, :p].astype("int32")
        return pd.Series(list(idx))

    return _nearest
