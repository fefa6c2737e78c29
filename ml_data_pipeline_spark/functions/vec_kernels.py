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
