"""Missing-value imputation (SURVEY.md §2.6, I1-I8).

Reference signature: impute_x(df, column) -> (df, description)
(/root/reference/preprocessing/dataset_processing_check_nan_logic.py:23-26).
Here every method is DataFrame -> DataFrame; the statistic is computed with an
aggregate and folded back in as a literal or via a window — never a driver
loop over rows.

Scale notes:
- mean/median/mode: one aggregate (tiny result) + one projection. The
  statistic is collected to the driver (a scalar) — O(1) driver memory.
- linear interpolation (I4) is row-order-dependent in pandas; Spark has no
  row order, so it is defined over an explicit ordering column and uses two
  window passes (last-non-null before, first-non-null after) — no driver
  materialization. See SURVEY §4 "row-order-sensitive ops".
- EM (I8): driver-side loop of aggregates + a seeded randn projection;
  each iteration is one scan, convergence on |Δmu| < tol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def impute_mean(df: DataFrame, column: str) -> DataFrame:
    """I1 (ref fillna(col.mean()), dataset_processing_check_nan_logic.py:29-35)."""
    return df.withColumn(
        column, F.coalesce(F.col(column), F.avg(column).over(Window.partitionBy()))
    )

def impute_median(df: DataFrame, column: str) -> DataFrame:
    """I2 (ref fillna(col.median()), dataset_processing_check_nan_logic.py:38-44).

    Exact median (F.median = percentile 0.5 with interpolation, matching
    pandas/DuckDB). At 100 TB switch exact=False → percentile_approx, which is
    a single-pass sketch.
    """
    return df.withColumn(
        column, F.coalesce(F.col(column), F.median(column).over(Window.partitionBy()))
    )

def impute_median_approx(df: DataFrame, column: str, accuracy: int = 10000) -> DataFrame:
    """I2 at scale — percentile_approx sketch, one pass, mergeable."""
    med = df.agg(F.percentile_approx(column, 0.5, accuracy)).collect()[0][0]
    return df.withColumn(column, F.coalesce(F.col(column), F.lit(med)))

def impute_mode(df: DataFrame, column: str) -> DataFrame:
    """I3 — most frequent value, ties broken by value asc for determinism
    (ref fillna(col.mode()[0]), dataset_processing_check_nan_logic.py:47-55;
    pandas mode()[0] is also the smallest of the tied values).

    One groupBy on the column (cardinality-sized) + orderBy limit 1.
    """
    mode_row = (
        df.where(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.desc("__cnt"), F.asc(column))
        .limit(1)
        .collect()
    )
    if not mode_row:
        return df
    return df.withColumn(column, F.coalesce(F.col(column), F.lit(mode_row[0][0])))

def impute_interpolate(df: DataFrame, column: str, order_column: str | list[str]) -> DataFrame:
    """I4 — linear interpolation over an explicit row order, limit_direction=
    'both' (ref col.interpolate(method='linear', limit_direction='both'),
    dataset_processing_check_nan_logic.py:58-63).

    Two ordered window passes:
      prev = last non-null value/position before the row,
      next = first non-null value/position after the row,
      fill = prev + (next-prev) * (pos-prev_pos)/(next_pos-prev_pos);
    edges fall back to the single available side (that is 'both').
    Windows are unbounded but only carry (value, position) — Spark evaluates
    last(ignorenulls) incrementally, O(n) per partition. For 100 TB, range-
    partition on order_column first (repartitionByRange) so sort is parallel.
    """
    order_cols = [order_column] if isinstance(order_column, str) else list(order_column)
    c = F.col(column)
    # The ordering MUST be a total order (unique key) — ties make the fill
    # positions engine/partition-dependent. Callers pass tie-breaker columns.
    asc = [F.col(x).asc() for x in order_cols]
    desc = [F.col(x).desc() for x in order_cols]
    # Both context windows are GROWING prefix frames (unboundedPreceding..0),
    # one over ascending and one over descending order: Spark evaluates these
    # incrementally (O(n)). The naive (1, unboundedFollowing) shrinking frame
    # is recomputed per row — O(n^2), measured 180s vs 2s at 60k rows.
    # Including the current row is safe: the result is only used when the
    # current value is null, and null never wins last(ignorenulls).
    w_fwd = Window.orderBy(*asc).rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = Window.orderBy(*desc).rowsBetween(Window.unboundedPreceding, 0)
    pos = F.row_number().over(Window.orderBy(*asc))
    df2 = df.withColumn("__pos", pos)
    val_pos = F.when(c.isNotNull(), F.col("__pos"))
    prev_v = F.last(F.when(c.isNotNull(), c), ignorenulls=True).over(w_fwd)
    prev_p = F.last(val_pos, ignorenulls=True).over(w_fwd)
    next_v = F.last(F.when(c.isNotNull(), c), ignorenulls=True).over(w_bwd)
    next_p = F.last(val_pos, ignorenulls=True).over(w_bwd)
    interp = prev_v + (next_v - prev_v) * (F.col("__pos") - prev_p) / (next_p - prev_p)
    filled = F.when(c.isNotNull(), c).otherwise(F.coalesce(interp, prev_v, next_v))
    return df2.withColumn(column, filled).drop("__pos")

def impute_em_normal(
    df: DataFrame, column: str, tol: float = 1e-5, max_iter: int = 100, seed: int = 42
) -> DataFrame:
    """I8 — EM under a normal model: fill missing with N(mu, sigma) draws,
    re-estimate mu/sigma, iterate to |Δmu| < tol
    (ref dataset_processing_check_nan_logic.py:229-260).

    Driver loop of (aggregate, project) pairs — each iteration one scan, no
    data collected. Draws are seeded F.randn(seed+iter): deterministic at
    fixed partitioning (documented determinism model, SURVEY §4).
    """
    stats = df.agg(
        F.avg(column).alias("mu"), F.coalesce(F.stddev(column), F.lit(0.0)).alias("sigma")
    ).collect()[0]
    mu, sigma = float(stats["mu"]), float(stats["sigma"])
    out = df
    for i in range(max_iter):
        candidate = out.withColumn(
            "__fill",
            F.when(
                F.col(column).isNull(), F.randn(seed + i) * F.lit(sigma) + F.lit(mu)
            ).otherwise(F.col(column)),
        )
        new = candidate.agg(
            F.avg("__fill").alias("mu"), F.coalesce(F.stddev("__fill"), F.lit(0.0)).alias("sigma")
        ).collect()[0]
        new_mu, new_sigma = float(new["mu"]), float(new["sigma"])
        if abs(new_mu - mu) < tol:
            mu, sigma = new_mu, new_sigma
            out = candidate.withColumn(column, F.col("__fill")).drop("__fill")
            return out
        mu, sigma = new_mu, new_sigma
    final = out.withColumn(
        column,
        F.when(F.col(column).isNull(), F.randn(seed + max_iter) * F.lit(sigma) + F.lit(mu)).otherwise(
            F.col(column)
        ),
    )
    return final

def with_nulls(df: DataFrame, column: str, fraction: float, seed: int = 42) -> DataFrame:
    """Test helper: knock out a deterministic pseudo-random fraction of a
    column (the testdata has no nulls; imputation oracles need some).
    Uses a hash-derived uniform so Spark and an external SQL oracle can
    reproduce the SAME null mask (unlike F.rand, which is partition-dependent).
    """
    u = (F.abs(F.xxhash64(F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns]))) % 10000) / 10000.0
    return df.withColumn(column, F.when(u < fraction, F.lit(None)).otherwise(F.col(column)))
