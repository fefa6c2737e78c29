"""Projection / filtering / row-and-column surgery (SURVEY.md §2.3, F1-F13)
plus scalar cleanup ops clip/round/coerce (§2.5 E14-E16).

All of these are single narrow transformations: no shuffle, fully fused by
whole-stage codegen, and the filters push down to the parquet scan when they
are first in the plan (ref does a full CSV read then masks in pandas, e.g.
/root/reference/checking_data_formats_ui.py:285-290,493-499).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .profiling import numeric_columns

def drop_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """F1 (ref df.drop(columns=[c]), /root/reference/checking_data_formats_ui.py:418-442)."""
    return df.drop(*columns)

def select_numeric(df: DataFrame) -> DataFrame:
    """F2 (ref select_dtypes(include=['number']),
    /root/reference/researching_models/model_evaluation_logic.py:149).
    Column pruning reaches the scan: untouched columns are never read."""
    return df.select(*numeric_columns(df))

def range_filter(
    df: DataFrame, column: str, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """F3 — numeric range filter, either bound optional
    (ref /root/reference/checking_data_formats_ui.py:493-499)."""
    out = df
    if lo is not None:
        out = out.where(F.col(column) >= F.lit(lo))
    if hi is not None:
        out = out.where(F.col(column) <= F.lit(hi))
    return out

def equality_filter(df: DataFrame, column: str, value) -> DataFrame:
    """F4 (ref df[column] == v, /root/reference/splitting_dataset_ui.py:389-391)."""
    return df.where(F.col(column) == F.lit(value))

def in_list_filter(df: DataFrame, column: str, values: list[str]) -> DataFrame:
    """F5 — string IN-list (ref df[column].astype(str).isin(values),
    /root/reference/splitting_dataset_ui.py:397-407)."""
    return df.where(F.col(column).cast("string").isin([str(v) for v in values]))

def null_partition(df: DataFrame, column: str) -> tuple[DataFrame, DataFrame]:
    """F6 — (complete, missing) split on one column
    (ref /root/reference/splitting_dataset_ui.py:416-446)."""
    return df.where(F.col(column).isNotNull()), df.where(F.col(column).isNull())

def drop_null_rows(df: DataFrame, columns: list[str]) -> DataFrame:
    """F7 (ref df.dropna(subset=[col]),
    /root/reference/preprocessing/dataset_processing_check_nan.py:295-312)."""
    return df.na.drop(subset=columns)

def merge_interval(df: DataFrame, column: str, lo: float, hi: float, target_value) -> DataFrame:
    """F8 — collapse a numeric range into one value
    (ref df.loc[(col>=lo)&(col<=hi), col] = v,
    /root/reference/checking_data_formats_ui.py:535-597).
    A lazy withColumn: only this column's expression changes; Catalyst leaves
    the rest of the projection untouched."""
    c = F.col(column)
    return df.withColumn(
        column, F.when(c.between(F.lit(lo), F.lit(hi)), F.lit(target_value)).otherwise(c)
    )

def align_columns(
    df: DataFrame, ref_columns: list[str], keep_extras: bool = True
) -> DataFrame:
    """F9 — reorder to a reference column order, extras appended or dropped;
    error if reference columns are missing
    (ref /root/reference/preprocessing/data_balancing/align_columns_ui.py:259-318)."""
    missing = [c for c in ref_columns if c not in df.columns]
    if missing:
        raise ValueError(f"missing reference columns: {missing}")
    extras = [c for c in df.columns if c not in ref_columns]
    cols = list(ref_columns) + (extras if keep_extras else [])
    return df.select(*cols)

def align_dtypes(df: DataFrame, ref_schema: T.StructType) -> DataFrame:
    """F10 — cast common columns to a reference schema's types; cast failure
    yields null, matching pandas errors='coerce'
    (ref /root/reference/preprocessing/data_balancing/align_columns_ui.py:176-257)."""
    ref_types = {f.name: f.dataType for f in ref_schema.fields}
    # try_cast, not cast: Spark 4 ANSI mode makes cast THROW on malformed
    # input; pandas errors='coerce' semantics = null on failure.
    return df.select(
        *[
            F.col(c).try_cast(ref_types[c]).alias(c) if c in ref_types else F.col(c)
            for c in df.columns
        ]
    )

def strip_column_names(df: DataFrame) -> DataFrame:
    """F11 (ref df.columns.str.strip(), /root/reference/eda.py:43)."""
    return df.toDF(*[c.strip() for c in df.columns])

def dedup_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """F13 — exact row dedup (ref README «Удаление дубликатов»;
    /root/reference/preprocessing/data_balancing/data_balancing_operaiting_classes.py:95).

    dropDuplicates = hash-partition on the key columns + per-partition
    first-row keep; at 100 TB prefer subset= on a business key so the shuffle
    key is narrow, and pre-bucket the table on it to remove the shuffle."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()

def clip(df: DataFrame, column: str, lo: float | None = None, hi: float | None = None) -> DataFrame:
    """E14 (ref col.clip(...),
    /root/reference/preprocessing/repair_nan_methods/mice_method.py:96-100)."""
    c = F.col(column)
    if lo is not None:
        c = F.greatest(F.lit(lo), c)
    if hi is not None:
        c = F.least(F.lit(hi), c)
    # greatest/least SKIP nulls, so an unguarded clip turned every NULL
    # into the clip bound — corrupting missing data (pandas col.clip
    # preserves NaN; r10 review). NaN needs the same guard: Spark orders
    # NaN ABOVE every number, so least(hi, NaN) returns hi and a NaN
    # would silently clip to the upper bound (ADVICE r10) — pandas
    # col.clip preserves NaN. winsorize inherits this guard.
    from pyspark.sql.types import DoubleType, FloatType

    valid = F.col(column).isNotNull()
    if isinstance(df.schema[column].dataType, (DoubleType, FloatType)):
        valid = valid & ~F.isnan(F.col(column))
    return df.withColumn(column, F.when(valid, c).otherwise(F.col(column)))

def round_column(df: DataFrame, column: str, scale: int = 0, as_int: bool = False) -> DataFrame:
    """E15 (ref col.round(k) / .astype('Int64'),
    /root/reference/preprocessing/repair_nan_methods/mice_method.py:102-106)."""
    c = F.round(F.col(column), scale)
    if as_int:
        c = c.cast("long")
    return df.withColumn(column, c)

def to_numeric(df: DataFrame, column: str) -> DataFrame:
    """E16 — numeric coercion; non-parseable → null, matching
    pd.to_numeric(errors='coerce')
    (ref /root/reference/preprocessing/data_balancing/align_columns_ui.py:227-229)."""
    return df.withColumn(column, F.col(column).try_cast("double"))

def bucketize(
    df: DataFrame, column: str, splits: list[float], out_col: str | None = None
) -> DataFrame:
    """Discretize a numeric column into bins at the given ascending split
    points: bin = number of splits <= value (0 .. len(splits)); nulls stay
    null. Pure column expression (a sum of comparisons — codegen-fused,
    zero shuffle, engine-portable), the binning step behind histogram
    features and quantile bucketing once boundaries are known."""
    x = F.col(column).cast("double")
    bin_expr = sum(
        (x >= F.lit(float(s))).cast("int") for s in sorted(splits)
    )
    return df.withColumn(
        out_col or f"{column}_bin",
        F.when(x.isNotNull(), bin_expr).cast("int"),
    )

def quantile_bucketize(
    df: DataFrame,
    column: str,
    num_buckets: int = 10,
    out_col: str | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Equal-frequency binning: compute the quantile boundaries first
    (approx_percentile sketch by default — mergeable, bounded memory; the
    100 TB path), then assign bins with the same pure comparison expression
    as bucketize(). Two passes over the data but NO global sort — the
    ntile() formulation is one global-sort task and is exactly what this
    avoids. exact=True swaps in the exact percentile for oracle-grade
    reproducibility on small data."""
    x = F.col(column).cast("double")
    probs = [i / num_buckets for i in range(1, num_buckets)]
    fn = F.percentile(x, F.array(*[F.lit(p) for p in probs])) if exact else \
        F.approx_percentile(x, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy))
    qs = df.agg(fn.alias("qs")).first()["qs"]
    # an all-NULL / empty column has no percentiles: every row lands in
    # one bin rather than TypeError-ing on a None aggregate (r10 review)
    splits = [r for r in (qs or []) if r is not None]
    return bucketize(df, column, splits, out_col=out_col or f"{column}_qbin")

def winsorize(
    df: DataFrame,
    column: str,
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Percentile clipping (winsorization): compute the [lower, upper]
    percentile bounds in one aggregate (approx sketch by default — the
    100 TB path; exact for oracle-grade runs), then clip with the pure
    clip() expression. Tames heavy tails before scaling/OLS without
    dropping rows."""
    x = F.col(column).cast("double")
    probs = F.array(F.lit(lower), F.lit(upper))
    fn = F.percentile(x, probs) if exact else F.approx_percentile(x, probs, F.lit(accuracy))
    bounds = df.agg(fn.alias("b")).first()["b"]
    if bounds is None:  # all-NULL column: nothing to winsorize (r10 review)
        return df
    lo, hi = bounds
    return clip(df, column, lo=lo, hi=hi)

def robust_scale(
    df: DataFrame, column: str, out_col: str | None = None, exact: bool = True
) -> DataFrame:
    """Robust scaling: (x - median) / IQR — the outlier-immune companion to
    the ML pipeline's StandardScaler (reference scales with mean/std only:
    /root/reference/researching_models/model_evaluation_logic.py:31-33;
    median/IQR survives the heavy tails that break z-scores).

    exact=True uses percentile() (exact, piecewise-linear interpolation —
    DuckDB quantile_cont parity, used by the oracle gate). At 100 TB flip
    exact=False for the approx_percentile t-digest sketch: one pass,
    bounded memory, no sort — identical plan shape otherwise (the same
    exact/approx dual as profiling.numeric_summary). A zero IQR (constant
    column) yields explicit NULLs via nullif, not a divide-crash.
    """
    fn = "percentile" if exact else "approx_percentile"
    # backtick-quote the column inside the SQL string: an unquoted name
    # containing operators (e.g. "price-usd") PARSES as an expression over
    # other columns and returns silently wrong scales (r10 review)
    q = df.agg(
        F.expr(f"{fn}(`{column}`, 0.25)").alias("__q1"),
        F.expr(f"{fn}(`{column}`, 0.5)").alias("__med"),
        F.expr(f"{fn}(`{column}`, 0.75)").alias("__q3"),
    )
    out = out_col or f"{column}_scaled"
    iqr = F.nullif(F.col("__q3") - F.col("__q1"), F.lit(0.0))
    return (
        df.crossJoin(F.broadcast(q))
        .withColumn(out, (F.col(column) - F.col("__med")) / iqr)
        .drop("__q1", "__med", "__q3")
    )
