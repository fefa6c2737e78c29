"""Categorical encoding + date expansion (SURVEY.md §2.5, E1-E6, E17).

The reference encodes eagerly in pandas (one-hot via pd.get_dummies at
/root/reference/preprocessing/dataset_processing_fix_non_numeric_ui.py:227-238,
label/target/frequency/binary at :240-282, date expansion at :284-323).

Scale design notes:
- Encoders that need a per-value statistic (target mean, frequency, index)
  build a SMALL distinct-value table (cardinality rows, not data rows) and
  broadcast-join it back — the big table is never shuffled.
- One-hot emits plain 0/1 integer columns (SQL-visible, oracle-checkable),
  with the distinct-value set either supplied or collected from the small
  aggregate; MLlib's OneHotEncoder (vector) is the model-input variant in ml/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# one-hot guard: beyond this many distinct values the collected list and the
# exploded schema stop being "driver metadata" (10k columns also breaks every
# downstream consumer) — callers hash-encode instead
MAX_ONE_HOT_CARDINALITY = 10_000

def distinct_values(df: DataFrame, column: str, max_cardinality: int | None = None) -> list:
    """Sorted distinct non-null values — a cardinality-sized driver list.
    Only safe for true categoricals (the reference's use case); pass
    ``max_cardinality`` to fail fast instead of collecting an unbounded set
    (the limit+1 probe stops the scan early — no full distinct count)."""
    base = df.where(F.col(column).isNotNull()).select(column).distinct()
    if max_cardinality is not None:
        probe = base.limit(max_cardinality + 1).collect()
        if len(probe) > max_cardinality:
            raise ValueError(
                f"column {column!r} has more than {max_cardinality} distinct "
                f"values — one-hot would explode the schema and the driver; "
                f"use functions.hashing.feature_hash instead"
            )
        return sorted(r[0] for r in probe)
    rows = base.orderBy(column).collect()
    return [r[0] for r in rows]

def one_hot_encode(
    df: DataFrame,
    column: str,
    values: list | None = None,
    drop_original: bool = True,
    max_cardinality: int = MAX_ONE_HOT_CARDINALITY,
) -> DataFrame:
    """E1 — one 0/1 column per distinct value, original dropped
    (ref pd.get_dummies, dataset_processing_fix_non_numeric_ui.py:227-238).

    values=None collects the distinct set first (one small agg job),
    guarded by ``max_cardinality``: at 100 TB a high-cardinality column
    would OOM the driver and emit an unusable schema — the guard raises
    with a pointer to feature_hash (fixed-width, collision-tolerant). The
    encode itself is a pure projection — no shuffle, codegen-fused.
    """
    values = (
        values if values is not None
        else distinct_values(df, column, max_cardinality=max_cardinality)
    )
    cols = [c for c in df.columns if c != column or not drop_original]
    onehot = [
        F.when(F.col(column) == F.lit(v), F.lit(1)).otherwise(F.lit(0)).alias(f"{column}_{v}")
        for v in values
    ]
    return df.select(*cols, *onehot)

def label_encode(df: DataFrame, column: str, out_column: str | None = None) -> DataFrame:
    """E2 — distinct values → 0..K-1 in LEXICOGRAPHIC (string) order
    (ref dataset_processing_fix_non_numeric_ui.py:240-248). For string
    categories this equals sklearn LabelEncoder's sorted order; for
    NUMERIC categories it does NOT (codes follow "10" < "2" — the
    StringIndexer alphabetAsc contract below, which the oracle pins) —
    cast/format numeric categories upstream if sklearn-numeric order is
    required (r10 review: the old docstring claimed sklearn parity
    unconditionally).

    Codes come from ranged_rank over the DISTINCT-value table (r14: on a
    distinct frame row_number == dense_rank, so the assignment is
    bit-identical to the old single-task ordered window but stays
    parallel when the "categorical" column turns out to be near-
    continuous) then broadcast-join back; the data table is untouched by
    the rank. Equivalent to StringIndexer(stringOrderType='alphabetAsc')
    but SQL-expressible.
    """
    from ml_data_pipeline_spark.operators.profiling import ranged_rank

    out_column = out_column or column
    distinct_vals = (
        df.where(F.col(column).isNotNull())
        .select(F.col(column).cast("string").alias("__val"))
        .distinct()
    )
    mapping = ranged_rank(distinct_vals, ["__val"], out_col="__rr").select(
        "__val", (F.col("__rr") - 1).cast("long").alias("__code")
    )
    joined = df.join(
        F.broadcast(mapping), df[column].cast("string") == mapping["__val"], "left"
    )
    cols = [c for c in df.columns if c != column]
    return joined.select(
        *cols, F.col("__code").cast("long").alias(out_column)
    ) if out_column == column else joined.select(*df.columns, F.col("__code").cast("long").alias(out_column))

def target_encode(df: DataFrame, column: str, target: str, out_column: str | None = None) -> DataFrame:
    """E3 — per-category mean of target appended as `{c}_encoded`
    (ref df.groupby(c)[target].mean(),
    dataset_processing_fix_non_numeric_ui.py:250-261).

    groupBy produces a cardinality-sized table; broadcast-joined back, so the
    fact table is scanned twice but never shuffled.
    """
    out_column = out_column or f"{column}_encoded"
    means = df.groupBy(column).agg(F.avg(target).alias(out_column))
    return df.join(F.broadcast(means), on=column, how="left")

def frequency_encode(
    df: DataFrame, column: str, out_column: str | None = None, normalize: bool = True
) -> DataFrame:
    """E4 — per-category relative frequency appended as `{c}_freq_encoded`
    (ref value_counts(normalize=True), dataset_processing_fix_non_numeric_ui.py:263-271)."""
    out_column = out_column or f"{column}_freq_encoded"
    # NULL categories are excluded from counts AND the denominator —
    # pandas value_counts(normalize=True) drops NaN, so including null
    # rows in the total made frequencies sum below 1 (r10 review); the
    # total also comes from the cardinality-sized counts frame now
    # instead of a second full-table count() scan
    counts = (
        df.where(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    if normalize:
        # total WITHOUT re-deriving the groupBy from the base scan (the
        # r10 3x-scan trap) and WITHOUT the old empty-partitionBy window
        # (a single-task exchange of the whole counts frame — row-scale
        # when the column is near-continuous, r14): cache the narrow
        # counts frame once, aggregate the total off the cache, attach
        # as a broadcast scalar.
        from ml_data_pipeline_spark.cache import tracked_cache

        counts = tracked_cache(counts)
        tot = counts.agg(F.sum("__cnt").cast("double").alias("__tot"))
        counts = counts.crossJoin(F.broadcast(tot)).select(
            column, (F.col("__cnt") / F.col("__tot")).alias(out_column)
        )
    else:
        counts = counts.select(column, F.col("__cnt").cast("double").alias(out_column))
    return df.join(F.broadcast(counts), on=column, how="left")

def binary_encode(df: DataFrame, column: str, n_bits: int | None = None) -> DataFrame:
    """E5 — label index → binary digit columns `{c}_0..{c}_k` (MSB first),
    mirroring category_encoders.BinaryEncoder's 1-based ordinal
    (ref dataset_processing_fix_non_numeric_ui.py:273-282).

    Same broadcast-mapping shape as E2; bits extracted with shiftright/bitwise
    ops — all JVM-side.
    """
    tmp = "__be_code"
    encoded = label_encode(df, column, tmp)
    # category_encoders assigns ordinals 1..K (0 reserved), then binary-expands
    encoded = encoded.withColumn(tmp, F.col(tmp) + 1)
    k = n_bits
    if k is None:
        max_code = encoded.agg(F.max(tmp)).collect()[0][0] or 1
        k = max(1, int(max_code).bit_length())
    bit_cols = [
        (F.shiftright(F.col(tmp), k - 1 - i) % 2).cast("int").alias(f"{column}_{i}")
        for i in range(k)
    ]
    keep = [c for c in encoded.columns if c not in (tmp, column)]
    return encoded.select(*keep, *bit_cols)

DATE_FORMATS = ("M/d/yyyy", "M/d/yy", "d/M/yyyy", "yyyy-MM-dd", "d.M.yyyy", "yyyy/M/d")

def parse_date(df: DataFrame, column: str, formats: tuple[str, ...] = DATE_FORMATS) -> DataFrame:
    """E6a — multi-format date parse, first format that matches wins, else null
    (ref pd.to_datetime(format='mixed', errors='coerce') with formats listed at
    dataset_processing_fix_non_numeric_ui.py:290-294)."""
    attempts = [F.try_to_timestamp(F.col(column).cast("string"), F.lit(f)).cast("date") for f in formats]
    # try_cast, not cast: under Spark 4's default ANSI mode a plain
    # cast("date") THROWS on the first non-ISO string — crashing on
    # exactly the multi-format input this function exists for (r10
    # review; same hazard filters.align_dtypes documents)
    return df.withColumn(
        column, F.coalesce(F.col(column).try_cast("date"), *attempts)
    )

def date_features(df: DataFrame, column: str, drop_original: bool = False) -> DataFrame:
    """E6b — year/month/day/dayofweek/week/quarter expansion
    (ref dataset_processing_fix_non_numeric_ui.py:284-323).

    dayofweek is pandas convention (Monday=0..Sunday=6); week is ISO week.
    Pure projection, codegen-fused, no shuffle.
    """
    c = F.col(column)
    out = df.select(
        "*",
        F.year(c).cast("int").alias(f"{column}_year"),
        F.month(c).cast("int").alias(f"{column}_month"),
        F.dayofmonth(c).cast("int").alias(f"{column}_day"),
        ((F.dayofweek(c) + 5) % 7).cast("int").alias(f"{column}_dayofweek"),
        F.weekofyear(c).cast("int").alias(f"{column}_week"),
        F.quarter(c).cast("int").alias(f"{column}_quarter"),
    )
    return out.drop(column) if drop_original else out

def round_labels(df: DataFrame, column: str) -> DataFrame:
    """E17 — post-balance label rounding (ref np.round(y).astype(int),
    data_balancing_list_method_logic.py:17-20)."""
    return df.withColumn(column, F.round(F.col(column)).cast("int"))

def woe_encode(
    df: DataFrame,
    column: str,
    target: str,
    out_column: str | None = None,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight-of-Evidence encoding for a binary target: per category c,
    WoE(c) = ln( (pos_c + s)/(pos_tot + s*K) / ((neg_c + s)/(neg_tot + s*K)) )
    with Laplace smoothing s over K categories (no infinite WoE on pure
    categories). The credit-scoring/risk standard companion to target
    encoding: monotone in the category's positive rate but scaled in
    log-odds, so it composes directly with logistic models.

    Same plan shape as target_encode: one cardinality-sized aggregate,
    broadcast-joined back — the fact table never shuffles. Deterministic and
    closed-form, so the DuckDB oracle recomputes it exactly.
    """
    out_column = out_column or f"{column}_woe"
    y = F.col(target).cast("double")
    # category-cardinality-sized; feeds the totals AND the WoE table —
    # materialize once or both branches re-aggregate the fact table
    # (plan_audit r5)
    per = df.groupBy(column).agg(
        F.sum(y).alias("__pos"), F.sum(1 - y).alias("__neg")
    ).localCheckpoint()
    tot = per.agg(
        F.sum("__pos").alias("__ptot"),
        F.sum("__neg").alias("__ntot"),
        F.count(F.lit(1)).alias("__k"),
    )
    s = F.lit(float(smoothing))
    woe = F.log(
        ((F.col("__pos") + s) / (F.col("__ptot") + s * F.col("__k")))
        / ((F.col("__neg") + s) / (F.col("__ntot") + s * F.col("__k")))
    )
    table = per.join(F.broadcast(tot)).select(column, woe.alias(out_column))
    return df.join(F.broadcast(table), on=column, how="left")

def loo_target_encode(
    df: DataFrame, column: str, target: str, out_column: str
) -> DataFrame:
    """Leave-one-out target encoding — the leakage-free variant of E3:
    each row's encoding is the mean of the OTHER rows' targets in its
    category, so a model can't read its own label back out of the
    feature (the standard high-cardinality trick, public ML folklore).

    enc = (group_sum - own_target) / (group_count - 1); singleton
    categories and null targets fall back to the global mean.

    Shape: one groupBy to category-sized stats, broadcast back; a scalar
    global-mean aggregate attached via broadcast crossJoin (same pattern
    as E3 at operators/encoding.py target_encode) — no window sort, no
    per-category shuffle of the fact table beyond the stats aggregate.
    """
    # checkpoint the category-sized stats and derive the global mean FROM
    # them (sum of sums / sum of counts — identical for integer targets,
    # last-bit-equivalent for doubles) instead of a second source
    # aggregate: source is scanned once for stats + once for the encode
    # join (plan_audit: customer x3 before)
    stats = df.groupBy(column).agg(
        F.sum(target).alias("__s"), F.count(target).alias("__n")
    ).localCheckpoint()
    gm = stats.agg(
        (F.sum("__s") / F.nullif(F.sum("__n").cast("double"), F.lit(0.0))).alias("__gm")
    )
    loo = (F.col("__s") - F.col(target)) / F.nullif(
        (F.col("__n") - F.lit(1)).cast("double"), F.lit(0.0)
    )
    return (
        df.join(F.broadcast(stats), on=column, how="left")
        .crossJoin(F.broadcast(gm))
        .withColumn(out_column, F.coalesce(loo, F.col("__gm")))
        .drop("__s", "__n", "__gm")
    )


def quantile_transform(
    df: DataFrame, column: str, out_column: str | None = None
) -> DataFrame:
    """Rank-based quantile (CDF) transform: each value maps to
    ``(# rows with a strictly smaller value) / (n - 1)`` — exactly SQL
    ``percent_rank()`` with min-rank ties, i.e. sklearn's
    QuantileTransformer(uniform) at n_quantiles = n. The scale-robust
    encoder for heavy-tailed numerics (prices, counts) where min-max or
    z-scaling is dominated by outliers.

    Scale shape: NO unpartitioned window over fact rows. One groupBy to
    the distinct-value frame, the running sum over THAT frame — since r14
    as a ranged cumsum (per-range parallel prefixes + P-row carry,
    profiling.ranged_cumsum), so a CONTINUOUS column whose distinct count
    approaches row count no longer serializes into one ordered task — and
    an equi-join back (AQE broadcasts it when the value frame is small;
    the old forced broadcast was an executor-OOM hazard at continuous-
    column cardinality, the count_min_sketch r13 class). A single-value
    column maps to 0.0 (n-1 == 0 guard). Nulls stay null.
    """
    out = out_column or f"{column}_q"
    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    # cardinality-bounded frame consumed twice (total + running sum):
    # localCheckpoint so the corpus-sized groupBy runs once, not per branch
    counts = df.where(F.col(column).isNotNull()).groupBy(
        F.col(column).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__c")).localCheckpoint(eager=True)
    tot = counts.agg(F.sum("__c").alias("__n"))
    cdf = (
        ranged_cumsum(counts, ["__v"], ["__c"])
        .crossJoin(F.broadcast(tot))
        .select(
            "__v",
            F.when(F.col("__n") > 1,
                   (F.col("__cum___c") - F.col("__c")).cast("double")
                   / (F.col("__n") - 1).cast("double"))
            .otherwise(F.lit(0.0))
            .alias(out),
        )
    )
    return df.join(cdf, df[column] == cdf["__v"], "left").drop("__v")
