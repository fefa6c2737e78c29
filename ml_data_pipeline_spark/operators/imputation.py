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
    """I1 (ref fillna(col.mean()), dataset_processing_check_nan_logic.py:29-35).

    Scalar aggregate folded back as a literal — a partial/final agg tree
    (parallel) + a projection. The window form (avg over an empty
    partitionBy) funnels the WHOLE table through one window task.
    """
    mean_val = df.agg(F.avg(column)).first()[0]
    return df.withColumn(column, F.coalesce(F.col(column), F.lit(mean_val)))

def impute_median(df: DataFrame, column: str) -> DataFrame:
    """I2 (ref fillna(col.median()), dataset_processing_check_nan_logic.py:38-44).

    Exact median (F.median = percentile 0.5 with interpolation, matching
    pandas/DuckDB), computed as a scalar aggregate (same shape note as
    impute_mean). At 100 TB switch to impute_median_approx — a single-pass
    mergeable sketch.
    """
    med_val = df.agg(F.median(column)).first()[0]
    return df.withColumn(column, F.coalesce(F.col(column), F.lit(med_val)))

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

_TWO_PI = 6.283185307179586  # shared literal with the DuckDB EM oracle


def _hash_normal(key, i: int):
    """Deterministic standard-normal draw from a row key and an iteration
    index: two md5-derived uniforms (the proven E8/hash_bucket 60-bit
    recipe) through Box-Muller. The uniform (h + 0.5) / 2^60 lies in
    (0, 1] AFTER double rounding — h within 128 of 2^60 rounds UP to
    2^60 exactly (the ulp there is 256), giving u = 1.0; that edge is
    still safe and parity-exact: ln(1) = 0 so z = 0, identically in both
    engines (r12 review — the first docstring claimed strictly-inside,
    which is false at the top end; do NOT build a u<1-dependent variant
    like log1p/inverse-CDF on this recipe without re-deriving the edge).
    Partition-INDEPENDENT, so the draw is identical on any cluster
    layout AND replayable by a SQL oracle (ln/cos agree between the JVM
    and libm within ~1 ulp, absorbed by the i8 gate's integer centi-grid
    output; pinned at three scales). The 2π literal is written out so
    both engines parse the same double."""

    def u(tag: str):
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", key, F.lit(f"{i}|{tag}"))), 1, 15),
            16,
            10,
        ).cast("long")
        return (h.cast("double") + 0.5) / float(1 << 60)

    return F.sqrt(-2.0 * F.log(u("a"))) * F.cos(F.lit(_TWO_PI) * u("b"))


def impute_em_normal(
    df: DataFrame,
    column: str,
    tol: float = 1e-5,
    max_iter: int = 100,
    seed: int = 42,
    rng: str = "randn",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """I8 — EM under a normal model: fill missing with N(mu, sigma) draws,
    re-estimate mu/sigma, iterate to |Δmu| < tol
    (ref dataset_processing_check_nan_logic.py:229-260).

    Driver loop of (aggregate, project) pairs — each iteration one scan, no
    data collected. Draws (default rng='randn') are seeded
    F.randn(seed+iter): deterministic at fixed partitioning (documented
    determinism model, SURVEY §4). rng='hash' draws instead via Box-Muller
    over md5 uniforms of ``key_cols`` + the iteration index (_hash_normal)
    — partition-independent AND SQL-replayable; the i8 gate uses it so the
    full EM trajectory is DuckDB-oracle-checked (r12 graduation). At
    100 TB it is also the stronger reproducibility story: the DRAWS are
    a pure function of (key, iteration), so a repartition cannot change
    them — the mu/sigma scalars remain float aggregates (order-sensitive
    at the last ulp), so the FILLS are stable to ~1e-12 rather than
    bitwise, which is why the gate compares on an integer centi-grid.

    The input is persisted for the loop: every iteration's aggregate and
    the returned projection read the SAME materialization instead of
    re-deriving the source lineage k times (k+1 source scans → 1 at
    100 TB), and the pinned partition layout makes the seeded randn draws
    stable across the loop by construction, not by luck. Left cached for
    the consumer's first action (repo convention; storage is
    MEMORY_AND_DISK, eviction-safe) — the pin is REGISTERED with
    ml_data_pipeline_spark.cache, so a long-lived session reclaims it with
    release_tracked() once results are materialized (ADVICE r8).
    """
    from ml_data_pipeline_spark.cache import tracked_persist

    if rng == "hash":
        if not key_cols:
            raise ValueError("impute_em_normal: rng='hash' requires key_cols")
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])

        def draw(i: int):
            return _hash_normal(key, i)

    elif rng == "randn":

        def draw(i: int):
            return F.randn(seed + i)

    else:
        raise ValueError(f"impute_em_normal: unknown rng {rng!r}")

    df = tracked_persist(df)
    stats = df.agg(
        F.avg(column).alias("mu"), F.coalesce(F.stddev(column), F.lit(0.0)).alias("sigma")
    ).collect()[0]
    if stats["mu"] is None:
        raise ValueError(
            f"impute_em_normal: column {column!r} has no observed values — "
            "the normal model cannot be initialized"
        )
    mu, sigma = float(stats["mu"]), float(stats["sigma"])
    out = df
    for i in range(max_iter):
        candidate = out.withColumn(
            "__fill",
            F.when(
                F.col(column).isNull(), draw(i) * F.lit(sigma) + F.lit(mu)
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
        F.when(
            F.col(column).isNull(), draw(max_iter) * F.lit(sigma) + F.lit(mu)
        ).otherwise(F.col(column)),
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

def _split_points(df: DataFrame, order_cols: list[str], P: int) -> list[tuple]:
    """Range split points from ONE driver action (replaces the previous
    count() + sample().collect() pair — two actions re-evaluating upstream
    lineage).

    Correctness needs only CONSISTENT split keys — ANY fixed boundaries
    partition the order into contiguous ranges and the carry logic handles
    the rest; balance is purely a performance concern. So the fast path
    takes P-1 approx quantiles of just the FIRST order column (one tiny
    JVM aggregate over a column-pruned scan, no Python worker) and emits
    1-tuple splits; ranges are then balanced by first-column frequency,
    which is what a time/key-ordered dataset gives anyway. Pathological
    first-column skew (one value dominating) degrades parallelism, not
    correctness — hand such data a pre-bucketed layout instead.

    Non-numeric first columns fall back to _sketch_split_points (an Arrow
    bottom-k sketch over the full composite key).
    """
    from pyspark.sql import types as T

    dt = df.schema[order_cols[0]].dataType
    if isinstance(dt, T.NumericType):
        fracs = [i / P for i in range(1, P)]
        # r15: quantiles of a 2% SAMPLE (seeded — deterministic at fixed
        # partitioning), accuracy 2000 kept on the sampled rows. The split
        # points only steer range BALANCE — any consistent boundaries are
        # correct (see caller) — so a sketch over 2% of rows is plenty,
        # and the per-row percentile_approx update (the dominant cost of
        # this job after the scan: 0.37s vs 0.24s bare scan at sf0.1) now
        # touches 50x fewer rows. Sample-induced boundary jitter moves
        # work between ranges, never values between results.
        qs = df.sample(0.02, seed=1715).agg(
            F.percentile_approx(order_cols[0], fracs, 2000).alias("q")
        ).first()["q"]
        if qs is None or not any(v is not None for v in qs):
            # degenerate sample (tiny input): fall back to the full scan
            qs = df.agg(
                F.percentile_approx(order_cols[0], fracs, 2000).alias("q")
            ).first()["q"]
        splits: list[tuple] = []
        for v in qs or []:
            if v is not None and (not splits or splits[-1][0] != v):
                splits.append((v,))
        return splits
    return _sketch_split_points(df, order_cols, P)

def _sketch_split_points(
    df: DataFrame, order_cols: list[str], P: int, per_part: int = 512
) -> list[tuple]:
    """Range split points for `order_cols` from ONE job — the RDD
    RangePartitioner sketch re-expressed over DataFrames; general-type
    fallback for _split_points.

    Each input partition streams its (null-free) order keys through an
    Arrow mapInPandas task that keeps the `per_part` rows with the
    SMALLEST content hashes (a bottom-k sketch — deterministic across
    runs and independent of batch boundaries, unlike an RNG reservoir)
    plus its row count; the driver then walks the weighted, sorted union
    and emits P-1 weighted-quantile boundaries. Driver memory is
    O(input_partitions * per_part) narrow keys.
    """
    from functools import reduce

    keys_df = df.select(*order_cols).where(
        reduce(lambda a, b: a & b, [F.col(x).isNotNull() for x in order_cols])
    )
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in keys_df.schema)
    out_schema = f"{out_fields}, __w double"

    def sketch(batches):
        import pandas as pd

        best = None
        cnt = 0
        for pdf in batches:
            if pdf.empty:
                continue
            cnt += len(pdf)
            pdf = pdf.assign(__u=pd.util.hash_pandas_object(pdf, index=False))
            best = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            best = best.nsmallest(per_part, "__u", keep="first")
        if best is not None and cnt:
            yield best.drop(columns="__u").assign(__w=float(cnt) / len(best))

    sampled = keys_df.mapInPandas(sketch, schema=out_schema).collect()
    if not sampled:
        return []
    weighted: dict[tuple, float] = {}
    for r in sampled:
        k = tuple(r[x] for x in order_cols)
        weighted[k] = weighted.get(k, 0.0) + r["__w"]
    keys = sorted(weighted)
    total = sum(weighted.values())
    n_splits = min(P, len(keys)) - 1
    if n_splits <= 0:
        return []
    splits: list[tuple] = []
    cum, j = 0.0, 1
    for k in keys:
        cum += weighted[k]
        while j <= n_splits and cum >= total * j / (n_splits + 1):
            if not splits or splits[-1] != k:
                splits.append(k)
            j += 1
    return splits

def impute_interpolate_ranged(
    df: DataFrame,
    column: str,
    order_column: str | list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """I4 at scale — the same pandas-parity linear interpolation as
    impute_interpolate, but WITHOUT the global single-task window sort.

    Shape:
    1. repartitionByRange on the order key → P sorted, disjoint ranges;
    2. per-partition prefix windows (partitionBy partition id) find the
       local prev/next non-null — fully parallel;
    3. ONE tiny aggregate (P rows) collects each partition's row count and
       its first/last non-null (value, local position) — the only data that
       must cross partitions;
    4. the driver turns that into per-partition carry-ins (cumulative row
       offsets + nearest non-null on each side) and folds them back in via
       a broadcast map — rows near a partition boundary fall back to the
       carried values.

    Equivalent output to impute_interpolate (tested), but the critical path
    is a parallel sort + per-range windows: it survives 100x data where the
    global-window version serializes on one task.

    The range buckets are NOT repartitionByRange + spark_partition_id —
    that shape forces a cache() (pid stability across the two reads) plus a
    second Exchange, because Catalyst cannot see that RangePartitioning
    output is already clustered by partition id. Instead the split points
    come from ONE sketch job over just the order columns (see
    _split_points — no count(), no second driver action), and __pid is a
    deterministic EXPRESSION (count of split keys <= the row's key):
    both passes stay uncached column-pruned scans with exactly one shuffle
    each, and the summary pass shuffles only (order cols, value). Measured
    at sf0.1/600k rows: 8.1s cold / ~2.2s warm (cached-pid shape) vs
    3.1s cold / ~1.1s warm (expression shape), same hashes.

    Ordering contract: `order_column` must be a TOTAL order (unique key) —
    the summary pass and the main pass each rank rows independently, so
    ties could break differently between the two plans and corrupt the
    boundary-interpolation weights. Callers append tie-breaker columns
    (the gates use (l_orderkey, l_linenumber, l_extendedprice)). NULL
    values in order columns are allowed: they sort first (Spark window
    NULLS FIRST), route to range 0, and match the global baseline.
    """
    order_cols = [order_column] if isinstance(order_column, str) else list(order_column)
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    c = F.col(column)
    asc = [F.col(x).asc() for x in order_cols]
    desc = [F.col(x).desc() for x in order_cols]

    # 1. split points: one bottom-k sketch job over the order key only
    #    (pruned scan) — the RangePartitioner recipe without the count().
    splits = _split_points(df, order_cols, P)
    key_struct = F.struct(*[F.col(x) for x in order_cols])

    def _with_pid(frame: DataFrame) -> DataFrame:
        """Attach __pid = number of split keys <= the row's key, as a plain
        sum of struct comparisons. Spark's struct ordering is TOTAL and
        NULLS FIRST (verified: struct(5, NULL) >= struct(5, 7) evaluates to
        FALSE, not NULL), so rows with NULL key components lose every
        comparison they should lose and land exactly where the window sort
        (and the global baseline) places them — no per-column CASE chain
        needed (a hand-built NULLS-FIRST lexicographic when-chain measured
        6x slower at sf0.1: 10.3s vs 1.7s warm).

        Codegen-friendly; measured ~1.5s warm at
        sf0.1 vs ~12s for both an F.aggregate HOF form — interpreted per
        row — and an unrolled binary search — CollapseProject inlines the
        per-level aliases, exploding the expression tree). Cost is O(P) per
        row, fine up to a few hundred ranges; for P in the thousands hand
        the operator a pre-bucketed layout (skew.write_bucketed) or fall
        back to repartitionByRange + spark_partition_id + persist, trading
        a materialization for the O(log P) partitioner."""
        if not splits:
            return frame.withColumn("__pid", F.lit(0))
        if all(len(s) == 1 and isinstance(s[0], int) for s in splits):
            # fast path: 1-tuple integer splits on the first order column —
            # built as ONE SQL expression string (a single py4j parse) and
            # codegen'd as plain scalar comparisons; ~100 per-Column py4j
            # round-trips were a measurable slice of cold construction.
            # Scalar comparisons (unlike struct ordering) return NULL for
            # NULL keys, which would NULL the whole sum — COALESCE routes
            # NULL keys to range 0, where NULLS-FIRST window order puts
            # them anyway.
            terms_sql = " + ".join(
                f"CAST((`{order_cols[0]}` >= {s[0]}) AS INT)" for s in splits
            )
            return frame.withColumn("__pid", F.expr(f"COALESCE({terms_sql}, 0)"))
        terms = []
        for s in splits:
            if len(s) == 1:
                cmp = F.col(order_cols[0]) >= F.lit(s[0])
            else:
                cmp = key_struct >= F.struct(
                    *[F.lit(v).alias(x) for x, v in zip(order_cols, s)]
                )
            terms.append(cmp.cast("int"))
        return frame.withColumn("__pid", F.coalesce(sum(terms[1:], terms[0]), F.lit(0)))

    w_asc_all = Window.partitionBy("__pid").orderBy(*asc)
    w_fwd = w_asc_all.rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = Window.partitionBy("__pid").orderBy(*desc).rowsBetween(Window.unboundedPreceding, 0)
    lpos = F.row_number().over(w_asc_all)

    # The (__pid, __lpos)-annotated frame is built ONCE and feeds both the
    # boundary summary and the main pass: the Column tree (P comparison
    # terms) is constructed a single time, and both plans rank rows from
    # the same expression. Catalyst prunes the summary branch down to
    # (order cols, value) on its own.
    ann = _with_pid(df).withColumn("__lpos", lpos)

    # 2.+3. boundary summary + carries, fully declarative: a narrow
    # (order cols + value) branch aggregates each range to ONE row, then a
    # P-row window derives cumulative offsets and the nearest non-null on
    # each side. No driver collect / createDataFrame round-trip. The
    # SinglePartition window is the legitimate aggregate-then-window
    # shape: it runs over P rows.
    summ = (
        ann
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.when(c.isNotNull(), F.struct(F.col("__lpos").alias("p"), c.cast("double").alias("v")))).alias("__first_nn"),
            F.max(F.when(c.isNotNull(), F.struct(F.col("__lpos").alias("p"), c.cast("double").alias("v")))).alias("__last_nn"),
        )
    )
    w_pid = Window.orderBy("__pid")
    w_before = w_pid.rowsBetween(Window.unboundedPreceding, -1)
    w_after = w_pid.rowsBetween(1, Window.unboundedFollowing)
    summ = summ.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_before), F.lit(0)).cast("long")
    )
    last_g = F.when(
        F.col("__last_nn").isNotNull(),
        F.struct(
            (F.col("__off") + F.col("__last_nn.p")).alias("p"),
            F.col("__last_nn.v").alias("v"),
        ),
    )
    first_g = F.when(
        F.col("__first_nn").isNotNull(),
        F.struct(
            (F.col("__off") + F.col("__first_nn.p")).alias("p"),
            F.col("__first_nn.v").alias("v"),
        ),
    )
    carries = (
        summ.withColumn("__last_g", last_g)
        .withColumn("__first_g", first_g)
        .select(
            "__pid",
            "__off",
            F.last("__last_g", ignorenulls=True).over(w_before).alias("__cp"),
            F.first("__first_g", ignorenulls=True).over(w_after).alias("__cn"),
        )
        .select(
            "__pid",
            "__off",
            F.col("__cp.p").alias("__cp_p"),
            F.col("__cp.v").alias("__cp_v"),
            F.col("__cn.p").alias("__cn_p"),
            F.col("__cn.v").alias("__cn_v"),
        )
    )

    val_pos = F.when(c.isNotNull(), F.col("__lpos"))
    local_prev_v = F.last(F.when(c.isNotNull(), c), ignorenulls=True).over(w_fwd)
    local_prev_p = F.last(val_pos, ignorenulls=True).over(w_fwd)
    local_next_v = F.last(F.when(c.isNotNull(), c), ignorenulls=True).over(w_bwd)
    local_next_p = F.last(val_pos, ignorenulls=True).over(w_bwd)

    # All four window columns in ONE projection (r15): sequential
    # withColumn calls left four separate Window nodes in the physical
    # plan (each last() forced its own pass over the sorted partition
    # because the _w0 pre-projection between them defeated window
    # grouping); a single select lets ExtractWindowExpressions group them
    # by spec — 2 Window nodes (one asc, one desc) instead of 4, two
    # fewer full passes over every range partition. Same expressions,
    # same values.
    joined = (
        ann
        .select(
            "*",
            local_prev_v.alias("__lprev_v"),
            local_prev_p.alias("__lprev_p"),
            local_next_v.alias("__lnext_v"),
            local_next_p.alias("__lnext_p"),
        )
        .join(F.broadcast(carries), "__pid")
    )
    gpos = F.col("__off") + F.col("__lpos")
    prev_p = F.coalesce(F.col("__off") + F.col("__lprev_p"), F.col("__cp_p"))
    prev_v = F.when(F.col("__lprev_p").isNotNull(), F.col("__lprev_v")).otherwise(F.col("__cp_v"))
    next_p = F.coalesce(F.col("__off") + F.col("__lnext_p"), F.col("__cn_p"))
    next_v = F.when(F.col("__lnext_p").isNotNull(), F.col("__lnext_v")).otherwise(F.col("__cn_v"))
    interp = prev_v + (next_v - prev_v) * (gpos - prev_p) / (next_p - prev_p)
    filled = F.when(c.isNotNull(), c).otherwise(F.coalesce(interp, prev_v, next_v))
    out = joined.withColumn(column, filled).select(*df.columns)
    return out
