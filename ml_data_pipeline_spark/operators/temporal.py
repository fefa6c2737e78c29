"""Temporal joins (scale-extension family: as-of / range joins).

The reference has no joins at all (SURVEY.md §2.9); these are the standard
time-series operators a training-data pipeline needs when aligning event
streams with slowly-changing context (features-as-of, point-in-time-correct
labels).

as-of join, Spark-first: the naive formulation (join on key + time filter +
row_number) materializes every (left, right-earlier) pair before pruning —
quadratic per key for long histories. The merge-asof shape used here is the
UNION-SORT-CARRY trick:

    tag left/right rows → unionByName → one window per key ordered by
    (time, right-before-left on ties) → last(right_value, ignorenulls)
    carries the most recent right row forward → keep left rows.

One shuffle on the key, one per-key sort, zero pair blowup — the same plan
shape at 60k rows and at 100 TB (AQE handles key skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str] | None = None,
    tolerance_seconds: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, append the right row with the greatest
    ``right_time <= left_time`` for the same ``on`` key (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics; ``strict=True`` uses
    ``<``). ``tolerance_seconds`` drops matches older than the window.

    Left rows with no earlier right row keep nulls (left-outer semantics).
    A right value column whose name collides with a left column comes back
    suffixed ``_right`` (pandas-merge_asof-style).
    """
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    def ordinal(df: DataFrame, colname: str):
        """Sortable double: numeric as-is; timestamps via unix_micros
        (NTZ/date are not directly castable to double under ANSI)."""
        dt = df.schema[colname].dataType
        if isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
            return F.unix_micros(F.col(colname).cast("timestamp")) / F.lit(1e6)
        return F.col(colname).cast("double")

    rvals = right_values or [c for c in right.columns if c not in (on, right_time)]
    # a right value column shadowing a left column would emit DUPLICATE
    # output names (r10 review: any later select('name') then throws
    # AMBIGUOUS_REFERENCE) — suffix collisions like pandas merge_asof
    out_names = {c: (f"{c}_right" if c in left.columns else c) for c in rvals}

    l_tag = left.withColumn("__t", ordinal(left, left_time)).withColumn("__is_l", F.lit(1))
    r_tag = (
        right.select(
            on,
            ordinal(right, right_time).alias("__t"),
            F.struct(
                ordinal(right, right_time).alias("__rt"), *[F.col(c) for c in rvals]
            ).alias("__rv"),
        )
        .withColumn("__is_l", F.lit(0))
    )
    # allowMissingColumns null-fills each side's absent columns: left rows
    # get __rv = null, right rows get null left attributes
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # ties: strict -> right rows with equal time must NOT match, so left
    # sorts BEFORE right at the same instant; non-strict -> right first.
    # __rv as the final key makes equal-(key, time) right rows resolve
    # deterministically (struct compare → the max-value row wins, matching
    # pandas merge_asof's keep-last-sorted behavior)
    tie = F.when(F.col("__is_l") == (0 if not strict else 1), 0).otherwise(1)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), tie.asc(), F.col("__rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
    out = carried.where(F.col("__is_l") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col("__t") - F.col("__match.__rt").cast("double") <= tolerance_seconds,
                F.col("__match"),
            ),
        )
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in rvals],
    )


def range_join_interval(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    [start, end) per key. Expressed as an equi-join on the key + interval
    predicate — Catalyst turns the conjunction into a hash join with a
    post-filter; for interval tables small enough, broadcast applies.

    Both sides get explicit aliases before the join: when ``right`` is
    DERIVED FROM ``left`` (e.g. intervals built from the same events
    table), ``left[on] == right[on]`` column references resolve ambiguously
    on the shared lineage — the old ``.drop(right[on])`` silently dropped
    the LEFT key and kept the right one, which is NULL for unmatched rows
    (found by the q_interval_join oracle: every unmatched event migrated
    into a NULL key group)."""
    l_al, r_al = left.alias("__rj_l"), right.alias("__rj_r")
    lc = lambda c: F.col(f"__rj_l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"__rj_r.{c}")  # noqa: E731
    cond = (
        (lc(on) == rc(on))
        & (lc(left_time) >= rc(start_col))
        & (lc(left_time) < rc(end_col))
    )
    keep_right = [rc(c).alias(c) for c in right.columns if c != on]
    return l_al.join(r_al, cond, "left").select(
        *[lc(c).alias(c) for c in left.columns], *keep_right
    )

def ewma_last(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Final EWMA value per group: s_n = alpha*x_n + (1-alpha)*s_{n-1},
    s_1 = x_1, evaluated over the group's rows ordered by ``order_col``.

    The recurrence is computed in CLOSED FORM as one weighted sum —
    weight(i) = alpha*(1-alpha)^(N-i) for i>1, (1-alpha)^(N-1) for i=1 —
    so the whole operator is a partitioned window (row_number + per-group
    count) plus one aggregate: no UDF, no iterative loop, no state. Old
    terms underflow to 0.0 in the same IEEE754 way every engine computes
    pow(), which keeps it oracle-checkable. ``order_col`` values must be
    unique within a group (e.g. a date after a daily pre-aggregation) or
    the ordering — and therefore the EWMA — is not well-defined.

    Returns (group_col, n_points, ewma).
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    wall = Window.partitionBy(group_col)
    n = F.row_number().over(w)
    big_n = F.count(F.lit(1)).over(wall)
    decay = F.lit(1.0 - alpha)
    weight = F.when(n == 1, F.pow(decay, (big_n - 1).cast("double"))).otherwise(
        F.lit(alpha) * F.pow(decay, (big_n - n).cast("double"))
    )
    return (
        df.select(F.col(group_col), (weight * F.col(value_col)).alias("__wx"), big_n.alias("__n"))
        .groupBy(group_col)
        .agg(
            F.max("__n").cast("long").alias("n_points"),
            F.round(F.sum("__wx"), 6).alias("ewma"),
        )
        .orderBy(group_col)
    )

def time_weighted_avg(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group TIME-weighted average (TWAP): each observation holds until
    the next one, so its weight is the duration it was in force —
    w_i = t_{i+1} - t_i, the last observation weighted 0 (its holding
    window is unknown; the standard left-closed convention). The correct
    average for irregularly-sampled state series (prices, gauge metrics),
    where the plain avg() over-weights chatty periods.

    One partitioned window (lead over the per-group time sort — shuffle on
    the group key only, no global sort) + one map-side-combinable agg.
    Groups with a single observation have zero total weight and yield NULL
    (nullif guard) — explicitly "no interval to average over".
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(ts_col))
    micros = F.unix_micros(F.col(ts_col))
    dur = (F.lead(micros).over(w) - micros).cast("double")
    weighted = df.select(
        F.col(group_col),
        dur.alias("__w"),
        (dur * F.col(value_col)).alias("__wx"),
    )
    return (
        weighted.groupBy(group_col)
        .agg(
            F.round(
                F.sum("__wx") / F.nullif(F.sum("__w"), F.lit(0.0)), 6
            ).alias("twap"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .orderBy(group_col)
    )


def churn_labels(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    cutoff: str,
    horizon_days: int = 90,
) -> DataFrame:
    """Point-in-time-correct churn label generation: features from
    STRICTLY BEFORE the cutoff, the label from [cutoff, cutoff+horizon)
    — the temporal wall that keeps future information out of training
    features (the leakage class backtesting frameworks exist to prevent).

    Per entity active before cutoff: n_events, total span of activity,
    days_since_last at the cutoff, and churned = no event inside the
    horizon. One aggregate per side of the wall, one left join on the
    entity key; entities first seen after the cutoff are excluded (no
    feature history)."""
    cut = F.lit(cutoff).cast("timestamp")
    # timestamp (not date) arithmetic: a non-midnight cutoff must keep its
    # time of day or the horizon silently shrinks below horizon_days
    horizon_end = cut + F.expr(f"INTERVAL {int(horizon_days)} DAYS")
    # ONE conditional aggregate over ONE scan (filtered to ts < horizon_end,
    # which pushes to the source): the previous past-aggregate + horizon-
    # distinct + join shape read the events table twice and shuffled it
    # twice — at 100 TB the second full scan is the whole cost. The
    # entities-without-pre-cutoff-history exclusion becomes the
    # n_events > 0 filter (identical semantics: such entities had no `past`
    # row before, so the left join never surfaced them).
    past_ts = F.when(F.col(ts_col) < cut, F.col(ts_col))
    in_horizon = (F.col(ts_col) >= cut) & (F.col(ts_col) < horizon_end)
    return (
        events.where(F.col(ts_col) < horizon_end)
        .groupBy(entity_col)
        .agg(
            F.count(past_ts).alias("n_events"),
            F.datediff(cut.cast("date"), F.max(past_ts).cast("date")).alias(
                "days_since_last"
            ),
            F.datediff(
                F.max(past_ts).cast("date"), F.min(past_ts).cast("date")
            ).alias("active_span_days"),
            (F.count(F.when(in_horizon, 1)) == 0).alias("churned"),
        )
        .where(F.col("n_events") > 0)
    )


def golden_record(
    df: DataFrame, entity_col: str, key_col: str, attrs: list[str]
) -> DataFrame:
    """Survivorship merge ("golden record"): per entity, each attribute
    independently takes its value from the most recent record where THAT
    attribute is non-null — attribute-wise survivorship, not row-wise,
    so a stale record can still donate the only non-null phone number
    (the standard MDM merge rule, public practice).

    One groupBy with map-side partial aggregation; each attribute is
    max(struct(key, value)) over non-null values, so determinism needs
    key_col unique per record (compose recency*K + record id upstream).
    """
    aggs = []
    for a in attrs:
        picked = F.max(
            F.when(
                F.col(a).isNotNull(),
                F.struct(F.col(key_col).alias("k"), F.col(a).alias("v")),
            )
        )
        aggs.append(picked.getField("v").alias(a))
    return df.groupBy(entity_col).agg(*aggs)


def rolling_corr(
    df: DataFrame,
    part_col: str,
    date_col: str,
    x_col: str,
    y_col: str,
    window_days: int = 30,
    min_n: int = 10,
) -> DataFrame:
    """Trailing-window Pearson correlation per group per day, built on
    RANGE frames over the day index — a range frame includes every row
    of a tied day, so the result is deterministic under intra-day ties
    (a ROWS frame would not be).

    Exactness contract: x_col/y_col must be INTEGER-valued (the gate
    feeds quantity and price-in-cents) so the six frame sums are exact;
    the correlation is then identical IEEE arithmetic in any engine.
    Frame sums accumulate in 64-bit — at extreme frame sizes move y to a
    coarser unit (the sums, not the correlation, are the overflow
    surface). One row per (group, day) via distinct; frames with fewer
    than min_n points are dropped (degenerate correlations)."""
    d = F.datediff(F.col(date_col).cast("date"), F.lit("1990-01-01").cast("date")).cast(
        "long"
    )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = df.select(F.col(part_col).alias("g"), d.alias("d"), x.alias("x"), y.alias("y"))
    w = (
        Window.partitionBy("g")
        .orderBy("d")
        .rangeBetween(-(window_days - 1), 0)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum("x").over(w).cast("double")
    sy = F.sum("y").over(w).cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).over(w).cast("double")
    syy = F.sum(F.col("y") * F.col("y")).over(w).cast("double")
    sxy = F.sum(F.col("x") * F.col("y")).over(w).cast("double")
    corr = (n * sxy - sx * sy) / F.nullif(
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy), F.lit(0.0)
    )
    return (
        base.select(
            "g",
            "d",
            n.cast("long").alias("n"),
            F.round(corr, 6).alias("corr"),
        )
        .where(F.col("n") >= min_n)
        .distinct()
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    windows: tuple[int, ...] = (1, 7, 28),
) -> DataFrame:
    """Rolling distinct-active-user counts per day (DAU/WAU/MAU for the
    default windows): for each calendar day, how many distinct users
    were active in the trailing w days.

    COUNT DISTINCT over a sliding frame has no native window form; the
    scalable shape is: reduce events to distinct (user, day) — the big
    shrink, event-cardinality to activity-cardinality — then explode
    each activity day to the w report days it supports and count
    distinct users per (report day, window). Fanout is max(windows) per
    activity row, bounded and constant. Report days past the data's last
    day are clipped (no partial trailing windows); the FIRST w-1 days
    necessarily carry partial windows — there is no earlier data to
    complete them — so consumers comparing w-day actives across days
    should start reading at day w."""
    days = df.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    last_day = days.agg(F.max("d").alias("__last"))
    w_max = max(windows)
    contrib = (
        days.select(
            "u", "d", F.explode(F.sequence(F.lit(0), F.lit(w_max - 1))).alias("off")
        )
        .select("u", "d", F.date_add(F.col("d"), F.col("off")).alias("rd"), "off")
        .crossJoin(F.broadcast(last_day))
        .where(F.col("rd") <= F.col("__last"))
    )
    aggs = [
        F.countDistinct(F.when(F.col("off") < w, F.col("u"))).alias(f"active_{w}d")
        for w in windows
    ]
    return (
        contrib.groupBy(F.col("rd").cast("string").alias("day"))
        .agg(*aggs)
        .orderBy("day")
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival estimator with right-censoring (public
    statistics, Kaplan & Meier 1958): at each distinct event time t,
    S(t) = prod over t' <= t of (1 - d_t'/n_t') where d = events at t'
    and n = subjects still at risk entering t'. Censored subjects leave
    the risk set without an event — the estimator survival analysis
    exists for (plain churn rates over-count early droppers).

    Shape: one groupBy to the per-time (d, c) table (time-cardinality-
    sized), a cumulative window for the risk set, and the running
    product computed as exp(cumsum(ln)) — the log-space form that is a
    plain window aggregate. Output rows only at event times (the steps
    of the KM curve): (t, n_risk, d_events, survival)."""
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    # n_risk = subjects leaving at or after t — a reverse window sum over
    # the tiny per-time table, so no eager df.count() action runs the
    # upstream plan twice (review pass r3)
    w = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    at_risk = per_t.withColumn("n_risk", F.sum("leaving").over(w))
    steps = at_risk.where(F.col("d") > 0)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # d == n_risk makes the factor exactly 0 (ln undefined; DuckDB even
    # raises): survival is an ABSORBING zero from that step on, handled
    # as an explicit flag with the zero factor excluded from the log sum
    factor = 1.0 - F.col("d") / F.col("n_risk").cast("double")
    zero_seen = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(wcum)
    log_sum = F.sum(F.log(F.nullif(factor, F.lit(0.0)))).over(wcum)
    surv = steps.withColumn(
        "survival",
        F.round(
            F.when(zero_seen == 1, F.lit(0.0)).otherwise(F.exp(log_sum)), 6
        ),
    )
    return surv.select("t", "n_risk", F.col("d").alias("d_events"), "survival")


def max_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Peak concurrent intervals by sweep line: +1 at each start, -1 at
    each end, running sum over the merged boundary stream, max. Ends
    sort BEFORE starts at the same instant (half-open [start, end)
    intervals — back-to-back sessions don't double-count). The classic
    capacity-planning question (peak concurrent sessions/jobs) in two
    window functions; per-group when group_col is given.

    Scale note: the grouped form is partition-parallel (one window per
    group). The UNGROUPED form runs one global ordered window — a single
    sort task at boundary-stream scale; use max_concurrency_ranged for
    the plan that survives 100x data (same answer, tested hash-equal)."""
    from ml_data_pipeline_spark.cache import tracked_cache

    keys = [group_col] if group_col else []
    # the union's two branches would each re-run the caller's upstream
    # plan (r14 plan audit) — project to the needed columns and cache
    # the narrow interval frame so it runs once
    iv = tracked_cache(df.select(*keys, start_col, end_col))
    starts = iv.select(*keys, F.col(start_col).alias("at"), F.lit(1).alias("delta"))
    ends = iv.select(*keys, F.col(end_col).alias("at"), F.lit(-1).alias("delta"))
    events = starts.unionByName(ends)
    w = Window.partitionBy(*keys).orderBy("at", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = events.withColumn("c", F.sum("delta").over(w))
    return running.groupBy(*keys).agg(F.max("c").alias("max_concurrent"))


def max_concurrency_ranged(
    df: DataFrame,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Ungrouped sweep line at scale (VERDICT r13 item 1) — identical
    semantics to max_concurrency(group_col=None) but the running sum over
    the boundary stream is a ranged prefix sum (profiling.ranged_cumsum:
    repartitionByRange on (at, delta), per-range parallel windows, P-row
    total carry), never a single global sort task.

    Equivalence: the global max of the running sum is invariant to the
    order WITHIN a tie group of equal (at, delta) rows — all rows in a
    tie carry the same delta, so the running sum is monotone across the
    group and its extremum sits at a group boundary in every order. Ends
    still sort before starts at the same instant (delta -1 < +1), the
    half-open-interval convention of the global twin.

    The boundary stream is a UNION of two projections of ``df`` — built
    naively, each branch re-runs the caller's upstream plan (the
    q_max_concurrency gate's user-day aggregation ran TWICE, plan-audit
    r14). The interval frame is therefore projected to its two columns
    and tracked-cached (narrow, spillable, recomputable) before the
    union, so the upstream plan runs once however expensive it was."""
    from ml_data_pipeline_spark.cache import tracked_cache
    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    iv = tracked_cache(df.select(F.col(start_col).alias("__s"), F.col(end_col).alias("__e")))
    starts = iv.select(F.col("__s").alias("at"), F.lit(1).alias("delta"))
    ends = iv.select(F.col("__e").alias("at"), F.lit(-1).alias("delta"))
    events = starts.unionByName(ends)
    running = ranged_cumsum(
        events, ["at", "delta"], ["delta"], num_partitions=num_partitions
    )
    return running.agg(
        F.max("__cum_delta").cast("long").alias("max_concurrent")
    )


def cusum_changepoint(
    series: DataFrame, t_col: str, x_col: str
) -> DataFrame:
    """Single changepoint estimate via the CUSUM statistic (Page 1954,
    public literature): S_i = cumulative sum of (x - mean) in time order;
    the argmax of |S_i| is the classic estimate of where the level shifts.
    Returns one row (change_point, cusum_abs, n_points).

    Input contract: ``series`` is an ALREADY-AGGREGATED (t, x) frame (one
    row per period — e.g. daily counts), so the unpartitioned window is
    bounded by the period cardinality (days/months), never by fact-table
    rows. The corpus-sized pass is the caller's groupBy that produced the
    series. Use integer x (counts) when cross-engine bit-parity matters:
    the cumulative float adds then run in identical order on both engines.

    Scale shape: scalar (mean, n) attached via broadcast crossJoin; one
    bounded window; TakeOrderedAndProject for the argmax (no global sort).
    ``series`` feeds two branches (stats + cumulative scan), so it is
    localCheckpoint-ed — without it each branch re-runs the caller's
    corpus-sized aggregation (same lineage-truncation pattern as
    graph.py:112).
    """
    series = series.localCheckpoint(eager=True)
    stats = series.agg(
        F.avg(F.col(x_col)).alias("__m"), F.count(F.lit(1)).alias("__n")
    )
    w = Window.orderBy(t_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        series.crossJoin(F.broadcast(stats))
        .withColumn("__s", F.sum(F.col(x_col) - F.col("__m")).over(w))
        .withColumn("__abs", F.abs(F.col("__s")))
    )
    return (
        cum.orderBy(F.desc("__abs"), F.asc(t_col))
        .limit(1)
        .select(
            F.col(t_col).alias("change_point"),
            F.round("__abs", 6).alias("cusum_abs"),
            F.col("__n").alias("n_points"),
        )
    )


def mann_kendall_trend(
    series: DataFrame, t_col: str, x_col: str
) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope (Mann 1945, Kendall 1975,
    Sen 1968 — the standard nonparametric "is this series trending"
    answer). Returns one row: n_points, s_stat, var_s (tie-corrected),
    z_score, sen_slope.

    Input contract: ``series`` is an ALREADY-AGGREGATED (t, x) frame with
    NUMERIC t (e.g. month index) — the pairwise self-join is O(n²) in the
    PERIOD count (84 months → 3.5k pairs), never in fact rows; the
    corpus-sized pass is the caller's aggregation. Integer x and t give
    bit-exact cross-engine slopes ((int-int)/(int-int) is one IEEE
    division).

    Sen slope median is selected EXPLICITLY (avg of the two middle sorted
    slopes via row_number) rather than percentile_cont: engines disagree
    on interpolation arithmetic (l+(h-l)*f vs (l+h)/2) in the last ulp,
    while element selection + one avg is bit-identical everywhere.

    ``series`` feeds four branches (both join sides, tie groups, n) and
    the pair frame three — localCheckpoint both, or every branch re-runs
    the caller's corpus-sized aggregation (plan-audited: 8 input scans
    before; same pattern as graph.py:112).
    """
    series = series.localCheckpoint(eager=True)
    a = series.select(F.col(t_col).alias("__ta"), F.col(x_col).alias("__xa"))
    b = series.select(F.col(t_col).alias("__tb"), F.col(x_col).alias("__xb"))
    pairs = a.join(F.broadcast(b), F.col("__tb") > F.col("__ta")).select(
        F.signum(F.col("__xb") - F.col("__xa")).alias("__sgn"),
        (
            (F.col("__xb") - F.col("__xa")).cast("double")
            / (F.col("__tb") - F.col("__ta")).cast("double")
        ).alias("__slope"),
    ).localCheckpoint(eager=True)
    s_and_np = pairs.agg(
        F.sum("__sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).alias("__np"),
    )
    # tie correction: sum over tie groups of t*(t-1)*(2t+5)
    ties = (
        series.groupBy(x_col)
        .agg(F.count(F.lit(1)).alias("__t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
                ),
                F.lit(0),
            ).alias("__tie_term"),
            F.count(F.lit(1)).alias("__ng"),
        )
    )
    n_row = series.agg(F.count(F.lit(1)).alias("n_points"))
    wm = Window.orderBy("__slope")
    ranked = pairs.withColumn("__rn", F.row_number().over(wm))
    # lower/upper median positions (1-indexed): floor((np+1)/2), floor(np/2)+1
    # — equal when np is odd, adjacent when even; avg of the two is the median
    median = (
        ranked.crossJoin(F.broadcast(s_and_np.select("__np")))
        .where(
            (F.col("__rn") == F.floor((F.col("__np") + 1) / 2))
            | (F.col("__rn") == F.floor(F.col("__np") / 2) + 1)
        )
        .agg(F.avg("__slope").alias("sen_slope"))
    )
    out = (
        n_row.crossJoin(F.broadcast(s_and_np))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(median))
    )
    n = F.col("n_points")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("__tie_term")
    ).cast("double") / F.lit(18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.nullif(F.sqrt(var_s), F.lit(0.0)))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.nullif(F.sqrt(var_s), F.lit(0.0)))
        .otherwise(F.lit(0.0))
    )
    return out.select(
        "n_points",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z_score"),
        F.round("sen_slope", 6).alias("sen_slope"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator with right-censoring
    (Nelson 1972 / Aalen 1978, public statistics) — the additive sibling
    of kaplan_meier above: H(t) = sum over event times t' <= t of
    d_t'/n_t'. Preferred over -ln(KM) when hazard increments themselves
    are the quantity of interest, and defined even after a step where
    d == n_risk (no absorbing-zero special case — the sum just grows).

    Same shape as kaplan_meier: one groupBy to the per-time (d, leaving)
    table (time-cardinality-sized), a reverse window sum for the risk
    set, a forward window sum for the hazard — everything after the
    aggregate runs on the bounded per-time frame. Variance (Klein 1991
    simple form) sum d/n² accumulates in the same window. Output rows at
    event times: (t, n_risk, d_events, cum_hazard, var_hazard).
    """
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    at_risk = per_t.withColumn("n_risk", F.sum("leaving").over(w))
    steps = at_risk.where(F.col("d") > 0)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    nr = F.col("n_risk").cast("double")
    hz = F.sum(F.col("d") / nr).over(wcum)
    vz = F.sum(F.col("d") / (nr * nr)).over(wcum)
    return steps.select(
        "t",
        "n_risk",
        F.col("d").alias("d_events"),
        F.round(hz, 6).alias("cum_hazard"),
        F.round(vz, 6).alias("var_hazard"),
    )


def acf(
    df: DataFrame,
    value_col: str,
    order_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Autocorrelation function at lags 1..``max_lag`` of an ordered
    series (Box & Jenkins, public time-series statistics):
    r_k = sum_{t>k} (x_t - x̄)(x_{t-k} - x̄) / sum_t (x_t - x̄)² — the
    standard biased estimator (denominator over the FULL series), which
    keeps |r_k| <= 1 and matches statsmodels' default.

    The caller pre-aggregates to one row per ``order_col`` (same contract
    as ewma_last), so the single ordered window here runs over the
    AGGREGATED series — bounded by the order key's cardinality (e.g. ~2.5k
    days for a 7-year daily series), never by row count. All max_lag lag
    columns come out of ONE window pass; the mean/variance ride in via a
    broadcast scalar frame. Returns (lag, n_pairs, acf) rows, lag asc.
    """
    # the series feeds both the lag window and the mean/variance aggregate;
    # materialize it once so the (usually expensive) upstream aggregation
    # isn't derived twice by the lazy plan. The frame is order-cardinality
    # sized — the cheapest possible checkpoint.
    series = df.select(
        F.col(order_col).alias("__o"), F.col(value_col).cast("double").alias("__x")
    ).localCheckpoint()
    w = Window.orderBy("__o")
    base = series.select(
        "__x",
        *[F.lag("__x", k).over(w).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )
    stats = base.agg(
        F.avg("__x").alias("__m"),
        (F.var_pop("__x") * F.count(F.lit(1))).alias("__ss"),
    )
    j = base.crossJoin(F.broadcast(stats))
    pairs = []
    for k in range(1, max_lag + 1):
        pairs += [
            F.lit(k),
            (F.col("__x") - F.col("__m")) * (F.col(f"__l{k}") - F.col("__m")),
        ]
    stacked = j.select(
        F.stack(F.lit(max_lag), *pairs).alias("lag", "__prod"), F.col("__ss")
    )
    return (
        stacked.where(F.col("__prod").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("__prod") / F.nullif(F.first("__ss"), F.lit(0.0)), 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966, public survival statistics):
    does group A's survival curve differ from group B's, with censoring
    handled the same way kaplan_meier handles it? At each pooled event
    time: O-E contribution d_a - d·n_a/n and the hypergeometric variance
    d·(n_a/n)·(1-n_a/n)·(n-d)/(n-1); chi2 = (Σ(O-E))²/ΣV on 1 dof. The
    significance test to pair with the KM curves the dashboard draws.

    Shape (aggregate-then-window, same bound as kaplan_meier): one
    groupBy collapses subjects to the per-time (d, leaving) table per
    group — time-cardinality-sized — then reverse-cumsum windows build
    both risk sets and a 1-row aggregate finishes. n=1 times contribute
    zero variance (guarded NULL→0, not a crash). Returns one row
    (n_a, n_b, observed_a, expected_a, chi2).
    """
    is_a = F.col(group_col) == group_a
    per = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.when(is_a & F.col(event_col).cast("boolean"), 1).otherwise(0)).alias("d1"),
            F.sum(F.when(is_a, 1).otherwise(0)).alias("l1"),
            F.sum(F.when(~is_a & F.col(event_col).cast("boolean"), 1).otherwise(0)).alias("d2"),
            F.sum(F.when(~is_a, 1).otherwise(0)).alias("l2"),
        )
    )
    w = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    at_risk = per.withColumn("n1", F.sum("l1").over(w)).withColumn(
        "n2", F.sum("l2").over(w)
    )
    d = F.col("d1") + F.col("d2")
    n = (F.col("n1") + F.col("n2")).cast("double")
    e1 = d * F.col("n1") / n
    v1 = (
        d
        * (F.col("n1") / n)
        * (1 - F.col("n1") / n)
        * (n - d)
        / F.nullif(n - 1, F.lit(0.0))
    )
    # no d>0 filter: zero-event times contribute exactly 0 to O-E and V,
    # and keeping them makes max(n1/n2) the TRUE group sizes even when
    # some subjects are censored before the first event time
    agg = at_risk.agg(
        F.max("n1").cast("long").alias("n_a"),
        F.max("n2").cast("long").alias("n_b"),
        F.sum("d1").cast("long").alias("observed_a"),
        F.round(F.sum(e1), 6).alias("expected_a"),
        F.sum(F.col("d1") - e1).alias("__oe"),
        F.sum(F.coalesce(v1, F.lit(0.0))).alias("__v"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "observed_a",
        "expected_a",
        F.round(
            F.col("__oe") * F.col("__oe") / F.nullif(F.col("__v"), F.lit(0.0)), 6
        ).alias("chi2"),
    )
