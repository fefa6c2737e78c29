"""Event-funnel and cohort analytics over an events stream table.

Reference scope: the reference app has no funnel/cohort tooling; these are
scale extensions in the SURVEY.md §2.9 spirit (product-analytics staples any
engine replacing it at 100 TB would be asked for).

Design: both operators reduce events to ONE map-side-combinable groupBy on
user_id; the funnel walk is a higher-order array fold over each user's
time-sorted events (per-user event counts are session-bounded, so the
collected arrays stay small relative to partitions even at 100 TB — the same
assumption Spark's own sessionization examples make). No joins proportional
to the number of funnel stages, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion counts: a user reaches stage k when events
    matching stages[0..k] occur at strictly increasing timestamps (the
    classic first-view -> first-later-click -> ... definition; equivalent to
    the k-fold min-after-min join chain, computed in one pass).

    Per user: sort_array(collect_list(struct(ts, type))) then one
    F.aggregate walk carrying (reached, last_ts); then a stage-cardinality
    rollup. Shuffles once on user_id; the walk is a codegen'd array
    expression. Returns (stage_idx, stage, n_users, conversion) with
    conversion = n_users / previous stage's n_users.
    """
    ev = df.select(
        F.col(user_col).alias("u"),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("t"), F.col(type_col).alias("s")
        ).alias("e"),
    )
    stage_arr = F.array(*[F.lit(s) for s in stages])
    walk = F.aggregate(
        F.sort_array(F.collect_list("e")),
        # NULL last_t init, not a -1 sentinel (r10 review: a pre-epoch
        # event has unix_micros <= -1 and could never start the funnel)
        F.struct(F.lit(0).alias("reached"), F.lit(None).cast("long").alias("last_t")),
        lambda acc, e: F.when(
            (acc["reached"] < len(stages))
            & (e["s"] == F.element_at(stage_arr, acc["reached"] + 1))
            & (acc["last_t"].isNull() | (e["t"] > acc["last_t"])),
            F.struct(
                (acc["reached"] + 1).alias("reached"), e["t"].alias("last_t")
            ),
        ).otherwise(acc),
        lambda acc: acc["reached"],
    )
    per_user = ev.groupBy("u").agg(walk.alias("reached"))
    # n_users at stage k = users with reached >= k (cheap: stage count is
    # tiny). Every declared stage gets a row — a zero-user stage emits
    # n_users=0 instead of vanishing (r10 review: the oracle and any
    # full-funnel consumer expect len(stages) rows always)
    spark = df.sparkSession
    all_stages = spark.range(1, len(stages) + 1).select(
        F.col("id").cast("int").alias("stage_idx")
    )
    counts = (
        per_user.select(
            F.explode(
                F.filter(
                    F.sequence(F.lit(1), F.lit(len(stages))),
                    lambda k: k <= F.col("reached"),
                )
            ).alias("stage_idx")
        )
        .groupBy("stage_idx")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .join(all_stages, "stage_idx", "right")
        .select("stage_idx", F.coalesce("n_users", F.lit(0)).alias("n_users"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("stage_idx")
    return (
        counts.withColumn(
            "stage", F.element_at(stage_arr, F.col("stage_idx"))
        )
        .withColumn(
            "conversion",
            F.round(
                F.col("n_users")
                # nullif: a stage AFTER an empty one has conversion NULL
                # (0/0 is undefined, and ANSI would crash), not a fake 0
                / F.nullif(
                    F.coalesce(F.lag("n_users").over(w), F.col("n_users")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                6,
            ),
        )
        .select("stage_idx", "stage", "n_users", "conversion")
        .orderBy("stage_idx")
    )


def cohort_retention(
    df: DataFrame,
    max_offset_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity date; for each
    day offset 0..max_offset_days, how many of the cohort were active.

    Two aggs (first day per user; distinct user-days) and one join on
    user_id — the joined sides are user-cardinality, not event-cardinality,
    so the event table is reduced before anything wide happens."""
    days = df.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    first = days.groupBy("u").agg(F.min("d").alias("cohort_day"))
    return (
        days.join(first, "u")
        .withColumn("day_offset", F.datediff(F.col("d"), F.col("cohort_day")))
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("u").alias("n_users"))
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


def attribution_credit(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    window_days: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Multi-model marketing attribution in one plan: for every
    conversion, credit the touchpoints in the preceding `window_days`
    under first-touch, last-touch, and linear models simultaneously,
    aggregated per touch channel.

    The conversion-touch pairing is a user-key equi-join with a bounded
    time-range filter (the window bounds the fanout — same shape as the
    gated interval join); per-conversion ranks are windows partitioned by
    the conversion id with (ts, id) tie-breaks, so credit assignment is
    deterministic. Output: (channel, n_touches, first_touch, last_touch,
    linear) — the three models agree on total credit mass (= number of
    credited conversions), which the gate's oracle re-derives."""
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__conv"),
        F.col(ts_col).alias("__cts"),
    )
    touch = events.where(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("channel"),
        F.col(ts_col).alias("__tts"),
    )
    j = conv.join(touch, "__u").where(
        (F.col("__tts") < F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.expr(f"INTERVAL {window_days} DAYS"))
    )
    from pyspark.sql import Window

    # partition by (user, conversion): conversion ids are only assumed
    # unique per user, not globally
    wc = Window.partitionBy("__u", "__conv")
    first_rn = F.row_number().over(
        wc.orderBy(F.asc("__tts"), F.asc("__tid"))
    )
    last_rn = F.row_number().over(
        wc.orderBy(F.desc("__tts"), F.desc("__tid"))
    )
    credited = j.select(
        "channel",
        (first_rn == 1).cast("double").alias("__first"),
        (last_rn == 1).cast("double").alias("__last"),
        (F.lit(1.0) / F.count(F.lit(1)).over(wc)).alias("__linear"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("__first"), 6).alias("first_touch"),
        F.round(F.sum("__last"), 6).alias("last_touch"),
        F.round(F.sum("__linear"), 6).alias("linear"),
    )


def event_patterns(
    events: DataFrame,
    patterns: dict[str, str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """CEP-lite pattern detection over per-user event journeys: each
    user's events collapse to an ordered initial-letter string (the
    journey), and each named regex pattern is counted against it —
    adjacency ('vcp'), gated subsequences ('v[^p]*c[^p]*p'), whatever
    the regex class both engines share expresses.

    Ordering is deterministic: sort_array over (ts, id, initial) structs,
    not collect_list order (which is partition-dependent). The journey
    array is per-user-cardinality — the same bound every sessionizer in
    this repo documents; pathological users need a pre-split upstream.
    Counting is regexp_count (non-overlapping, leftmost — the semantics
    RE2 and Java regex agree on for the literal/char-class patterns this
    is meant for). Rows with a NULL timestamp are excluded up front —
    NULLs sort first in Spark's sort_array but last in SQL ORDER BY, so
    keeping them would make the journey string engine-dependent."""
    events = events.where(F.col(ts_col).isNotNull())
    seq = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(id_col).alias("i"),
                F.substring(F.col(type_col), 1, 1).alias("c"),
            )
        )
    )
    journeys = events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"), seq.alias("__seq")
    )
    journeys = journeys.withColumn(
        # nullReplacement keeps a NULL-typed event VISIBLE in the journey
        # ('?' placeholder) instead of silently splicing its neighbors
        # together into a false adjacency (r10 review) — n_events and
        # journey length stay consistent
        "journey",
        F.array_join(F.transform("__seq", lambda x: x.getField("c")), "", "?"),
    ).drop("__seq")
    for name, pat in patterns.items():
        journeys = journeys.withColumn(
            name, F.regexp_count(F.col("journey"), F.lit(pat))
        )
    return journeys
