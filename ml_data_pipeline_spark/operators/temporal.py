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
    rt = F.col(right_time)

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
        *[F.col(f"__match.{c}").alias(c) for c in rvals],
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
    post-filter; for interval tables small enough, broadcast applies."""
    return left.join(
        right,
        (left[on] == right[on])
        & (left[left_time] >= right[start_col])
        & (left[left_time] < right[end_col]),
        "left",
    ).drop(right[on])
