"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 scale extension; the escape hatch when built-in windowed
aggs can't express the semantics).

Demonstrator: per-user RUNNING statistics (event count, value sum, max)
maintained in explicit group state across micro-batches, emitted on every
update. The state is a fixed-width tuple per user — the state store holds
O(distinct users), not O(events); processing-time timeout expires idle
users so 100 TB streams with churning key spaces don't grow state forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("n_vals", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle user: drop state, emit nothing (the summary already went out
        # with the last update)
        state.remove()
        return
    n, n_vals, total, vmax = state.get if state.exists else (0, 0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        # SQL NULLs arrive as NaN through Arrow — skip them, matching
        # F.sum/F.max (r10 review: the old fold summed NaN-as-0 and kept a
        # -inf max sentinel for all-NULL users, diverging from the batch
        # twin and leaking -Infinity into output). Limitation: a GENUINE
        # NaN double is indistinguishable from NULL in the Arrow float
        # column, so it is skipped too, where batch F.sum would propagate
        # it — acceptable for a stats fold, and the only choice without
        # nullable-masked transfer.
        vals = pdf["value"].dropna()
        if len(vals):
            n_vals += len(vals)
            total += float(vals.sum())
            m = float(vals.max())
            vmax = m if vmax is None else max(vmax, m)
    state.update((n, n_vals, total, vmax))
    state.setTimeoutDuration(60 * 60 * 1000)  # 1h idle → expire
    # a user with NO non-null values yet reports NULL sum/max — exactly
    # the batch F.sum/F.max answer — never 0.0 / -inf
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": pd.array(
                [total if n_vals else None], dtype="Float64"
            ),
            "max_value": pd.array([vmax], dtype="Float64"),
        }
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) with explicit state + idle
    timeout. Update-mode output: one row per user per micro-batch touched."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
