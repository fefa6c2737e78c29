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
    n, total, vmax = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
    state.update((n, total, vmax))
    state.setTimeoutDuration(60 * 60 * 1000)  # 1h idle → expire
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [vmax],
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
