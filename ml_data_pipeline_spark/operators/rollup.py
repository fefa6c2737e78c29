"""Incremental aggregate maintenance (materialized-rollup merge).

At 100 TB you cannot recompute a corpus-wide rollup because one day of new
data arrived; you merge the new partition's PARTIAL aggregates into the
stored rollup. That works exactly for the decomposable aggregates
(sum/count/min/max — and avg carried as sum+count); the merge is an
aggregation over (|keys| x 2) rows per key, not over the corpus.

The same idea powers Spark's own partial aggregation; this operator lifts it
across batch boundaries with plain DataFrames over versioned parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge function per aggregate kind: how two partial states combine
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts ADD across partials
    "min": F.min,
    "max": F.max,
}


def aggregate_partial(
    df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Compute the partial-aggregate state of `df`: spec maps output column
    -> (kind, source column), kind in {sum,count,min,max}."""
    aggs = []
    for out, (kind, src) in sorted(spec.items()):
        if kind == "count":
            aggs.append(F.count(F.col(src)).cast("long").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(F.col(src)).alias(out))
        else:
            aggs.append(_MERGE[kind](F.col(src)).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    base: DataFrame, delta: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge two partial-aggregate states (same schema) into one: union then
    re-aggregate each value column with its MERGE function (sum/count add,
    min/max fold). Associative and commutative, so batches can arrive in any
    order and the result equals the from-scratch aggregate."""
    merged = base.unionByName(delta)
    aggs = [
        _MERGE[kind](F.col(out)).alias(out) for out, (kind, _src) in sorted(spec.items())
    ]
    return merged.groupBy(*keys).agg(*aggs)


def finalize_avg(df: DataFrame, sum_col: str, count_col: str, out: str) -> DataFrame:
    """avg is not directly mergeable — carry (sum, count) in the rollup and
    finalize at read time."""
    return df.withColumn(out, F.col(sum_col) / F.col(count_col))
