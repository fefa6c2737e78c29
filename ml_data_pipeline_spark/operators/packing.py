"""Sequence packing: assign documents to fixed token-budget bins — the
batching step between a cleaned corpus and a training run (SURVEY.md §2.9
scale extensions).

Deterministic OFFSET packing: within each partition group, documents are
laid out in a fixed order (order_col) and a document's bin is
floor(start_offset / budget), where start_offset is the exclusive running
sum of token counts. Properties:

- deterministic: pure function of (group, order, token counts) — no RNG,
  no partition-layout dependence, reproducible across engines (the DuckDB
  oracle recomputes it exactly);
- bounded overflow: a bin's token total is < budget + max_doc_tokens
  (the one document that straddles a boundary joins the bin its offset
  falls in). True first-fit bin packing is sequential by nature; offset
  packing is the standard scalable approximation (same shape used by
  block-based corpus shuffling).

Scale: the running sum is a window per PARTITION GROUP (e.g. source,
shard, language) — one sort per group, all groups in parallel. A single
global packing order would serialize into one sort task (the same trap as
global interpolation — see imputation.impute_interpolate_ranged); at
100 TB you pack within shards, which is also what data-locality wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    partition_col: str | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Add `bin_col`: the token-budget bin each row packs into, computed
    per partition group in the deterministic order_col order. Rows whose
    token count exceeds `budget` get a bin of their own (their offset
    starts a new bin by construction of the running sum)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    # loud NULL contract (r13 review, shared with the mixture planners):
    # sum() over the offset window SKIPS NULLs, so a NULL-count document
    # silently packs at zero width — it lands in a bin whose real token
    # total is then unknown, voiding the < budget + max_doc bound the
    # docstring promises. Count tokens upstream or drop the rows.
    # r14 (ADVICE): guarded IN-PLAN per row instead of an eager probe
    # scan — clean data pays one codegen'd null test, streaming inputs
    # work, and any action touching a NULL-count row raises loudly.
    # r15 (ADVICE): the guard is INSIDE the windowed sum, not only on the
    # row's own token — under a pruned/partial action (limit, pushed
    # filter) a row ordered AFTER a NULL-count document could otherwise
    # be returned with a silently undercounted offset without the
    # NULL row itself ever materializing. Now ANY action that evaluates
    # the window over a partition containing a NULL raises (WindowExec
    # walks the whole partition, so this covers every row of the group).
    from .mixing import _null_token_message

    w = (
        Window.partitionBy(partition_col).orderBy(order_col)
        if partition_col
        else Window.partitionBy().orderBy(order_col)
    )
    msg = _null_token_message(token_col, "sequence packing")
    tok_guarded = F.when(
        F.col(token_col).isNull(), F.raise_error(F.lit(msg))
    ).otherwise(F.col(token_col))
    start = F.coalesce(
        F.sum(tok_guarded).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    guarded = F.when(
        F.col(token_col).isNull(), F.raise_error(F.lit(msg))
    ).otherwise(F.floor(start / budget))
    return df.withColumn(bin_col, guarded.cast("long"))


def pack_stats(
    packed: DataFrame,
    token_col: str = "n_tokens",
    partition_col: str | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Per-bin audit: document count and token total — the view used to
    check fill efficiency (avg tokens/bin vs budget) before training."""
    keys = ([partition_col] if partition_col else []) + [bin_col]
    return (
        packed.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("bin_tokens"),
        )
        .orderBy(*keys)
    )
