"""Data-selection importance weights (DSIR-style, unigram variant).

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023) select pretraining documents by the
log-likelihood ratio of a TARGET-domain language model to the RAW-corpus
language model over hashed n-gram features. This module implements the
unigram-LM form of that estimator as pure DataFrame aggregations —
no sampling, no Python in the loop, fully deterministic:

    w(doc) = (1/|doc|) * sum_{token t in doc}
             [ log P_target(t) - log P_raw(t) ]

with add-``smoothing`` Laplace estimates over the raw-corpus vocabulary.
Per-token (not per-doc-sum) normalization keeps the weight comparable
across document lengths, which is what a top-k selection needs.

Scale shape (100 TB):
- one posexplode of tokens; word statistics are ONE groupBy(word) with
  conditional sums (map-side combined), so the shuffle carries
  (word, target_count, raw_count) — vocabulary-sized, not corpus-sized;
- the per-token join back to word stats is an equi-join on the word key
  that Catalyst broadcasts while the vocab fits (100M-word vocabs at
  ~24 B/row still fit a 4 GB broadcast; beyond that it degrades to a
  shuffle join on the same key, still linear);
- the final per-document reduce is one groupBy(id) sum.

The reference app has no corpus-selection surface; this extends the
LLM-pipeline operator set (SURVEY.md §2 'beyond the reference' scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.text import _tokens


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
) -> DataFrame:
    """(id, n_tokens, avg_log_ratio) for EVERY input document.

    ``is_target`` marks the in-domain subset whose unigram distribution
    defines P_target; P_raw comes from the full input. Documents with no
    tokens get a NULL weight (explicit, never silently dropped).
    """
    # tokenize once (the bigram_logprob recipe): the word-stats chain, the
    # per-token scoring join and the id-coverage join all read this frame
    # (plan_audit r5: 4 scans without it)
    base = df.select(
        F.col(id_col).alias("id"),
        is_target.cast("int").alias("__t"),
        _tokens(F.col(text_col)).alias("__toks"),
    ).localCheckpoint()
    toks = base.select("id", "__t", F.explode("__toks").alias("tok"))
    # vocabulary-sized; feeds totals AND the scored map — materialize so
    # neither branch re-explodes the corpus
    stats = toks.groupBy("tok").agg(
        F.sum("__t").alias("__ct"),
        F.count(F.lit(1)).alias("__cr"),
    ).localCheckpoint()
    totals = stats.agg(
        F.sum("__ct").alias("__nt"),
        F.sum("__cr").alias("__nr"),
        F.count(F.lit(1)).alias("__v"),
    )
    a = float(smoothing)
    scored = stats.crossJoin(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("__ct") + a) / (F.col("__nt") + a * F.col("__v")))
            - F.log((F.col("__cr") + a) / (F.col("__nr") + a * F.col("__v")))
        ).alias("__lr"),
    )
    per_doc = (
        toks.join(scored, "tok")
        .groupBy("id")
        .agg(F.sum("__lr").alias("__sum"), F.count(F.lit(1)).alias("n_tokens"))
        .select("id", "n_tokens", (F.col("__sum") / F.col("n_tokens")).alias("avg_log_ratio"))
    )
    return (
        base.select("id")
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_log_ratio",
        )
        .orderBy("id")
    )


def dsir_select(
    df: DataFrame,
    is_target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k selection by importance weight, fully deterministic.

    Ranks on the ROUNDED weight (``round_dp`` decimals) with the id as
    tie-break, so the selection is reproducible bit-for-bit across
    engines and partitionings; adds rank + a selected flag rather than
    filtering, so the caller sees the whole ranked corpus.

    The rank covers ONE ROW PER DOCUMENT (not per token) — at 100 TB of
    text still ~10^10 rows, so since r14 it runs on profiling.ranged_rank
    (range-partitioned parallel sort + P-row offset carry) instead of a
    single unpartitioned window task. desc-nulls-last order is encoded
    ascending as (is-null flag, negated weight, id): the negation is
    exact for IEEE doubles and NULL weights group last with the same
    id tie-break the old window used. Zero-token documents rank last.

    NaN policy (r15, pinned deliberately — the qini ADVICE's flip in
    reverse): negation places NaN-weight documents LAST among non-null
    weights, i.e. EXCLUDED from the top-k. A literal F.desc would rank
    NaN FIRST (Spark orders NaN above all doubles) and silently SELECT
    undefined-weight documents — the unsafe direction for a data
    curation filter. dsir_weights' smoothing keeps log ratios finite,
    so NaN is unreachable from this module's own math; the policy
    matters only for externally-supplied weight columns.
    """
    from ml_data_pipeline_spark.operators.profiling import ranged_rank

    w = dsir_weights(df, is_target, text_col, id_col, smoothing)
    rounded = F.round("avg_log_ratio", round_dp)
    keyed = w.select(
        "id", "n_tokens", rounded.alias("avg_log_ratio")
    ).withColumn(
        "__null_last", F.col("avg_log_ratio").isNull().cast("int")
    ).withColumn("__negw", -F.col("avg_log_ratio"))
    ranked = ranged_rank(keyed, ["__null_last", "__negw", "id"], out_col="__rr")
    return ranked.select(
        "id",
        "n_tokens",
        "avg_log_ratio",
        F.col("__rr").cast("int").alias("rank"),
        # zero-token docs (NULL weight) rank last AND are never selected,
        # even when k exceeds the weighted-document count (r10 review:
        # they used to backfill the selection with empty documents)
        ((F.col("__rr") <= k) & F.col("avg_log_ratio").isNotNull()).alias("selected"),
    ).orderBy("id")
