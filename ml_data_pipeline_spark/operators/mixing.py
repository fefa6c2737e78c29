"""Corpus mixture planning: turn target source weights into per-source
sampling fractions (SURVEY.md §2.9 scale extensions).

Training-data recipes specify a token budget and a target mix over
sources ("60% web, 30% books, 10% code"). Given the actual per-source
token inventory, the plan computes, per source:

- available_tokens: what the corpus holds;
- target_tokens: budget * weight (weights are renormalized over the
  sources actually present);
- sample_frac: min(1, target/available) — the fraction to sample;
- epochs: target/available when > 1 (the recipe wants MORE than the
  source holds → repeat passes; surfaced rather than silently capped).

One map-side-combinable aggregation over the corpus; the arithmetic runs
on the k-row per-source result. Deterministic — the DuckDB oracle
recomputes it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_nonnull_tokens(
    df: DataFrame, token_col: str, what: str = "mixture planning"
) -> None:
    """Loud contract for the mixture planners (r13 review; the balancing
    _require_nonnull_target pattern): a NULL token count corrupts each
    output differently and SILENTLY — sum() skips NULLs so partial NULLs
    undercount a source, and an all-NULL source aggregates to NULL
    available_tokens, where `least(target/NULL, 1.0)` NULL-skips to
    sample_frac = 1.0 (the greatest/least NULL-skip hazard the repo's
    gotcha list documents) and temperature weights go NULL. Count tokens
    upstream or filter the rows. One narrow limit(1) probe."""
    if df.where(F.col(token_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"{what} requires non-NULL token counts; column "
            f"{token_col!r} contains NULLs — count tokens upstream or "
            "drop the rows first"
        )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """(source, available_tokens, weight, target_tokens, sample_frac,
    epochs) for every source named in `weights` that exists in the corpus.
    Weights are renormalized over the present sources so the plan always
    allocates the full budget."""
    if total_tokens <= 0:
        raise ValueError("total_tokens must be positive")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    _require_nonnull_tokens(df.where(F.col(source_col).isin(*weights)), token_col)
    inv = (
        df.where(F.col(source_col).isin(*weights))
        .groupBy(source_col)
        .agg(F.sum(token_col).alias("available_tokens"))
    )
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    with_w = inv.withColumn("__w", wmap[F.col(source_col)])
    total_w = with_w.agg(F.sum("__w")).first()[0]
    if total_w is None:
        raise ValueError(
            "mixture_plan: none of the weighted sources "
            f"{sorted(weights)} exist in the corpus"
        )
    if total_w == 0:
        raise ValueError(
            "mixture_plan: the sources present in the corpus all carry "
            "zero weight — the renormalized plan is undefined"
        )
    target = F.col("__w") / float(total_w) * total_tokens
    ratio = target / F.col("available_tokens")
    return (
        with_w.select(
            source_col,
            "available_tokens",
            F.round(F.col("__w") / float(total_w), 6).alias("weight"),
            F.round(target, 2).alias("target_tokens"),
            F.round(F.least(ratio, F.lit(1.0)), 6).alias("sample_frac"),
            F.round(ratio, 6).alias("epochs"),
        )
        .orderBy(source_col)
    )


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Derive mixture weights from the inventory itself with sampling
    temperature: w_s proportional to n_s^alpha, renormalized. alpha=1 gives
    natural proportions, alpha->0 approaches uniform — the standard
    multilingual/multi-source rule for up-weighting low-resource sources
    without flattening the mix entirely (feeds straight into
    mixture_plan's `weights`).

    One per-source aggregate + a broadcast scalar total; deterministic
    closed form, oracle-exact.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    _require_nonnull_tokens(df, token_col)
    inv = df.groupBy(source_col).agg(F.sum(token_col).alias("available_tokens"))
    pw = F.pow(F.col("available_tokens").cast("double"), float(alpha))
    with_pw = inv.withColumn("__pw", pw)
    tot = with_pw.agg(F.sum("__pw").alias("__tot"))
    return (
        with_pw.join(F.broadcast(tot))
        .select(
            source_col,
            "available_tokens",
            F.round(F.col("__pw") / F.col("__tot"), 6).alias("weight"),
        )
        .orderBy(source_col)
    )
