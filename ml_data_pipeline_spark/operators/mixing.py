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


def _null_token_message(token_col: str, what: str = "mixture planning") -> str:
    """Loud contract shared by the mixture planners and sequence packing
    (r13 review; the balancing _require_nonnull_target pattern): a NULL
    token count corrupts each output differently and SILENTLY — sum()
    skips NULLs so partial NULLs undercount a source, an all-NULL source
    aggregates to NULL available_tokens where `least(target/NULL, 1.0)`
    NULL-skips to sample_frac = 1.0 (the greatest/least NULL-skip hazard
    the repo's gotcha list documents), temperature weights go NULL, and a
    NULL-count document packs at zero width. Count tokens upstream or
    filter the rows.

    r14 (ADVICE): the former limit(1).count() probe paid a full extra
    scan in the clean-data common case (the filter cannot short-circuit
    when nothing matches) and broke on streaming inputs (count() is
    unsupported there). The check is now folded into each operator's own
    plan — a NULL tally alongside the aggregation it already runs
    (mixture_plan raises a driver ValueError from the action it already
    takes; temperature_weights raises in-plan via F.raise_error), or a
    per-row in-plan guard (pack_sequences) — so clean data pays nothing."""
    return (
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
    inv = (
        df.where(F.col(source_col).isin(*weights))
        .groupBy(source_col)
        # NULL tally rides the inventory aggregation (see
        # _null_token_message) — no separate probe scan
        .agg(
            F.sum(token_col).alias("available_tokens"),
            F.sum(F.col(token_col).isNull().cast("long")).alias("__nnull"),
        )
    )
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    with_w = inv.withColumn("__w", wmap[F.col(source_col)])
    head = with_w.agg(
        F.sum("__w").alias("__tw"), F.sum("__nnull").alias("__nn")
    ).first()
    total_w = head["__tw"]
    if (head["__nn"] or 0) > 0:
        raise ValueError(_null_token_message(token_col))
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
    inv = df.groupBy(source_col).agg(
        F.sum(token_col).alias("available_tokens"),
        # NULL tally rides the inventory aggregation; the operator stays
        # a single lazy plan (streaming-safe), so the contract raises
        # IN-PLAN at action time (see _null_token_message)
        F.sum(F.col(token_col).isNull().cast("long")).alias("__nnull"),
    )
    pw = F.pow(F.col("available_tokens").cast("double"), float(alpha))
    with_pw = inv.withColumn("__pw", pw)
    tot = with_pw.agg(
        F.sum("__pw").alias("__tot"), F.sum("__nnull").alias("__tnull")
    )
    return (
        with_pw.join(F.broadcast(tot))
        .select(
            source_col,
            "available_tokens",
            F.when(
                F.col("__tnull") > 0,
                F.raise_error(F.lit(_null_token_message(token_col))),
            )
            .otherwise(F.round(F.col("__pw") / F.col("__tot"), 6))
            .alias("weight"),
        )
        .orderBy(source_col)
    )
