"""Text analysis for large-scale training-data pipelines (SURVEY.md §2.9).

Operators over a `documents(doc_id, text, lang, source, n_chars)` table:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All are pure column expressions (JVM-side, codegen-fused) —
at 100 TB these run as a single projection over the parquet scan with zero
shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "las", "es", "una", "con", "por", "para", "del"),
}

def _tokens(text: Column) -> Column:
    """Whitespace tokenization after lowercasing; empty strings removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)

def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count — the baseline 'how many tokens' profile."""
    return df.withColumn(out_col, F.size(_tokens(F.col(text_col))).cast("long"))

def bpe_ish_token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish token estimate: count regex word-pieces + punctuation marks.

    regexp_count of `\\w+|[^\\w\\s]` ≈ GPT-style pre-tokenizer piece count;
    a cheap, deterministic stand-in for a real BPE vocab (not shipped here).
    """
    return df.withColumn(
        out_col, F.regexp_count(F.col(text_col), F.lit(r"\w+|[^\w\s]")).cast("long")
    )

def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals: length, word stats, punctuation/digit/upper ratios,
    stopword ratio, and a composite [0,1] quality score.

    Mirrors the C4/Gopher-style heuristics: mean word length in [3,10],
    stopword presence, not-too-much punctuation. Single projection.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    mean_word_len = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0, F.regexp_count(t, F.lit(r"[0-9]")).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0))
    score = (
        F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(n_words >= 5, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_chars.cast("long").alias("q_n_chars"),
        n_words.cast("long").alias("q_n_words"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(digit_ratio, 6).alias("q_digit_ratio"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"),
    )

def detect_language(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID: the language whose marker set matches the
    most tokens wins; ties and no-hits → 'und'. Pure expressions — the per-
    language hit counts are four array-filter sizes over one tokenization.
    """
    toks = _tokens(F.col(text_col))

    def contains_fn(arr):
        return lambda w: F.array_contains(arr, w)

    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array([F.lit(w) for w in markers])
        hit_cols.append(
            F.struct(
                F.size(F.filter(toks, contains_fn(arr))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on (hits, lang) structs: max hits; ties broken by the
    # lexicographically greatest language code — deterministic.
    best = F.array_max(F.array(*hit_cols))
    return df.withColumn(
        out_col, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )

def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: xxhash64 of the whitespace-normalized, lowercased
    text — a stable rolling-hash-style identity for exact near-normalization
    dedup. JVM-side, shuffle-free.
    """
    norm = F.concat_ws(" ", _tokens(F.col(text_col)))
    return df.withColumn(out_col, F.xxhash64(norm))

def fingerprint_md5(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Fingerprint variant on md5 instead of xxhash64 — bit-identical across
    engines (DuckDB md5 == Spark md5), so the oracle checks VALUES, not just
    shape. Same normalization as fingerprint()."""
    norm = F.concat_ws(" ", _tokens(F.col(text_col)))
    return df.withColumn(out_col, F.md5(norm))
