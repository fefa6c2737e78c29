"""Span-level repeated-n-gram deduplication (ExactSubstr-style).

Document-level dedup (dedup.py) and line-level dedup (text.line_dedup)
miss the middle case: a long passage copied into otherwise-distinct
documents (licence blocks, templated paragraphs, quoted chains). Lee et
al., "Deduplicating Training Data Makes Language Models Better" (ACL
2022) remove any sufficiently long substring shared between documents
via a corpus suffix array. A suffix array is a single-machine structure;
the Spark-native equivalent used here is the fixed-width sliding-window
form of the same idea (the MapReduce variant in that paper's §4.1):

1. every ``width``-token window of every document is hashed once
   (xxhash64 over the window text) — explode is on window STARTS, so no
   per-row quadratic array materialization;
2. corpus-wide doc-frequency per window hash = one shuffle keyed on the
   64-bit hash (count_distinct(id) is map-side partial-aggregated);
3. windows present in >= ``min_docs`` distinct documents join back to
   their (id, start) occurrences — an equi-join on the hash key, never
   an all-pairs comparison;
4. overlapping/adjacent repeated windows merge into MAXIMAL spans with
   the classic islands pattern (a window partitioned BY DOCUMENT — the
   per-doc row count is bounded by the doc's token count, so no global
   sort and no skew beyond document length).

Any span reported covers >= width tokens and every one of its
``width``-token sub-windows appears in another document — the same
guarantee as ExactSubstr with the suffix array replaced by a shuffle.

At 100 TB: stage 2's shuffle carries (hash, id) pairs only (16 bytes a
row before combine); stage 3 re-shuffles only the REPEATED window
occurrences, which for web corpora is a few percent of windows. The
reference has no span-level operator (nearest is row dedup,
preprocessing/dataset_processing_duplicates_logic.py); this is part of
the LLM-pipeline surface the engine adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.text import _tokens


def _repeated_starts(
    df: DataFrame, text_col: str, id_col: str, width: int, min_docs: int
) -> DataFrame:
    """(id, s) — 1-based token index of every width-token window whose
    text occurs in >= min_docs distinct documents."""
    toks = df.select(F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__toks"))
    starts = F.sequence(F.lit(1), F.size("__toks") - width + 1)
    wins = (
        toks.where(F.size("__toks") >= width)
        .select("id", "__toks", F.explode(starts).alias("s"))
        .select(
            "id",
            "s",
            F.xxhash64(F.concat_ws(" ", F.slice("__toks", F.col("s"), width))).alias("__h"),
        )
    )
    freq = (
        wins.groupBy("__h")
        .agg(F.count_distinct("id").alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("__h")
    )
    return wins.join(freq, "__h").select("id", "s")


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal repeated spans per document.

    Returns (id, span_start, span_end, span_tokens): token indices,
    1-based, end EXCLUSIVE — the span covers tokens
    [span_start, span_end). Overlapping and adjacent repeated windows are
    merged, so spans never overlap and each is >= ``width`` tokens.
    """
    rep = _repeated_starts(df, text_col, id_col, width, min_docs)
    w_prev = Window.partitionBy("id").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w_ord = Window.partitionBy("id").orderBy("s")
    islands = rep.withColumn(
        "__new", (F.col("s") > F.coalesce(F.max(F.col("s") + width).over(w_prev), F.lit(0))).cast("int")
    ).withColumn("__isl", F.sum("__new").over(w_ord))
    return (
        islands.groupBy("id", "__isl")
        .agg(F.min("s").alias("span_start"), (F.max("s") + width).alias("span_end"))
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
        .orderBy("id", "span_start")
    )


def remove_repeated_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Drop every token covered by a repeated span; rebuild the text.

    Returns (id, text_clean, n_tokens, n_tokens_removed, n_spans) with
    FULL id coverage (a document with no repeats, or no tokens, still
    appears — text_clean is its normalized token stream / '').

    The covered-position set explodes the MERGED spans, not the raw
    windows, so the explode factor is (total span length), proportional
    to the amount of actually-duplicated text.
    """
    # merged spans are read 3x (coverage explode, per-doc span counts,
    # and their own derivation is the expensive double-tokenize path) —
    # materialize once; the frame is proportional to actually-duplicated
    # text, not the corpus (plan_audit r5: 7 scans -> 4)
    spans = repeated_ngram_spans(df, text_col, id_col, width, min_docs).localCheckpoint()
    covered = spans.select(
        "id", F.explode(F.sequence("span_start", F.col("span_end") - 1)).alias("pos")
    )
    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(_tokens(F.col(text_col))).alias("pos0", "tok")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = toks.join(covered, ["id", "pos"], "left_anti")
    n_spans = spans.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    # per-doc token counts ride the id-coverage scan as size(tokens) —
    # aggregating them from `toks` instead added a third full scan of the
    # source (plan_audit: documents x3)
    return (
        df.select(
            F.col(id_col).alias("id"),
            # NULL text must report 0 tokens (the pre-r8 aggregate path's
            # behavior and the oracle's coalesce) — size(NULL) is NULL
            # under ANSI and -1 under the legacy flag, wrong either way
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(F.size(_tokens(F.col(text_col))))
            .alias("n_tokens"),
        )
        .join(rebuilt, "id", "left")
        .join(n_spans, "id", "left")
        .select(
            "id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_tokens_removed"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )
        .orderBy("id")
    )
