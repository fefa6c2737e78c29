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

Any span reported covers >= width tokens and every covered token lies
inside AT LEAST ONE width-token window that appears in >= min_docs
documents (r10 review: merged islands may contain sub-windows that are
NOT themselves repeated — e.g. two overlapping repeated windows whose
union straddles an unrepeated middle — so the per-sub-window claim of
raw ExactSubstr holds for the detected WINDOWS, not for every
sub-window of a MERGED span).

Preconditions: doc ids must be UNIQUE (duplicate ids would interleave
two documents' tokens into one rebuilt text — checked, loud ValueError)
and non-NULL ids are required for span detection (NULL-id rows pass
through remove_repeated_ngrams UNCHANGED: equi-joins cannot carry NULL
keys, and count_distinct skips them, so they can neither be probed nor
counted toward min_docs).

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


def _require_unique_ids(df: DataFrame, id_col: str) -> None:
    """Loud precondition (r10 review): duplicate doc ids would interleave
    two documents' tokens into one text_clean and undercount doc
    frequency (count_distinct sees one doc). One narrow id-only aggregate
    — never a text-sized shuffle."""
    dup = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        raise ValueError(
            f"repeated-span operators require unique doc ids; duplicated: "
            f"{[r[id_col] for r in dup]}"
        )


def _repeated_starts(
    df: DataFrame, text_col: str, id_col: str, width: int, min_docs: int
) -> DataFrame:
    """(id, s) — 1-based token index of every width-token window whose
    text occurs in >= min_docs distinct documents."""
    toks = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__toks")
    )
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
    _require_unique_ids(df, id_col)
    return _merged_spans(df, text_col, id_col, width, min_docs).orderBy(
        "id", "span_start"
    )


def _merged_spans(
    df: DataFrame, text_col: str, id_col: str, width: int, min_docs: int
) -> DataFrame:
    """Unsorted maximal-span derivation (r10 review: the public API's
    presentation orderBy was previously INSIDE this derivation, so
    remove_repeated_ngrams paid a global range-partition sort of the span
    set that its own groupBy/joins immediately destroyed)."""
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
    _require_unique_ids(df, id_col)
    # merged spans are read 3x (coverage explode, per-doc span counts,
    # and their own derivation is the expensive double-tokenize path) —
    # materialize once; the frame is proportional to actually-duplicated
    # text, not the corpus (plan_audit r5: 7 scans -> 4). UNSORTED
    # derivation on purpose: the public API's presentation sort would be
    # a global range shuffle this function's joins immediately destroy.
    spans = _merged_spans(df, text_col, id_col, width, min_docs).localCheckpoint()
    covered = spans.select(
        "id", F.explode(F.sequence("span_start", F.col("span_end") - 1)).alias("pos")
    )
    toks = df.where(F.col(id_col).isNotNull()).select(
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
    # NULL-id rows pass through UNCHANGED (r10 review: an equi-join can
    # never carry a NULL key, so the old left join reported such rows as
    # fully excised — text_clean '' with n_tokens_removed = n_tokens).
    # Their normalized token stream is computed from the source row
    # directly; they were filtered out of detection above.
    self_stream = F.when(F.col(text_col).isNull(), F.lit("")).otherwise(
        F.array_join(_tokens(F.col(text_col)), " ")
    )
    # no final orderBy (r10 review): output covers the full corpus, so a
    # presentation sort is a global range shuffle no consumer needs — the
    # gate md5s rows order-free and the tests sort for themselves
    return (
        df.select(
            F.col(id_col).alias("id"),
            # NULL text must report 0 tokens (the pre-r8 aggregate path's
            # behavior and the oracle's coalesce) — size(NULL) is NULL
            # under ANSI and -1 under the legacy flag, wrong either way
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(F.size(_tokens(F.col(text_col))))
            .alias("n_tokens"),
            self_stream.alias("__self_clean"),
        )
        .join(rebuilt, "id", "left")
        .join(n_spans, "id", "left")
        .select(
            "id",
            F.when(F.col("id").isNull(), F.col("__self_clean"))
            .otherwise(F.coalesce("text_clean", F.lit("")))
            .alias("text_clean"),
            "n_tokens",
            F.when(F.col("id").isNull(), F.lit(0))
            .otherwise(F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .alias("n_tokens_removed"),
            F.when(F.col("id").isNull(), F.lit(0))
            .otherwise(F.coalesce("n_spans", F.lit(0)))
            .alias("n_spans"),
        )
    )
