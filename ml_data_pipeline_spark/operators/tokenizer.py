"""Tokenizer-training statistics: corpus word counts and BPE pair counts.

The inner loop of byte-pair-encoding tokenizer training (Sennrich et al.
2016, public literature) is: count words once, then repeatedly count
adjacent-symbol pairs weighted by word frequency and merge the most
frequent pair. At 100 TB the expensive step is the corpus pass; the pair
statistics afterwards run over the DISTINCT VOCABULARY (orders of
magnitude smaller). This module expresses both stages as pure Column
expressions — the corpus pass is one explode+groupBy whose shuffle
carries (word, count) only, and the pair stage never touches the corpus
again.

No reference-repo counterpart (the reference tokenizes with a fixed
vocabulary only); this extends the engine toward training-data pipelines
per the round brief.

Scale notes:
- word_counts shuffles vocabulary-sized (word, count) pairs with map-side
  partial aggregation — the canonical scalable shape for corpus counting.
- bpe_pair_counts runs on the vocabulary table; even web-scale corpora
  have vocabularies in the tens of millions, so the pair explode (~word
  length × vocab) stays small relative to the corpus.
- Everything is whole-stage-codegen Column expressions; no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# apply_bpe_merges interpolates merge symbols into regexp_replace patterns;
# restrict to the alphabet top_bpe_pairs can produce so metacharacters
# ('$', '.', '\\') can never silently mis-merge.
_MERGE_SYMBOL_RE = re.compile(r"^[a-z]+$")


def _ascii_words(text: Column) -> Column:
    """Lowercased a-z word array. The deliberately simple [^a-z] tokenizer
    keeps Spark/DuckDB regex semantics identical for the oracle gate."""
    cleaned = F.regexp_replace(F.lower(text), "[^a-z]+", " ")
    return F.filter(F.split(F.trim(cleaned), " +"), lambda w: F.length(w) > 0)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table: (word, n). One explode + one groupBy;
    the shuffle after map-side combine is vocabulary-sized."""
    return (
        df.select(F.explode(_ascii_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent character-pair frequencies weighted by word frequency —
    one BPE merge-selection step at character granularity.

    Runs over the vocabulary (word_counts output), not the corpus: for a
    word of length L there are L-1 adjacent pairs, generated with
    transform(sequence(...)) + substr, all JVM-side. Words shorter than 2
    chars contribute no pairs (explicit filter — sequence(1, 0) would
    yield a DESCENDING [1, 0] array, not an empty one).
    """
    vocab = word_counts(df, text_col).where(F.length("word") >= 2)
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substr(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair"),
        F.col("n"),
    )
    return pairs.groupBy("pair").agg(F.sum("n").alias("pair_count"))


def top_bpe_pairs(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Top-k merge candidates, deterministically ranked by
    (pair_count DESC, pair ASC) so engines agree on ties. r14: the k cut
    is orderBy().limit() — TakeOrderedAndProject, a per-partition top-k
    heap — so the rank window runs over k rows (bounded by the
    parameter), never over the pair vocabulary."""
    from pyspark.sql import Window

    order = [F.col("pair_count").desc(), F.col("pair").asc()]
    ranked = (
        bpe_pair_counts(df, text_col)
        .orderBy(*order)
        .limit(int(k))
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )
    return ranked.select("rank", "pair", "pair_count")


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a fixed, ordered BPE merge list and count the resulting
    tokens per document — the inference half of BPE (top_bpe_pairs is
    the training half).

    Segmentation runs over the DISTINCT VOCABULARY, not the corpus: each
    word is rendered as a double-space-separated symbol stream
    (' a  b  c ') and each merge is ONE global literal regexp_replace
    (' a  b ' -> ' ab '), which reproduces BPE's leftmost-non-overlapping
    merge semantics and keeps the sentinel invariant (single edge spaces,
    double interior) so later merges keep matching. Literal patterns only
    — both Java regex and RE2 replay it identically, which is what makes
    the gate oracle exact.

    Corpus cost: one tokenize pass + a vocab join; the per-merge chain is
    a fixed-width codegen expression over vocab rows. Documents with no
    ascii words are preserved with n_bpe_tokens = 0 (left join + coalesce).
    """
    for x, y in merges:
        if not (_MERGE_SYMBOL_RE.match(x) and _MERGE_SYMBOL_RE.match(y)):
            raise ValueError(
                f"merge symbols must match [a-z]+ (regex/replacement "
                f"metacharacters would silently mis-merge): {(x, y)!r}"
            )
    # explode_outer keeps a NULL-word row for wordless documents, so the
    # per-doc aggregate itself has full id coverage — no third scan of the
    # source to restore dropped ids (plan_audit: documents x3 before)
    words = df.select(
        F.col(id_col).alias("id"), F.explode_outer(_ascii_words(F.col(text_col))).alias("word")
    )
    seg = F.regexp_replace(F.col("word"), "(.)", " $1 ")
    for x, y in merges:
        seg = F.regexp_replace(seg, f" {x}  {y} ", f" {x}{y} ")
    vocab = (
        words.where(F.col("word").isNotNull())
        .select("word")
        .distinct()
        .select("word", F.size(F.split(F.trim(seg), " +")).alias("n_pieces"))
    )
    return (
        words.join(vocab, "word", "left")
        .groupBy("id")
        .agg(F.coalesce(F.sum("n_pieces"), F.lit(0)).alias("n_bpe_tokens"))
    )
