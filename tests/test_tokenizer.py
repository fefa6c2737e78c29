from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.tokenizer import (
    bpe_pair_counts,
    top_bpe_pairs,
    word_counts,
)


def _df(spark):
    rows = [
        (1, "the cat sat"),
        (2, "The cat, the CAT!"),
        (3, "a b ab"),  # 1-char words contribute no pairs
        (4, ""),  # empty doc contributes nothing
        (5, "123 %$#"),  # non-alpha only -> no words
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_word_counts_hand_computed(spark):
    wc = {r["word"]: r["n"] for r in word_counts(_df(spark)).collect()}
    assert wc == {"the": 3, "cat": 3, "sat": 1, "a": 1, "b": 1, "ab": 1}


def test_pair_counts_weighted_by_word_freq(spark):
    pc = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(_df(spark)).collect()}
    # "the"x3 -> th,he x3; "cat"x3 -> ca,at x3; "sat" -> sa,at; "ab" -> ab
    assert pc == {"th": 3, "he": 3, "ca": 3, "at": 4, "sa": 1, "ab": 1}


def test_top_pairs_rank_deterministic_on_ties(spark):
    top = top_bpe_pairs(_df(spark), k=3).orderBy("rank").collect()
    # at=4 first; then the 3-count pairs tie-broken alphabetically: ca, he
    assert [(r["rank"], r["pair"]) for r in top] == [(1, "at"), (2, "ca"), (3, "he")]


def test_single_char_and_empty_words_no_pairs(spark):
    df = _df(spark).where(F.col("id").isin(3, 4, 5))
    assert bpe_pair_counts(df).collect() == [
        r for r in bpe_pair_counts(df).collect() if r["pair"] == "ab"
    ]
