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


def test_apply_bpe_merges_hand_traced(spark):
    from ml_data_pipeline_spark.operators.tokenizer import apply_bpe_merges

    rows = [
        (1, "the"),      # t h e -> th e -> the : 1 token
        (2, "then"),     # t h e n -> th e n -> the n : 2 tokens
        (3, "ant and"),  # a n t -> an t (2); a n d -> an d -> and (1)
        (4, ""),         # empty doc survives with 0
        (5, "aaa"),      # greedy leftmost: a a a -> aa? no (a,a) merge -> 3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"), ("an", "d")]
    out = {r["id"]: r["n_bpe_tokens"] for r in apply_bpe_merges(df, merges).collect()}
    assert out == {1: 1, 2: 2, 3: 3, 4: 0, 5: 3}


def test_apply_bpe_greedy_leftmost_overlap(spark):
    from ml_data_pipeline_spark.operators.tokenizer import apply_bpe_merges

    # 'aaa' with merge (a,a): leftmost pair merges, overlap does not ->
    # pieces aa + a = 2 (the BPE single-pass semantics)
    df = spark.createDataFrame([(1, "aaa aaaa")], ["doc_id", "text"])
    out = apply_bpe_merges(df, [("a", "a")]).collect()[0]
    # aaa -> aa,a (2); aaaa -> aa,aa (2)
    assert out["n_bpe_tokens"] == 4


def test_bigram_logprob_hand_computed(spark):
    import math
    from ml_data_pipeline_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "doc_id int, text string"
    )
    out = {r["id"]: r for r in bigram_logprob(df, "text", "doc_id", k=1.0).collect()}
    # corpus: tokens a:3 b:3 x:1 (V=3); bigrams: (a,b):2+1=3? doc1: ab,ba,ab -> (a,b)x2,(b,a)x1; doc2: (a,b)
    c2 = {("a", "b"): 3, ("b", "a"): 1}
    c1 = {"a": 3, "b": 3, "x": 1}
    V = 3

    def nlp(w1, w2):
        return -math.log((c2[(w1, w2)] + 1) / (c1[w1] + V))

    d1 = (nlp("a", "b") + nlp("b", "a") + nlp("a", "b")) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_neg_logp2"] == round(d1, 6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_neg_logp2"] == round(nlp("a", "b"), 6)
    # single-token doc: zero bigrams, NULL score, still present
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_neg_logp2"] is None
