"""Span-level repeated-n-gram dedup (operators/spans.py)."""

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.spans import (
    remove_repeated_ngrams,
    repeated_ngram_spans,
)

DOCS = [
    # docs 1 and 2 share a 5-token passage embedded in distinct contexts
    (1, "a b c d e SHARED1 SHARED2 SHARED3 SHARED4 SHARED5 x y z"),
    (2, "p q SHARED1 SHARED2 SHARED3 SHARED4 SHARED5 r s t u"),
    (3, "totally unique words here nothing repeated at all ok fine"),
    (4, ""),
    (5, "short doc"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_spans_found_and_merged(spark):
    spans = repeated_ngram_spans(_df(spark), width=5).collect()
    by_id = {r["id"]: r for r in spans}
    assert set(by_id) == {1, 2}
    # doc 1: shared passage is tokens 6..10 (1-based, end exclusive 11)
    assert (by_id[1]["span_start"], by_id[1]["span_end"]) == (6, 11)
    assert (by_id[2]["span_start"], by_id[2]["span_end"]) == (3, 8)
    assert all(r["span_tokens"] == 5 for r in spans)


def test_overlapping_windows_merge_to_one_span(spark):
    # a 7-token shared passage => three repeated 5-windows that must merge
    rows = [
        (1, "x x1 S1 S2 S3 S4 S5 S6 S7 y1 y"),
        (2, "z1 S1 S2 S3 S4 S5 S6 S7 z2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = repeated_ngram_spans(df, width=5).collect()
    assert len(spans) == 2  # ONE maximal span per doc, not three
    s1 = [r for r in spans if r["id"] == 1][0]
    assert (s1["span_start"], s1["span_end"], s1["span_tokens"]) == (3, 10, 7)


def test_remove_covers_all_ids_and_counts(spark):
    out = remove_repeated_ngrams(_df(spark), width=5).orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 2, 3, 4, 5]
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["text_clean"] == "a b c d e x y z"
    assert by_id[1]["n_tokens_removed"] == 5 and by_id[1]["n_spans"] == 1
    # untouched docs keep their (lowercased) token stream and zero counts
    assert by_id[3]["n_tokens_removed"] == 0 and by_id[3]["n_spans"] == 0
    # empty doc still present with zeros
    assert by_id[4]["n_tokens"] == 0 and by_id[4]["text_clean"] == ""


def test_no_repeats_below_min_docs(spark):
    # min_docs=3: the passage is only in 2 docs, so nothing is removed
    out = remove_repeated_ngrams(_df(spark), width=5, min_docs=3)
    assert out.agg(F.sum("n_tokens_removed")).collect()[0][0] == 0


def test_spans_null_id_passthrough_and_duplicate_id_raises(spark):
    """r10 review: a NULL-id row passes through remove_repeated_ngrams
    UNCHANGED (it used to come back as fully excised because equi-joins
    drop NULL keys); duplicate doc ids raise loudly instead of
    interleaving two documents' tokens."""
    import pytest

    from ml_data_pipeline_spark.operators.spans import (
        remove_repeated_ngrams,
        repeated_ngram_spans,
    )

    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta"),
            (2, f"{shared} gamma delta"),
            (None, "hello world entirely unique text here"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in remove_repeated_ngrams(docs, width=10, min_docs=2).collect()}
    assert len(out) == 3
    null_row = out[None]
    assert null_row["text_clean"] == "hello world entirely unique text here"
    assert null_row["n_tokens_removed"] == 0 and null_row["n_spans"] == 0
    assert out[1]["n_tokens_removed"] == 10 and out[2]["n_tokens_removed"] == 10
    dup = spark.createDataFrame(
        [(1, "a b c"), (1, "x y z")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="unique doc ids"):
        remove_repeated_ngrams(dup, width=2, min_docs=2)
    with pytest.raises(ValueError, match="unique doc ids"):
        repeated_ngram_spans(dup, width=2, min_docs=2)
