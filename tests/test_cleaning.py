"""Text cleaning (operators/cleaning.py) + repetition metrics (text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import cleaning as CL
from ml_data_pipeline_spark.operators import text as TX


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io visit https://x.io/p?q=1 from 10.1.2.3 call +1 (555) 123-4567 done")],
        "id long, text string",
    )
    out = CL.redact_pii(df).first()["text"]
    assert "<email>" in out and "<url>" in out and "<ip>" in out and "<phone>" in out
    assert "x-corp" not in out and "10.1.2.3" not in out and "555" not in out


def test_redact_url_wins_over_email_inside_url(spark):
    # URL containing an @ (userinfo) must be consumed by the url pass first
    df = spark.createDataFrame([(1, "see https://u@host.com/path end")], "id long, text string")
    out = CL.redact_pii(df).first()["text"]
    assert out == "see <url> end"


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co c@d.org and http://e.fg"), (2, "nothing here")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in CL.pii_counts(df).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_url"] == 1
    assert rows[2]["n_email"] == 0 and rows[2]["n_url"] == 0


def test_strip_html_tags_and_entities(spark):
    df = spark.createDataFrame(
        [(1, "<div><p>Hello &amp; welcome to &lt;Spark&gt;</p>\n\n<br/>bye</div>")],
        "id long, text string",
    )
    out = CL.strip_html(df).first()["text"]
    assert out == "Hello & welcome to <Spark> bye"


def test_normalize_whitespace(spark):
    df = spark.createDataFrame([(1, "  a\t\tb \n c  ")], "id long, text string")
    assert CL.normalize_whitespace(df).first()["text"] == "a b c"


def test_repetition_metrics_values(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # dup 3/4; top bigram "spam spam" x3
            (2, "all words fully distinct here"),
            (3, "x"),                            # single token: no bigram
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.repetition_metrics(df).collect()}
    assert abs(rows[1]["rep_dup_word_frac"] - 0.75) < 1e-9
    assert rows[1]["rep_top_bigram"] == "spam spam"
    assert rows[1]["rep_top_bigram_count"] == 3
    # 3 * len("spam spam")=9 chars / 19 text chars
    assert abs(rows[1]["rep_top_bigram_frac"] - 27 / 19) < 1e-6
    assert rows[2]["rep_dup_word_frac"] == 0.0
    assert rows[2]["rep_top_bigram_count"] == 1
    assert rows[3]["rep_top_bigram"] is None
    assert rows[3]["rep_top_bigram_frac"] == 0.0


def test_gopher_repetition_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now buy now"),
            (2, "a perfectly ordinary sentence with many distinct tokens inside"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["rep_keep"] for r in TX.gopher_repetition_filter(df).collect()}
    assert rows[1] is False
    assert rows[2] is True


def test_pack_sequences_offset_packing(spark):
    from ml_data_pipeline_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 250), (5, 10)],
        "doc_id long, n_tokens long",
    )
    packed = {r["doc_id"]: r["bin_id"] for r in PK.pack_sequences(df, budget=256).collect()}
    # offsets: 0,100,200,300,550 -> bins 0,0,0,1,2
    assert packed == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}
    stats = {r["bin_id"]: (r["n_docs"], r["bin_tokens"]) for r in
             PK.pack_stats(PK.pack_sequences(df, budget=256)).collect()}
    assert stats == {0: (3, 300), 1: (1, 250), 2: (1, 10)}
    # bounded overflow: every bin < budget + max doc tokens
    for _, (_, tok) in stats.items():
        assert tok < 256 + 250


def test_pack_sequences_oversized_doc_gets_own_bin_start(spark):
    from ml_data_pipeline_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(1, 5000), (2, 10)], "doc_id long, n_tokens long"
    )
    packed = {r["doc_id"]: r["bin_id"] for r in PK.pack_sequences(df, budget=256).collect()}
    assert packed[1] == 0 and packed[2] == 19  # 5000 // 256


def test_mixture_plan_allocation(spark):
    from ml_data_pipeline_spark.operators import mixing as MX

    df = spark.createDataFrame(
        [("web", 1000), ("web", 1000), ("books", 500), ("code", 100)],
        "source string, n_tokens long",
    )
    plan = {r["source"]: r for r in
            MX.mixture_plan(df, {"web": 0.5, "books": 0.5}, total_tokens=2000).collect()}
    # 'code' absent from weights -> excluded; weights renormalize to 0.5/0.5
    assert set(plan) == {"web", "books"}
    assert plan["web"]["available_tokens"] == 2000
    assert plan["web"]["target_tokens"] == 1000.0
    assert plan["web"]["sample_frac"] == 0.5
    # books wants 1000 but holds 500 -> full take + 2 epochs surfaced
    assert plan["books"]["sample_frac"] == 1.0
    assert plan["books"]["epochs"] == 2.0


def test_mixture_plan_rejects_bad_inputs(spark):
    import pytest as _pytest

    from ml_data_pipeline_spark.operators import mixing as MX

    df = spark.createDataFrame([("web", 10)], "source string, n_tokens long")
    with _pytest.raises(ValueError):
        MX.mixture_plan(df, {"web": 1.0}, total_tokens=0)
    with _pytest.raises(ValueError):
        MX.mixture_plan(df, {}, total_tokens=10)


def test_r13_mixture_planners_reject_null_token_counts(spark):
    """r13 review: NULL token counts corrupted the planners SILENTLY —
    sum() skips NULLs so partial NULLs undercount a source, and an
    all-NULL source aggregates to NULL available_tokens, where
    least(target/NULL, 1.0) NULL-skips to sample_frac = 1.0 (a full-take
    plan for a source whose inventory is unknown) and temperature
    weights go NULL. Both planners raise loudly instead; NULLs in
    sources OUTSIDE the weighted set stay irrelevant to mixture_plan.

    r14 (ADVICE): the guard no longer pays a separate probe scan —
    mixture_plan folds the NULL tally into the driver action it already
    takes (still a construction-time ValueError); temperature_weights is
    a single lazy plan, so its contract raises at ACTION time via
    F.raise_error (streaming-safe, scan-free on clean data)."""
    import pytest as _pytest

    from ml_data_pipeline_spark.operators import mixing as MX

    df = spark.createDataFrame(
        [("web", 1000), ("books", None)], "source string, n_tokens long"
    )
    with _pytest.raises(ValueError, match="non-NULL token counts"):
        MX.mixture_plan(df, {"web": 0.5, "books": 0.5}, total_tokens=100)
    with _pytest.raises(Exception, match="non-NULL token counts"):
        MX.temperature_weights(df).collect()
    # a NULL in an UNWEIGHTED source must not trip mixture_plan's tally
    plan = MX.mixture_plan(df, {"web": 1.0}, total_tokens=100).collect()
    assert [r["source"] for r in plan] == ["web"]
    # clean data: the lazy guard is inert
    clean = spark.createDataFrame(
        [("web", 1000), ("books", 500)], "source string, n_tokens long"
    )
    assert len(MX.temperature_weights(clean).collect()) == 2


def test_chunk_documents_overlap_and_coverage(spark):
    from ml_data_pipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "abcdefghij"), (2, "")], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk"])
        for r in chunk_documents(df, chunk_chars=4, overlap=2).collect()
    )
    # stride 2, count = ceil(max(10-2,1)/2) = 4: abcd cdef efgh ghij —
    # r10 fix: the old formula also emitted a 5th chunk "ij" that was
    # FULLY CONTAINED in "ghij" (duplicate text)
    assert rows == [(0, "abcd"), (1, "cdef"), (2, "efgh"), (3, "ghij")]
    # overlap invariant: consecutive chunks share `overlap` chars
    for (i, a), (_, b) in zip(rows, rows[1:]):
        assert a[2:] == b[: len(a) - 2]
    # empty doc -> no chunks; reassembly covers the original text
    assert "".join(c[: 2] for _, c in rows[:-1]) + rows[-1][1] == "abcdefghij"


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from ml_data_pipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=4, overlap=4)


def test_line_dedup_covers_empty_documents(spark):
    """A document with no non-empty lines must still appear in the output
    (text_clean='', zero counts) — ADVICE r2: the output id set must never
    shrink versus the input."""
    from ml_data_pipeline_spark.operators.text import line_dedup

    rows = [
        (1, "shared line\nunique one"),
        (2, "shared line\nunique two"),
        (3, ""),
        (4, "   \n  \n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in line_dedup(df, max_doc_freq=1).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["text_clean"] == "unique one"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_removed"] == 1
    assert out[3]["text_clean"] == "" and out[3]["n_lines_kept"] == 0
    assert out[3]["n_lines_removed"] == 0
    assert out[4]["n_lines_kept"] == 0 and out[4]["n_lines_removed"] == 0


def test_line_dedup_literal_delimiter(spark):
    """delim is literal, not regex — '.' must split on dots only (ADVICE r2:
    F.split takes a regex; the delimiter is escaped before splitting)."""
    from ml_data_pipeline_spark.operators.text import line_dedup

    rows = [(1, "common.only in one"), (2, "common.only in two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in line_dedup(df, max_doc_freq=1, delim=".").collect()}
    assert out[1]["text_clean"] == "only in one"
    assert out[1]["n_lines_removed"] == 1


def test_unigram_logprob_covers_zero_token_documents(spark):
    """Zero-token docs stay in the output with n_tokens=0 and NULL score
    (ADVICE r2: explode silently dropped them)."""
    from ml_data_pipeline_spark.operators.text import unigram_logprob

    rows = [(1, "alpha beta alpha"), (2, ""), (3, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in unigram_logprob(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_tokens"] == 3 and out[1]["avg_neg_logp"] is not None
    assert out[2]["n_tokens"] == 0 and out[2]["avg_neg_logp"] is None


def test_canonicalize_url_rules(spark):
    cases = [
        (1, "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=t&z=9&a=1#frag", "https://ex.com/a/b?a=1&z=9"),
        (2, "http://ex.com:80", "http://ex.com/"),
        (3, "http://ex.com/path/", "http://ex.com/path"),
        (4, "http://ex.com/p?gclid=1&fbclid=2&ref=h", "http://ex.com/p"),
        (5, "ftp://ex.com/x", None),
        (6, "not a url", None),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], "id long, url string")
    got = {r["id"]: r["canonical_url"] for r in CL.canonicalize_url(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_canonicalize_url_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.Ex.COM/a?b=2&a=1#f")], "id long, url string"
    )
    once = CL.canonicalize_url(df).select("id", F.col("canonical_url").alias("url"))
    twice = CL.canonicalize_url(once).first()["canonical_url"]
    assert twice == "https://ex.com/a?a=1&b=2"


def test_blocklist_filter_anti_join(spark):
    docs = spark.createDataFrame(
        [(1, "bad.com"), (2, "ok.com"), (3, "bad.com"), (4, "fine.org")],
        "id long, domain string",
    )
    blocked = spark.createDataFrame([("bad.com",), ("bad.com",)], "domain string")
    kept = sorted(r["id"] for r in CL.blocklist_filter(docs, blocked).collect())
    assert kept == [2, 4]


def test_script_stats_fractions_and_dominant(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир"),
            (3, "你好世界"),
            (4, "مرحبا"),
            (5, "12345"),
            (6, "...!!!"),
            (7, ""),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in TX.script_stats(df).collect()}
    assert rows[1]["dominant_script"] == "latin" and rows[1]["frac_latin"] == 1.0
    assert rows[2]["dominant_script"] == "cyrillic" and rows[2]["frac_cyrillic"] == 1.0
    assert rows[3]["dominant_script"] == "cjk"
    assert rows[4]["dominant_script"] == "arabic"
    assert rows[5]["dominant_script"] == "digit"
    # punctuation-only and empty docs: all fractions 0, dominant 'other'
    assert rows[6]["dominant_script"] == "other"
    assert rows[7]["dominant_script"] == "other" and rows[7]["frac_latin"] == 0.0


def test_r10_cleaning_url_and_entity_fixes(spark):
    """r10 review: scheme-paired default-port stripping, query never taken
    from the fragment, &amp; decoded last, unknown PII kinds raise."""
    import pytest

    from ml_data_pipeline_spark.operators import cleaning as CL

    urls = spark.createDataFrame(
        [
            (1, "http://ex.com:443/x"),    # NON-default port: must survive
            (2, "https://ex.com:443/x"),   # default port: stripped
            (3, "http://h/p#sec?x=1"),     # '?' inside fragment: no query
            (4, "http://h/p?a=1#f?b=2"),   # real query + tricky fragment
        ],
        "id long, url string",
    )
    got = {r["id"]: r["canonical_url"] for r in CL.canonicalize_url(urls).collect()}
    assert got[1] == "http://ex.com:443/x"
    assert got[2] == "https://ex.com/x"
    assert got[3] == "http://h/p"
    assert got[4] == "http://h/p?a=1"
    html = spark.createDataFrame(
        [(1, "&amp;lt;b&amp;gt; stays escaped")], "id long, text string"
    )
    out = CL.strip_html(html).collect()[0]["text"]
    assert out == "&lt;b&gt; stays escaped"  # was '<b>' (double-unescaped)
    with pytest.raises(ValueError, match="unknown PII kinds"):
        CL.redact_pii(html, kinds=("emails",))


def test_ws_class_x0b_parity_spark_vs_duckdb(spark):
    """ADVICE r11: Java regex \\s includes \\x0B (vertical tab) but DuckDB's
    RE2 \\s does not, so any twinned tokenization written as \\s silently
    depended on the corpus containing no \\x0b. The shared WS_CLASS/WS_PLUS
    (constants.py) spells the class out; this pins (a) WS_PLUS == Java \\s+
    on the Spark side, (b) Spark and DuckDB split \\x0b text IDENTICALLY on
    WS_PLUS, and (c) the old RE2 \\s divergence is real (guards against the
    class ever being rewritten back to \\s)."""
    import duckdb

    from ml_data_pipeline_spark.constants import WS_PLUS

    txt = "alpha\x0bbeta gamma\tdelta\x0b\x0bepsilon\nzeta\f\reta"

    def spark_split(pattern: str) -> list[str]:
        return (
            spark.range(1)
            .select(
                F.filter(
                    F.split(F.lit(txt), pattern), lambda t: F.length(t) > 0
                ).alias("tk")
            )
            .head()["tk"]
        )

    expected = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    assert spark_split(WS_PLUS) == expected
    assert spark_split(r"\s+") == expected  # (a) WS_PLUS is a Java no-op

    con = duckdb.connect()
    duck = con.execute(
        "SELECT list_filter(string_split_regex(?, '" + WS_PLUS + "'), "
        "x -> len(x) > 0)",
        [txt],
    ).fetchone()[0]
    assert duck == expected  # (b) identical splits on \x0b text

    duck_legacy = con.execute(
        r"SELECT list_filter(string_split_regex(?, '\s+'), x -> len(x) > 0)",
        [txt],
    ).fetchone()[0]
    assert "alpha\x0bbeta" in duck_legacy  # (c) RE2 \s keeps \x0b glued


def test_r13_pack_sequences_rejects_null_token_counts(spark):
    """r13 review (same class as the mixture planners): the offset
    window's sum() skips NULLs, so a NULL-count document silently packed
    at zero width into a bin whose true token total was then unknown —
    the bounded-overflow invariant quietly gone. r14 (ADVICE): the guard
    is now IN-PLAN (per-row F.raise_error, not an eager probe scan), so
    construction stays lazy and the error fires at action time."""
    import pytest as _pytest

    from ml_data_pipeline_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(1, 100), (2, None)], "doc_id long, n_tokens long"
    )
    with _pytest.raises(Exception, match="non-NULL token counts"):
        PK.pack_sequences(df, budget=256).collect()
    # clean data: guard is inert and bins are unchanged
    clean = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 100)], "doc_id long, n_tokens long"
    )
    bins = {
        r["doc_id"]: r["bin_id"]
        for r in PK.pack_sequences(clean, budget=256).collect()
    }
    assert bins == {1: 0, 2: 0, 3: 1}
    # r15 (ADVICE): the guard lives INSIDE the windowed offset sum too —
    # a partial action that materializes only a row ordered AFTER the
    # NULL document (filter pushdown skips doc 2 itself) must still
    # raise, because that row's bin depends on the NULL row's count
    df2 = spark.createDataFrame(
        [(1, 100), (2, None), (3, 100)], "doc_id long, n_tokens long"
    )
    with _pytest.raises(Exception, match="non-NULL token counts"):
        PK.pack_sequences(df2, budget=256).where("doc_id = 3").collect()
    # stricter than required: WindowExec walks the whole partition, so
    # even a row ordered BEFORE the NULL raises once its partition is
    # evaluated — no partial action over a NULL-bearing group can return
    with _pytest.raises(Exception, match="non-NULL token counts"):
        PK.pack_sequences(df2, budget=256).where("doc_id = 1").collect()
