"""Versioned dataset layer + CSV ingest + META interchange (SURVEY.md §1.2, §2.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.sources import csv_io, meta_csv
from ml_data_pipeline_spark.sources.versioned import (
    VersionedDataset,
    check_paired_versions,
    parse_file_version,
    strip_file_version,
)


def test_read_csv_null_spellings(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "# META: v0: imported\n"
        "a,b,c\n"
        "1,NA,x\n"
        "2,?,N/A\n"
        "3,hello,null\n"
    )
    df = csv_io.read_csv(spark, str(p))
    rows = {r["a"]: (r["b"], r["c"]) for r in df.collect()}
    assert rows == {1: (None, "x"), 2: (None, None), 3: ("hello", None)}


def test_read_csv_as_strings(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,\n2,x\n")
    rows = {r["a"]: r["b"] for r in csv_io.read_csv_as_strings(spark, str(p)).collect()}
    assert rows == {"1": "", "2": "x"}  # dtype=str + fillna("") semantics


def test_versioned_dataset_roundtrip(spark, tmp_path):
    vd = VersionedDataset(spark, str(tmp_path), "cust")
    assert vd.latest_version() is None
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    info0 = vd.write_version(df, ["imported"])
    assert (info0.version, info0.parent) == (0, None)
    info1 = vd.write_version(df.where(F.col("id") == 1), ["filtered id=1"])
    assert (info1.version, info1.parent) == (1, 0)
    assert vd.versions() == [0, 1]
    assert vd.read().count() == 1          # latest
    assert vd.read(0).count() == 2         # explicit
    hist = vd.history()
    assert [h.changes for h in hist] == [["imported"], ["filtered id=1"]]
    assert vd.meta().base == "cust"


def test_file_version_parse():
    assert parse_file_version("data_v3.csv") == 3
    assert parse_file_version("data.csv") is None
    assert strip_file_version("/x/y/housing_train_v2.csv") == "housing_train"


def test_paired_version_gate():
    ok, _ = check_paired_versions("h_train_v2.csv", "h_test_v2.csv")
    assert ok
    bad, msg = check_paired_versions("h_train_v2.csv", "h_test_v3.csv")
    assert not bad and "mismatch" in msg
    bad2, _ = check_paired_versions("h_train_v2.csv", "other_test_v2.csv")
    assert not bad2


def test_meta_csv_roundtrip(tmp_path):
    hist = {0: ["imported"], 1: ["dropped x", "imputed mean y"]}
    text = meta_csv.format_meta_lines(hist)
    assert text == "# META: v0: imported\n# META: v1: dropped x, imputed mean y\n"
    p = tmp_path / "d_v1.csv"
    p.write_text(text + "a,b\n1,2\n")
    assert meta_csv.load_meta_header(str(p)) == hist
    assert meta_csv.max_version(hist) == 1


def test_description_sidecar(tmp_path, spark):
    p = tmp_path / "desc.txt"
    p.write_text("age: years since birth\nbad line\nincome: usd / year\n")
    d = meta_csv.load_description_sidecar(str(p))
    assert d == {"age": "years since birth", "income": "usd / year"}
    df = spark.createDataFrame([(1, 2)], "age int, income int")
    out = meta_csv.apply_descriptions(df, d)
    assert out.schema["age"].metadata["comment"] == "years since birth"


def test_job_group_scope(spark):
    from ml_data_pipeline_spark.session import job_group

    with job_group(spark, "t-group", "test jobs") as jg:
        assert spark.createDataFrame([(1,)], "a int").count() == 1
        jg.cancel()  # no running jobs — must be a no-op, not an error


def test_merge_upsert(spark):
    from ml_data_pipeline_spark.sources import scd

    cur = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    got = {r["id"]: r["v"] for r in scd.merge_upsert(cur, upd, "id").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_scd2_history_and_snapshot(spark):
    from ml_data_pipeline_spark.sources import scd

    base = spark.createDataFrame([(1, "a", "2024-01-01"), (2, "b", "2024-01-01")],
                                 "id int, v string, ts string")
    hist = scd.scd2_init(base, "ts")
    upd = spark.createDataFrame([(1, "A", "2024-06-01")], "id int, v string, ts string")
    hist2 = scd.scd2_apply(hist, upd, "id", "ts")
    # key 1 has two versions, key 2 one
    assert hist2.count() == 3
    old = {r["id"]: r["v"] for r in scd.scd2_snapshot(hist2, "2024-03-01").collect()}
    new = {r["id"]: r["v"] for r in scd.scd2_snapshot(hist2, "2024-07-01").collect()}
    assert old == {1: "a", 2: "b"}
    assert new == {1: "A", 2: "b"}


def test_meta_csv_legacy_header(tmp_path):
    """Reference meta_tracker accepts `# META: v1 dropped x` (no colon) and
    blank lines inside the comment header (ADVICE r1)."""
    p = tmp_path / "legacy_v1.csv"
    p.write_text(
        "# META: v0 imported\n"
        "\n"
        "# META: v1: dropped x\n"
        "a,b\n1,2\n"
    )
    assert meta_csv.load_meta_header(str(p)) == {0: ["imported"], 1: ["dropped x"]}


def test_scd2_multi_update_per_key_compacts(spark):
    """A batch with several updates for one key must not fan out history:
    last-write-wins per key (ADVICE r1 — Delta MERGE raises here)."""
    from ml_data_pipeline_spark.sources import scd

    base = spark.createDataFrame([(1, "a", "2024-01-01")], "id int, v string, ts string")
    hist = scd.scd2_init(base, "ts")
    upd = spark.createDataFrame(
        [(1, "mid", "2024-03-01"), (1, "late", "2024-06-01")],
        "id int, v string, ts string",
    )
    hist2 = scd.scd2_apply(hist, upd, "id", "ts")
    # one closed original + ONE opened row (latest update), not three
    assert hist2.count() == 2
    assert {r["v"] for r in scd.scd2_snapshot(hist2, "2024-07-01").collect()} == {"late"}
    assert {r["v"] for r in scd.scd2_snapshot(hist2, "2024-02-01").collect()} == {"a"}


def test_versioned_writer_claim_blocks_duplicate(spark, tmp_path):
    """A stale/concurrent claim on the next version must raise, not clobber."""
    import pytest

    vd = VersionedDataset(spark, str(tmp_path), "claimed")
    df = spark.createDataFrame([(1,)], "a int")
    vd.write_version(df, ["v0"])
    # plant a claim for v1 as a concurrent writer would
    vd._write_text(f"{vd.root}/{vd.base}/.v1.claim", "", overwrite=False)
    with pytest.raises(RuntimeError, match="claimed"):
        vd.write_version(df, ["v1"])


def test_knn_exact_ceiling_enforced(spark, monkeypatch):
    """method='exact' must refuse oversized inputs instead of crossJoining."""
    import pytest

    from ml_data_pipeline_spark.operators import neighbors

    monkeypatch.setattr(neighbors, "EXACT_CEILING", 3)
    df = spark.range(10).select(
        F.col("id").alias("lid"), (F.col("id") * 1.0).alias("x")
    )
    r = df.select(F.col("lid").alias("rid"), "x")
    with pytest.raises(ValueError, match="EXACT_CEILING"):
        neighbors.knn_join(df, r, ["x"], k=2, left_id="lid", right_id="rid",
                           method="exact").count()


def test_jsonl_corrupt_records_quarantined(spark, tmp_path):
    """PERMISSIVE JSONL ingest: malformed lines land in _corrupt_record
    instead of failing the job — the at-scale posture (one bad line in a
    100 TB corpus must not kill the read)."""
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{not json at all}\n{"a": 2, "b": "y"}\n')
    df = spark.read.schema("a bigint, b string, _corrupt_record string").json(str(p))
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {(r["a"], r["b"]) for r in good} == {(1, "x"), (2, "y")}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_diff_versions_classification(spark):
    from ml_data_pipeline_spark.sources.versioned import diff_versions

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {(r["k"], r["change"]) for r in diff_versions(old, new, ["k"]).collect()}
    # 1 unchanged (not emitted), 2 changed, 3 removed, 4 added
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_diff_versions_rejects_schema_mismatch(spark):
    import pytest as _pytest

    from ml_data_pipeline_spark.sources.versioned import diff_versions

    a = spark.createDataFrame([(1, "x")], "k long, s string")
    b = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with _pytest.raises(ValueError):
        diff_versions(a, b, ["k"])


def test_read_evolved_unions_across_schema_change(spark, tmp_path):
    from ml_data_pipeline_spark.sources.versioned import VersionedDataset

    vd = VersionedDataset(spark, str(tmp_path), "evolving")
    v0 = spark.createDataFrame([(1, "a")], "id long, name string")
    vd.write_version(v0, ["initial"])
    v1 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    vd.write_version(v1, ["add score column"])

    allv = vd.read_evolved()
    assert set(allv.columns) == {"id", "name", "score", "_version"}
    rows = {r["id"]: (r["score"], r["_version"]) for r in allv.collect()}
    assert rows[1] == (None, 0)   # old rows: new column null-filled
    assert rows[2] == (9.5, 1)


def test_content_fingerprint_order_and_merge_invariance(spark):
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.sources.versioned import content_fingerprint

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], ["k", "v"]
    )
    a = content_fingerprint(df).collect()[0]
    b = content_fingerprint(df.orderBy(F.desc("k")).repartition(7)).collect()[0]
    assert (a["n_rows"], a["content_hash"]) == (b["n_rows"], b["content_hash"])
    # mergeable: xor of shard fingerprints == fingerprint of the union
    s1 = content_fingerprint(df.where(F.col("k") < 50)).collect()[0]
    s2 = content_fingerprint(df.where(F.col("k") >= 50)).collect()[0]
    assert s1["content_hash"] ^ s2["content_hash"] == a["content_hash"]
    # any single-row change flips the fingerprint
    c = content_fingerprint(
        df.withColumn("v", F.when(F.col("k") == 7, "CHANGED").otherwise(F.col("v")))
    ).collect()[0]
    assert c["content_hash"] != a["content_hash"]


def test_content_fingerprint_null_vs_empty_distinct(spark):
    from ml_data_pipeline_spark.sources.versioned import content_fingerprint

    withnull = spark.createDataFrame([(1, None)], "k int, v string")
    withempty = spark.createDataFrame([(1, "")], "k int, v string")
    h1 = content_fingerprint(withnull).collect()[0]["content_hash"]
    h2 = content_fingerprint(withempty).collect()[0]["content_hash"]
    assert h1 != h2


def test_bucketed_join_has_no_shuffle(spark):
    """s25: both sides bucketed on the join key -> no Exchange feeds the
    SortMergeJoin (the write-once, shuffle-never-again contract).
    Broadcast is disabled for the assertion — at test scale AQE would
    broadcast the tiny tables and hide the bucket alignment under test."""
    from ml_data_pipeline_spark import queries as Q

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = Q.ALL_QUERIES["s25_bucketed_join"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "SortMergeJoin" in plan, plan[:800]
    # no shuffle on the JOIN KEYS: the bucketed scans feed the join
    # directly (the countDistinct agg may shuffle on o_custkey — that is
    # a different key and not what bucketing addresses)
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:1500]
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:1500]
    assert "Bucketed: true" in plan, plan[:1500]


def test_partitioned_write_prunes_partitions(spark):
    """s24: the event_type filter must resolve at directory level
    (PartitionFilters), not as a data filter over every file."""
    from ml_data_pipeline_spark import queries as Q

    df = Q.ALL_QUERIES["s24_partitioned_write"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan or (
        "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    ), plan[:1200]


def test_r11_read_csv_quoted_empty_survives_custom_spellings(spark, tmp_path):
    """ADVICE r10: Spark's CSV reader default nullValue is the empty
    string, so quoted-empty fields were destroyed at parse time even when
    null_spellings deliberately excluded blank forms — normalize_nulls
    preserved empty strings the reader had already turned to NULL. With a
    blank-free custom spelling set the reader now takes a non-occurring
    nullValue sentinel. Parser limit (probed): an UNQUOTED empty field is
    tokenized as null regardless of options, so only the quoted form is
    recoverable."""
    from ml_data_pipeline_spark.sources import csv_io as CSV

    p = tmp_path / "q.csv"
    p.write_text('code,v\n"",1\n?,2\nx,3\n')
    df = CSV.read_csv(spark, str(p), null_spellings=["?"])
    rows = {r["v"]: r["code"] for r in df.collect()}
    assert rows[1] == ""        # quoted empty survives (was NULL)
    assert rows[2] is None      # '?' nulled per the caller's contract
    assert rows[3] == "x"
    # the default spelling set includes blank forms — quoted empty nulls
    p2 = tmp_path / "q2.csv"
    p2.write_text('code,v\n"",1\nx,2\n')
    dd = {r["v"]: r["code"] for r in CSV.read_csv(spark, str(p2)).collect()}
    assert dd[1] is None and dd[2] == "x"


def test_r10_source_fixes(spark, tmp_path):
    """r10 review regressions across the source layer."""
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.sources import csv_io as CSV
    from ml_data_pipeline_spark.sources import scd as SCD
    from ml_data_pipeline_spark.sources.versioned import content_fingerprint

    # custom null spellings are authoritative: 'NA' survives when excluded,
    # empty strings survive when not listed
    p = tmp_path / "c.csv"
    p.write_text("code,v\nNA,1\n?,2\n")
    df = CSV.read_csv(spark, str(p), null_spellings=["?"])
    rows = {r["v"]: r["code"] for r in df.collect()}
    assert rows[1] == "NA"      # Namibia survives
    assert rows[2] is None      # '?' nulled
    # normalize_nulls honors the caller's spellings: empty strings are
    # nulled ONLY when an empty/whitespace spelling is listed
    base = spark.createDataFrame([("",), ("?",), ("x",)], "code string")
    kept = {r["code"] for r in CSV.normalize_nulls(base, ["?"]).collect()}
    assert kept == {"", None, "x"}
    blanked = {r["code"] for r in CSV.normalize_nulls(base, ["?", ""]).collect()}
    assert blanked == {None, "x"}
    # merge_upsert compacts duplicate keys in one batch (SCD1 uniqueness)
    cur = spark.createDataFrame(
        [(1, "old", 1), (2, "keep", 1)], "k long, v string, ts int"
    )
    upd = spark.createDataFrame(
        [(1, "u1", 10), (1, "u2", 20), (3, "new", 5)], "k long, v string, ts int"
    )
    out = SCD.merge_upsert(cur, upd, "k", ts_col="ts")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert len(out.collect()) == 3 and got[1] == "u2"  # latest ts wins, one row per key
    # r14 (stream_recovery.py finding): a LATE-arriving older row must not
    # overwrite newer keyed state — latest-wins applies vs current too
    late = spark.createDataFrame([(1, "stale", 5)], "k long, v string, ts int")
    again = {r["k"]: r["v"] for r in SCD.merge_upsert(out, late, "k", ts_col="ts").collect()}
    assert again[1] == "u2"  # ts 5 < 20: current row survives
    # ... and merging the same batch twice stays idempotent
    twice = {r["k"]: r["v"] for r in SCD.merge_upsert(out, upd, "k", ts_col="ts").collect()}
    assert twice == got
    # content_fingerprint: field-boundary shifts no longer collide
    a = spark.createDataFrame([("a|b", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b|c")], "x string, y string")
    ha = content_fingerprint(a).collect()[0]["content_hash"]
    hb = content_fingerprint(b).collect()[0]["content_hash"]
    assert ha != hb
    # and a literal sentinel is distinct from NULL
    c = spark.createDataFrame([("␀",)], "x string")
    d = spark.createDataFrame([(None,)], "x string")
    assert (
        content_fingerprint(c).collect()[0]["content_hash"]
        != content_fingerprint(d).collect()[0]["content_hash"]
    )
