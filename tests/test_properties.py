"""Property-based tests (hypothesis): operator invariants over random
inputs — the contracts the oracle gate pins at one dataset, checked across
many. Settings keep each Spark round-trip count low (local JVM latency)."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import balancing as B
from ml_data_pipeline_spark.operators import dedup as DD
from ml_data_pipeline_spark.operators import imputation as I

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_interpolate_matches_pandas_any_sequence(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "o int, v double")
    got = [r["v"] for r in I.impute_interpolate(df, "v", "o").orderBy("o").collect()]
    expected = pd.Series(vals, dtype=float).interpolate(
        method="linear", limit_direction="both"
    ).tolist()
    for g, e in zip(got, expected):
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert g is None  # all-null input stays null
        else:
            assert g is not None and math.isclose(g, e, rel_tol=1e-9, abs_tol=1e-9)


@given(
    counts=st.lists(st.integers(min_value=1, max_value=12), min_size=2, max_size=4),
    seed=st.integers(min_value=0, max_value=2**30),
)
@SET
def test_under_oversample_count_contracts(spark, counts, seed):
    data = [(f"c{ci}", float(i)) for ci, n in enumerate(counts) for i in range(n)]
    df = spark.createDataFrame(data, "cls string, x double")
    under = {
        r["cls"]: r["n"]
        for r in B.random_undersample(df, "cls", seed)
        .groupBy("cls").agg(F.count("*").alias("n")).collect()
    }
    assert set(under.values()) == {min(counts)}
    over = {
        r["cls"]: r["n"]
        for r in B.random_oversample(df, "cls", seed)
        .groupBy("cls").agg(F.count("*").alias("n")).collect()
    }
    assert set(over.values()) == {max(counts)}


@given(
    texts=st.lists(
        st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=10
    )
)
@SET
def test_exact_dedup_idempotent_and_minimal(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = DD.exact_dedup(df, ["text"])
    n_distinct = df.select("text").distinct().count()
    assert once.count() == n_distinct
    # idempotence
    assert DD.exact_dedup(once, ["text"]).count() == n_distinct
    # survivors keep the minimal id per text (min-struct determinism)
    survivors = {r["text"]: r["doc_id"] for r in once.collect()}
    for t, i in survivors.items():
        assert i == min(j for j, tt in enumerate(texts) if tt == t)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
        min_size=2,
        max_size=25,
    ).filter(lambda v: any(x is not None for x in v))
)
@SET
def test_mean_impute_preserves_mean(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = I.impute_mean(df, "x")
    before = df.agg(F.avg("x")).first()[0]
    after = out.agg(F.avg("x")).first()[0]
    assert out.where(F.col("x").isNull()).count() == 0
    assert math.isclose(before, after, rel_tol=1e-9, abs_tol=1e-9)


@given(
    n_left=st.integers(min_value=1, max_value=15),
    n_right=st.integers(min_value=0, max_value=15),
    seed=st.integers(min_value=0, max_value=1000),
)
@SET
def test_asof_join_matches_pandas_random(spark, n_left, n_right, seed):
    import random

    from ml_data_pipeline_spark.operators import temporal as TP

    rng = random.Random(seed)
    keys = ["a", "b"]
    left = [(rng.choice(keys), float(rng.randint(0, 50))) for _ in range(n_left)]
    right = [
        (rng.choice(keys), float(rng.randint(0, 50)), float(i)) for i in range(n_right)
    ]
    ldf = spark.createDataFrame(left, "k string, lt double")
    rdf = spark.createDataFrame(right, "k string, rt double, v double")
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in TP.asof_join(ldf, rdf, "k", "lt", "rt").collect()
    }
    lp = pd.DataFrame(left, columns=["k", "lt"]).sort_values("lt", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "rt", "v"]).sort_values("rt", kind="stable")
    if len(rp):
        # pandas merge_asof keeps the LAST right row on rt ties; our operator
        # picks the one sorting last by (rt) too — drop exact-duplicate
        # (k, rt) rows keeping the max v to make the expectation well-defined
        rp = rp.sort_values(["rt", "v"]).drop_duplicates(["k", "rt"], keep="last")
        exp = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k")
    else:
        exp = lp.assign(v=float("nan"))
    for _, row in exp.iterrows():
        e = None if pd.isna(row["v"]) else row["v"]
        g = got[(row["k"], row["lt"])]
        assert g == e, (dict(row), g)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
@SET
def test_redact_pii_idempotent(spark, texts):
    """Redaction is a fixed point: applying it twice equals applying it
    once (the '<kind>' tokens never re-match any PII pattern)."""
    from ml_data_pipeline_spark.operators import cleaning as CL

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    once = CL.redact_pii(df)
    twice = CL.redact_pii(once)
    a = [r["text"] for r in once.orderBy("id").collect()]
    b = [r["text"] for r in twice.orderBy("id").collect()]
    assert a == b


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40, unique=True),
    f1=st.floats(min_value=0.05, max_value=0.45),
)
@SET
def test_split_by_hash_membership_nested(spark, keys, f1):
    """Monotone membership: the test set at fraction f is a SUBSET of the
    test set at any larger fraction — growing the holdout never moves an
    example out of it."""
    from ml_data_pipeline_spark.operators.sampling import split_by_hash

    f2 = min(0.95, f1 * 2)
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    t1 = {r["k"] for r in split_by_hash(df, "k", f1).where("is_test").collect()}
    t2 = {r["k"] for r in split_by_hash(df, "k", f2).where("is_test").collect()}
    assert t1 <= t2


@given(
    pairs=st.lists(
        st.tuples(
            st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
            st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
        ),
        min_size=3,
        max_size=25,
    )
)
@SET
def test_spearman_matches_pandas_and_bounded(spark, pairs):
    from ml_data_pipeline_spark.operators.profiling import spearman_corr

    df = spark.createDataFrame(pairs, "a double, b double")
    r = spearman_corr(df, "a", "b").first()
    expected = pd.DataFrame(pairs, columns=["a", "b"]).corr(method="spearman").iloc[0, 1]
    if r["spearman"] is None:
        assert math.isnan(expected) or pd.isna(expected)  # constant column
    else:
        assert -1.0 <= r["spearman"] <= 1.0
        assert math.isclose(r["spearman"], expected, rel_tol=1e-4, abs_tol=1e-4)


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=1e3, allow_nan=False), min_size=1, max_size=20
    ),
    alpha=st.floats(min_value=0.05, max_value=0.95),
)
@SET
def test_ewma_last_matches_sequential_recurrence(spark, vals, alpha):
    from ml_data_pipeline_spark.operators.temporal import ewma_last

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, d int, x double"
    )
    got = ewma_last(df, "x", "d", "g", alpha=alpha).first()["ewma"]
    s = vals[0]
    for v in vals[1:]:
        s = alpha * v + (1 - alpha) * s
    assert math.isclose(got, round(s, 6), rel_tol=1e-6, abs_tol=2e-6)


@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False), min_size=2, max_size=25
    )
)
@SET
def test_robust_scale_median_maps_to_zero(spark, vals):
    from ml_data_pipeline_spark.operators.filters import robust_scale

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = robust_scale(df, "x").toPandas()
    med = pd.Series(vals).quantile(0.5)
    q1, q3 = pd.Series(vals).quantile(0.25), pd.Series(vals).quantile(0.75)
    if q3 - q1 == 0.0:  # exact, mirroring the operator's nullif(iqr, 0)
        assert out["x_scaled"].isna().all()  # zero IQR -> explicit NULL
    else:
        expected = ((pd.Series(vals) - med) / (q3 - q1)).tolist()
        got = out.sort_values("x")["x_scaled"].tolist()
        for g, e in zip(got, sorted(expected)):
            assert math.isclose(g, e, rel_tol=1e-6, abs_tol=1e-6)


@given(
    host=st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True),
    www=st.booleans(),
    upper=st.booleans(),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9._-]{0,8}){0,3}/?", fullmatch=True),
    params=st.lists(
        st.sampled_from(["a=1", "b=2", "z=9", "utm_source=x", "utm_campaign=y", "gclid=g", "ref=r"]),
        max_size=5,
    ),
    frag=st.sampled_from(["", "#top", "#a/b"]),
)
@SET
def test_canonicalize_url_idempotent_and_tracking_free(spark, host, www, upper, port, path, params, frag):
    """For any http(s) URL: canonicalize(canonicalize(u)) ==
    canonicalize(u) (a canonical form is a fixed point) and the result
    never carries tracking params, fragments, 'www.', or default ports."""
    from ml_data_pipeline_spark.operators import cleaning as CL

    raw = "https://" + ("www." if www else "") + host + port + path
    if params:
        raw += "?" + "&".join(params)
    raw += frag
    if upper:
        raw = raw.upper().replace("HTTPS://", "https://", 1)
    df = spark.createDataFrame([(1, raw)], "id long, url string")
    once = CL.canonicalize_url(df).first()["canonical_url"]
    assert once is not None
    again = (
        CL.canonicalize_url(
            spark.createDataFrame([(1, once)], "id long, url string")
        ).first()["canonical_url"]
    )
    assert again == once
    for bad in ("utm_", "gclid", "ref=", "#", "://www."):
        assert bad not in once, (raw, once, bad)
    # the port that is DEFAULT for the scheme is stripped; any other port
    # (':8080', or http's ':443' / https' ':80' — r10 fix: those are real
    # non-default endpoints) survives. Match the authority END, not any
    # substring (':80' is inside ':8080').
    authority = once.split("/")[2]
    scheme = once.split("://")[0]
    default = ":443" if scheme == "https" else ":80"
    assert not authority.endswith(default), (raw, once)


@given(
    weights=st.lists(
        st.floats(min_value=0.01, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=12,
    ),
    total=st.integers(min_value=0, max_value=5000),
)
@SET
def test_quota_allocation_always_sums_to_total(spark, weights, total):
    from ml_data_pipeline_spark.operators.sampling import quota_allocation

    df = spark.createDataFrame(
        [(f"g{i:02d}", float(w)) for i, w in enumerate(weights)], ["g", "w"]
    )
    got = quota_allocation(df, "g", "w", total).collect()
    assert sum(r["quota"] for r in got) == total  # Hamilton: EXACT, always
    assert all(r["quota"] >= 0 for r in got)
    assert len(got) == len(weights)


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=50), st.text(max_size=6)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@SET
def test_content_fingerprint_merge_property_random(spark, rows):
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.sources.versioned import content_fingerprint

    df = spark.createDataFrame(rows, "k int, v string")
    whole = content_fingerprint(df).collect()[0]
    lo = content_fingerprint(df.where(F.col("k") < 25)).collect()[0]
    hi = content_fingerprint(df.where(F.col("k") >= 25)).collect()[0]
    # xor-mergeability holds for ANY split of unique-keyed rows
    assert lo["content_hash"] ^ hi["content_hash"] == whole["content_hash"]
    assert lo["n_rows"] + hi["n_rows"] == whole["n_rows"]


@given(
    durs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.booleans()),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_kaplan_meier_monotone_and_bounded(spark, durs):
    from ml_data_pipeline_spark.operators.temporal import kaplan_meier

    df = spark.createDataFrame(
        [(d, int(e)) for d, e in durs], "duration int, event int"
    )
    rows = kaplan_meier(df, "duration", "event").orderBy("t").collect()
    # survival is a non-increasing step function in [0, 1]
    last = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= last + 1e-9
        last = r["survival"]
        assert r["d_events"] >= 1 and r["n_risk"] >= r["d_events"]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),      # treat
            st.integers(min_value=0, max_value=40),     # score grid
        ),
        min_size=2,
        max_size=40,
    ).filter(lambda r: any(t == 0 for t, _ in r) and any(t == 1 for t, _ in r))
)
@SET
def test_psm_ranged_equals_global_property(spark, rows):
    from ml_data_pipeline_spark.operators import causal as C

    df = spark.createDataFrame(
        [(i, t, s / 40.0, float(i % 5)) for i, (t, s) in enumerate(rows)],
        "uid int, t int, s double, y double",
    )
    want = sorted(map(tuple, C.psm_match(df, "t", "s", "uid", "y").collect()))
    got = sorted(
        map(tuple, C.psm_match_ranged(df, "t", "s", "uid", "y", num_partitions=4).collect())
    )
    assert got == want


@given(
    xs=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=3, max_size=40
    )
)
@SET
def test_acf_bounded_property(spark, xs):
    from ml_data_pipeline_spark.operators.temporal import acf

    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "t int, x double"
    )
    for r in acf(df, "x", "t", max_lag=3).collect():
        if r["acf"] is not None:       # constant series -> NULL
            assert -1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6
        assert r["n_pairs"] == max(0, len(xs) - r["lag"])


@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=8)),
        min_size=2,
        max_size=50,
    ).filter(lambda r: any(g for g, _ in r) and any(not g for g, _ in r))
)
@SET
def test_mann_whitney_u_sum_identity(spark, rows):
    """U_a + U_b = n_a * n_b — the defining rank identity, tie-proof."""
    from ml_data_pipeline_spark.operators import profiling as P

    df = spark.createDataFrame(
        [("a" if g else "b", float(v)) for g, v in rows], "g string, v double"
    )
    ua = P.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    ub = P.mann_whitney_u(df, "v", "g", "b", "a").collect()[0]
    assert abs(ua["u_a"] + ub["u_a"] - ua["n_a"] * ua["n_b"]) < 1e-6


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=10),
            st.booleans(),
        ),
        min_size=2,
        max_size=40,
    ).filter(lambda r: any(g == 0 for g, _, _ in r) and any(g == 1 for g, _, _ in r))
)
@SET
def test_logrank_chi2_nonnegative(spark, rows):
    from ml_data_pipeline_spark.operators.temporal import logrank_test

    df = spark.createDataFrame(
        [(g, t, int(e)) for g, t, e in rows], "g int, t int, e int"
    )
    out = logrank_test(df, "t", "e", "g", 0, 1).collect()[0]
    assert out["n_a"] == sum(1 for g, _, _ in rows if g == 0)
    assert out["n_b"] == sum(1 for g, _, _ in rows if g == 1)
    if out["chi2"] is not None:        # zero variance (no events) -> NULL
        assert out["chi2"] >= -1e-9


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    ),
    min_pts=st.integers(min_value=2, max_value=4),
)
@SET
def test_dbscan_same_component_cores_share_label(spark, edges, min_pts):
    from ml_data_pipeline_spark.ml.clustering import dbscan_labels

    points = spark.createDataFrame([(i,) for i in range(1, 13)], "vec_id int")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a int, id_b int"
    )
    out = dbscan_labels(points, pairs, min_pts=min_pts).collect()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {r["vec_id"]: r["label"] for r in out}
    core = {r["vec_id"] for r in out if r["is_core"]}
    # definition check: core iff degree+1 >= min_pts
    for p in range(1, 13):
        assert (len(adj.get(p, ())) + 1 >= min_pts) == (p in core)
    for p in core:
        assert lab[p] is not None
        for q in adj[p]:
            if q in core:
                assert lab[q] == lab[p]          # connected cores share label
            else:
                assert lab[q] is not None         # border of a core is labeled
    for r in out:                                 # noise iff no core neighbor
        if r["label"] is None:
            assert r["vec_id"] not in core
            assert not (adj.get(r["vec_id"], set()) & core)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_evaluate_classification_matches_mllib_evaluator(spark, rows):
    """The one-pass confusion-matrix suite (r8) must equal MLlib's
    MulticlassClassificationEvaluator on ANY (label, prediction) table —
    including classes that are never predicted or only predicted."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    from ml_data_pipeline_spark.ml.pipeline import evaluate_classification

    preds = spark.createDataFrame(
        [(float(y), float(p)) for y, p in rows], "label double, prediction double"
    )
    m = evaluate_classification(preds, label_col="label")
    for metric, name in [
        ("accuracy", "accuracy"),
        ("weightedPrecision", "precision"),
        ("weightedRecall", "recall"),
        ("f1", "f1"),
    ]:
        ref = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName=metric
        ).evaluate(preds)
        assert math.isclose(m[name], ref, rel_tol=1e-9, abs_tol=1e-12), (name, m[name], ref)


@given(
    events=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40)),  # (user, day offset)
        min_size=1,
        max_size=60,
    )
)
@SET
def test_churn_labels_one_pass_equals_two_scan_reference(spark, events):
    """The r8 single-aggregate churn_labels must equal the textbook
    two-scan formulation (past aggregate LEFT JOIN horizon distinct) on
    random event sets straddling the cutoff."""
    from ml_data_pipeline_spark.operators.temporal import churn_labels

    df = spark.createDataFrame(
        [(u, f"2024-01-{1 + d % 28:02d} 06:00:00") for u, d in events],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    cutoff, horizon = "2024-01-15 00:00:00", 7
    got = {
        r["user_id"]: (r["n_events"], r["days_since_last"], r["active_span_days"], r["churned"])
        for r in churn_labels(df, "user_id", "ts", cutoff, horizon).collect()
    }
    cut = F.lit(cutoff).cast("timestamp")
    past = (
        df.where(F.col("ts") < cut)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.datediff(cut.cast("date"), F.max("ts").cast("date")).alias("dsl"),
            F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date")).alias("span"),
        )
    )
    fut = (
        df.where((F.col("ts") >= cut) & (F.col("ts") < cut + F.expr(f"INTERVAL {horizon} DAYS")))
        .select("user_id")
        .distinct()
        .withColumn("__alive", F.lit(1))
    )
    want = {
        r["user_id"]: (r["n"], r["dsl"], r["span"], r["__alive"] is None)
        for r in past.join(fut, "user_id", "left").collect()
    }
    assert got == want


@given(
    sig=st.integers(min_value=0, max_value=(1 << 64) - 1),
    flips=st.lists(st.integers(min_value=0, max_value=63), max_size=3, unique=True),
)
@SET
def test_simhash_combinatorial_banding_pigeonhole(sig, flips):
    """Pure-math recall guarantee of the r10 combinatorial LSH (no Spark):
    for ANY 64-bit signature and ANY <=3 bit flips, the pair (sig,
    flipped) must share at least one of the C(6,3) indexed 3-block-combo
    keys — the exact property simhash_near_duplicates(max_hamming=3)
    relies on for zero recall loss."""
    import itertools

    other = sig
    for b in flips:
        other ^= 1 << b
    nblocks = 6
    widths = [64 // nblocks + (1 if i < 64 % nblocks else 0) for i in range(nblocks)]
    offs = [sum(widths[:i]) for i in range(nblocks)]

    def key(s, combo):
        return tuple((s >> offs[b]) & ((1 << widths[b]) - 1) for b in combo)

    combos = list(itertools.combinations(range(nblocks), 3))
    assert any(key(sig, c) == key(other, c) for c in combos)


def test_simhash_signature_values_pinned(spark):
    """Reference twin for the r10 grouped 8x8 vote aggregate: an
    independent per-bit SQL formulation (the r2-r9 explode-0..63 shape,
    written directly in SparkSQL) must produce bit-identical signatures —
    any drift in the grouped vote math (bit packing, tie handling, group
    assembly) diverges from the definition."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon"),
         (3, "zz yy xx ww")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["simhash"] for r in
           DD.simhash_signatures(docs, "text", "doc_id", idf_weighted=False).collect()}
    exp = {r["id"]: r["simhash"] for r in spark.sql("""
        WITH toks AS (
            SELECT doc_id AS id, explode(split(lower(text), '\\\\s+')) AS t
            FROM {d}
        ),
        votes AS (
            SELECT id, i,
                   sum(CASE WHEN (shiftright(xxhash64(t), i) & 1) = 1
                            THEN 1.0 ELSE -1.0 END) AS v
            FROM toks LATERAL VIEW explode(sequence(0, 63)) AS i
            GROUP BY id, i
        )
        SELECT id, sum(CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), i)
                            ELSE CAST(0 AS BIGINT) END) AS simhash
        FROM votes GROUP BY id
    """, d=docs).collect()}
    assert got == exp and len(got) == 3


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=12,
    )
)
@SET
def test_ngram_jaccard_matches_python_reference(spark, docs):
    """Differential test on RANDOM corpora: ngram_jaccard_pairs (inverted-
    index join, counts-only verify) must equal a direct per-pair Python
    computation of word-trigram Jaccard — the gate pins one dataset, this
    pins the algorithm."""
    import itertools

    frame = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(frame, n=3, threshold=0.0).collect()
    }

    def grams(t):
        toks = [w for w in t.lower().split() if w]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    exp = {}
    for (ia, ta), (ib, tb) in itertools.combinations(enumerate(docs), 2):
        ga, gb = grams(ta), grams(tb)
        if ga and gb:
            j = len(ga & gb) / len(ga | gb)
            if j > 0:  # operator emits only intersecting pairs
                exp[(ia, ib)] = round(j, 6)
    assert got == exp


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        max_size=25,
    )
)
@SET
def test_connected_components_matches_union_find(spark, edges):
    """Differential test: large-star/small-star components on random edge
    lists must equal a Python union-find's min-id labels."""
    from ml_data_pipeline_spark.operators import components as CC

    if not edges:
        return
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in CC.connected_components(pairs).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {x: find(x) for x in parent}
    assert got == exp


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefghij"), min_size=1, max_size=10).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    d=st.integers(0, 4),
)
@SET
def test_simhash_lsh_equals_brute_force_on_signatures(spark, docs, d):
    """End-to-end LSH exactness on RANDOM corpora and RANDOM hamming
    budgets: simhash_near_duplicates' banded-candidate + verify output
    must EQUAL brute-force all-pairs hamming over its own signatures —
    the zero-recall-loss claim, checked against the data rather than
    only the pigeonhole argument."""
    frame = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    sigs = {
        r["id"]: r["simhash"]
        for r in DD.simhash_signatures(frame, idf_weighted=False).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_near_duplicates(
            frame, max_hamming=d, idf_weighted=False
        ).collect()
    }
    exp = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            if h <= d:
                exp[(a, b)] = h
    assert got == exp


@given(
    toks=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=25),
    budget=st.integers(min_value=1, max_value=60),
)
@SET
def test_pack_sequences_matches_running_sum_replay(spark, toks, budget):
    """Differential test: offset packing equals a Python running-sum
    replay (bin = floor(exclusive_prefix_sum / budget)), and every bin's
    total stays under budget + max_doc_tokens (the documented bounded
    overflow)."""
    from ml_data_pipeline_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate(toks)], "doc_id long, source string, n_tokens int"
    )
    got = {
        r["doc_id"]: r["bin_id"]
        for r in PK.pack_sequences(df, budget, partition_col="source").collect()
    }
    run = 0
    exp, bins = {}, {}
    for i, n in enumerate(toks):
        b = run // budget
        exp[i] = b
        bins[b] = bins.get(b, 0) + n
        run += n
    assert got == exp
    assert all(t < budget + max(toks) for t in bins.values())


@given(
    keys=st.lists(
        st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62), st.text(max_size=12)),
        min_size=1,
        max_size=25,
    ),
    buckets=st.integers(min_value=1, max_value=9999),
    salt=st.text(max_size=6),
)
@SET
def test_hash_bucket_range_determinism_null_safety(spark, keys, buckets, salt):
    """r11 hash_bucket (the ONE shared md5 bucket recipe): every bucket is
    in [0, buckets) — including for negative and NULL keys (conv of 8 hex
    digits is non-negative; concat_ws is null-safe) — and membership is a
    pure function of (key, salt): a second evaluation is identical."""
    from ml_data_pipeline_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([(str(k) if k is not None else None,) for k in keys], "k string")
    out = df.select("k", hash_bucket(["k"], buckets, salt).alias("b"))
    rows = out.collect()
    assert all(r["b"] is not None and 0 <= r["b"] < buckets for r in rows)
    again = {(r["k"], r["b"]) for r in out.collect()}
    assert {(r["k"], r["b"]) for r in rows} == again


@given(
    w1=st.floats(min_value=1.0, max_value=1e6),
    ratio=st.floats(min_value=1.0, max_value=16.0),
    length=st.floats(min_value=1e-3, max_value=8.0),
)
@SET
def test_calibrated_length_contracts(w1, ratio, length):
    """r11 _calibrated_length invariants: (a) within 2x of target the
    width is untouched (no plan churn); (b) overfull cells always SHRINK
    the width, never grow it; (c) the result stays inside the clamp; and
    (d) under the modeled response w(l) = w1*(l/length)^beta the solved
    width would land occupancy exactly on target (up to clamping)."""
    import math

    from ml_data_pipeline_spark.operators.neighbors import (
        _TARGET_OCCUPANCY,
        _calibrated_length,
    )

    w2 = w1 / ratio
    got = _calibrated_length(w1, w2, length)
    if w1 <= 2 * _TARGET_OCCUPANCY:
        assert got == length
        return
    assert 1e-3 <= got <= 8.0
    assert got <= length  # overfull can only shrink
    beta = min(max(math.log2(w1 / w2), 0.5), 4.0) if ratio > 1.0 else 1.0
    want = min(max(length * (_TARGET_OCCUPANCY / w1) ** (1.0 / beta), 1e-3), 8.0)
    assert math.isclose(got, want, rel_tol=1e-12)


def test_r13_xxhash64_pinned_to_public_xxh64_seed42_vectors(spark):
    """VERDICT r12 item 2: xxhash64 is the ONE primitive no cross-engine
    oracle replays (the dd_minhash/dd_simhash headline signatures — their
    md5 twins cover the surrounding pipeline logic, not the hash itself).
    A Spark upgrade that changed xxhash64's seeding would silently
    re-cluster every headline dedup with all gates green. Pin it to
    hardcoded vectors of the PUBLIC XXH64 spec at Spark's fixed seed 42
    (each value independently re-derived from the reference algorithm,
    not just snapshotted from the current JVM): string inputs hash their
    UTF-8 bytes (dedup.py shingle/token path), long inputs their 8-byte
    little-endian representation."""
    expect = {
        "hello": -4367754540140381902,
        "": -7444071767201028348,
        "the quick brown fox": 6882318601984224800,
        "abcd": -6810745876291105281,
    }
    row = spark.range(1).select(
        *[F.xxhash64(F.lit(s)).alias(f"s{i}") for i, s in enumerate(expect)],
        F.xxhash64(F.lit(42).cast("long")).alias("i64"),
    ).first()
    got = {s: row[f"s{i}"] for i, s in enumerate(expect)}
    assert got == expect
    assert row["i64"] == -6876166290308861218


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),    # order key (ties!)
            st.integers(min_value=-9, max_value=9),    # long sum col
        ),
        min_size=1,
        max_size=40,
    ),
    p=st.sampled_from([1, 3, 32]),
)
@SET
def test_ranged_cumsum_equals_global_window_property(spark, rows, p):
    """r14 kernel: per-range prefix sums + P-row carry == the global
    single-task cumulative window, for arbitrary integer frames with key
    ties (a unique id tie-breaks the order, as callers must) and P below,
    at, or above the row count."""
    from pyspark.sql import Window

    from ml_data_pipeline_spark.operators.profiling import ranged_cumsum

    df = spark.createDataFrame(
        [(i, k, x) for i, (k, x) in enumerate(rows)], "id int, k int, x long"
    )
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["c"] for r in df.withColumn("c", F.sum("x").over(w)).collect()
    }
    got = {
        r["id"]: r["__cum_x"]
        for r in ranged_cumsum(df, ["k", "id"], ["x"], num_partitions=p).collect()
    }
    assert got == want
