"""Causal-effect estimators: PSM matching, DiD, Qini."""

from __future__ import annotations

import pytest

from ml_data_pipeline_spark.operators import causal as C


@pytest.fixture(scope="module")
def obs(spark):
    # (id, treat, score, outcome)
    rows = [
        (1, 1, 0.30, 10.0),
        (2, 1, 0.52, 20.0),
        (3, 1, 0.90, 30.0),
        (101, 0, 0.10, 1.0),
        (102, 0, 0.50, 2.0),
        (103, 0, 0.54, 3.0),
        (104, 0, 0.80, 4.0),
    ]
    return spark.createDataFrame(rows, "uid int, t int, s double, y double")


def test_psm_match_nearest_and_ties(spark, obs):
    got = {
        r["treated_id"]: (r["control_id"], r["c_score"])
        for r in C.psm_match(obs, "t", "s", "uid", "y").collect()
    }
    # t=0.30: below 0.10 (d=.2), above 0.50 (d=.2) equidistant -> LOWER score
    assert got[1] == (101, 0.10)
    # t=0.52: below 0.50 (d=.02), above 0.54 (d=.02) equidistant -> lower
    assert got[2] == (102, 0.50)
    # t=0.90: nearest is 0.80
    assert got[3] == (104, 0.80)


def test_psm_match_same_score_control_wins(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.5, 9.0), (11, 0, 0.5, 1.0), (12, 0, 0.4, 2.0)],
        "uid int, t int, s double, y double",
    )
    rows = C.psm_match(df, "t", "s", "uid", "y").collect()
    assert rows[0]["control_id"] == 11 and rows[0]["c_score"] == 0.5


def test_psm_match_duplicate_score_controls_min_id(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.5, 9.0), (12, 0, 0.6, 2.0), (11, 0, 0.6, 1.0)],
        "uid int, t int, s double, y double",
    )
    rows = C.psm_match(df, "t", "s", "uid", "y").collect()
    # two controls at the same score: min-id survivor
    assert rows[0]["control_id"] == 11


def test_psm_match_caliper_and_no_controls(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.9, 9.0), (11, 0, 0.1, 1.0)], "uid int, t int, s double, y double"
    )
    assert C.psm_match(df, "t", "s", "uid", "y", caliper=0.5).count() == 0
    only_treated = spark.createDataFrame(
        [(1, 1, 0.9, 9.0)], "uid int, t int, s double, y double"
    )
    assert C.psm_match(only_treated, "t", "s", "uid", "y").count() == 0


def test_psm_att_hand_computed(spark, obs):
    out = C.psm_att(obs, "t", "s", "uid", "y").collect()[0]
    assert out["n_matched"] == 3
    # pairs: (10-1), (20-2), (30-4) -> att = (9+18+26)/3
    assert out["att"] == round((9 + 18 + 26) / 3, 6)


def test_psm_match_ranged_equals_global(spark, obs):
    want = sorted(map(tuple, C.psm_match(obs, "t", "s", "uid", "y").collect()))
    got = sorted(
        map(tuple, C.psm_match_ranged(obs, "t", "s", "uid", "y", num_partitions=3).collect())
    )
    assert got == want


def test_psm_match_ranged_boundary_carries(spark):
    # 200 units over many range partitions: treated units whose nearest
    # control lives in an adjacent range MUST see it via the carry-in.
    rows = []
    for i in range(200):
        # controls sparse (every 7th unit) so long carry chains cross ranges
        t = 0 if i % 7 == 0 else 1
        rows.append((i, t, i / 200.0, float(i % 5)))
    df = spark.createDataFrame(rows, "uid int, t int, s double, y double")
    want = sorted(map(tuple, C.psm_match(df, "t", "s", "uid", "y").collect()))
    got = sorted(
        map(tuple, C.psm_match_ranged(df, "t", "s", "uid", "y", num_partitions=8).collect())
    )
    assert got == want
    # and with a caliper
    want_c = sorted(
        map(tuple, C.psm_match(df, "t", "s", "uid", "y", caliper=0.01).collect())
    )
    got_c = sorted(
        map(
            tuple,
            C.psm_match_ranged(
                df, "t", "s", "uid", "y", caliper=0.01, num_partitions=8
            ).collect(),
        )
    )
    assert got_c == want_c


def test_did_hand_computed(spark):
    rows = [
        (1, 0, 10.0), (1, 0, 14.0),   # treat pre: mean 12
        (1, 1, 30.0),                 # treat post: 30
        (0, 0, 5.0), (0, 1, 9.0),     # ctl pre 5, post 9
    ]
    df = spark.createDataFrame(rows, "t int, p int, y double")
    out = C.did_estimate(df, "t", "p", "y").collect()[0]
    assert out["treat_pre"] == 12.0 and out["treat_post"] == 30.0
    assert out["ctl_pre"] == 5.0 and out["ctl_post"] == 9.0
    assert out["n_treat_pre"] == 2 and out["n_ctl_post"] == 1
    assert out["did"] == (30.0 - 12.0) - (9.0 - 5.0)


def test_qini_hand_computed(spark):
    # 4 units, 2 bins; scores order units 1..4 descending
    rows = [
        (1, 1, 0.9, 1.0),  # bin 1 treated converted
        (2, 0, 0.8, 1.0),  # bin 1 control converted
        (3, 1, 0.2, 0.0),  # bin 2 treated not
        (4, 0, 0.1, 1.0),  # bin 2 control converted
    ]
    df = spark.createDataFrame(rows, "uid int, t int, s double, y double")
    got = {r["bin"]: r for r in C.qini_curve(df, "t", "s", "y", "uid", n_bins=2).collect()}
    b1, b2 = got[1], got[2]
    assert b1["n_cum"] == 2 and b2["n_cum"] == 4
    # bin1: yt=1, nt=1, yc=1, nc=1 -> qini = 1 - 1*(1/1) = 0
    assert b1["qini"] == 0.0
    # cumulative: yt=1, nt=2, yc=2, nc=2 -> qini = 1 - 2*(2/2) = -1
    assert b2["qini"] == -1.0


def test_qini_null_scores_rank_last_nan_first(spark):
    """r15 ADVICE regression: ranking desc via negation flips Spark's
    default NULL/NaN placement — F.desc(score) puts NULLs LAST and NaN
    FIRST; asc(-score) inverted both, so NULL-score rows silently filled
    the top bins. Pin the exact desc placement: NaN > finite > NULL."""
    rows = [
        (1, 1, None, 1.0),           # NULL score -> must land in the LAST bin
        (2, 0, 0.9, 1.0),            # top finite score
        (3, 1, float("nan"), 0.0),   # NaN -> FIRST bin (desc: NaN > all)
        (4, 0, 0.1, 1.0),
    ]
    df = spark.createDataFrame(rows, "uid int, t int, s double, y double")
    out = C.qini_curve(df, "t", "s", "y", "uid", n_bins=4).collect()
    # reconstruct per-bin membership from the cumulative treat/ctl counts
    # bin1 must hold the NaN row (treated), bin4 the NULL row (treated)
    b = {r["bin"]: r for r in out}
    assert b[1]["cum_n_treat"] == 1 and b[1]["cum_n_ctl"] == 0
    assert b[2]["cum_n_treat"] == 1 and b[2]["cum_n_ctl"] == 1  # 0.9 ctl row
    assert b[3]["cum_n_treat"] == 1 and b[3]["cum_n_ctl"] == 2  # 0.1 ctl row
    assert b[4]["cum_n_treat"] == 2  # NULL-score treated row ranks dead last


def test_qini_all_bins_present_on_skewed_scores(spark):
    df = spark.createDataFrame(
        [(i, i % 2, 0.5, float(i % 3 == 0)) for i in range(100)],
        "uid int, t int, s double, y double",
    )
    out = C.qini_curve(df, "t", "s", "y", "uid", n_bins=10).collect()
    assert [r["bin"] for r in out] == list(range(1, 11))
    assert out[-1]["n_cum"] == 100
