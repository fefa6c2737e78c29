"""As-of / range joins (scale-extension temporal family)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import temporal as TP


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 10.0), ("b", 3.0), ("c", 1.0)],
        "k string, lt double",
    )
    right = spark.createDataFrame(
        [("a", 0.0, 100.0), ("a", 5.0, 200.0), ("a", 7.0, 300.0), ("b", 4.0, 400.0)],
        "k string, rt double, v double",
    )
    return left, right


def test_asof_join_matches_pandas(spark, frames):
    left, right = frames
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in TP.asof_join(left, right, "k", "lt", "rt").collect()
    }
    lp = left.toPandas().sort_values("lt")
    rp = right.toPandas().sort_values("rt")
    exp = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k")
    for _, row in exp.iterrows():
        e = None if pd.isna(row["v"]) else row["v"]
        assert got[(row["k"], row["lt"])] == e
    # spot-check semantics: lt=5 matches rt=5 (<=); b@3 has no earlier row
    assert got[("a", 5.0)] == 200.0 and got[("b", 3.0)] is None


def test_asof_join_strict(spark, frames):
    left, right = frames
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in TP.asof_join(left, right, "k", "lt", "rt", strict=True).collect()
    }
    assert got[("a", 5.0)] == 100.0  # strict <: the rt=5 row no longer matches


def test_asof_join_tolerance(spark, frames):
    left, right = frames
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in TP.asof_join(left, right, "k", "lt", "rt", tolerance_seconds=2.0).collect()
    }
    assert got[("a", 10.0)] is None  # rt=7 is 3s stale > tolerance
    assert got[("a", 5.0)] == 200.0


def test_range_join_interval(spark):
    left = spark.createDataFrame([("a", 5.0), ("a", 15.0)], "k string, t double")
    right = spark.createDataFrame(
        [("a", 0.0, 10.0, "early"), ("a", 10.0, 20.0, "late")],
        "k string, s double, e double, label string",
    )
    got = {r["t"]: r["label"] for r in TP.range_join_interval(left, right, "k", "t", "s", "e").collect()}
    assert got == {5.0: "early", 15.0: "late"}


def test_range_join_interval_self_lineage_keeps_left_key(spark):
    """Intervals DERIVED from the left table (shared lineage) must not
    hijack the key column: unmatched left rows keep their own key, with
    null interval bounds (regression: drop(right[on]) resolved to the
    left key and nulled unmatched keys)."""
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.operators.temporal import range_join_interval

    left = spark.createDataFrame([(1, 5), (1, 20), (2, 7)], "k long, t long")
    iv = (
        left.select("k", (F.col("t") - F.col("t") % 10).alias("s"))
        .distinct()
        .withColumn("e", F.col("s") + 6)
    )
    out = {
        (r["k"], r["t"]): r["s"] for r in range_join_interval(left, iv, "k", "t", "s", "e").collect()
    }
    assert out == {(1, 5): 0, (1, 20): 20, (2, 7): None}  # key never null


def test_ewma_last_matches_recurrence(spark):
    """Closed-form weighted sum == the sequential recurrence s_n =
    a*x_n + (1-a)*s_{n-1}, hand-evaluated."""
    from ml_data_pipeline_spark.operators.temporal import ewma_last

    rows = [("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, 30.0), ("h", 1, 5.0)]
    df = spark.createDataFrame(rows, "g string, d int, x double")
    out = {r["g"]: (r["n_points"], r["ewma"]) for r in ewma_last(df, "x", "d", "g", alpha=0.3).collect()}
    # s1=10; s2=.3*20+.7*10=13; s3=.3*30+.7*13=18.1
    assert out == {"g": (3, 18.1), "h": (1, 5.0)}


def test_time_weighted_avg_hand_computed(spark):
    """value 10 held for 3s then 20 held for 1s -> TWAP (10*3+20*1)/4 = 12.5;
    the final observation carries zero weight; single-observation groups
    have no interval and yield NULL."""
    import datetime as dt

    from ml_data_pipeline_spark.operators.temporal import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0, 10.0),
        ("u1", t0 + dt.timedelta(seconds=3), 20.0),
        ("u1", t0 + dt.timedelta(seconds=4), 99.0),   # last: weight 0
        ("u2", t0, 7.0),                               # lone observation
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    got = {r["user_id"]: (r["twap"], r["n_obs"]) for r in
           time_weighted_avg(df, "value", "ts", "user_id").collect()}
    assert got["u1"] == (12.5, 3)
    assert got["u2"][0] is None and got["u2"][1] == 1


def test_churn_labels_respects_the_temporal_wall(spark):
    from ml_data_pipeline_spark.operators.temporal import churn_labels

    rows = [
        (1, "2024-01-01"), (1, "2024-01-10"), (1, "2024-01-22"),  # alive
        (2, "2024-01-05"),                                        # churned
        (3, "2024-01-25"),                                        # no history -> excluded
        (4, "2024-01-19"), (4, "2024-02-20"),                     # horizon missed -> churned
    ]
    df = spark.createDataFrame(rows, ["uid", "d"]).select(
        "uid", F.col("d").cast("timestamp").alias("ts")
    )
    out = {r["uid"]: r for r in churn_labels(df, "uid", "ts", "2024-01-20", 7).collect()}
    assert set(out) == {1, 2, 4}  # user 3 has no pre-cutoff history
    assert out[1]["churned"] is False and out[1]["n_events"] == 2  # future rows not counted
    assert out[1]["days_since_last"] == 10 and out[1]["active_span_days"] == 9
    assert out[2]["churned"] is True
    assert out[4]["churned"] is True  # 2024-02-20 is outside the 7-day horizon


def test_golden_record_attribute_wise_survivorship(spark):
    from ml_data_pipeline_spark.operators.temporal import golden_record

    rows = [
        ("e1", 1, "old-phone", "old-mail"),
        ("e1", 2, None, "new-mail"),   # newest record lacks phone
        ("e2", 5, None, None),
        ("e2", 4, "p2", "m2"),
    ]
    df = spark.createDataFrame(rows, ["e", "k", "phone", "mail"])
    out = {r["e"]: r for r in golden_record(df, "e", "k", ["phone", "mail"]).collect()}
    # stale record donates the only non-null phone; mail comes from the newest
    assert (out["e1"]["phone"], out["e1"]["mail"]) == ("old-phone", "new-mail")
    assert (out["e2"]["phone"], out["e2"]["mail"]) == ("p2", "m2")


def test_rolling_corr_perfect_and_sign(spark):
    from ml_data_pipeline_spark.operators.temporal import rolling_corr

    # y = 2x inside one 30-day window -> corr exactly 1; y = -x -> -1
    rows = [("a", f"2024-01-{d:02d}", d, 2 * d) for d in range(1, 13)]
    rows += [("b", f"2024-01-{d:02d}", d, -d) for d in range(1, 13)]
    df = spark.createDataFrame(rows, ["g", "ds", "x", "y"]).select(
        "g", F.col("ds").cast("date").alias("dt"), "x", "y"
    )
    out = rolling_corr(df, "g", "dt", "x", "y", window_days=30, min_n=10).collect()
    assert len(out) > 0
    for r in out:
        assert r["corr"] == (1.0 if r["g"] == "a" else -1.0)
        assert r["n"] >= 10


def test_rolling_corr_tie_days_deterministic(spark):
    from ml_data_pipeline_spark.operators.temporal import rolling_corr

    # several rows share a day: RANGE frame includes all ties, so every
    # row of that day reports the identical frame stats
    rows = [("g", "2024-01-05", x, x * 3 + (x % 2)) for x in range(1, 15)]
    df = spark.createDataFrame(rows, ["g", "ds", "x", "y"]).select(
        "g", F.col("ds").cast("date").alias("dt"), "x", "y"
    )
    out = rolling_corr(df, "g", "dt", "x", "y", 30, 10).collect()
    assert len(out) == 1  # distinct collapses the tied day to one row
    assert out[0]["n"] == 14


def test_churn_horizon_keeps_time_of_day(spark):
    from ml_data_pipeline_spark.operators.temporal import churn_labels

    # noon cutoff, 7-day horizon: an event 6.25 days after the cutoff is
    # INSIDE the horizon — the date-truncation bug labeled this churned
    rows = [(1, "2024-01-10 00:00:00"), (1, "2024-01-26 18:00:00")]
    df = spark.createDataFrame(rows, ["uid", "t"]).select(
        "uid", F.col("t").cast("timestamp").alias("ts")
    )
    out = churn_labels(df, "uid", "ts", "2024-01-20 12:00:00", 7).collect()[0]
    assert out["churned"] is False


def test_rolling_active_users_hand_computed(spark):
    from ml_data_pipeline_spark.operators.temporal import rolling_active_users

    rows = [
        (1, "2024-01-01"), (2, "2024-01-01"),
        (1, "2024-01-03"),
        (3, "2024-01-05"),
    ]
    df = spark.createDataFrame(rows, ["uid", "ds"]).select(
        "uid", F.col("ds").cast("timestamp").alias("ts")
    )
    out = {r["day"]: r for r in rolling_active_users(df, "uid", "ts", (1, 3)).collect()}
    # day 01: dau {1,2}; day 03: dau {1}, 3d window {1,2}; day 05: dau {3}, 3d {1,3}
    assert (out["2024-01-01"]["active_1d"], out["2024-01-01"]["active_3d"]) == (2, 2)
    assert (out["2024-01-03"]["active_1d"], out["2024-01-03"]["active_3d"]) == (1, 2)
    assert (out["2024-01-05"]["active_1d"], out["2024-01-05"]["active_3d"]) == (1, 2)
    # quiet day 02 still reported (covered by the trailing window)
    assert out["2024-01-02"]["active_1d"] == 0 and out["2024-01-02"]["active_3d"] == 2
    # nothing past the data's last day
    assert max(out) == "2024-01-05"


def test_kaplan_meier_textbook_example(spark):
    from ml_data_pipeline_spark.operators.temporal import kaplan_meier

    # classic: events at t=1 (1 of 5) and t=3 (1 of 3); censored at 2 and 4;
    # survivor to 5. S(1) = 4/5; S(3) = 4/5 * 2/3
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, ["duration", "event"])
    out = {r["t"]: r for r in kaplan_meier(df, "duration", "event").collect()}
    assert set(out) == {1, 3}  # steps only at event times
    assert out[1]["n_risk"] == 5 and out[1]["d_events"] == 1
    assert out[1]["survival"] == 0.8
    assert out[3]["n_risk"] == 3
    assert abs(out[3]["survival"] - 0.8 * (2 / 3)) < 1e-6


def test_kaplan_meier_absorbing_zero(spark):
    from ml_data_pipeline_spark.operators.temporal import kaplan_meier

    # everyone events by t=2: survival hits exactly 0 and stays there
    rows = [(1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(rows, ["duration", "event"])
    out = {r["t"]: r["survival"] for r in kaplan_meier(df, "duration", "event").collect()}
    assert out[1] == round(2 / 3, 6) and out[2] == 0.0


def test_max_concurrency_sweep_line(spark):
    from ml_data_pipeline_spark.operators.temporal import max_concurrency

    rows = [
        ("a", 0, 10), ("a", 5, 15), ("a", 20, 30), ("a", 10, 12),
        ("b", 0, 1), ("b", 1, 2),  # back-to-back: never concurrent
    ]
    df = spark.createDataFrame(rows, ["g", "s", "e"])
    per_g = {
        r["g"]: r["max_concurrent"]
        for r in max_concurrency(df, "s", "e", group_col="g").collect()
    }
    assert per_g == {"a": 2, "b": 1}  # [5,10) overlaps two; half-open ends
    total = max_concurrency(df, "s", "e").collect()[0]["max_concurrent"]
    # globally no instant has 3 open intervals: b's short intervals end
    # before a's second wave stacks up
    assert total == 2


def test_max_concurrency_ranged_matches_global(spark):
    """r14 (VERDICT r13 item 1): the ranged sweep line — per-range running
    sums + P-row prefix carry via ranged_cumsum — returns the exact same
    peak as the single-sort global window, including at (at, delta) ties
    (many intervals starting at one instant) and back-to-back half-open
    boundaries, even when ranges outnumber distinct boundary values."""
    from ml_data_pipeline_spark.operators.temporal import (
        max_concurrency,
        max_concurrency_ranged,
    )

    rows = (
        # a burst of 40 intervals all opening at t=100 (tie group)
        [(100, 110 + i) for i in range(40)]
        # back-to-back chains: end == next start, never concurrent
        + [(i, i + 1) for i in range(0, 50)]
        # nested intervals
        + [(200, 300), (210, 290), (220, 280), (230, 270)]
    )
    df = spark.createDataFrame(rows, ["s", "e"])
    want = max_concurrency(df, "s", "e").collect()[0]["max_concurrent"]
    assert want == 40
    for p in (1, 4, 64):  # fewer / comparable / more ranges than values
        got = max_concurrency_ranged(df, "s", "e", num_partitions=p).collect()
        assert got[0]["max_concurrent"] == want, f"P={p}"


# ---------------------------------------------------------------- round-4: CUSUM + Mann-Kendall


def test_cusum_changepoint_level_shift(spark):
    # 10 points at level 1, then 10 at level 5: |CUSUM| peaks at the shift
    rows = [(i, 1) for i in range(10)] + [(i, 5) for i in range(10, 20)]
    s = spark.createDataFrame(rows, "t int, x int")
    out = TP.cusum_changepoint(s, "t", "x").collect()[0]
    assert out["change_point"] == 9  # last pre-shift point maximizes |S|
    assert out["n_points"] == 20
    # mean = 3; S_9 = 10 * (1 - 3) = -20
    assert out["cusum_abs"] == 20.0


def test_cusum_changepoint_flat_series(spark):
    s = spark.createDataFrame([(i, 7) for i in range(5)], "t int, x int")
    out = TP.cusum_changepoint(s, "t", "x").collect()[0]
    assert out["cusum_abs"] == 0.0 and out["n_points"] == 5
    assert out["change_point"] == 0  # tie broken by earliest t


def test_mann_kendall_monotone_up(spark):
    s = spark.createDataFrame([(i, 2 * i + 3) for i in range(10)], "t int, x int")
    out = TP.mann_kendall_trend(s, "t", "x").collect()[0]
    assert out["s_stat"] == 45  # all 45 pairs increasing
    assert out["sen_slope"] == 2.0
    # no ties: var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125
    assert out["var_s"] == 125.0
    assert out["z_score"] == round((45 - 1) / 125**0.5, 6)


def test_mann_kendall_no_trend_sign_symmetry(spark):
    up = spark.createDataFrame([(i, i) for i in range(8)], "t int, x int")
    down = spark.createDataFrame([(i, -i) for i in range(8)], "t int, x int")
    u = TP.mann_kendall_trend(up, "t", "x").collect()[0]
    d = TP.mann_kendall_trend(down, "t", "x").collect()[0]
    assert u["s_stat"] == -d["s_stat"] and u["z_score"] == -d["z_score"]
    assert u["sen_slope"] == 1.0 and d["sen_slope"] == -1.0


def test_mann_kendall_ties_reduce_variance(spark):
    tied = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2), (3, 2), (4, 3)], "t int, x int"
    )
    out = TP.mann_kendall_trend(tied, "t", "x").collect()[0]
    # n=5: base 5*4*15=300; two tie-pairs contribute 2*(2*1*9)=36 -> (300-36)/18
    assert out["var_s"] == round((300 - 36) / 18.0, 6)
    # S: pairs with equal x contribute 0; count by hand = 8
    assert out["s_stat"] == 8


def test_mann_kendall_even_pair_count_median(spark):
    # 4 points -> 6 pairs (even): sen slope must average the two middle slopes
    s = spark.createDataFrame([(0, 0), (1, 1), (2, 4), (3, 9)], "t int, x int")
    out = TP.mann_kendall_trend(s, "t", "x").collect()[0]
    slopes = sorted([1.0, 2.0, 3.0, 3.0, 4.0, 5.0])
    assert out["sen_slope"] == (slopes[2] + slopes[3]) / 2


def test_nelson_aalen_hand_computed(spark):
    # durations: events at t=1 (1 of 3 at risk... built so n_risk is clear)
    # subjects: (1, event), (2, censored), (3, event), (3, event)
    s = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (3, 1)], "duration int, event int"
    )
    rows = {r["t"]: r for r in TP.nelson_aalen(s, "duration", "event").collect()}
    assert set(rows) == {1, 3}  # only event times
    # t=1: n_risk=4, d=1 -> H = 0.25; t=3: n_risk=2, d=2 -> H = 0.25 + 1.0
    assert rows[1]["n_risk"] == 4 and rows[1]["cum_hazard"] == 0.25
    assert rows[3]["n_risk"] == 2 and rows[3]["cum_hazard"] == 1.25
    # variance: 1/16 then + 2/4
    assert rows[1]["var_hazard"] == round(1 / 16, 6)
    assert rows[3]["var_hazard"] == round(1 / 16 + 2 / 4, 6)


def test_nelson_aalen_defined_past_full_death(spark):
    # d == n_risk at the last step: KM hits absorbing zero, NA keeps summing
    s = spark.createDataFrame([(1, 1), (2, 1)], "duration int, event int")
    rows = {r["t"]: r["cum_hazard"] for r in TP.nelson_aalen(s, "duration", "event").collect()}
    assert rows[1] == 0.5 and rows[2] == 1.5


def test_logrank_hand_computed(spark):
    from ml_data_pipeline_spark.operators.temporal import logrank_test

    # group a: events at t=1,2; group b: event at t=2, censored at t=3
    rows = [
        ("a", 1, 1), ("a", 2, 1), ("b", 2, 1), ("b", 3, 0),
    ]
    df = spark.createDataFrame(rows, "g string, t int, e int")
    out = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    # t=1: n1=2,n2=2,d=1,d1=1 -> e1=0.5, v=1*.5*.5*3/3=0.25
    # t=2: n1=1,n2=2,d=2,d1=1 -> e1=2/3, v=2*(1/3)*(2/3)*(3-2)/2=2/9
    e1 = 0.5 + 2 / 3
    v = 0.25 + 2 / 9
    oe = 2 - e1
    assert out["n_a"] == 2 and out["n_b"] == 2 and out["observed_a"] == 2
    assert out["expected_a"] == round(e1, 6)
    assert out["chi2"] == round(oe * oe / v, 6)


def test_logrank_identical_groups_zero(spark):
    from ml_data_pipeline_spark.operators.temporal import logrank_test

    rows = [("a", t, 1) for t in (1, 2, 3)] + [("b", t, 1) for t in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, t int, e int")
    out = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    assert out["chi2"] == 0.0


def test_asof_join_suffixes_colliding_value_columns(spark):
    """r10 review: a right value column shadowing a left column used to
    emit two output columns with the same name (AMBIGUOUS_REFERENCE on
    any later select); it now comes back suffixed _right."""
    from ml_data_pipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, 100.0)], "k long, t double, price double"
    )
    right = spark.createDataFrame(
        [(1, 5.0, 42.0)], "k long, rt double, price double"
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    assert out.columns.count("price") == 1
    row = out.collect()[0]
    assert row["price"] == 100.0 and row["price_right"] == 42.0
