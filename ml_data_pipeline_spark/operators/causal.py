"""Causal-effect estimators (scale-extension family).

No reference-repo counterpart (the reference stops at supervised model
metrics); these are the observational/experimental analysis operators an
analytics engine is asked for the day a team wants "did the change work"
answers instead of correlations: propensity-score matching, the 2x2
difference-in-differences estimator, and the Qini uplift curve.

All three are expressed as pure DataFrame plans:
- PSM is the UNION-SORT-CARRY nearest-neighbor trick (same shape as
  temporal.asof_join): one window pass over the score-sorted union finds
  each treated unit's nearest control below AND above — no treated x
  control pair blowup. psm_match's carry windows are unpartitioned
  (single-task, fine for eval-sized frames); psm_match_ranged is the
  corpus-scale twin — range-partitioned carries + a P-row boundary
  exchange, same output.
- DiD is a single groupBy to four cell means plus scalar arithmetic.
- Qini ranks the scored evaluation frame once; like the ROC gates
  (ml/pipeline.py roc_points) the global sort is over the MODEL-SCORED
  EVAL SET, which is evaluation-sized by construction, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def psm_match(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    id_col: str,
    outcome_col: str | None = None,
    caliper: float | None = None,
) -> DataFrame:
    """1:1 nearest-neighbor propensity-score matching WITH replacement
    (Rosenbaum & Rubin 1983, public literature): each treated unit is
    matched to the control whose score is closest. Returns one row per
    matched treated unit: (treated_id, control_id, t_score, c_score[,
    t_outcome, c_outcome]). ``caliper`` drops matches farther than the
    given score distance.

    Determinism: controls are first collapsed to ONE row per distinct
    score (min id, min outcome-of-that-id via struct min), so the
    carried neighbor is a pure function of the data — no partition-order
    sensitivity. Equidistant below/above neighbors resolve to the LOWER
    score (documented convention).

    Shape: controls-per-score frame is score-cardinality-sized, and the
    carry avoids the treated x control pair blowup — but the two carry
    windows here are UNPARTITIONED, so Spark moves the whole
    treated + distinct-control-score union through ONE task (the
    WindowExec single-partition plan). That bound is fine for
    evaluation-sized observational frames (the m40 gate's shape); for a
    corpus-sized frame use :func:`psm_match_ranged`, which replaces the
    global windows with range-partitioned carries + a P-row boundary
    exchange and returns the identical result (tested equal).
    """
    u = _psm_union(df, treat_col, score_col, id_col, outcome_col)
    # controls sort before treated at equal score in the forward pass so a
    # same-score control is "at distance 0 below"; mirrored in the backward
    fwd = Window.orderBy(F.asc("__s"), F.asc("__is_treat")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    bwd = Window.orderBy(F.desc("__s"), F.asc("__is_treat")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = u.withColumn("__below", F.last("__ctl", ignorenulls=True).over(fwd)).withColumn(
        "__above", F.last("__ctl", ignorenulls=True).over(bwd)
    )
    return _psm_pick(carried.where(F.col("__is_treat") == 1), caliper, outcome_col)


def _psm_union(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    id_col: str,
    outcome_col: str | None,
) -> DataFrame:
    """Shared PSM stage 1: score-collapsed controls UNION treated, each
    control row carrying its (score, survivor) struct in ``__ctl``."""
    cols = [F.col(id_col).alias("__id"), F.col(score_col).alias("__s")]
    if outcome_col is not None:
        cols.append(F.col(outcome_col).alias("__y"))
    base = df.select(F.col(treat_col).cast("int").alias("__t"), *cols)
    # one control row per distinct score, min-(id, outcome) survivor
    ctl_cols = [F.col("__id")] + ([F.col("__y")] if outcome_col else [])
    controls = (
        base.where(F.col("__t") == 0)
        .groupBy("__s")
        .agg(F.min(F.struct(*ctl_cols)).alias("__c"))
        .select("__s", F.struct(F.col("__s").alias("cs"), F.col("__c").alias("cv")).alias("__ctl"))
        .withColumn("__is_treat", F.lit(0))
    )
    treated = base.where(F.col("__t") == 1).select(
        "__id", "__s", *( ["__y"] if outcome_col else [] )
    ).withColumn("__ctl", F.lit(None).cast(controls.schema["__ctl"].dataType)).withColumn(
        "__is_treat", F.lit(1)
    )
    return treated.unionByName(controls, allowMissingColumns=True)


def _psm_pick(
    t: DataFrame, caliper: float | None, outcome_col: str | None
) -> DataFrame:
    """Shared PSM stage 3: choose the nearer of the carried below/above
    controls (equidistant -> lower score wins) and project the output."""
    d_below = F.abs(F.col("__s") - F.col("__below.cs"))
    d_above = F.abs(F.col("__above.cs") - F.col("__s"))
    pick_below = F.col("__above").isNull() | (
        F.col("__below").isNotNull() & (d_below <= d_above)
    )
    chosen = F.when(pick_below, F.col("__below")).otherwise(F.col("__above"))
    # a treated unit with NULL propensity cannot be matched (r10 review:
    # NULL distances made pick_below NULL -> otherwise() grabbed an
    # arbitrary carried control and the garbage pair flowed into the ATT)
    out = (
        t.where(F.col("__s").isNotNull())
        .where(chosen.isNotNull())
        .withColumn("__match", chosen)
    )
    if caliper is not None:
        out = out.where(F.abs(F.col("__s") - F.col("__match.cs")) <= caliper)
    sel = [
        F.col("__id").alias("treated_id"),
        F.col("__match.cv.__id").alias("control_id"),
        F.col("__s").alias("t_score"),
        F.col("__match.cs").alias("c_score"),
    ]
    if outcome_col is not None:
        sel += [
            F.col("__y").alias("t_outcome"),
            F.col("__match.cv.__y").alias("c_outcome"),
        ]
    return out.select(*sel)


def psm_match_ranged(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    id_col: str,
    outcome_col: str | None = None,
    caliper: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """psm_match at scale — identical output (tested equal), but the
    global single-task carry windows are replaced by the same
    range-partition + boundary-carry recipe as impute_interpolate_ranged:

    1. repartitionByRange on the score → P sorted, disjoint ranges
       (equal scores always co-locate, so the equal-score tie rules are
       untouched);
    2. per-partition forward/backward carries (partitionBy partition id)
       find the local nearest control below/above — fully parallel;
    3. ONE P-row aggregate collects each partition's min/max-score
       control; the driver folds those into per-partition carry-ins,
       broadcast-joined back so boundary rows see the neighbor control
       that lives in an adjacent range.

    The critical path is a parallel range sort + bounded windows: it
    survives corpus-sized observational frames where psm_match
    serializes on one task.
    """
    u = _psm_union(df, treat_col, score_col, id_col, outcome_col)
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    ctl_type = u.schema["__ctl"].dataType
    # localCheckpoint (not cache): spark_partition_id stays stable because
    # the rows are materialized once, and the storage is released when the
    # returned frame's lineage is dropped — no forever-pinned cache across
    # repeated PSM calls in one session
    rp = u.repartitionByRange(P, F.col("__s")).withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    fwd = Window.partitionBy("__pid").orderBy(
        F.asc("__s"), F.asc("__is_treat")
    ).rowsBetween(Window.unboundedPreceding, 0)
    bwd = Window.partitionBy("__pid").orderBy(
        F.desc("__s"), F.asc("__is_treat")
    ).rowsBetween(Window.unboundedPreceding, 0)
    carried = rp.withColumn(
        "__below_l", F.last("__ctl", ignorenulls=True).over(fwd)
    ).withColumn("__above_l", F.last("__ctl", ignorenulls=True).over(bwd))
    # boundary summary: ONE P-row aggregate job over ALL rows (controls
    # fold in via null-skipping min/max of a guarded struct — the
    # impute_interpolate_ranged shape), so every pid is listed even when
    # its range holds no control
    ctl_struct = F.when(
        F.col("__is_treat") == 0, F.struct(F.col("__s"), F.col("__ctl"))
    )
    summary = (
        rp.groupBy("__pid")
        .agg(F.max(ctl_struct).alias("mx"), F.min(ctl_struct).alias("mn"))
        .collect()
    )
    info = {r["__pid"]: r for r in summary}
    all_pids = sorted(info)
    below_in: dict[int, object] = {}
    best = None
    for pid in all_pids:  # range partitions are score-ordered by pid
        below_in[pid] = best
        if info[pid]["mx"] is not None:
            best = info[pid]["mx"]["__ctl"]
    above_in: dict[int, object] = {}
    best = None
    for pid in reversed(all_pids):
        above_in[pid] = best
        if info[pid]["mn"] is not None:
            best = info[pid]["mn"]["__ctl"]
    carry_schema = T.StructType(
        [
            T.StructField("__pid", T.IntegerType(), False),
            T.StructField("__below_in", ctl_type, True),
            T.StructField("__above_in", ctl_type, True),
        ]
    )
    carry = spark.createDataFrame(
        [(pid, below_in[pid], above_in[pid]) for pid in all_pids], carry_schema
    )
    t = (
        carried.where(F.col("__is_treat") == 1)
        .join(F.broadcast(carry), "__pid")
        .withColumn("__below", F.coalesce(F.col("__below_l"), F.col("__below_in")))
        .withColumn("__above", F.coalesce(F.col("__above_l"), F.col("__above_in")))
    )
    return _psm_pick(t, caliper, outcome_col)


def psm_att(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    id_col: str,
    outcome_col: str,
    caliper: float | None = None,
    matcher: str = "ranged",
) -> DataFrame:
    """Average treatment effect on the treated from 1:1 matched pairs:
    ATT = mean(t_outcome - c_outcome). One row: (n_matched, att,
    mean_treated, mean_control).

    ``matcher``: 'ranged' (default since r14 — psm_match_ranged's
    range-partitioned carries, the plan that survives corpus-sized
    frames) or 'global' (psm_match's two single-task carry windows —
    fine for evaluation-sized frames; kept because the pair is tested
    hash-equal and the global twin is the simpler reference)."""
    match_fn = {"ranged": psm_match_ranged, "global": psm_match}[matcher]
    pairs = match_fn(df, treat_col, score_col, id_col, outcome_col, caliper)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(F.avg(F.col("t_outcome") - F.col("c_outcome")), 6).alias("att"),
        F.round(F.avg("t_outcome"), 6).alias("mean_treated"),
        F.round(F.avg("c_outcome"), 6).alias("mean_control"),
    )


def did_estimate(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    outcome_col: str,
) -> DataFrame:
    """2x2 difference-in-differences (Card & Krueger 1994 canonical form,
    public literature): DiD = (ȳ_treat,post − ȳ_treat,pre) −
    (ȳ_ctl,post − ȳ_ctl,pre). One groupBy to the four cell means; the
    estimate is scalar arithmetic on the 4-row frame. Output one row:
    the four cell means, each cell's n, and the did estimate.
    """
    cells = df.groupBy(
        F.col(treat_col).cast("int").alias("__t"),
        F.col(post_col).cast("int").alias("__p"),
    ).agg(F.avg(outcome_col).alias("__m"), F.count(F.lit(1)).alias("__n"))
    pick = lambda t, p, c: F.max(  # noqa: E731
        F.when((F.col("__t") == t) & (F.col("__p") == p), F.col(c))
    )
    wide = cells.agg(
        pick(1, 0, "__m").alias("treat_pre"),
        pick(1, 1, "__m").alias("treat_post"),
        pick(0, 0, "__m").alias("ctl_pre"),
        pick(0, 1, "__m").alias("ctl_post"),
        F.coalesce(pick(1, 0, "__n"), F.lit(0)).alias("n_treat_pre"),
        F.coalesce(pick(1, 1, "__n"), F.lit(0)).alias("n_treat_post"),
        F.coalesce(pick(0, 0, "__n"), F.lit(0)).alias("n_ctl_pre"),
        F.coalesce(pick(0, 1, "__n"), F.lit(0)).alias("n_ctl_post"),
    )
    did = (F.col("treat_post") - F.col("treat_pre")) - (
        F.col("ctl_post") - F.col("ctl_pre")
    )
    return wide.select(
        *[F.round(c, 6).alias(c) for c in ("treat_pre", "treat_post", "ctl_pre", "ctl_post")],
        "n_treat_pre",
        "n_treat_post",
        "n_ctl_pre",
        "n_ctl_post",
        F.round(did, 6).alias("did"),
    )


def qini_curve(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    outcome_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Qini curve (Radcliffe 2007, public uplift-modeling literature): rank
    units by uplift score descending, cut into ``n_bins`` rank bins, and
    report per-bin cumulative incremental outcomes
    qini = cumY_treat − cumY_ctl * (cumN_treat / cumN_ctl) — what the
    treated population gained versus the scaled control baseline if only
    the top fraction were targeted.

    Deterministic binning: rank over (score desc, id asc), bin =
    ceil(rn * n_bins / n) — no ntile partition sensitivity. r14: the
    rank runs on profiling.ranged_rank (range-partitioned parallel sort
    + P-row offset carry — the scored eval frame no longer serializes
    into one global sort task), and n is a broadcast scalar. r15
    (ADVICE): negating the score flips Spark's default NULL/NaN
    placement (desc puts NULLs LAST and NaN FIRST; asc on -score put
    NULLs first and NaN last), so NULL-score rows silently occupied the
    top bins — explicit __null_last / __nan_first sort keys now pin
    F.desc(score)'s exact placement, the dsir_select idiom.
    After the per-bin aggregate every window runs on an n_bins-row
    frame. Output per bin: (bin, n_cum, cum_y_treat, cum_n_treat,
    cum_y_ctl, cum_n_ctl, qini).
    """
    from ml_data_pipeline_spark.operators.profiling import ranged_rank

    score = F.col(score_col).cast("double")
    base = df.select(
        F.col(treat_col).cast("int").alias("__t"),
        F.col(outcome_col).cast("double").alias("__y"),
        score.isNull().cast("int").alias("__null_last"),
        F.when(score.isNull(), F.lit(1))
        .otherwise((~F.isnan(score)).cast("int"))
        .alias("__nan_first"),
        (-score).alias("__negs"),
        F.col(id_col).alias("__mid"),
    )
    ranked = ranged_rank(
        base, ["__null_last", "__nan_first", "__negs", "__mid"], out_col="__rn"
    )
    n_tot = ranked.agg(F.count(F.lit(1)).alias("__n"))
    binned = ranked.crossJoin(F.broadcast(n_tot)).withColumn(
        "bin", F.ceil(F.col("__rn") * n_bins / F.col("__n")).cast("int")
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("__nb"),
        F.sum(F.when(F.col("__t") == 1, F.col("__y")).otherwise(0.0)).alias("__yt"),
        F.sum(F.col("__t").cast("long")).alias("__nt"),
        F.sum(F.when(F.col("__t") == 0, F.col("__y")).otherwise(0.0)).alias("__yc"),
        F.sum(F.lit(1) - F.col("__t")).alias("__nc"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_bin.select(
        "bin",
        F.sum("__nb").over(wc).alias("n_cum"),
        F.sum("__yt").over(wc).alias("cum_y_treat"),
        F.sum("__nt").over(wc).alias("cum_n_treat"),
        F.sum("__yc").over(wc).alias("cum_y_ctl"),
        F.sum("__nc").over(wc).alias("cum_n_ctl"),
    )
    qini = F.col("cum_y_treat") - F.col("cum_y_ctl") * (
        F.col("cum_n_treat").cast("double")
        / F.nullif(F.col("cum_n_ctl").cast("double"), F.lit(0.0))
    )
    return cum.select(
        "bin",
        "n_cum",
        F.round("cum_y_treat", 6).alias("cum_y_treat"),
        "cum_n_treat",
        F.round("cum_y_ctl", 6).alias("cum_y_ctl"),
        "cum_n_ctl",
        F.round(qini, 6).alias("qini"),
    ).orderBy("bin")
