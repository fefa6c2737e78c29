"""Class balancing (SURVEY.md §2.7 B1-B9) — Spark-native re-expression of the
imblearn method set (ref /root/reference/preprocessing/data_balancing/
data_balancing_list_method_logic.py:9-124).

Count contracts are EXACT and deterministic (window row_number / explode of
computed copy counts), matching imblearn's resulting class sizes; row
identity is RNG-dependent (documented — Spark RNG != numpy RNG).

Scale notes:
- under/over-sampling are one window or one explode — a single shuffle on
  the class key; AQE handles the inherent skew (the majority class IS the
  hot key).
- SMOTE-family neighbor search rides the shared LSH knn_join
  (operators/neighbors.py) — never a crossJoin at scale.
- synthetic-row generation is explode(sequence(1, n_copies)) + zip_with
  interpolation: pure codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .neighbors import knn_join

# ---------------------------------------------------------------- helpers

def class_counts(df: DataFrame, target: str) -> DataFrame:
    return df.groupBy(target).agg(F.count(F.lit(1)).alias("__n"))


def _require_nonnull_target(df: DataFrame, target: str) -> None:
    """Loud contract shared by every balancer (r10 review): a NULL class
    label silently corrupted each of them differently — null-unsafe count
    joins dropped the rows from random_oversample/smote/adasyn, isin and
    ~isin both excluded them from nearmiss, and `col == None` gave
    cluster_centroids an empty class frame. imblearn draws the same line
    (rejects NaN labels); label or split the data upstream. One narrow
    limit(1) probe."""
    if df.where(F.col(target).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"balancing requires non-NULL class labels; column {target!r} "
            "contains NULLs — impute or filter them first"
        )


def _with_counts(df: DataFrame, target: str) -> DataFrame:
    """Attach per-class count via broadcast join (class cardinality is small
    by definition of 'class')."""
    return df.join(F.broadcast(class_counts(df, target)), target)


# ---------------------------------------------------------------- B2 / B5

def random_undersample(df: DataFrame, target: str, seed: int = 42) -> DataFrame:
    """B2 — every class downsampled to the minority count. Exact counts via
    per-class row_number over rand (ref data_balancing_list_method_logic.py:24-32)."""
    _require_nonnull_target(df, target)
    min_n = class_counts(df, target).agg(F.min("__n")).first()[0]
    w = Window.partitionBy(target).orderBy(F.rand(seed))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= min_n)
        .drop("__rk")
    )


def random_oversample(df: DataFrame, target: str, seed: int = 42) -> DataFrame:
    """B5 — every class upsampled (with replacement) to the majority count,
    EXACTLY: each row gets floor(maj/n) copies; the first maj mod n rows (by
    shuffled order) get one extra (ref data_balancing_list_method_logic.py:57-65)."""
    _require_nonnull_target(df, target)
    max_n = class_counts(df, target).agg(F.max("__n")).first()[0]
    w = Window.partitionBy(target).orderBy(F.rand(seed))
    base = _with_counts(df, target).withColumn("__rk", F.row_number().over(w))
    copies = (F.lit(max_n) / F.col("__n")).cast("long") + F.when(
        F.col("__rk") <= F.lit(max_n) % F.col("__n"), 1
    ).otherwise(0)
    return (
        base.withColumn("__c", F.explode(F.sequence(F.lit(1), copies)))
        .drop("__n", "__rk", "__c")
    )


# ---------------------------------------------------------------- B1 SMOTE family

def _numeric_feature_cols(df: DataFrame, target: str) -> list[str]:
    from pyspark.sql.types import NumericType

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name != target
    ]


def smote(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    k: int = 5,
    seed: int = 42,
    method: str = "lsh",
    seeds_df: DataFrame | None = None,
) -> DataFrame:
    """B1 — SMOTE: every class raised to the majority count with synthetic
    rows interpolated toward within-class k-NN
    (ref data_balancing_list_method_logic.py:9-22).

    synth = x + u * (neighbor - x), u ~ U(0,1); the neighbor is picked
    uniformly among the k nearest per copy. Output schema = feature_cols +
    target (SMOTE is defined on the numeric feature matrix, as in imblearn).
    ``seeds_df`` optionally restricts which minority rows seed synthesis
    (Borderline-SMOTE reuses this).

    ONE distributed plan for ALL classes: the within-class kNN is a single
    partitioned LSH join (knn_join(partition_cols=[target])) and the copy
    allocation is a per-class window — no per-class driver loop, no
    per-class model fits. (The loop version re-planned and re-fit per
    class: 15.2s → ~6s at sf0.01 with 4 deficit classes, and O(1) plans
    regardless of class count.)
    """
    feats = feature_cols or _numeric_feature_cols(df, target)
    _require_nonnull_target(df, target)
    counts = class_counts(df, target)
    max_n = counts.agg(F.max("__n")).first()[0]

    base = df.select(*feats, target)
    # cache: __id must be IDENTICAL in every DAG branch (kNN left/right,
    # neighbor-feature join) — monotonically_increasing_id is only
    # deterministic for a fixed partition layout
    from ml_data_pipeline_spark.cache import tracked_cache

    tagged = tracked_cache(base.withColumn("__id", F.monotonically_increasing_id()))

    seed_rows = tagged
    if seeds_df is not None:
        # join on feats + target when the seed frame carries the label
        # (r10 review: a feats-only semi-join let a danger row of class A
        # 'seed' identically-featured rows of class B, suppressing B's
        # all-rows fallback and synthesizing B's whole deficit from one
        # wrong point)
        join_cols = feats + ([target] if target in seeds_df.columns else [])
        seed_rows = tagged.join(
            seeds_df.select(*join_cols).dropDuplicates(join_cols), join_cols, "left_semi"
        )
        # deficit classes with NO seed rows fall back to all class rows
        # (class list is driver metadata — one tiny aggregate)
        seeded_classes = {
            r[target] for r in seed_rows.select(target).distinct().collect()
        }
        deficit_classes = {
            r[target] for r in counts.where(F.col("__n") < max_n).collect()
        }
        unseeded = deficit_classes - seeded_classes
        if unseeded:
            seed_rows = seed_rows.unionByName(
                tagged.where(F.col(target).isin(list(unseeded)))
            )

    # per-class copy allocation: deficit spread evenly over that class's
    # seed rows, remainder to the first rows (window rank per class)
    w_cls = Window.partitionBy(target).orderBy("__id")
    n_seed = F.count(F.lit(1)).over(Window.partitionBy(target))
    seeded = (
        seed_rows.join(F.broadcast(counts), target)
        .withColumn("__deficit", F.lit(max_n) - F.col("__n"))
        .where(F.col("__deficit") > 0)
        .withColumn("__rk", F.row_number().over(w_cls) - 1)
        .withColumn("__nseed", n_seed)
        .withColumn(
            "__copies",
            (F.col("__deficit") / F.col("__nseed")).cast("long")
            + F.when(F.col("__rk") < F.col("__deficit") % F.col("__nseed"), 1).otherwise(0),
        )
        .where(F.col("__copies") > 0)
    )

    synth = _synthesize_within_class(tagged, seeded, feats, target, k, seed, method)
    return base.unionByName(synth)


def _synthesize_within_class(
    tagged: DataFrame,
    seeded: DataFrame,
    feats: list[str],
    target: str,
    k: int,
    seed: int,
    method: str,
) -> DataFrame:
    """Shared SMOTE/ADASYN synthesis: for each seed row (with a __copies
    count), generate __copies interpolations toward a uniformly-picked
    within-class k-NN — ONE partitioned LSH join for every class.

    - pick drawn BEFORE the neighbor join (one draw per synthetic row;
      drawing after would give every joined candidate its own rand() and
      match 0..k rows);
    - LEFT join: a seed with no within-class neighbor still yields its
      copies (as plain duplicates) so count contracts stay exact.
    """
    from ml_data_pipeline_spark.cache import lazy_local_checkpoint

    # The seed/weight frame is deficit-row-sized but its LINEAGE carries the
    # whole upstream derivation (ADASYN's global density kNN, Borderline's
    # danger vote) — referenced twice below (kNN left + expand), the
    # optimizer re-analyzed that tree per branch and the plan re-printed the
    # source scan under every reference (plan audit: b6 x15, b7 x22 cached
    # re-derivations — VERDICT r12 item 1). Checkpointing truncates it; the
    # frame is minority-sized so the materialization is cheap at any SF.
    seeded = lazy_local_checkpoint(seeded)
    nn = knn_join(
        seeded.select("__id", *feats, target),
        tagged.select(F.col("__id").alias("__nid"), *feats, target),
        feats,
        k=k,
        left_id="__id",
        right_id="__nid",
        method=method,
        seed=seed,
        partition_cols=[target],
    )
    nbrs = nn.join(
        tagged.select(F.col("__id").alias("__nid"), *[F.col(c).alias(f"__v_{c}") for c in feats]),
        "__nid",
    )
    expanded = seeded.withColumn(
        "__c", F.explode(F.sequence(F.lit(1), F.col("__copies")))
    ).withColumn("__pick", (F.floor(F.rand(seed) * k) + 1).cast("int"))
    picked = (
        expanded.join(nbrs.drop(target), "__id", "left")
        .withColumn("__navail", F.max("rk").over(Window.partitionBy("__id", "__c")))
        .where(
            F.col("rk").isNull()
            | (F.col("rk") == F.least(F.col("__pick"), F.col("__navail")))
        )
    )
    # Materialize the interpolation draw ONCE per row before the projection:
    # referencing a bare F.rand() Column in N feature expressions only yields
    # one shared value under whole-stage codegen; interpreted/fallback eval
    # (e.g. projections past spark.sql.codegen.maxFields) would re-draw per
    # column, moving synthetic points off the x->neighbor segment.
    picked = picked.withColumn("__u", F.rand(seed + 1))
    return picked.select(
        *[
            F.when(F.col("rk").isNull(), F.col(c))
            .otherwise(F.col(c) + F.col("__u") * (F.col(f"__v_{c}") - F.col(c)))
            .alias(c)
            for c in feats
        ],
        target,
    )


def borderline_danger(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    k: int = 5,
    seed: int = 42,
    method: str = "lsh",
) -> DataFrame:
    """B7 danger-set selection: minority rows whose k-NN in the FULL dataset
    contain >= k/2 (but < k) other-class members
    (ref data_balancing_list_method_logic.py:79-87). Returns the danger rows
    projected to (feature_cols..., target) — the SMOTE seed set."""
    # loud NULL-label contract, consistent with the other balancers
    # (ADVICE r10): NULL labels corrupt the other-class vote filter
    _require_nonnull_target(df, target)
    feats = feature_cols or _numeric_feature_cols(df, target)
    counts = class_counts(df, target)
    max_n = counts.agg(F.max("__n")).first()[0]
    minority = [r[target] for r in counts.collect() if r["__n"] < max_n]

    from ml_data_pipeline_spark.cache import tracked_cache

    # cached: __gid feeds FOUR DAG branches (kNN both sides + two vote
    # joins) — uncached, monotonically_increasing_id could assign
    # different ids per branch on a nondeterministic upstream (r10
    # review; the invariant smote's cache documents)
    all_rows = tracked_cache(
        df.select(*feats, target).withColumn("__gid", F.monotonically_increasing_id())
    )
    nn = knn_join(
        all_rows,
        all_rows.select(F.col("__gid").alias("__gnid"), *feats, F.col(target).alias("__ncls")),
        feats,
        k=k,
        left_id="__gid",
        right_id="__gnid",
        method=method,
        seed=seed,
    )
    votes = (
        nn.join(all_rows.select(F.col("__gid").alias("__gnid"), F.col(target).alias("__ncls")), "__gnid")
        .join(all_rows.select("__gid", F.col(target).alias("__cls")), "__gid")
        .groupBy("__gid", "__cls")
        .agg(F.sum((F.col("__ncls") != F.col("__cls")).cast("int")).alias("__other"))
    )
    danger_ids = votes.where(
        (F.col("__other") * 2 >= F.lit(k)) & (F.col("__other") < F.lit(k))
        & F.col("__cls").isin(minority)
    ).select("__gid")
    from ml_data_pipeline_spark.cache import lazy_local_checkpoint

    # checkpoint the danger stage (VERDICT r12 item 1): the seed set is
    # minority-sized but its lineage is the full-corpus vote kNN, and the
    # callers act on it up to three times (smote's semi-join, its seeded-
    # class collect, the gate's non-empty flag) — uncheckpointed, each
    # action re-ran the kNN and each plan reference re-printed the source
    # scan (the x22 cached re-derivations on b7_borderline_counts).
    # A single-action caller pays the block materialization too (ADVICE
    # r13: reviewed, kept) — the frame is minority-sized, and every
    # in-repo caller is multi-action, so charging it here beats asking
    # each call site to remember.
    return lazy_local_checkpoint(
        all_rows.join(danger_ids, "__gid").select(*feats, target)
    )


def borderline_smote(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    k: int = 5,
    seed: int = 42,
    method: str = "lsh",
) -> DataFrame:
    """B7 — SMOTE seeded only from DANGER rows (see borderline_danger)."""
    feats = feature_cols or _numeric_feature_cols(df, target)
    danger = borderline_danger(df, target, feats, k=k, seed=seed, method=method)
    return smote(df, target, feats, k=k, seed=seed, method=method, seeds_df=danger)


# ---------------------------------------------------------------- B3 / B4

def cluster_centroids(
    df: DataFrame, target: str, feature_cols: list[str] | None = None, seed: int = 42
) -> DataFrame:
    """B3 — every class larger than the minority is REPLACED by the centroids
    of a KMeans(k=min_count) fit on that class
    (ref data_balancing_list_method_logic.py:35-43). MLlib KMeans — the
    distributed Lloyd's iteration, no driver data.

    Scale bound: this loops ONE KMeans fit per oversized class on the driver
    — unlike SMOTE/ADASYN/NearMiss this cannot fuse into a single plan,
    because each class needs an independent iterative model fit (MLlib has
    no grouped KMeans). Cost is O(n_classes) sequential fits, each itself
    distributed; fine for the reference's use (class counts are small by
    definition of a label column), pathological only if someone passes a
    high-cardinality "target". The min_n-per-class count contract stays
    exact via the empty-cluster pad below."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = feature_cols or _numeric_feature_cols(df, target)
    _require_nonnull_target(df, target)
    counts = class_counts(df, target)
    min_n = counts.agg(F.min("__n")).first()[0]
    parts = []
    for r in counts.collect():
        cls, n = r[target], r["__n"]
        cls_df = df.where(F.col(target) == cls).select(*feats, target)
        if n <= min_n:
            parts.append(cls_df)
            continue
        vec = cls_df.withColumn(
            "__v", array_to_vector(F.array(*[F.col(c).cast("double") for c in feats]))
        )
        model = KMeans(k=min_n, seed=seed, featuresCol="__v").fit(vec)
        centers = model.clusterCenters()
        rows = [[float(x) for x in c] for c in centers]
        cdf = df.sparkSession.createDataFrame(
            [(row,) for row in rows], "arr array<double>"
        ).select(
            *[F.col("arr").getItem(i).alias(c) for i, c in enumerate(feats)],
            F.lit(cls).alias(target),
        )
        # MLlib KMeans DROPS empty clusters, so it can return < k centers
        # (sklearn reassigns instead) — pad with real class rows to keep the
        # min_n-per-class count contract exact
        shortfall = min_n - len(rows)
        if shortfall > 0:
            w = Window.partitionBy(target).orderBy(F.rand(seed))
            pad = (
                cls_df.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") <= shortfall)
                .drop("__rk")
            )
            cdf = cdf.unionByName(pad)
        parts.append(cdf)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nearmiss(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    k: int = 3,
    seed: int = 42,
    method: str = "lsh",
) -> DataFrame:
    """B4 — NearMiss-1: keep the majority rows whose MEAN distance to their k
    nearest minority rows is smallest, trimming every class to the minority
    count (ref data_balancing_list_method_logic.py:46-54).

    Loop-free (same rewrite as SMOTE/ADASYN): every trimmed class measures
    distance to the GLOBAL minority class (a class at the minimum count is
    never trimmed, so the per-class "smallest other class" is the global
    minimum for every class that reaches the kNN) — which makes the whole
    operator ONE kNN join (all oversized classes vs the minority corpus),
    one avg-distance aggregate, and one per-class rank window. O(1) plans
    for any class count; the former driver loop re-planned and re-ran the
    kNN once per class. Rows the approximate LSH search finds no candidates
    for rank LAST (nulls_last) instead of silently vanishing, so the
    min_n-per-class count contract is exact even at low recall."""
    feats = feature_cols or _numeric_feature_cols(df, target)
    _require_nonnull_target(df, target)
    counts = class_counts(df, target)
    crows = counts.collect()  # class-cardinality metadata only
    min_n = min(r["__n"] for r in crows)
    # deterministic minority pick: smallest count, target value tie-break
    min_cls = sorted(crows, key=lambda r: (r["__n"], str(r[target])))[0][target]
    base = df.select(*feats, target)
    keep_classes = [r[target] for r in crows if r["__n"] <= min_n]
    kept_whole = base.where(F.col(target).isin(keep_classes))

    trimmed = base.where(~F.col(target).isin(keep_classes))
    from ml_data_pipeline_spark.cache import tracked_cache

    tagged = tracked_cache(trimmed.withColumn("__mid", F.monotonically_increasing_id()))
    minority = (
        base.where(F.col(target) == min_cls)
        .select(*feats)
        .withColumn("__oid", F.monotonically_increasing_id())
    )
    nn = knn_join(
        tagged.select("__mid", *feats), minority, feats, k=k,
        left_id="__mid", right_id="__oid", method=method, seed=seed,
    )
    avgd = nn.groupBy("__mid").agg(F.avg("dist").alias("__avgd"))
    w = Window.partitionBy(target).orderBy(F.asc_nulls_last("__avgd"), F.asc("__mid"))
    return (
        tagged.join(avgd, "__mid", "left")
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= min_n)
        .select(*feats, target)
        .unionByName(kept_whole)
    )


# ---------------------------------------------------------------- B6 ADASYN

def adasyn(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    k: int = 5,
    seed: int = 42,
    method: str = "lsh",
) -> DataFrame:
    """B6 — ADASYN: SMOTE with per-seed synthesis counts proportional to the
    local other-class density r_i = (#other-class among k-NN)/k
    (ref data_balancing_list_method_logic.py:68-76). Total synthesized per
    class still equals the deficit, so counts stay exact.

    Loop-free like smote: ONE global kNN (density), ONE partitioned
    within-class kNN (synthesis, via the shared helper), copy allocation
    entirely in per-class windows — O(1) plans for any class count
    (the per-class loop version: 64.5s → 9.5s cached → ~5s loop-free at
    sf0.01)."""
    feats = feature_cols or _numeric_feature_cols(df, target)
    _require_nonnull_target(df, target)
    counts = class_counts(df, target)
    max_n = counts.agg(F.max("__n")).first()[0]
    base = df.select(*feats, target)
    from ml_data_pipeline_spark.cache import tracked_cache

    tagged = tracked_cache(base.withColumn("__id", F.monotonically_increasing_id()))

    # density r_i from the GLOBAL kNN (all classes, no partition)
    nn_global = knn_join(
        tagged,
        tagged.select(F.col("__id").alias("__nid"), *feats, F.col(target).alias("__ncls")),
        feats,
        k=k,
        left_id="__id",
        right_id="__nid",
        method=method,
        seed=seed,
    )
    dens = (
        nn_global.join(
            tagged.select(F.col("__id").alias("__nid"), F.col(target).alias("__ncls")), "__nid"
        )
        .join(tagged.select("__id", target), "__id")
        .groupBy("__id", target)
        .agg((F.sum((F.col("__ncls") != F.col(target)).cast("int")) / F.lit(k)).alias("__r"))
    )
    w_cls = Window.partitionBy(target)
    # per-class: deficit (broadcast counts), density normalization, exact
    # integerization (floor + remainder to largest fractional parts)
    allocated = (
        dens.join(F.broadcast(counts), target)
        .withColumn("__deficit", F.lit(max_n) - F.col("__n"))
        .where(F.col("__deficit") > 0)
        .withColumn("__tot", F.sum("__r").over(w_cls))
        .withColumn("__ncls_rows", F.count(F.lit(1)).over(w_cls))
        .withColumn(
            "__g",
            F.when(F.col("__tot") > 0, F.col("__r") / F.col("__tot") * F.col("__deficit"))
            .otherwise(F.col("__deficit") / F.col("__ncls_rows")),  # no overlap anywhere
        )
        .withColumn("__gfloor", F.floor("__g"))
        .withColumn("__rem", F.col("__deficit") - F.sum("__gfloor").over(w_cls))
        .withColumn(
            "__frank",
            F.row_number().over(
                w_cls.orderBy(F.desc(F.col("__g") - F.col("__gfloor")), F.asc("__id"))
            ),
        )
        .withColumn(
            "__copies",
            (F.col("__gfloor") + F.when(F.col("__frank") <= F.col("__rem"), 1).otherwise(0)).cast(
                "int"
            ),
        )
        .where(F.col("__copies") > 0)
    )
    seeded = tagged.join(allocated.select("__id", "__copies"), "__id")
    synth = _synthesize_within_class(tagged, seeded, feats, target, k, seed, method)
    return base.unionByName(synth)


# ---------------------------------------------------------------- B8 / B9 cleaning

def tomek_links(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    seed: int = 42,
    method: str = "lsh",
) -> DataFrame:
    """Pairs (id_a, id_b) that are mutual 1-NN of each other AND of different
    classes — the Tomek links. Majority members of links are what SMOTE-Tomek
    removes (ref data_balancing_list_method_logic.py:91-99)."""
    # same loud contract as the other balancers (ADVICE r10): a NULL label
    # makes the null-unsafe __cls != __ncls filter evaluate to NULL, so
    # links touching NULL-label rows silently vanish
    _require_nonnull_target(df, target)
    feats = feature_cols or _numeric_feature_cols(df, target)
    from ml_data_pipeline_spark.cache import tracked_cache

    # cached for the same __gid-stability reason as borderline_danger
    rows = tracked_cache(
        df.select(*feats, target).withColumn("__gid", F.monotonically_increasing_id())
    )
    nn1 = knn_join(
        rows,
        rows.select(F.col("__gid").alias("__gnid"), *feats),
        feats,
        k=1,
        left_id="__gid",
        right_id="__gnid",
        method=method,
        seed=seed,
    ).select("__gid", "__gnid")
    rev = nn1.select(F.col("__gnid").alias("__gid"), F.col("__gid").alias("__gnid"))
    mutual = nn1.intersect(rev).where(F.col("__gid") < F.col("__gnid"))
    # merge hint (r16, guide §3.1 — found by the sf10 b8 probe): `cls` is
    # ONE ROW PER CORPUS ROW projected to 2 columns, so its size estimate
    # slips under autoBroadcastJoinThreshold in a mid-scale band (2.4M rows
    # ≈ 40 MB estimated, 150-200 MB built) while the actual HashedRelation
    # builds — several at once, non-spillable — starved the candidate
    # join's sorts into SparkOutOfMemoryError at sf10. A side that scales
    # with the corpus must never be broadcast; sort-merge spills gracefully
    # at every scale. Same rows, same values — physical strategy only.
    cls = rows.select("__gid", F.col(target).alias("__cls")).hint("merge")
    return (
        mutual.join(cls, "__gid")
        .join(
            cls.select(F.col("__gid").alias("__gnid"), F.col("__cls").alias("__ncls")),
            "__gnid",
        )
        .where(F.col("__cls") != F.col("__ncls"))
        .select(F.col("__gid").alias("id_a"), F.col("__gnid").alias("id_b"))
    )


def smote_tomek(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    k: int = 5,
    seed: int = 42,
    method: str = "lsh",
) -> DataFrame:
    """B8 — SMOTE then remove Tomek-link members from the originally-majority
    classes."""
    feats = feature_cols or _numeric_feature_cols(df, target)
    # localCheckpoint (VERDICT r9 item 4 — was cache): the SMOTE plan is
    # read three times below (link detection reads it twice internally,
    # the anti-join once) and __gid must be identical across those reads.
    # cache() served the READS locally but left the full SMOTE lineage in
    # the plan — the optimizer re-planned the deep tree per branch (plan
    # audit counted 339 cached re-derivations); checkpointing truncates
    # the lineage so every branch plans against the materialized blocks.
    balanced = smote(df, target, feats, k=k, seed=seed, method=method).withColumn(
        "__gid", F.monotonically_increasing_id()
    ).localCheckpoint()
    links = tomek_links(balanced.drop("__gid"), target, feats, seed=seed, method=method)
    # remove BOTH endpoints (imblearn removes majority side; post-SMOTE all
    # classes are equal so the symmetric rule is the faithful analogue)
    bad = links.select(F.col("id_a").alias("__gid")).union(
        links.select(F.col("id_b").alias("__gid"))
    )
    return balanced.join(bad, "__gid", "left_anti").drop("__gid")


def smote_enn(
    df: DataFrame,
    target: str,
    feature_cols: list[str] | None = None,
    k: int = 3,
    seed: int = 42,
    method: str = "lsh",
) -> DataFrame:
    """B9 — SMOTE then Edited-Nearest-Neighbours cleaning: drop every row
    whose k-NN majority vote disagrees with its own class
    (ref data_balancing_list_method_logic.py:102-110)."""
    feats = feature_cols or _numeric_feature_cols(df, target)
    balanced = smote(df, target, feats, k=k, seed=seed, method=method)
    # localCheckpoint (VERDICT r9 item 4 — was cache): __gid read from
    # three DAG branches (kNN left/right + vote join); checkpointing also
    # truncates the SMOTE lineage the optimizer was re-planning per branch
    # (131 counted re-derivations with cache alone)
    rows = balanced.withColumn("__gid", F.monotonically_increasing_id()).localCheckpoint()
    nn = knn_join(
        rows,
        rows.select(F.col("__gid").alias("__gnid"), *feats, F.col(target).alias("__ncls")),
        feats,
        k=k,
        left_id="__gid",
        right_id="__gnid",
        method=method,
        seed=seed,
    )
    votes = (
        # merge hint: corpus-sized side — same §3.1 rationale as tomek_links
        nn.join(
            rows.select(
                F.col("__gid").alias("__gnid"), F.col(target).alias("__ncls")
            ).hint("merge"),
            "__gnid",
        )
        .groupBy("__gid", "__ncls")
        .agg(F.count(F.lit(1)).alias("__votes"))
    )
    w = Window.partitionBy("__gid").orderBy(F.desc("__votes"), F.asc("__ncls"))
    majority_vote = votes.withColumn("__r", F.row_number().over(w)).where(F.col("__r") == 1)
    # LEFT join: a row the approximate LSH search found NO candidates for
    # has no vote — ENN has no disagreement evidence against it, so it is
    # KEPT (r10 review: the inner join deleted such rows for search
    # recall, not for disagreement; nearmiss documents the same rule)
    keep = (
        rows.join(
            majority_vote.select("__gid", "__ncls").hint("merge"), "__gid", "left"
        )
        .where(F.col("__ncls").isNull() | (F.col(target) == F.col("__ncls")))
        .select("__gid")
    )
    return rows.join(keep.hint("merge"), "__gid", "left_semi").drop("__gid")
