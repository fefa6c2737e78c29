"""Sampling / splitting / trims (SURVEY.md §2.4, T1-T5).

Reference: sklearn train_test_split(test_size=0.2, random_state=42), per-class
trim loops (/root/reference/preprocessing/data_balancing/dataset_trim/
dataset_trim_window_logic.py:16-58).

Determinism model (SURVEY §4): Spark sampling is seeded but partition-layout-
dependent; invariants (counts, ratios, disjointness) are the tested contract,
not bit-parity with numpy RNG.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def train_test_split(
    df: DataFrame, test_size: float = 0.2, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """T1 — random split (ref train_test_split,
    data_balancing_list_method_ui.py:197-199). randomSplit is one pass with a
    per-row uniform draw — no shuffle."""
    train, test = df.randomSplit([1.0 - test_size, test_size], seed=seed)
    return train, test

def stratified_split(
    df: DataFrame, target: str, test_size: float = 0.2, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """T1 stratified — per-class test_size fractions via a seeded hash rank
    window (ref stratified train_test_split,
    cross_validation_optuna_logic.py:58-60).

    Exact per-class proportions: rank rows inside each class by a seeded
    pseudo-random key, first (1-test_size) fraction → train. One shuffle on
    the class key; skewed classes are handled by AQE skew splitting.
    """
    w = Window.partitionBy(target).orderBy(F.xxhash64(F.concat_ws("|", *df.columns), F.lit(seed)))
    n = Window.partitionBy(target)
    ranked = df.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(n)
    )
    train = ranked.where(F.col("__rk") <= F.ceil(F.col("__n") * (1 - test_size))).drop("__rk", "__n")
    test = ranked.where(F.col("__rk") > F.ceil(F.col("__n") * (1 - test_size))).drop("__rk", "__n")
    return train, test

def trim_equal(df: DataFrame, target: str, n_per_class: int, seed: int = 42) -> DataFrame:
    """T2 — keep at most n rows per class, random within class
    (ref sample(n=N, random_state=42) per class, dataset_trim_window_logic.py:16-27).

    row_number over (class, seeded-hash order) — single shuffle on the class
    key; no driver loop over classes (the reference loops in Python).
    """
    w = Window.partitionBy(target).orderBy(
        F.xxhash64(F.concat_ws("|", *df.columns), F.lit(seed))
    )
    return df.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= n_per_class
    ).drop("__rk")

def trim_proportional(df: DataFrame, target: str, max_total: int, seed: int = 42) -> DataFrame:
    """T3 — scale every class by max_total/total, min 1 row per class
    (ref dataset_trim_window_logic.py:29-43)."""
    total = df.count()
    if total <= max_total:
        return df
    ratio = max_total / total
    w = Window.partitionBy(target).orderBy(
        F.xxhash64(F.concat_ws("|", *df.columns), F.lit(seed))
    )
    n = Window.partitionBy(target)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__keep", F.greatest(F.lit(1), F.floor(F.count(F.lit(1)).over(n) * F.lit(ratio))))
        .where(F.col("__rk") <= F.col("__keep"))
        .drop("__rk", "__keep")
    )

def trim_majority(df: DataFrame, target: str, max_majority: int, seed: int = 42) -> DataFrame:
    """T4 — cap only the largest class (ref dataset_trim_window_logic.py:45-58).
    The majority class is found from the tiny frequency table; only its rows
    pass through the rank window, the rest are untouched (no shuffle for them
    after AQE prunes)."""
    counts = df.groupBy(target).agg(F.count(F.lit(1)).alias("__cnt")).orderBy(
        F.desc("__cnt"), F.asc(target)
    )
    top = counts.limit(1).collect()[0][0]
    # NULL can BE the majority class (r10 review: == / != against a NULL
    # literal evaluated to NULL, silently dropping every non-majority row
    # and skipping the trim entirely)
    is_top = F.col(target).isNull() if top is None else (F.col(target) == F.lit(top))
    majority = df.where(is_top)
    rest = df.where(~F.coalesce(is_top, F.lit(False)))
    w = Window.partitionBy(target).orderBy(
        F.xxhash64(F.concat_ws("|", *df.columns), F.lit(seed))
    )
    trimmed = majority.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= max_majority
    ).drop("__rk")
    return trimmed.unionByName(rest)

def concat(dfs: list[DataFrame]) -> DataFrame:
    """T5 (ref pd.concat(ignore_index=True), dataset_trim_window_logic.py:26)."""
    if not dfs:
        raise ValueError("concat of an empty DataFrame list")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out

def hash_bucket(key_cols, buckets: int, salt: str = "", sep: str = ""):
    """THE engine-portable bucket recipe, kept in ONE place (r11 review —
    an inline copy per caller is how draw logic drifted before):
    bucket = conv(md5(concat_ws(sep, keys…[, salt]))[:8], 16, 10) % buckets,
    always in [0, buckets) — the conv of 8 hex digits is a non-negative
    32-bit value, so Spark's sign-preserving % can never go negative.
    md5 (not xxhash64) so any engine reproduces membership bit-for-bit;
    split_by_hash, stratified_sample_by_hash, the m5 CV folds and their
    DuckDB oracles all replay exactly this. concat_ws is null-SAFE: a
    NULL key contributes an empty segment instead of nulling the hash
    (r10 review — plain concat made NULL-keyed rows vanish)."""
    parts = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in key_cols
    ]
    if salt:
        parts.append(F.lit(salt))
    return (
        F.conv(F.substring(F.md5(F.concat_ws(sep, *parts)), 1, 8), 16, 10).cast("long")
        % buckets
    )

def split_by_hash(
    df: DataFrame,
    key_col: str,
    test_frac: float = 0.1,
    buckets: int = 10_000,
    salt: str = "",
    out_col: str = "is_test",
) -> DataFrame:
    """Deterministic, seed-free split membership by hashing the key:
    bucket = md5(key||salt)[:8] as int mod `buckets`; test = bucket below
    the fraction cut. Unlike randomSplit, membership is a pure function of
    the key — stable across runs, engines, partitioning and corpus growth,
    so examples never migrate between train and test as the corpus is
    re-ingested (the property a growing 100 TB corpus actually needs).
    md5 (not xxhash64) so any engine reproduces membership bit-for-bit."""
    b = hash_bucket([key_col], buckets, salt)
    return df.withColumn(out_col, b < int(round(test_frac * buckets)))

def stratified_sample_by_hash(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_frac: float = 0.0,
    buckets: int = 10_000,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep fractions applied
    via the same md5-bucket membership as split_by_hash — a pure function of
    (key, salt), so the sample is reproducible across runs, engines and
    repartitioning (df.sampleBy is seed-dependent AND partitioning-dependent;
    at 100 TB re-ingestion would silently change the sample).

    One projection + filter, zero shuffles; the fractions map is compiled
    into a CASE expression (strata counts are small by definition)."""
    b = hash_bucket([key_col], buckets, salt)
    cut = F.lit(int(round(default_frac * buckets)))
    for val, frac in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col).cast("string") == val, F.lit(int(round(frac * buckets)))
        ).otherwise(cut)
    return df.where(b < cut)

def group_sample_by_hash(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group by
    md5(salt || key) and keep the first k. The hash order is a uniform
    pseudo-random permutation that is REPRODUCIBLE across engines, runs,
    and partitionings (same determinism model as split_by_hash — no RNG,
    no partition sensitivity), so eval-set construction survives
    re-ingestion. Change ``salt`` to draw an independent sample.

    One partitioned window; the shuffle is on the group key. For heavily
    skewed groups the rank-window is still bounded per group; for
    k-much-smaller-than-group at extreme scale, pre-filtering with a
    hash-range predicate (split_by_hash shape) before the window cuts the
    sorted volume."""
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col).cast("string"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )

def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    seed: int = 42,
    id_col: str = "id",
    key_out: str = "wkey",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES, Inf. Process. Lett. 97(5) 2006): each row gets key
    u^(1/w) with u a hash-derived uniform in (0,1); the k largest keys ARE
    a weighted sample without replacement. The standard way to draw a
    quality-weighted training subset (w = quality score, recency weight,
    mixture weight) reproducibly.

    Determinism model: u comes from md5(id:seed) — same as split_by_hash /
    group_sample_by_hash, no RNG, stable across runs, partitionings, and
    engines (the DuckDB oracle recomputes it bit-for-bit). Change `seed`
    for an independent draw; weights must be > 0 — rows with w <= 0 get a
    NULL key that sorts after every valid row (enforced, not just
    documented), so they are drawn only if fewer than k valid rows exist.

    Scale shape: orderBy(...).limit(k) plans TakeOrderedAndProject — a
    per-partition top-k heap + single k-row merge at the driver, never a
    global sort. The 2^60-bit hash is cast through double (both engines
    round identically per IEEE-754), keeping u exact-compatible.
    """
    hx = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))), 1, 15
        ),
        16,
        10,
    ).cast("double")
    u = (hx + 0.5) / float(16**15)
    # Guard, not docstring contract: w <= 0 keys to NULL (sorts after every
    # valid row) so a negative weight can never invert the sample by
    # producing u^(1/w) > 1.
    key = F.when(
        F.col(weight_col) > 0, F.pow(u, F.lit(1.0) / F.col(weight_col))
    )
    return (
        df.withColumn(key_out, key)
        .orderBy(F.desc_nulls_last(key_out), F.asc(id_col))
        .limit(k)
    )

def group_weighted_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    id_col: str = "id",
) -> DataFrame:
    """k-per-group weighted sampling WITHOUT replacement: A-ES keys
    (u^(1/w), u from md5(id:seed) — same determinism model as
    weighted_sample_topk) ranked INSIDE each group by a partitioned
    window. The per-domain form of the quality-weighted draw: "keep the
    best-quality k documents per source, sampled not argmaxed" — sampling
    keeps tail diversity that a plain top-k by weight would destroy.

    One shuffle on the group key; the rank window is bounded per group.
    Same scale posture as group_sample_by_hash (its unweighted sibling).
    """
    hx = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))), 1, 15
        ),
        16,
        10,
    ).cast("double")
    u = (hx + 0.5) / float(16**15)
    # Same w <= 0 guard as weighted_sample_topk: NULL key sorts last.
    key = F.when(
        F.col(weight_col) > 0, F.pow(u, F.lit(1.0) / F.col(weight_col))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc_nulls_last("__akey"), F.asc(id_col)
    )
    return (
        df.withColumn("__akey", key)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__akey", "__rn")
    )

def negative_sample(
    anchors: DataFrame,
    pool: DataFrame,
    k: int = 4,
    id_col: str = "id",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for each anchor row, draw k pseudo-random negatives from the pool
    WITHOUT any all-pairs join.

    Shape (all equi-joins, scale-safe):
      1. pool rows are hash-assigned to n_buckets and ranked inside each
         bucket by a second hash (row_number window, bounded per bucket);
      2. each (anchor, j<k) draw hashes to a bucket and a rank inside it;
      3. one join on (bucket, rank) fetches the negative.
    Per-bucket counts are a tiny broadcast. Every draw is a pure function
    of (anchor id, j), so the output is engine-reproducible — the gate
    oracle replays the identical arithmetic in SQL.

    Scale note: the rank window sorts within buckets, so n_buckets must
    grow with the pool (aim ~1e6 rows/bucket at 100 TB); it is a
    parameter for exactly that reason. Draws are with replacement across
    j (collisions possible, deterministic).

    No reference counterpart (the reference has no pairing stage); added
    per the round brief's training-data-pipeline scope.
    """
    from ml_data_pipeline_spark.functions.hashing import MERSENNE_P, universal_hash

    pid = F.col(id_col).cast("string")
    ranked = pool.select(
        F.col(id_col).alias("neg_id"),
        universal_hash(pid, n_buckets, a=2654435761, b=40503).alias("__bucket"),
        universal_hash(pid, MERSENNE_P, a=97, b=1009).alias("__order"),
    ).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__bucket").orderBy(F.asc("__order"), F.asc("neg_id"))
        ),
    )
    # draws index into the NON-EMPTY buckets (row_number over the tiny
    # counts table), so a draw can never hash into an empty bucket and
    # silently vanish — every (anchor, j) yields exactly one negative
    # bucket-cardinality-sized and read from several branches (size
    # lookup, non-empty-bucket index, broadcast join) — materialize once
    # or each branch re-runs the pool hash+rank window (plan_audit r5)
    counts = ranked.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__cnt"))
    counts = counts.withColumn(
        "__idx", F.row_number().over(Window.orderBy("__bucket")) - 1
    ).localCheckpoint()
    nb = counts.agg(F.count(F.lit(1)).alias("__nb"))
    draws = anchors.select(F.col(id_col).alias("anchor_id")).select(
        "anchor_id", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
    )
    dkey = F.concat_ws("#", F.col("anchor_id").cast("string"), F.col("j"))
    draws = draws.select(
        "anchor_id",
        "j",
        universal_hash(dkey, MERSENNE_P, a=2654435761, b=40503).alias("__braw"),
        universal_hash(dkey, MERSENNE_P, a=7919, b=104729).alias("__pick"),
    ).crossJoin(F.broadcast(nb))
    draws = draws.join(
        F.broadcast(counts), F.col("__braw") % F.col("__nb") == F.col("__idx")
    ).withColumn("__rn", F.col("__pick") % F.col("__cnt") + 1)
    return (
        draws.join(ranked, ["__bucket", "__rn"])
        # an anchor present in the pool can hash onto ITSELF — a
        # degenerate self-negative pushing an embedding away from itself
        # (r10 review). The colliding draw is dropped rather than redrawn
        # (deterministic; density loss is ~1/pool per draw).
        .where(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "j", "neg_id")
    )

def cluster_safe_split(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    test_frac: float = 0.1,
    group_col: str = "split_group",
    out_col: str = "is_test",
) -> DataFrame:
    """Near-dup-safe train/test split: hash-split on the near-dup CLUSTER
    id instead of the document id, so a near-duplicate of a test document
    can never land in train (the contamination path a plain row-level
    split leaves open — the reason eval suites leak into web-scale
    training sets).

    `components` is (id, component) from operators/components.py's
    connected_components over any near-dup pair generator; documents
    outside every cluster split on their own id. Membership inherits
    split_by_hash's engine-stable md5 determinism — stable across runs,
    engines, and corpus growth.
    """
    comp = components.select(
        F.col("id").alias("__cid"), F.col("component").alias("__comp")
    )
    # components covers only CLUSTERED docs, but at corpus scale that can
    # still be huge — leave the join strategy to Catalyst/AQE (broadcasts
    # when small, shuffles on the id key otherwise)
    out = (
        df.join(comp, df[id_col] == F.col("__cid"), "left")
        .withColumn(group_col, F.coalesce(F.col("__comp"), F.col(id_col)))
        .drop("__cid", "__comp")
    )
    return split_by_hash(out, group_col, test_frac, out_col=out_col)

def quota_allocation(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: turn fractional group
    weights into INTEGER quotas that sum exactly to `total` — the step
    between a mixture plan's real-valued shares (mixing.mixture_plan /
    temperature_weights) and an actual document count per source.
    floor(share*total) first, then the k groups with the largest
    fractional remainders (ties: larger weight, then group id) each get
    +1. Deterministic, group-cardinality-sized — one aggregate plus
    windows over the group table."""
    from pyspark.sql import Window

    # group-cardinality-sized and read from the total/shares branches —
    # materialize once or each re-aggregates the corpus (plan_audit r5)
    w = df.groupBy(group_col).agg(F.sum(weight_col).alias("__w")).localCheckpoint()
    tot = w.agg(F.sum("__w").alias("__tw"))
    shares = w.crossJoin(F.broadcast(tot)).select(
        group_col,
        "__w",
        (F.col("__w") / F.col("__tw") * total).alias("__q"),
    )
    shares = shares.select(
        group_col,
        "__w",
        F.floor("__q").cast("long").alias("base"),
        (F.col("__q") - F.floor("__q")).alias("__rem"),
    )
    deficit = shares.agg((F.lit(total) - F.sum("base")).alias("__d"))
    ranked = shares.crossJoin(F.broadcast(deficit)).withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(F.desc("__rem"), F.desc("__w"), F.asc(group_col))
        ),
    )
    return ranked.select(
        group_col,
        F.round(F.col("__w").cast("double"), 6).alias("weight"),
        (F.col("base") + (F.col("__rk") <= F.col("__d")).cast("long")).alias("quota"),
    )


# Poisson(1) CDF literals live in the dependency-free constants module so
# the DuckDB-only oracle module can read them without importing pyspark;
# re-exported here because this is where the Spark-side consumer lives.
from ml_data_pipeline_spark.constants import POISSON1_CDF


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 100,
    seed: int = 7,
    alpha: float = 0.05,
) -> DataFrame:
    """Percentile bootstrap CI for the mean via the POISSON BOOTSTRAP
    (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
    Google 2012, public literature) — the distributed form of the
    bootstrap: instead of resampling n rows WITH replacement (a shuffle
    per replicate), every row draws an independent Poisson(1) weight per
    replicate, which converges to multinomial resampling for large n.
    ONE pass over the data computes all B replicates: explode B weight
    slots per row, map-side partial-aggregate (b, sum(w*x), sum(w)) — the
    shuffle carries B rows per partition, never data.

    Weights are DETERMINISTIC (md5(id:b:seed) uniform → inverse-CDF
    lookup against POISSON1_CDF), so the whole estimate is reproducible
    and engine-exact up to float-sum order. CI convention: with the B
    replicate means sorted ascending, lo = rank ceil(B*alpha/2) (min 1),
    hi = rank B+1-that — explicit order statistics, no interpolation.

    Output: one row (n_rows, mean, ci_lo, ci_hi, n_replicates).
    """
    b_idx = F.explode(F.sequence(F.lit(1), F.lit(n_replicates))).alias("__b")
    hx = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("__id").cast("string"),
                    F.col("__b").cast("string"),
                    F.lit(str(seed)),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    u = (hx + 0.5) / float(16**15)
    k = (
        F.when(u < POISSON1_CDF[0], F.lit(0))
        .when(u < POISSON1_CDF[1], F.lit(1))
        .when(u < POISSON1_CDF[2], F.lit(2))
        .when(u < POISSON1_CDF[3], F.lit(3))
        .when(u < POISSON1_CDF[4], F.lit(4))
        .otherwise(F.lit(5))
    )
    rep_means = (
        # NULL-valued rows contribute neither numerator nor weight (r10
        # review: their Poisson weights landed in sum(__k) but not in
        # sum(__k*__x), biasing every replicate mean toward zero — the CI
        # could exclude the point mean entirely)
        df.where(F.col(value_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(value_col).alias("__x"))
        .select("__id", "__x", b_idx)
        .withColumn("__k", k)
        .groupBy("__b")
        .agg(
            (
                F.sum(F.col("__k") * F.col("__x"))
                / F.nullif(F.sum("__k").cast("double"), F.lit(0.0))
            ).alias("__m")
        )
    )
    lo_rank = max(1, math.ceil(n_replicates * alpha / 2))
    hi_rank = n_replicates + 1 - lo_rank
    wr = Window.orderBy("__m")
    ranked = rep_means.withColumn("__rn", F.row_number().over(wr))
    ci = ranked.agg(
        F.max(F.when(F.col("__rn") == lo_rank, F.col("__m"))).alias("__lo"),
        F.max(F.when(F.col("__rn") == hi_rank, F.col("__m"))).alias("__hi"),
    )
    point = df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.avg(value_col).alias("__mean")
    )
    return (
        point.crossJoin(F.broadcast(ci))
        .select(
            "n_rows",
            F.round("__mean", 6).alias("mean"),
            F.round("__lo", 6).alias("ci_lo"),
            F.round("__hi", 6).alias("ci_hi"),
            F.lit(n_replicates).alias("n_replicates"),
        )
    )
