"""Shared k-nearest-neighbor join — the foundation for SMOTE-family balancing
(SURVEY.md §2.7 B1/B4/B6-B9), KNN imputation (§2.6 I5) and hot-deck (§2.6 I7).

Three physical strategies behind one logical contract
``knn_join(left, right, feature_cols, k) -> (left_id, right_id, dist, rk)``:

- ``method='lsh'`` (default, the 100 TB path): hand-rolled random-projection
  LSH — each hash table ANDs h=min(d,2) projections into a composite grid
  cell, bucket_j = floor(<z-feat, r_tj> / width); candidates come from an
  equi-join on (partition_cols…, t, cell), OR'd across tables via
  pair-dedup. The width is DENSITY-ADAPTIVE (r11): a first guess from the
  donor count targets ~256 occupants per cell, then one donor-side scan
  measures the occupancy response at two widths simultaneously and solves
  the width with the measured local exponent — so candidate pairs grow
  LINEARLY with the corpus for ANY distribution shape (fixed widths went
  quadratic at 10x data; the Gaussian-mass guess alone undershot
  atom-heavy features 5-20x). With ``partition_cols`` the width is
  per-group (a global one starves minority classes — the regime SMOTE
  exists for). Explicit ``bucket_length`` keeps the legacy fixed-width
  single-projection tables. Supports ``partition_cols`` (e.g. the class
  column) so one plan computes per-group kNN for EVERY group — no
  per-group driver loop, no per-group model fit.
- ``method='brp'``: MLlib BucketedRandomProjectionLSH (approxSimilarityJoin)
  — same candidates, kept for parity/benchmarks; no partition_cols support
  and each call pays a fit job.
- ``method='exact'``: crossJoin (within partition_cols) + top-k window. The
  small-side / oracle baseline.

Features are z-scaled before distance (the reference scales before KNN /
hot-deck: ref /root/reference/preprocessing/dataset_processing_check_nan_logic.py:66-86,181-217)
so no single wide-range column dominates the euclidean metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EXACT_CEILING = 200_000  # crossJoin guard: beyond this, refuse 'exact'

# per-group adaptive-width guard (VERDICT r11 item 3): partition_cols are
# class-like BY CONTRACT (the balancers' target column, hot-deck's group
# key), and the adaptive LSH path collects one width per group to the
# driver. A caller passing a high-cardinality key (a user id, a join key)
# would silently materialize a driver-sized dict — refuse loudly instead,
# the same way EXACT_CEILING refuses an unbounded crossJoin. 10k matches
# the encoder's MAX_ONE_HOT_CARDINALITY: past that the key is not a class.
GROUP_CEILING = 10_000


def zscale(
    df: DataFrame,
    feature_cols: list[str],
    stats: dict[str, tuple[float, float]] | None = None,
):
    """Append ``__feat`` array<double> of z-scaled features. Stats (mean/std)
    are computed once and folded in as literals — one tiny aggregate, no join.
    Returns (df_with___feat, stats_row_dict) so train-fitted stats can be
    reused on another frame (fit-on-train-only semantics, M1)."""
    if stats is None:
        aggs = []
        for c in feature_cols:
            aggs += [F.avg(F.col(c)).alias(f"mu_{c}"), F.stddev(F.col(c)).alias(f"sd_{c}")]
        row = df.agg(*aggs).first()
        stats_d = {c: (row[f"mu_{c}"] or 0.0, row[f"sd_{c}"] or 1.0) for c in feature_cols}
    else:
        stats_d = stats
    arr = F.array(
        *[
            ((F.col(c).cast("double") - F.lit(stats_d[c][0])) / F.lit(stats_d[c][1] or 1.0))
            for c in feature_cols
        ]
    )
    return df.withColumn("__feat", arr), stats_d


def _sq_dist(a, b, dim: int | None = None):
    """Squared euclidean distance between two array<double> columns.

    With a known dimension (knn_join always knows len(feature_cols)) the
    sum is UNROLLED per index — a plain arithmetic expression that stays
    inside whole-stage codegen. The zip_with+aggregate form is a
    higher-order function Spark INTERPRETS row-by-row: on the candidate
    join's hundreds of millions of pairs that interpretation was the
    dominant constant (r11 probe: the sf1 kNN-impute join evaluates
    ~520M pairs). Falls back to the generic fold when dim is unknown or
    large (expression bloat beyond ~16 terms costs more in codegen than
    it saves)."""
    if dim is not None and dim <= 16:
        terms = [
            (F.element_at(a, i + 1) - F.element_at(b, i + 1))
            * (F.element_at(a, i + 1) - F.element_at(b, i + 1))
            for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def _projection_dirs(dim: int, n_dirs: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish directions (LCG — reproducible
    across sessions, folded into the plan as literals)."""
    state = (seed * 2654435761 + 1013904223) & 0x7FFFFFFF
    dirs: list[list[float]] = []
    for _ in range(n_dirs):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        norm = sum(x * x for x in row) ** 0.5 or 1.0
        dirs.append([x / norm for x in row])
    return dirs


#: adaptive-LSH occupancy target: expected candidates per row per table.
#: Well above k (<=16 across all callers) for recall, small enough that
#: total candidate pairs stay ~ n * OCCUPANCY * tables — linear in corpus.
_TARGET_OCCUPANCY = 256.0
#: approximate density mass of a z-scored feature inside a 1-unit-wide
#: projection bucket near the mode of N(0,1) (peak density ~0.4, averaged
#: over the bulk ~0.35) — the calibration constant for the occupancy rule.
_BUCKET_MASS_PER_UNIT = 0.35


def _adaptive_bucket_length(n_right: int, h: int) -> float:
    """Bucket width so a composite h-projection cell holds ~TARGET_OCCUPANCY
    donors: n * (mass_per_unit * len)^h = C  =>  len = (C/n)^(1/h) / mass.
    Fixed-width buckets are the quadratic trap the r11 sf1 probe caught:
    10x data => 10x rows per bucket => 100x candidate pairs (b1_smote ran
    4.1x wall for 10x data). Density-adaptive width keeps per-cell
    occupancy constant, so candidates grow LINEARLY with the corpus, and
    with h=2 the cell side shrinks at the same n^(-1/2) rate as the
    k-NN radius in 2-d, keeping recall roughly scale-invariant."""
    n = max(int(n_right), 1)
    length = (_TARGET_OCCUPANCY / n) ** (1.0 / h) / _BUCKET_MASS_PER_UNIT
    return min(max(length, 1e-3), 8.0)


def _occupancy_response(scaled_r_len, dirs, h: int, pcols: list[str]):
    """Pair-weighted cell occupancy E[donors in a random entry's cell] =
    Σn²/Σn, measured at BOTH the frame's ``__blen`` width and half of it
    from ONE donor scan: bucket at width/2, count child cells, then fold
    children into their parents via the floor identity
    floor(x/L) == floor(floor(x/(L/2))/2) — a single linear aggregate
    chain, no second scan, no branching re-derivation. Returns
    {group_tuple: (w_full, w_half)} with pcols, else (w_full, w_half)
    floats (Nones on an empty donor side)."""
    ent = scaled_r_len.select(
        *pcols,
        F.explode(
            _bucket_entries(F.col("__feat"), dirs, F.col("__blen") * F.lit(0.5), h)
        ).alias("__tb"),
    )
    # donors with a NULL feature project to a NULL bucket, which can never
    # match the candidate equi-join — but counted here they pool into one
    # giant pseudo-cell per table that inflates w by 5-10x and drives the
    # calibrated width to the floor, collapsing recall for the CLEAN
    # donors (r11 review, confirmed by experiment: 3000 null-featured +
    # 2000 clean donors measured w=1841 vs the true 225). Exclude them
    # from the measurement exactly as the join excludes them.
    ent = ent.where(F.col("__tb.b0").isNotNull() & F.col("__tb.b1").isNotNull())
    children = ent.groupBy(*pcols, "__tb").agg(F.count(F.lit(1)).alias("__n"))
    parent = F.struct(
        F.col("__tb.t").alias("t"),
        F.floor(F.col("__tb.b0") / 2).cast("long").alias("b0"),
        F.floor(F.col("__tb.b1") / 2).cast("long").alias("b1"),
    )
    parents = children.groupBy(*pcols, parent.alias("__pb")).agg(
        F.sum("__n").alias("__nf"),
        F.sum(F.col("__n") * F.col("__n")).alias("__sq_half"),
    )
    aggs = [
        (F.sum(F.col("__nf") * F.col("__nf")) / F.sum("__nf")).alias("__wf"),
        (F.sum("__sq_half") / F.sum("__nf")).alias("__wh"),
    ]
    if pcols:
        rows = parents.groupBy(*pcols).agg(*aggs).collect()
        return {
            tuple(r[c] for c in pcols): (float(r["__wf"]), float(r["__wh"]))
            for r in rows
        }
    row = parents.agg(*aggs).first()
    if row is None or row["__wf"] is None:
        return None, None
    return float(row["__wf"]), float(row["__wh"])


def _calibrated_length(w1: float, w2: float, length: float) -> float:
    """Solve for the width hitting _TARGET_OCCUPANCY from two measured
    occupancies w1 = w(length), w2 = w(length/2): local response exponent
    beta = log2(w1/w2) (1 for mass concentrated on a lower-dimensional
    manifold — e.g. a discrete feature collapsing the data onto lines —
    up to h for genuinely h-dimensional spread), then
    length* = length * (target/w1)^(1/beta). The Gaussian-constant first
    guess assumes full-dimensional spread and UNDERSHOOTS the density of
    atom-heavy features by 5-20x (measured: i5's l_tax lines put 1343
    donors in a 256-target cell at sf0.1); the measured exponent corrects
    that in one step for any distribution shape."""
    import math

    if not w1 or w1 <= _TARGET_OCCUPANCY * 2:
        return length  # close enough — don't churn the plan
    if not w2 or w2 >= w1:
        beta = 1.0  # halving didn't help: flat response, assume linear
    else:
        beta = min(max(math.log2(w1 / w2), 0.5), 4.0)
    return min(max(length * (_TARGET_OCCUPANCY / w1) ** (1.0 / beta), 1e-3), 8.0)


def _bucket_entries(
    feat_col, dirs: list[list[float]], bucket_length, h: int = 1
):
    """array<struct<t,b0,b1>> of (table_idx, composite bucket) for one
    feature vector: table t ANDs h consecutive projections (dirs[t*h ..
    t*h+h-1]) into one grid cell — b1 is 0 when h == 1. bucket_length is
    a float literal (global/legacy width) or a Column (the per-partition
    adaptive width joined onto the frame)."""
    from pyspark.sql import Column

    blen = bucket_length if isinstance(bucket_length, Column) else F.lit(bucket_length)
    entries = []
    n_tables = len(dirs) // h
    for t in range(n_tables):
        floors = []
        for j in range(h):
            d = dirs[t * h + j]
            proj = F.aggregate(
                F.zip_with(feat_col, F.array(*[F.lit(x) for x in d]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            floors.append(F.floor(proj / blen).cast("long"))
        entries.append(
            F.struct(
                F.lit(t).alias("t"),
                floors[0].alias("b0"),
                (floors[1] if h > 1 else F.lit(0).cast("long")).alias("b1"),
            )
        )
    return F.array(*entries)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    feature_cols: list[str],
    k: int,
    left_id: str,
    right_id: str,
    method: str = "lsh",
    num_hash_tables: int = 3,
    # None (default) = DENSITY-ADAPTIVE: one count job sizes the donor
    # side, each table ANDs h=min(d,2) projections into a grid cell, and
    # the cell width is set so occupancy ~= _TARGET_OCCUPANCY — candidate
    # pairs grow LINEARLY with the corpus (the r11 sf1 probe measured the
    # old fixed 0.25 width going quadratic: b1_smote 4.1x wall for 10x
    # data). An explicit float keeps the legacy single-projection tables
    # at that fixed width (callers that calibrated their own width, e.g.
    # the dedup-blocking gates at 0.02). Coarse fixed buckets (MLlib's
    # 2.0 example default) collapse everything into a handful of buckets
    # (measured: the sf0.01 KNN-impute join never finished at 2.0).
    bucket_length: float | None = None,
    seed: int = 42,
    exclude_self: bool = True,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """(left_id, right_id[, partition_cols…], dist, rk<=k): for each left
    row, its k nearest right rows by euclidean distance over z-scaled
    feature_cols — searched WITHIN each partition_cols group when given.

    Ties broken by right_id so the result is deterministic given the
    candidate set (LSH candidates themselves are seed-stable: the
    adaptive width depends only on the donor count, which is fixed for a
    given input).
    """
    if left_id == right_id:
        raise ValueError("left_id and right_id must differ (they name output columns)")
    pcols = list(partition_cols or [])
    # z-stats are fitted on the RIGHT (donor/population) side and reused on
    # the left (r10 review: fitting on the left meant a 3-row missing
    # partition defined the metric for 10M donors — degenerate per-dim
    # weights). Self-join callers (balancing) pass the same frame on both
    # sides, so this changes nothing for them.
    scaled_r, stats = zscale(right, feature_cols)
    scaled_l, _ = zscale(left, feature_cols, stats)

    if method == "exact":
        # 'exact' is the small-side/oracle baseline: O(|L|x|R|) within each
        # partition group. Guard against an oversized request silently running
        # a quadratic crossJoin — the count is one cheap job and 'exact' is
        # by contract only for corpora far below the ceiling.
        n_right = scaled_r.count()
        if n_right > EXACT_CEILING:
            raise ValueError(
                f"method='exact' refused: right side has {n_right} rows "
                f"(> EXACT_CEILING={EXACT_CEILING}); use method='lsh'"
            )
        a = scaled_l.select(
            F.col(left_id).alias("__lid"), F.col("__feat").alias("__fa"), *pcols
        )
        b = scaled_r.select(
            F.col(right_id).alias("__rid"), F.col("__feat").alias("__fb"), *pcols
        )
        pairs = a.crossJoin(F.broadcast(b)) if not pcols else a.join(F.broadcast(b), pcols)
        pairs = pairs.select(
            "__lid", "__rid", *pcols,
            F.sqrt(_sq_dist(F.col("__fa"), F.col("__fb"), len(feature_cols))).alias("dist"),
        )
    elif method == "lsh":
        if bucket_length is None:
            # adaptive: size the grid to the donor corpus from runtime
            # statistics (the same trade AQE makes) — a count for the
            # first-guess width, then ONE occupancy scan that measures
            # the response at two widths simultaneously (children at
            # width/2 folded into parents via the floor identity) and
            # corrects the guess for the ACTUAL distribution shape
            # (_calibrated_length: atom-heavy features collapse data
            # onto lower-dimensional manifolds where the Gaussian-mass
            # guess undershoots density 5-20x — measured 1343 donors in
            # a 256-target cell on i5's l_tax lines). Two narrow
            # donor-side jobs total — index-build cost, amortized.
            h = 2 if len(feature_cols) >= 2 else 1
            dirs = _projection_dirs(len(feature_cols), num_hash_tables * h, seed)
            if pcols:
                # PER-PARTITION widths (r11 review): candidates live
                # within a partition_cols group, so occupancy must be
                # sized from each GROUP's donor count — a global count
                # gives a class holding share s of the corpus occupancy
                # 256*s, which at real imbalance (1000:10M) is ~0: the
                # minority class SMOTE exists for would find ZERO
                # neighbors and the synthesizer's fallback would emit
                # plain duplicates. partition_cols are class-like by
                # contract (the balancers' target column, hot-deck's
                # group key), so the per-group stats are driver-sized
                # collects — the same convention as class_counts.
                from pyspark.sql.types import DoubleType, StructField, StructType

                spark = right.sparkSession
                lens_schema = StructType(
                    [scaled_r.schema[c] for c in pcols]
                    + [StructField("__blen", DoubleType(), False)]
                )

                def _lens_frame(d):
                    return F.broadcast(
                        spark.createDataFrame(
                            [g + (ln,) for g, ln in d.items()], lens_schema
                        )
                    )

                # limit(G+1) caps the collect at the driver BEFORE raising
                # (memory-safe even when the guard fires), one job either way
                grp_rows = (
                    scaled_r.groupBy(*pcols)
                    .agg(F.count(F.lit(1)).alias("__bn"))
                    .limit(GROUP_CEILING + 1)
                    .collect()
                )
                if len(grp_rows) > GROUP_CEILING:
                    raise ValueError(
                        f"knn_join: partition_cols {pcols!r} has more than "
                        f"GROUP_CEILING={GROUP_CEILING} distinct groups — "
                        "per-group adaptive widths are driver-sized only for "
                        "class-like keys; pass an explicit bucket_length or "
                        "reduce the grouping"
                    )
                lens = {
                    tuple(r[c] for c in pcols): _adaptive_bucket_length(r["__bn"], h)
                    for r in grp_rows
                }
                probe_r = scaled_r.join(_lens_frame(lens), pcols, "left")
                ws = _occupancy_response(probe_r, dirs, h, pcols)
                lens = {
                    g: _calibrated_length(*ws.get(g, (None, None)), ln)
                    for g, ln in lens.items()
                }
                # left join: a left group absent from the donor side gets a
                # NULL width -> NULL bucket -> no candidates (same outcome
                # as the equi-join gave it before)
                final_lens = _lens_frame(lens)
                scaled_l = scaled_l.join(final_lens, pcols, "left")
                scaled_r = scaled_r.join(final_lens, pcols, "left")
                length = F.col("__blen")
            else:
                length = _adaptive_bucket_length(scaled_r.count(), h)
                probe_r = scaled_r.withColumn("__blen", F.lit(length))
                w1, w2 = _occupancy_response(probe_r, dirs, h, [])
                length = _calibrated_length(w1, w2, length)
        else:
            h, length = 1, bucket_length
            dirs = _projection_dirs(len(feature_cols), num_hash_tables * h, seed)
        cells = _bucket_entries(F.col("__feat"), dirs, length, h)
        lb = scaled_l.select(
            F.col(left_id).alias("__lid"),
            F.col("__feat").alias("__fa"),
            *pcols,
            cells.alias("__ca"),
        ).withColumn("__tb", F.explode("__ca"))
        rb = scaled_r.select(
            F.col(right_id).alias("__rid"),
            F.col("__feat").alias("__fb"),
            *pcols,
            cells.alias("__cb"),
        ).withColumn("__tb", F.explode("__cb"))
        # a pair colliding in several tables appears once per table — keep
        # it ONLY at its FIRST common table: each row carries exactly one
        # cell per table (__ca/__cb indexed by t), so "no earlier table
        # also collides" is a tiny unrolled codegen predicate. This dedups
        # MAP-SIDE at the join output, where a dropDuplicates((lid, rid))
        # was a full extra shuffle of the candidate set — the single
        # largest frame in the plan (519M rows at the sf1 kNN-impute
        # probe, r11).
        t = F.col("__tb.t")
        first_common = F.lit(True)
        for j in range(num_hash_tables - 1):
            first_common = first_common & (
                (t <= j) | (F.col("__ca").getItem(j) != F.col("__cb").getItem(j))
            )
        # merge hint (r16, guide §3.1 — found by the sf10 b8 probe): BOTH
        # sides of the candidate join are corpus-sized (one exploded row
        # per (row, table)), but Generate/Project size estimates do not
        # multiply, so at mid scale Catalyst under-estimated `rb` below
        # autoBroadcastJoinThreshold and built a multi-GB HashedRelation —
        # java.lang.OutOfMemoryError at the sf10 probe. A side that scales
        # with the corpus must never be broadcast; sort-merge spills
        # gracefully at every scale. Physical strategy only — candidate
        # set unchanged.
        pairs = (
            lb.join(rb.hint("merge"), pcols + ["__tb"])
            .where(first_common)
            .select(
                "__lid", "__rid", *pcols,
                F.sqrt(_sq_dist(F.col("__fa"), F.col("__fb"), len(feature_cols))).alias("dist"),
            )
        )
    elif method == "brp":
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector

        if pcols:
            raise ValueError("method='brp' does not support partition_cols; use 'lsh'")
        a = scaled_l.select(
            F.col(left_id).alias("__lid"), array_to_vector("__feat").alias("__v")
        )
        b = scaled_r.select(
            F.col(right_id).alias("__rid"), array_to_vector("__feat").alias("__v")
        )
        lsh = BucketedRandomProjectionLSH(
            inputCol="__v",
            outputCol="__h",
            numHashTables=num_hash_tables,
            # brp keeps the legacy fixed width when the caller didn't pin one
            bucketLength=bucket_length if bucket_length is not None else 0.25,
            seed=seed,
        ).fit(b)
        joined = lsh.approxSimilarityJoin(a, b, float("inf"), distCol="__d")
        pairs = joined.select(
            F.col("datasetA.__lid").alias("__lid"),
            F.col("datasetB.__rid").alias("__rid"),
            F.col("__d").alias("dist"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    if exclude_self:
        pairs = pairs.where(F.col("__lid") != F.col("__rid"))
    # a NULL distance (either side carries a null feature element) must
    # never rank: Spark's asc ordering is NULLS FIRST, so without this
    # filter the null-feature donors would BE the k 'nearest' neighbors
    # for every query (r10 review)
    pairs = pairs.where(F.col("dist").isNotNull())
    w = Window.partitionBy("__lid").orderBy(F.asc("dist"), F.asc("__rid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            *pcols,
            F.col("dist"),
            F.col("rk"),
        )
    )
