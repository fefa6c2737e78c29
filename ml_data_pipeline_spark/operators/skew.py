"""Skew- and shuffle-management utilities (SURVEY.md §4 / 100 TB design).

Three tools for the joins that dominate wall time at scale:

- ``salted_join``: explicit key salting for joins whose hot keys AQE can't
  fix (e.g. when the skewed side must stay on disk layout). The small side
  is replicated SALT ways (explode), the big side gets a random salt —
  the hot key's rows spread over SALT reducers.
- ``write_bucketed`` / ``bucketed_join_ready``: persist a table bucketed +
  sorted by its join key. Two tables bucketed the same way join with ZERO
  exchange (verified by plan inspection in tests) — the co-located join
  that turns the nightly 100 TB fact-fact join from a full shuffle into a
  local merge.
- ``explain_has_exchange``: plan-inspection helper the tests (and users)
  use to ASSERT a join is shuffle-free instead of hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join with the big side's hot keys spread across ``salt`` sub-keys.
    small is exploded x salt (it must be the replicable side); result
    columns match a plain ``big.join(small, on, how)``.

    Only join types that never emit unmatched SMALL-side rows are
    supported (inner / left / left_semi / left_anti / cross): the small
    side is replicated x salt, so a right/full outer join would emit each
    unmatched small row once PER SALT VALUE (r10 review) — such joins
    raise instead of silently multiplying rows."""
    if how.replace("_", "").lower() in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join(how={how!r}): the replicated small side would "
            "emit unmatched rows once per salt value — use a plain join "
            "or swap sides"
        )
    big_s = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted managed table — the co-located join
    layout. Requires saveAsTable (bucket metadata lives in the catalog)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, left_table: str, right_table: str, on: str):
    """Read two same-bucketed tables and join — Catalyst elides both
    exchanges when bucket specs line up."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on)


def explain_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (hash or range
    repartitioning). Use in tests to PROVE a join is co-located rather than
    assuming."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Data-layout optimization for scan pruning: range-partition by the
    sort columns, sort within each partition, write parquet. Each file then
    owns a narrow, non-overlapping min/max range of the sort key, so a
    filtered read skips whole files on parquet row-group statistics (the
    poor-man's Z-order; for one-dimensional predicates it IS the optimal
    layout). The effect is checked in tests by reading back per-file
    min/max spans."""
    parted = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def auto_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    rows_per_task: int = 5_000_000,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Measure-then-decide join: estimate the big side's heaviest key (on a
    sample when sample_fraction is set — at 100 TB you sample), derive the
    salt factor the profiling.key_skew_stats way (ceil(max_key_rows /
    rows_per_task)), and either join plainly (no skew) or salt with exactly
    that factor. One extra aggregate over the key column buys a join that
    cannot stall on one reducer; results are identical to the plain join
    either way (parity-tested)."""
    probe = big.sample(fraction=sample_fraction, seed=seed) if sample_fraction else big
    hot = (
        probe.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__m"))
        .first()["__m"]
    )
    if hot is None:
        # empty big side (or an empty sample): the plain join is trivially
        # right — int(None) used to TypeError (r10 review)
        return big.join(small, on, how)
    if sample_fraction:
        hot = int(hot / sample_fraction)
    factor = max(1, -(-int(hot) // rows_per_task))  # ceil
    if factor <= 1:
        return big.join(small, on, how)
    return salted_join(big, small, on, salt=factor, how=how, seed=seed)


def zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Two-column Z-order (Morton) key: interleave the low `bits` bits of
    each column (x on even positions, y on odd). Range-partitioning/sorting
    the write by this key (write_sorted) gives MULTI-dimensional data
    skipping: every run of consecutive z-keys is confined to a bounded
    rectangle in (x, y), so parquet min/max stats prune scans filtered on
    EITHER column — the layout single-column sorting cannot provide (a sort
    on x leaves y uniform in every file).

    Pure bit arithmetic in one fixed-size expression (2*bits terms, codegen-
    fused, zero shuffle). Inputs are masked to `bits` bits; callers bucket
    or rank wider domains down first (a quantile/rank pre-pass is the usual
    production step — the masked form keeps the operator deterministic and
    oracle-exact).
    """
    mask = (1 << bits) - 1
    x = F.col(x_col).cast("long").bitwiseAND(F.lit(mask))
    y = F.col(y_col).cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        key = key + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return df.withColumn(out_col, key)

def plan_compaction(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    file_col: str = "file",
    partition_cols: list[str] | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Small-file compaction plan: assign an inventory of input files to
    target-sized output bins.

    bin = floor(exclusive-prefix-sum(size) / target) over files ordered by
    name — the deterministic streaming bin-pack every table-maintenance
    job (Iceberg/Delta-style OPTIMIZE, public designs) runs before a
    rewrite. Consecutive files land in the same output until the target
    fills; an oversized file overflows into bins of its own without
    disturbing its neighbors' assignment.

    The prefix sum is a window over the file INVENTORY (metadata, ~1 row
    per file — millions of rows at 100 TB, not billions), partitioned by
    `partition_cols` (date/table partition) so no single sort sees the
    whole inventory. The planned `bin` becomes the repartition key of the
    actual rewrite job.
    """
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(file_col)
    else:
        w = Window.orderBy(file_col)
    prev = F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    return files.withColumn(
        out_col, (F.coalesce(prev, F.lit(0)) / F.lit(float(target_bytes))).cast("long")
    )

# fixed (a, b) families for the bloom hashes — arbitrary distinct constants,
# pinned so oracle SQL can replay the exact bit positions
_BLOOM_HASHES = [(131, 137), (977, 983), (7919, 7927)]

def bloom_prejoin(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    n_bits: int = 16384,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join pre-filter: drop fact rows whose key cannot
    be in `keys` BEFORE the real join's shuffle.

    The middle ground Catalyst's own strategies bracket: a dim too big to
    BROADCAST as an exact hash relation can still broadcast its ~n_bits/8-
    byte bloom. Built as k chained broadcast LEFT SEMI joins against the
    distinct set-bit positions — no explode, no row multiplication, no
    shuffle on the fact side; survivors are the bloom-positive rows
    (false-positive rate (1-e^(-kn/m))^k, resolved by the real join).

    Every position is universal-hash arithmetic over sha256, so the
    surviving set — INCLUDING its false positives — is deterministic and
    the gate oracle replays it bit-for-bit. (Spark's runtime bloom
    pruning, when it fires, is complementary; this is the explicit,
    plannable form with engine-reproducible semantics.)
    """
    from ml_data_pipeline_spark.functions.hashing import universal_hash

    if n_hashes > len(_BLOOM_HASHES):
        raise ValueError(
            f"n_hashes={n_hashes} exceeds the {len(_BLOOM_HASHES)} pinned hash "
            "families (extend _BLOOM_HASHES; silently truncating would ship a "
            "higher false-positive rate than the parameters promise)"
        )
    hashes = _BLOOM_HASHES[:n_hashes]
    positions = (
        keys.select(
            F.explode(
                F.array(
                    *[
                        universal_hash(F.col(keys_key).cast("string"), n_bits, a=a, b=b)
                        for a, b in hashes
                    ]
                )
            ).alias("__pos")
        )
        .distinct()
    )
    out = fact
    for a, b in hashes:
        probe = universal_hash(F.col(fact_key).cast("string"), n_bits, a=a, b=b)
        out = out.join(F.broadcast(positions), probe == F.col("__pos"), "left_semi")
    return out

def join_size_estimate(
    left: DataFrame, left_key: str, right: DataFrame, right_key: str
) -> DataFrame:
    """Exact equi-join output-cardinality prediction from per-key count
    histograms: |A join B| = sum_k cntA(k) * cntB(k) — the planning
    number every skew/shuffle decision (salting factor, AQE skew split,
    broadcast viability) hangs off, computed WITHOUT running the join.

    Two key-sized aggregates + one key-sized join — metadata cost, not
    data cost; the histograms are also exactly what p18_key_skew reads,
    so a planner can reuse one pass for both. Also returns the max
    single-key contribution (the skew hotspot the estimate localizes)."""
    ca = left.groupBy(F.col(left_key).alias("k")).agg(F.count(F.lit(1)).alias("na"))
    cb = right.groupBy(F.col(right_key).alias("k")).agg(F.count(F.lit(1)).alias("nb"))
    per_key = ca.join(cb, "k").select(
        "k", (F.col("na") * F.col("nb")).alias("rows")
    )
    return per_key.agg(
        F.sum("rows").alias("predicted_rows"),
        F.max("rows").alias("max_key_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
    )
