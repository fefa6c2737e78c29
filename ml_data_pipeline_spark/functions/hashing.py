"""String-hashing encoders (SURVEY.md §2.5 E7-E13).

The reference implements six hashing schemes over string columns
(/root/reference/preprocessing/hashing_methods_ui.py:285-319,412-433). All are
re-expressed as JVM-side Column expressions — no Python UDFs — so they stay
inside whole-stage codegen and cost one projection at any scale.

Determinism upgrade vs the reference: the reference's "simple hash" uses
Python's session-salted hash() (documented unstable, hashing_methods_ui.py:
285-289); here simple_hash uses xxhash64, stable across sessions and
executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1

def _nonneg_mod(c: Column, n: int) -> Column:
    return ((c % n) + n) % n

def simple_hash(col: Column, n_buckets: int) -> Column:
    """E7 — bucketed hash (ref hash(x) % 2**31 % n, hashing_methods_ui.py:285-289).
    xxhash64 replaces Python's unstable hash()."""
    return _nonneg_mod(F.xxhash64(col) % (1 << 31), n_buckets)

def feature_hash(col: Column, n_buckets: int) -> Column:
    """E8 — md5 hash-trick (ref int(md5(x),16) % n, hashing_methods_ui.py:290-294).

    Uses the top 15 hex digits (60 bits, fits a signed 64-bit int) of the md5
    digest; identical formula is expressible in ANSI SQL for the oracle.
    """
    return _nonneg_mod(F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long"), n_buckets)

def onehot_hash(df: DataFrame, column: str, n_buckets: int, out_column: str) -> DataFrame:
    """E9 — distinct→index map then feature-hash the index
    (ref hashing_methods_ui.py:295-300). Index assignment is lexicographic
    — ranged_rank over the distinct set (r14: row_number == dense_rank on
    a distinct frame, bit-identical to the old single-task window but
    parallel at high cardinality), then E8 on the stringified index."""
    from ml_data_pipeline_spark.operators.profiling import ranged_rank

    distinct_vals = (
        df.select(F.col(column).cast("string").alias("__val"))
        .where(F.col("__val").isNotNull())
        .distinct()
    )
    mapping = ranged_rank(distinct_vals, ["__val"], out_col="__rr").select(
        "__val", (F.col("__rr") - 1).cast("long").alias("__idx")
    )
    joined = df.join(F.broadcast(mapping), df[column].cast("string") == mapping["__val"], "left")
    return joined.select(
        *df.columns, feature_hash(F.col("__idx").cast("string"), n_buckets).alias(out_column)
    )

def embedding_hash(col: Column, n_buckets: int) -> Column:
    """E10 — char-code sum + hash mix
    (ref (sum(ord(ch)) % 2**31 + hash(x)) % n, hashing_methods_ui.py:301-307).

    Char-code sum via aggregate(split(...)) — still JVM-side. The hash() term
    is replaced by stable xxhash64 (same rationale as E7).
    """
    s = col.cast("string")
    char_sum = F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: acc + F.when(F.length(ch) > 0, F.ascii(ch)).otherwise(F.lit(0)),
    )
    return _nonneg_mod((char_sum % (1 << 31)) + (F.xxhash64(s) % (1 << 31)), n_buckets)

def universal_hash(col: Column, n_buckets: int, a: int = 1103515245, b: int = 12345) -> Column:
    """E11 — ((a*x + b) mod p) mod n with p = 2^31-1, x = 48-bit prefix of
    sha256 (ref hashing_methods_ui.py:308-313,418-420; a,b random there —
    fixed here for reproducibility, overridable).

    x is reduced mod p BEFORE the multiply so a*x stays < 2^63 (no overflow).
    """
    x = F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 12), 16, 10).cast("long") % MERSENNE_P
    return _nonneg_mod((F.lit(a) * x + F.lit(b)) % MERSENNE_P, n_buckets)

def count_min_sketch_counts(
    df: DataFrame, column: str, out_column: str, depth: int = 3, width: int = 1000
) -> DataFrame:
    """E12 — per-value estimated count, written as the encoded value
    (ref d=3 hash tables of width n, hashing_methods_ui.py:314-319,422-433).

    Spark-first: the sketch is built from the EXACT per-value counts (one
    groupBy on a cardinality-sized table), then the CMS estimate for each
    value is min over d rows of the collision-summed table — i.e. we simulate
    the sketch's collision behavior deterministically instead of streaming
    updates. At true stream scale use df.stat.countMinSketch (JVM sketch);
    this variant exists because the reference defines the encoded VALUE as the
    estimate, which must be reproducible for the oracle.
    """
    counts = df.groupBy(F.col(column).cast("string").alias("__val")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # d hash rows per value: (row, bucket, cnt) — materialized once; the
    # per-depth bucket-total/estimate branches would otherwise each
    # re-aggregate from the source scan (plan_audit r5: 7 scans). The
    # frame is value-cardinality sized.
    hashed = counts.select(
        "__val",
        "__cnt",
        *[
            universal_hash(F.col("__val"), width, a=31 * (i + 1) + 7, b=97 * (i + 1) + 3).alias(
                f"__b{i}"
            )
            for i in range(depth)
        ],
    ).localCheckpoint()
    estimates = None
    for i in range(depth):
        bucket_tot = hashed.groupBy(F.col(f"__b{i}").alias("__bucket")).agg(
            F.sum("__cnt").alias("__btot")
        )
        est_i = hashed.select("__val", f"__b{i}").join(
            bucket_tot, F.col(f"__b{i}") == F.col("__bucket")
        ).select("__val", F.col("__btot").alias(f"__est"))
        estimates = est_i if estimates is None else estimates.unionByName(est_i)
    min_est = estimates.groupBy("__val").agg(F.min("__est").alias(out_column))
    # no broadcast hint (r13 review): min_est is DISTINCT-VALUE-cardinality
    # sized, and a sketch column is by definition one whose cardinality is
    # too large to count exactly — forcing the broadcast is precisely the
    # executor-OOM anti-pattern the plan audit bans on named tables (this
    # frame just escaped the identifier regex). Unhinted, AQE broadcasts
    # when the estimate table is actually small and sort-merges otherwise.
    joined = df.join(
        min_est, df[column].cast("string") == min_est["__val"], "left"
    )
    return joined.select(*df.columns, out_column)
