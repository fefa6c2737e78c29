"""CDC merge emulation over plain Parquet (no Delta in this environment).

Two upsert shapes for the versioned-dataset layer:

- ``merge_upsert`` (SCD1): with a ts column, the LATEST row per key wins
  across current ∪ updates (order-independent — safe for out-of-order
  micro-batch delivery, r14); without one, updates overwrite matching keys
  (classic in-order-changelog SCD1) via anti-join + union. With the table
  bucketed on the key, both sides co-locate and the merge is shuffle-free.
- ``scd2_apply`` (SCD2): full history — matching current rows are CLOSED
  (valid_to stamped) and new row versions opened; every key's history stays
  queryable with an as-of filter (``scd2_snapshot``).

At 100 TB the merge pattern is: partition the table by key-hash bucket,
rewrite ONLY the buckets containing updated keys (updates join → distinct
bucket list is driver metadata). These functions express the row-level
semantics; the versioned layer writes each merge result as a new version,
so time travel comes from [[VersionedDataset]] for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_TS = "9999-12-31 00:00:00"


def merge_upsert(
    current: DataFrame, updates: DataFrame, key: str, ts_col: str | None = None
) -> DataFrame:
    """SCD1 MERGE: rows in ``updates`` win on key match; unmatched current
    rows survive; brand-new keys insert. (anti-join + union — the Delta
    MERGE INTO emulation for plain Parquet.)

    A batch carrying SEVERAL rows for one key is compacted to one (r10
    review: it used to append them all, leaving duplicate keys in the
    'current' table — the invariant SCD1 exists to hold). With ``ts_col``
    the latest row wins (ties broken by full-row struct order, so a
    replayed batch is idempotent); without it the deterministic
    max-struct row wins — supply ts_col for real CDC streams.

    r14 (found by tools/stream_recovery.py's multi-batch run): with
    ``ts_col`` the latest-wins rule now also applies AGAINST ``current``
    — "updates win on key match" is only correct for an in-order
    changelog, but a file/stream source delivers micro-batches in ARRIVAL
    order, so an older event landing in a later batch used to silently
    overwrite newer keyed state. current ∪ updates → one latest row per
    key is commutative and idempotent: delivery order cannot change the
    final table. The no-ts_col path keeps the classic SCD1
    "updates overwrite" contract for genuinely ordered changelogs.

    EQUAL-ts tie semantics CHANGED with the r14 rule (r15 ADVICE,
    documented deliberately): at an exactly equal ts the winner is the
    MAX full-row struct across current ∪ updates — NOT "the update".
    A same-timestamp correction whose payload sorts lower than the
    current row is dropped. This is forced by the commutativity
    contract: any "update beats current" provenance bit is meaningless
    across batches (this batch's update IS the next batch's current, so
    replay/arrival order would decide who holds the bit — exactly the
    order-dependence r14 removed). Corrections must carry a strictly
    newer ts (the CDC norm); equal-ts distinct payloads for one key are
    a source defect this merge resolves deterministically, not
    semantically. Callers needing in-order update-wins semantics use
    the no-ts_col path."""
    from pyspark.sql import Window

    if ts_col is not None:
        allr = current.unionByName(updates)
        w = Window.partitionBy(key).orderBy(
            F.col(ts_col).desc(), F.struct(*allr.columns).desc()
        )
        return (
            allr.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        others = [c for c in updates.columns if c != key]
        if others:
            packed = updates.groupBy(key).agg(F.max(F.struct(*others)).alias("__r"))
            updates = packed.select(
                key, *[F.col(f"__r.{c}").alias(c) for c in others]
            )
        else:
            updates = updates.distinct()
    survivors = current.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    effective_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD2 MERGE: close the open row of each updated key (valid_to :=
    update's effective ts) and open a new row version. ``current`` must
    carry valid_from/valid_to (use scd2_init for the first load).

    A merge batch may carry several rows for one key; joining them all
    against current would fan every history row out into duplicate closed
    copies (Delta's MERGE raises on multiple matches). We keep only the
    LATEST update per key (max effective_ts, ties broken arbitrarily but
    deterministically by row_number) — the standard "last write wins per
    batch" CDC compaction."""
    from pyspark.sql import Window

    # full-struct tiebreak (r10 review: effective_ts alone left
    # same-timestamp updates partition-order-dependent — a replayed batch
    # could crown a different winner, breaking idempotent re-merge)
    w = Window.partitionBy(key).orderBy(
        F.col(effective_ts).desc(), F.struct(*updates.columns).desc()
    )
    updates = (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # no broadcast hint: a merge batch is usually small but is caller-
    # controlled and unbounded — AQE broadcasts it when it actually is small
    upd_keys = updates.select(key, F.col(effective_ts).alias("__eff"))
    closed = (
        current.join(upd_keys, key, "left")
        .withColumn(
            valid_to,
            F.when(
                (F.col(valid_to) == OPEN_TS) & F.col("__eff").isNotNull(), F.col("__eff")
            ).otherwise(F.col(valid_to)),
        )
        .drop("__eff")
    )
    opened = updates.withColumn(valid_from, F.col(effective_ts)).withColumn(
        valid_to, F.lit(OPEN_TS)
    )
    return closed.unionByName(opened.select(*closed.columns))


def scd2_init(
    df: DataFrame, effective_ts: str, valid_from: str = "valid_from", valid_to: str = "valid_to"
) -> DataFrame:
    return df.withColumn(valid_from, F.col(effective_ts)).withColumn(
        valid_to, F.lit(OPEN_TS)
    )


def scd2_snapshot(history: DataFrame, as_of: str, valid_from: str = "valid_from", valid_to: str = "valid_to") -> DataFrame:
    """Point-in-time view: rows whose validity interval covers ``as_of``."""
    return history.where(
        (F.col(valid_from) <= F.lit(as_of)) & (F.col(valid_to) > F.lit(as_of))
    )
