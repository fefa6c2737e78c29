"""Tracked operator caches with an explicit release point (ADVICE r8).

Several multi-pass operators cache/persist an intermediate frame that the
RETURNED lazy result still reads (impute_em_normal, impute_knn,
impute_hot_deck, outliers_mad, spearman_corr, semantic_dedup, the
fingerprint gate): unpersisting inside the operator would throw the work
away before the caller's first action, so the pin must outlive the call.
In a one-shot job that is free — the session exits. In a LONG-LIVED
session invoking these repeatedly, the pins accumulate and compete for
executor storage memory indefinitely (MEMORY_AND_DISK eviction prevents
OOM, not the contention).

``tracked_cache``/``tracked_persist`` register every such pin;
``release_tracked()`` unpersists them all — call it once the results of
prior operator invocations have been materialized (between pipeline
stages, between queries in a service loop, or in a test fixture). The
registry holds strong references on purpose: the JVM keeps a cached RDD
alive regardless of Python object lifetime, so a weakref registry would
leak exactly the entries it was meant to free.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """df.cache(), registered for release_tracked()."""
    out = df.cache()
    with _LOCK:
        _TRACKED.append(out)
    return out


def tracked_persist(df: DataFrame) -> DataFrame:
    """df.persist() (default MEMORY_AND_DISK), registered for
    release_tracked()."""
    out = df.persist()
    with _LOCK:
        _TRACKED.append(out)
    return out


def lazy_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=False)`` — lineage-truncating pin for a
    SMALL DERIVED frame that downstream plans reference many times
    (VERDICT r12 item 1: the b-family danger/weight frames).

    Unlike ``tracked_cache``, the returned plan is a bare ``Scan
    ExistingRDD``: the optimizer stops re-analyzing (and the plan stops
    re-printing) the frame's full derivation once per reference — the fix
    that collapsed q_rfm_segments' 16 cached re-derivations in r12.
    ``eager=False`` so no job runs at operator-build time; the first
    action materializes the blocks and every later branch reads them.

    Use ONLY on frames that are small relative to the input (class-count/
    minority/missing-row sized) and cheap to re-run if lost: localCheckpoint
    severs lineage, so a lost executor makes the blocks unrecoverable —
    exactly why the RAW-INPUT caches must stay ``tracked_cache``
    (operators/imputation_ml.py:202, r11 review). Not registered with the
    release registry: unpersisting a checkpoint is unsafe (the blocks ARE
    the data; there is no lineage to recompute from) — storage frees when
    the frame is garbage-collected instead."""
    return df.localCheckpoint(eager=False)


def release_tracked() -> int:
    """Unpersist (non-blocking) every tracked operator cache and clear the
    registry. Returns the number released.

    Call this at STAGE BOUNDARIES — after the results of prior operator
    invocations have been materialized — not between building a frame and
    acting on it: some tracked caches pin NONDETERMINISTIC assignments
    (impute_knn/impute_hot_deck cache a monotonically_increasing_id row
    tag precisely so it is assigned once), and releasing mid-derivation
    lets each downstream branch re-evaluate the tag independently, which
    can silently mis-align rows. After materialization a release is
    always safe: a re-acted frame recomputes its full lineage in one
    evaluation."""
    with _LOCK:
        frames, _TRACKED[:] = list(_TRACKED), []
    n = 0
    for df in frames:
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)
