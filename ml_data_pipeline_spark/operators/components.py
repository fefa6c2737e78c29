"""Connected components over near-duplicate pair graphs — the step that
turns pairwise dedup output (minhash/simhash/ngram/cosine pairs) into
dedup GROUPS and a canonical survivor per group.

Reference parity: the reference app deduplicates exact rows only
(full_duplicates_logic.py); grouping near-dup pairs into clusters is part
of this repo's scale extension surface (SURVEY.md §2.9), required for
"keep one copy per near-dup cluster" semantics at corpus scale.

Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC 2014). Each round is two map-side-combinable groupBys and
two equi-joins; the edge set contracts toward star graphs rooted at each
component's minimum id in O(log n) rounds — no per-node driver loop, no
assumption about component diameter (plain min-label propagation needs
O(diameter) rounds, which is the wrong bound for chain-shaped near-dup
graphs).

Scale notes:
- every step shuffles only (long, long) edge pairs — document payloads
  never enter the iteration;
- lineage is truncated each round with localCheckpoint (on a cluster,
  prefer spark.sparkContext.setCheckpointDir + .checkpoint(); local mode
  has no reliable checkpoint dir, and the iteration count is ~log n so
  executor-local storage is safe here);
- convergence is detected from a 2-value aggregate (count + xxhash64
  bit_xor) per round, not a driver-side edge diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to u's minimum neighbor.
    Emit (v, m) for v in G(u), v > u, where m = min(G(u) + {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select("u", F.least("__mn", "u").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge large->small, then connect each node's smaller
    neighborhood (and the node itself) to its minimum neighbor."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return relinked


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: xxhash64 values overflow a long sum under ANSI mode;
    # xor is order-independent and collision-safe here because the edge set
    # is distinct (no even-multiplicity cancellation)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in `pairs`, where component
    is the MINIMUM id in the node's connected component (deterministic,
    oracle-friendly labeling). Ids must be integral; isolated nodes (absent
    from `pairs`) are not emitted — callers keep them as their own
    singletons (see keep_canonical).

    max_rounds bounds the alternation; the algorithm needs O(log n) rounds,
    so 25 covers any realistic corpus (2^25 nodes per component). Raises if
    the bound is hit without convergence rather than returning a partially
    contracted graph.
    """
    # LOUD type guard (r12 review): the 'ids must be integral' contract was
    # docstring-only — string/UUID ids cast(long) to NULL, every edge is
    # filtered, and downstream callers (cluster_safe_split, keep_canonical)
    # silently degrade to no-op/all-singleton behavior instead of failing.
    from pyspark.sql.types import ByteType, DecimalType, IntegerType, LongType, ShortType

    for c in (src, dst):
        t = pairs.schema[c].dataType
        # DecimalType with scale 0 and precision <= 18 is accepted (ADVICE
        # r12): such ids cast(long) losslessly — sources that type keys as
        # DECIMAL (JDBC NUMBER(n,0), parquet written from decimals) worked
        # before the guard and must not be false-positived by it. Wider or
        # scaled decimals stay rejected: precision > 18 can overflow a
        # long to NULL and a nonzero scale truncates.
        ok = isinstance(t, (ByteType, ShortType, IntegerType, LongType)) or (
            isinstance(t, DecimalType) and t.scale == 0 and t.precision <= 18
        )
        if not ok:
            raise TypeError(
                f"connected_components: pair column {c!r} has type "
                f"{t.simpleString()} — ids must be integral (or decimal "
                "with scale 0 and precision <= 18; hash or dense-rank "
                "other id types to longs first)"
            )
    edges = (
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_fingerprint(edges)
    for _ in range(max_rounds):
        stepped = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_fingerprint(stepped)
        edges.unpersist()
        edges = stepped
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "the pair graph is larger than 2^max_rounds nodes per component "
            "or contains non-integral ids"
        )
    # converged edge set is a star forest: (member -> root). Roots map to
    # themselves.
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    return members.union(roots).distinct()


def keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Near-dup GROUP dedup: keep exactly one row (the minimum id) per
    connected component of `pairs`, plus every row not mentioned in any
    pair. The anti-join carries only the loser-id column — document
    payloads stay out of the shuffle until the final join prunes them."""
    cc = connected_components(pairs, src, dst, max_rounds)
    losers = cc.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
