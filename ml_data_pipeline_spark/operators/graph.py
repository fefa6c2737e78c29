"""Iterative graph analytics over edge DataFrames.

Near-dup grouping already has a scale-correct connected-components
operator (operators/components.py, Large-Star/Small-Star). This module
adds the other staple a curation pipeline runs over its link graph —
PageRank (Page et al. 1999) — for host/domain authority scoring when
filtering web crawls (e.g. prioritizing high-authority domains in a
quality mix).

Spark-first shape: ranks and edges stay DataFrames; one iteration is

    contribs = edges ⋈ ranks (on src)  →  groupBy(dst).sum(rank/outdeg)
    ranks'   = (1-d)/N + d * (contribs + dangling_mass/N)

i.e. one equi-join shuffle keyed on the node id plus one aggregation per
iteration — the textbook distributed PageRank plan. The shuffles carry
(node, double) pairs only; edge payloads never iterate. Dangling mass
(nodes with no out-edges) is redistributed uniformly, the standard
correction, computed as a scalar aggregate broadcast into the plan.

The rank frame is ``localCheckpoint``-ed every ``checkpoint_every``
iterations (default: every iteration — same lineage-truncation pattern
as components.py). This is not optional hygiene: one iteration
references ``ranks`` TWICE (dangling-mass aggregate + contribution
join), so without truncation the lazy plan DOUBLES per iteration —
exponential analysis cost that hangs past ~15 iterations. The
materialized frame is (node, double), the smallest state the algorithm
can carry. The loop is deterministic, so a fixed iteration count with a
final round() is reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, rank) after a FIXED number of power iterations.

    Edges are directed (duplicate edges contribute multiply — pre-
    ``distinct`` them if that is not intended). Every node appearing as
    src or dst is ranked; ranks sum to 1.
    """
    # materialize the edge frame once (r10 review: each per-iteration
    # checkpoint re-derived the CALLER's upstream edge plan — an
    # orders-join-lineitem join in the gate — ~3x per iteration through
    # e/outdeg; triangle_stats and adamic_adar already draw this line)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    from ml_data_pipeline_spark.cache import tracked_cache

    # tracked (r10 review: a raw forever-pinned cache leaked per call)
    nodes = tracked_cache(
        e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph: empty result, not a driver ZeroDivisionError
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__od"))
    d = float(damping)
    base = (1.0 - d) / n_nodes

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(iterations):
        with_deg = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left").select(
            "node", "rank", "__od"
        )
        # dangling nodes: no out-edges; their rank mass spreads uniformly
        dangling = with_deg.where(F.col("__od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contribs = (
            e.join(with_deg.where(F.col("__od").isNotNull()), e["src"] == with_deg["node"])
            .select("dst", (F.col("rank") / F.col("__od")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + d * (F.coalesce(F.col("__s"), F.lit(0.0)) + F.col("__dm") / n_nodes)
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_stats(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Exact triangle count + global clustering coefficient via the
    degree-oriented wedge join (Cohen 2009 / Suri & Vassilvitskii 2011,
    public literature — the standard MapReduce-era algorithm).

    Input: undirected edge list; duplicates and self-loops are cleaned,
    each edge canonicalized to u < v. Each edge is then ORIENTED from its
    lower-degree endpoint to the higher-degree one (ties broken on id),
    which bounds every node's out-degree by O(sqrt(m)) — so the wedge
    self-join, the step that explodes on skewed graphs (a celebrity node
    with degree 10^6 would otherwise emit 10^12 wedges), stays
    sqrt-bounded at any scale. Wedges then semi-join the oriented edge
    set once to confirm closure; each triangle is counted exactly once.

    Shuffles: edge canonicalization groupBy, one degree aggregate
    (node-sized), the wedge join keyed on the apex node, one closure
    join keyed on the (dst1, dst2) pair. All equi-joins — no crossJoin at
    any scale.

    Output: one row (n_nodes, n_edges, n_wedges, n_triangles,
    clustering_coeff = 3*triangles/wedges, 6dp).
    """
    # localCheckpoint: e feeds FOUR branches (degrees, orientation, wedge
    # join via both sides, closure) — lazily each branch re-derives the
    # edge list AND its upstream pair generator (plan-audited: 40 input
    # scans / 16 sort-merge joins for the co-purchase gate). Measured at
    # sf0.01: none 2.4s / cache 4-5s / localCheckpoint 2.3s warm — the
    # checkpoint matches the uncached speed here and removes the
    # recompute entirely, which is what matters when the generator is a
    # corpus-sized join. Same lineage-truncation pattern as components.py.
    e = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("u"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint()
    o1 = oriented.select(F.col("src").alias("apex"), F.col("dst").alias("b"))
    o2 = oriented.select(F.col("src").alias("apex"), F.col("dst").alias("c"))
    wedges = o1.join(o2, "apex").where(F.col("b") < F.col("c"))
    # closure: the third edge may be oriented either way between b and c
    closing = oriented.select(
        F.least("src", "dst").alias("b"), F.greatest("src", "dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    n_wedges = deg.select(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .crossJoin(n_wedges.select(F.col("w").cast("long").alias("n_wedges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.nullif(F.col("n_wedges").cast("double"), F.lit(0.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )


def flatten_hierarchy(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_depth: int = 1024,
) -> DataFrame:
    """Hierarchy flattening (org charts, BOM trees, category taxonomies)
    by POINTER DOUBLING: each round every node's pointer jumps to its
    pointer's pointer, so after ceil(log2(max_depth)) rounds — not
    max_depth rounds — every node holds its root and exact depth. The
    log-vs-linear shuffle count is the whole reason this shape exists
    (Spark has no WITH RECURSIVE; a naive parent-walk loop is one join
    PER LEVEL, this is one per level-DOUBLING).

    State per round is (id, ptr, dist) — three longs, localCheckpoint'd
    like every iterative operator here (components/pagerank/triangles).
    Roots are rows with NULL parent (or self-parent); forests are fine,
    each tree reports its own root. A DANGLING parent reference (a parent
    id with no row of its own — an upstream filter artifact) is treated
    as a root: the node reports the dangling id as its root with the
    depth walked to it, rather than silently vanishing from the output
    (review pass r3: the original inner join dropped whole orphaned
    subtrees). Returns (id, root, depth)."""
    import math

    pid = F.col(id_col)
    par = F.col(parent_col)
    state = nodes.select(
        pid.alias("id"),
        F.when(par.isNull() | (par == pid), pid).otherwise(par).alias("ptr"),
        F.when(par.isNull() | (par == pid), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("dist"),
    )
    for _ in range(max(1, math.ceil(math.log2(max_depth)))):
        hop = state.select(
            F.col("id").alias("__hid"),
            F.col("ptr").alias("__hptr"),
            F.col("dist").alias("__hdist"),
        )
        state = (
            state.join(hop, state["ptr"] == hop["__hid"], "left")
            .select(
                "id",
                F.coalesce(F.col("__hptr"), F.col("ptr")).alias("ptr"),
                (F.col("dist") + F.coalesce(F.col("__hdist"), F.lit(0))).alias("dist"),
            )
            .localCheckpoint()
        )
    # cycle / over-depth detection (r10 review: a 2-cycle A->B->A never
    # reaches a fixpoint — pointer doubling reported an arbitrary cycle
    # member as root with a garbage ~2^k depth, silently). A finished row
    # points either OUTSIDE the node set (the dangling-parent-becomes-root
    # convention above) or at a SELF-ROOT; a ptr that is a node but not a
    # self-root marks an unconverged cycle — NULL root/depth, loud in any
    # downstream join. Over-depth chains (dist > max_depth) flag the same
    # way.
    tgt = state.select(
        F.col("id").alias("__tid"),
        F.col("ptr").alias("__tptr"),
        F.col("dist").alias("__tdist"),
    )
    done = state.join(tgt, state["ptr"] == tgt["__tid"], "left")
    # a TRUE root has dist == 0 by construction (init), so a pointer that
    # lands on a node with ptr == id but dist > 0 is an even-length cycle
    # that doubled onto itself — flagged, not trusted
    ok = (
        F.col("__tid").isNull()
        | ((F.col("__tptr") == F.col("__tid")) & (F.col("__tdist") == 0))
    ) & (F.col("dist") <= max_depth)
    return done.select(
        "id",
        F.when(ok, F.col("ptr")).alias("root"),
        F.when(ok, F.col("dist")).alias("depth"),
    )


def adamic_adar(
    edges: DataFrame,
    u_col: str,
    v_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003, public literature)
    over a bipartite edge list (u, v): for every pair of u-nodes sharing at
    least one v-neighbor, score = Σ_{v ∈ common} 1/ln(deg(v)) — common
    neighbors, but rare shared neighbors count more. The standard
    "customers who bought the same niche parts" / "docs citing the same
    obscure source" affinity ranking.

    Scale shape (same inverted-index discipline as basket_lift and the
    prefix-filter similarity join): pair candidates come from a self
    equi-join ON the shared neighbor v, so fan-out per v is bounded by
    deg(v)² — Zipf-head v's dominate, and 1/ln(deg) makes exactly those
    contribute least, so a caller-side deg cap composes naturally. No
    crossJoin anywhere; deg(v) is one map-side-combinable groupBy joined
    back on v — unhinted, so AQE broadcasts it at gate scale but a
    v-cardinality-sized degree table at corpus scale falls back to a
    co-partitioned shuffle join. deg(v)=1 neighbors form no pair, so
    ln() never sees 1 inside a score. Top-k orders by the ROUNDED score
    (then the pair ids), keeping the cut deterministic across engines.
    """
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v")).distinct()
    deg = e.groupBy("v").agg(F.count(F.lit(1)).alias("__d"))
    # the self-join reads this frame twice; without truncation the lazy
    # plan re-derives the dedup + degree join per side (4 source scans —
    # the q_triangles lesson). Materialize the (v, u, deg) frame once.
    ew = e.join(deg, "v").where(F.col("__d") >= 2).localCheckpoint()
    a = ew.select("v", F.col("u").alias("ua"), "__d")
    b = ew.select("v", F.col("u").alias("ub"))
    return (
        a.join(b, "v")
        .where(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("__d"))), 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "ua", "ub")
        .limit(top_k)
    )
