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
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct().cache()
    n_nodes = nodes.count()
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
