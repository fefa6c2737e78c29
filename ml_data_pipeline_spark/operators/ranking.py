"""Rank aggregation (scale-extension family).

No reference-repo counterpart (the reference has no retrieval stack);
this extends the engine toward corpus curation, where multiple rankers
(lexical BM25, embedding cosine, recency, quality score) must be fused
into one ordering — e.g. picking which documents enter a training mix.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009, public
literature) is the standard unsupervised fusion: it needs only RANKS, so
rankers with incomparable score scales combine without calibration, and
items missing from a list simply contribute nothing.

Scale shape: fusion is rank-list-sized, never corpus-sized — each input
frame is a (usually top-k) ranked list, so the union + groupBy shuffles
k*n_lists rows. The corpus-sized work (scoring + top-k per ranker) stays
in the callers, where TakeOrderedAndProject keeps it heap-based.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fusion(
    frames: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k0: int = 60,
) -> DataFrame:
    """Fuse ranked lists: score(item) = sum over lists containing it of
    1 / (k0 + rank). ``k0 = 60`` is the published default — it damps the
    head so one ranker's #1 cannot dominate consensus mid-ranks.

    Each input frame carries (id_col, rank_col) with rank 1-based within
    that list. Returns (id_col, rrf_score, n_lists) sorted by score desc
    with the id as the deterministic tie-break.

    A duplicated id WITHIN one list (a ranker bug upstream) is collapsed
    to its best (minimum) rank before fusion, so n_lists can never exceed
    len(frames) and a dirty ranker can't double-vote. The dedup groupBy
    is rank-list-sized (k rows per frame), so the extra shuffle is noise
    next to the corpus-sized scoring the callers own.
    """
    if not frames:
        raise ValueError("rrf_fusion needs at least one ranked frame")
    tagged = [
        f.select(F.col(id_col), F.col(rank_col).alias("__rank"))
        .groupBy(id_col)
        .agg(F.min("__rank").alias("__rank"))
        for f in frames
    ]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(
                F.sum(1.0 / (F.lit(k0) + F.col("__rank")).cast("double")), 6
            ).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
    )
