"""Declarative data-quality expectations, evaluated in ONE aggregate pass.

Great-Expectations-style checks (not-null, unique, range, set-membership,
regex) compiled into a single `agg` over the table: every rule becomes a
conditional-count expression, so N rules cost one scan and one 1-row
aggregate regardless of table size — the only shape that survives 100 TB
(running each check as its own query would scan the corpus N times).
Uniqueness rides the same pass as count(*) - count(distinct ...).

Reference scope: the reference app validates frames ad hoc in UI handlers
(e.g. dtype/null checks before model runs); this is the engine-level
generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Expectation = tuple[str, str]  # (rule name, kind marker) — internal


def expect_not_null(column: str) -> dict:
    return {
        "rule": f"not_null({column})",
        "violations": F.count(F.when(F.col(column).isNull(), 1)),
    }


def expect_unique(columns: list[str]) -> dict:
    # distinct over a STRUCT: the struct itself is never NULL even when
    # fields are, so NULL-containing rows count as distinct values (r10
    # review: bare count_distinct(cols) DROPPED them while count(*) kept
    # them — every nullable row reported as a spurious violation)
    cols = [F.col(c) for c in columns]
    return {
        "rule": f"unique({','.join(columns)})",
        "violations": F.count(F.lit(1)) - F.count_distinct(F.struct(*cols)),
    }


def expect_in_range(column: str, lo: float, hi: float) -> dict:
    c = F.col(column)
    return {
        "rule": f"in_range({column},{lo},{hi})",
        "violations": F.count(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1)),
    }


def expect_in_set(column: str, values: list) -> dict:
    c = F.col(column)
    return {
        "rule": f"in_set({column})",
        "violations": F.count(F.when(c.isNotNull() & ~c.isin(values), 1)),
    }


def expect_regex(column: str, pattern: str) -> dict:
    c = F.col(column)
    return {
        "rule": f"regex({column})",
        "violations": F.count(F.when(c.isNotNull() & ~c.rlike(pattern), 1)),
    }


def run_expectations(df: DataFrame, expectations: list[dict]) -> DataFrame:
    """Evaluate all expectations in one aggregate pass.

    Returns (rule, n_violations, passed), one row per rule, computed from a
    single 1-row agg exploded driver-free into rows. Note: rule names key
    on (kind, column) — two different in_set/regex checks on one column
    would collide in the report; give such suites distinct columns or
    range-style parameterized rules. An empty suite returns an empty
    frame (r10 review: df.agg() with no expressions raised)."""
    if not expectations:
        return df.sparkSession.createDataFrame(
            [], "rule string, n_violations long, passed boolean"
        )
    structs = [
        F.struct(
            F.lit(e["rule"]).alias("rule"),
            e["violations"].cast("long").alias("n_violations"),
        ).alias(f"__e{i}")
        for i, e in enumerate(expectations)
    ]
    one = df.agg(*structs)
    return (
        one.select(
            F.explode(F.array(*[F.col(f"__e{i}") for i in range(len(expectations))])).alias(
                "s"
            )
        )
        .select(
            "s.rule",
            "s.n_violations",
            (F.col("s.n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )
