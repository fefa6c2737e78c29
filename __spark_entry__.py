"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ml_data_pipeline_spark.queries (Spark) and
ml_data_pipeline_spark.oracles (DuckDB SQL); this module is the thin contract
surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ml_data_pipeline_spark.oracles import ALL_ORACLES
from ml_data_pipeline_spark.queries import ALL_QUERIES, q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ scale packs)."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; seeded/hash-specific operators
    are intentionally absent (driver applies rows-only checks to those)."""
    return dict(ALL_ORACLES)
