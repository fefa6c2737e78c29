"""Tiny catalog over the driver-generated parquet test tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-TZ TIMESTAMP.

    The testdata parquet stores naive microsecond timestamps
    (isAdjustedToUTC=false); Spark 4 infers those as TIMESTAMP_NTZ, which
    rejects numeric casts and diverges from the engine's (and DuckDB
    oracle's) plain-timestamp semantics. With the session TZ pinned to UTC
    the cast is value-identical; it happens at scan time so every operator
    downstream sees one timestamp type regardless of how the files were
    written.
    """
    ntz = [name for name, dtype in df.dtypes if dtype == "timestamp_ntz"]
    if not ntz:
        return df
    from pyspark.sql import functions as F

    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — columnar, predicate-pushdown- and pruning-friendly.

    Some testdata generations write the events table with nanosecond
    timestamps, which Spark's vectorized parquet reader rejects; read them
    as longs and convert to microsecond timestamps (truncating, matching
    DuckDB's ns→us behavior). Naive (NTZ) timestamps are normalized to the
    session timezone in all tables.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_ntz(df)
    return _normalize_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))

def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table and register it as a temp view for spark.sql."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
