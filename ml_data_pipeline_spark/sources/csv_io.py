"""Robust CSV ingest/egress (SURVEY.md §2.1 S1-S4).

The reference reads CSV with pandas ``na_values=[9 null spellings],
skipinitialspace=True, comment='#'`` (ref /root/reference/
checking_data_formats_ui.py:285-290). Spark's CSV reader covers comment
lines and leading whitespace natively; the null-spelling set is wider than
Spark's single ``nullValue`` option, so remaining spellings are normalized
with a post-pass that stays entirely inside codegen (no UDF).

Scale note: schema inference on a 100 TB CSV would scan everything twice —
callers at scale pass an explicit schema (``schema=``) and inference is only
the convenience path for small interactive files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ref /root/reference/checking_data_formats_ui.py:287
NULL_SPELLINGS = ["", "NA", "N/A", "NULL", "?", "none", "null", ".", " "]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    null_spellings: list[str] | None = None,
) -> DataFrame:
    """S1/S2 — robust CSV scan: header, ``#`` comment lines skipped, the
    reference's 9 null spellings mapped to null, permissive parse.

    Inference caveat: schema inference runs at PARSE time, before the
    null-spelling post-pass — a numeric column whose nulls are spelled
    with anything other than the reader-level 'NA' infers as string (the
    values stay, correctly, null after normalization). Pass ``schema=``
    (the documented at-scale path) or coerce with filters.to_numeric /
    align_dtypes when custom spellings carry numeric columns."""
    nulls = NULL_SPELLINGS if null_spellings is None else null_spellings
    reader = (
        spark.read.option("header", True)
        .option("comment", "#")
        .option("ignoreLeadingWhiteSpace", True)
        .option("mode", "PERMISSIVE")
    )
    if "NA" in nulls:
        # Spark accepts one nullValue; the rest are normalized post-read.
        # Set it ONLY when the caller's spellings include 'NA' (r10 review:
        # hard-coding it nulled legitimate 'NA' data — e.g. a Namibia
        # country code — that a custom null_spellings list excluded)
        reader = reader.option("nullValue", "NA")
    elif not any(not sp.strip() for sp in nulls):
        # caller-authoritative blanks (ADVICE r10): Spark's default
        # nullValue is the empty string, so QUOTED empty fields ("") were
        # destroyed at parse time even when null_spellings deliberately
        # excluded blank forms — before normalize_nulls could preserve
        # them. A non-occurring sentinel keeps them as empty strings.
        # Parser limit (probed, univocity): an UNQUOTED empty field is
        # returned as null by the tokenizer itself regardless of any
        # option, so only the quoted form is recoverable.
        reader = reader.option("nullValue", "__spark_csv_no_null_sentinel__")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    return normalize_nulls(df, nulls)


def read_csv_as_strings(spark: SparkSession, path: str) -> DataFrame:
    """S3 — everything as strings, nulls → "" (ref /root/reference/
    preprocessing/hashing_methods_ui.py:169)."""
    df = (
        spark.read.option("header", True)
        .option("comment", "#")
        .option("inferSchema", False)
        .csv(path)
    )
    return df.na.fill("")


def normalize_nulls(df: DataFrame, spellings: list[str] | None = None) -> DataFrame:
    """Map the reference's null spellings to real nulls on every string
    column — one codegen'd projection, no UDF."""
    spellings = NULL_SPELLINGS if spellings is None else spellings
    if not spellings:
        return df
    out_cols = []
    nonblank = [sp.strip() for sp in spellings if sp.strip()]
    # the trim-to-empty clause applies ONLY when the caller's spellings
    # actually include an empty/whitespace form (r10 review: it used to
    # apply unconditionally, destroying empty-string data even when the
    # caller restricted spellings to e.g. ['?'])
    blank_is_null = any(not sp.strip() for sp in spellings)
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            c = F.col(f.name)
            cond = F.trim(c).isin(nonblank) if nonblank else F.lit(False)
            if blank_is_null:
                cond = cond | (F.trim(c) == "")
            out_cols.append(F.when(cond, None).otherwise(c).alias(f.name))
        else:
            out_cols.append(F.col(f.name))
    return df.select(*out_cols)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV egress for interchange. ``single_file`` coalesces to 1 partition —
    interactive-scale only; at 100 TB you never coalesce(1)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
