"""One-off r15 probe: decompose dd_minhash construct cost and A/B the
signature aggregation shape (fused 32-buffer vs two-stage min).

Interleaves variants across repeats so host noise hits both equally.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.constants import WS_PLUS
from ml_data_pipeline_spark.operators.dedup import _ensure_parallel
from ml_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_minhash")
spark.read.parquet(f"{sf_dir}/documents.parquet").count()

docs = (
    spark.read.parquet(f"{sf_dir}/documents.parquet")
    .select("doc_id", F.lower(F.col("text")).alias("text"))
    .repartition(spark.sparkContext.defaultParallelism)
    .cache()
)
docs.count()

K = 32
p = (1 << 31) - 1
shingle_k = 5


def exploded_frame():
    norm = F.lower(F.regexp_replace(F.col("text"), WS_PLUS, " "))
    normed = docs.select(F.col("doc_id").alias("id"), norm.alias("__norm"))
    positions = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length("__norm") - shingle_k + 1))
    shingle = F.col("__norm").substr(F.col("__i"), F.lit(shingle_k))
    raw = F.xxhash64(shingle)
    ex = normed.select("id", "__norm", F.explode(positions).alias("__i")).select(
        "id", F.pmod(raw, F.lit(p)).alias("h")
    )
    return ex.select("id", "h", F.pmod("h", F.lit(K)).alias("b"))


def sig_fused():
    bucketed = exploded_frame()
    mins = bucketed.groupBy("id").agg(
        *[F.expr(f"min(CASE WHEN b = {k} THEN h END)").alias(f"__m{k}") for k in range(K)]
    )
    all_mins = ", ".join(f"__m{k}" for k in range(K))
    slots = ", ".join(f"coalesce(__m{k}, __fb)" for k in range(K))
    return mins.withColumn("__fb", F.expr(f"least({all_mins})")).select(
        "id", F.expr(f"array({slots})").alias("signature")
    )


def sig_twostage():
    bucketed = exploded_frame()
    bmins = bucketed.groupBy("id", "b").agg(F.min("h").alias("mh"))
    mins = bmins.groupBy("id").agg(
        *[F.expr(f"min(CASE WHEN b = {k} THEN mh END)").alias(f"__m{k}") for k in range(K)]
    )
    all_mins = ", ".join(f"__m{k}" for k in range(K))
    slots = ", ".join(f"coalesce(__m{k}, __fb)" for k in range(K))
    return mins.withColumn("__fb", F.expr(f"least({all_mins})")).select(
        "id", F.expr(f"array({slots})").alias("signature")
    )


def time_noop(df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 3)


# equality check once: same signatures
a = {r["id"]: list(r["signature"]) for r in sig_fused().collect()}
b = {r["id"]: list(r["signature"]) for r in sig_twostage().collect()}
assert a == b, "two-stage signatures differ!"
print(f"signatures identical for {len(a)} docs", flush=True)

for rep in range(4):
    fused_construct_t0 = time.monotonic()
    f_df = sig_fused()
    fc = time.monotonic() - fused_construct_t0
    ft = time_noop(f_df, f"fused {rep}")
    two_construct_t0 = time.monotonic()
    t_df = sig_twostage()
    tc = time.monotonic() - two_construct_t0
    tt = time_noop(t_df, f"twostage {rep}")
    print(
        f"rep{rep}: fused construct={fc:.3f} noop={ft:.3f} | "
        f"twostage construct={tc:.3f} noop={tt:.3f} loadavg={os.getloadavg()[0]:.2f}",
        flush=True,
    )
