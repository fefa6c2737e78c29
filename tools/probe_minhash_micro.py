"""One-off r15 micro-profile of dd_minhash construction steps."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.constants import WS_PLUS
from ml_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_minhash_micro")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

import ml_data_pipeline_spark.queries as Q
from ml_data_pipeline_spark.operators.dedup import _ensure_parallel

K, shingle_k, p = 32, 5, (1 << 31) - 1


def T(label, fn, n=1):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"  {label}: {dt:.3f}", flush=True)
    return out


for rep in range(2):
    print(f"rep{rep} loadavg={os.getloadavg()[0]:.2f}", flush=True)
    Q._NORM_DOCS_CACHE.clear()
    spark.catalog.clearCache()
    docs = T("norm_docs", lambda: Q._normalized_documents(spark, sf_dir))
    norm = F.lower(F.regexp_replace(F.col("text"), WS_PLUS, " "))
    sel = T("select_norm", lambda: docs.select(F.col("doc_id").alias("id"), norm.alias("__norm")))
    normed = T("ensure_parallel", lambda: _ensure_parallel(sel))
    positions = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length("__norm") - shingle_k + 1))
    shingle = F.col("__norm").substr(F.col("__i"), F.lit(shingle_k))
    raw = F.xxhash64(shingle)
    exploded = T(
        "explode_select",
        lambda: normed.select("id", "__norm", F.explode(positions).alias("__i")).select(
            "id", F.pmod(raw, F.lit(p)).alias("h")
        ),
    )
    bucketed = T(
        "bucket_select",
        lambda: exploded.select("id", "h", F.pmod("h", F.lit(K)).alias("b")),
    )
    mins = T(
        "agg32",
        lambda: bucketed.groupBy("id").agg(
            *[F.expr(f"min(CASE WHEN b = {k} THEN h END)").alias(f"__m{k}") for k in range(K)]
        ),
    )
    all_mins = ", ".join(f"__m{k}" for k in range(K))
    slots = ", ".join(f"coalesce(__m{k}, __fb)" for k in range(K))
    sigs_plan = T(
        "assemble",
        lambda: mins.withColumn("__fb", F.expr(f"least({all_mins})")).select(
            "id", F.expr(f"array({slots})").alias("signature")
        ),
    )
    sigs = T("localCheckpoint", lambda: sigs_plan.localCheckpoint())
    r = K // 8

    def build_join():
        def _band_key(b):
            concat = F.concat_ws(",", *[F.element_at("signature", b * r + j + 1) for j in range(r)])
            return F.xxhash64(concat)

        banded = sigs.select(
            "id",
            "signature",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), _band_key(b).alias("bucket"))
                        for b in range(8)
                    ]
                )
            ).alias("bb"),
        ).select("id", "signature", "bb.band", "bb.bucket")
        left = banded.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"), "band", "bucket")
        right = banded.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"), "band", "bucket")
        agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x))
        est = agree.cast("double") / F.lit(float(K))
        return (
            left.join(right, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
            .where(F.col("est_jaccard") >= 0.7)
            .dropDuplicates(["id_a", "id_b"])
            .orderBy("id_a", "id_b")
        )

    pairs = T("join_build", build_join)
    T("exec_count", lambda: pairs.count())
