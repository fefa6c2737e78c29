"""One-off r15 probe: minhash band bucket as xxhash64(slot longs) directly
vs xxhash64(concat_ws(',', casts to string)). The bucket is only an equality
key, so any hash of the r slot values yields the same pair set modulo
64-bit collisions; this checks the pair OUTPUT is identical at 3 SFs and
times the two shapes."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import dedup as DD
from ml_data_pipeline_spark.session import get_spark

spark = get_spark("probe_band_key")

import ml_data_pipeline_spark.queries as Q


def minhash_pairs_longkey(df, num_hashes=32, bands=8, threshold=0.7):
    r = num_hashes // bands
    sigs = DD.shingle_minhash(df, "text", "doc_id", num_hashes, 5, "xxhash64").localCheckpoint()

    def _band_key(b):
        return F.xxhash64(*[F.element_at("signature", b * r + j + 1) for j in range(r)])

    banded = sigs.select(
        "id",
        "signature",
        F.explode(
            F.array(
                *[F.struct(F.lit(b).alias("band"), _band_key(b).alias("bucket")) for b in range(bands)]
            )
        ).alias("bb"),
    ).select("id", "signature", "bb.band", "bb.bucket")
    left = banded.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"), "band", "bucket")
    right = banded.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"), "band", "bucket")
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x))
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )


for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    cur = sorted(map(tuple, Q.dd_minhash_pairs(spark, sf_dir).collect()))
    new = sorted(
        map(tuple, minhash_pairs_longkey(Q._normalized_documents(spark, sf_dir)).collect())
    )
    print(f"{sf_dir}: cur={len(cur)} new={len(new)} identical={cur == new}", flush=True)

sf_dir = "/root/testdata/sf0.1"
for rep in range(3):
    t0 = time.monotonic()
    Q.dd_minhash_pairs(spark, sf_dir).collect()
    t1 = time.monotonic()
    minhash_pairs_longkey(Q._normalized_documents(spark, sf_dir)).collect()
    t2 = time.monotonic()
    print(f"rep{rep}: cur={t1-t0:.3f} longkey={t2-t1:.3f} loadavg={os.getloadavg()[0]:.2f}", flush=True)
