"""One-off r15 probe: can ReusedExchange replace the dd_* localCheckpoint?

C = minhash/simhash near-duplicates with NO checkpoint (lazy; both self-join
sides share the signature subtree). Checks pair-set equality with the
committed (checkpointed) shape, greps the final plan for exchange reuse, and
times construct+collect for both, interleaved.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import itertools

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import dedup as DD
from ml_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_dd_reuse")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

import ml_data_pipeline_spark.queries as Q


def minhash_C():
    df = Q._normalized_documents(spark, sf_dir)
    num_hashes, bands, threshold = 32, 8, 0.7
    r = num_hashes // bands
    sigs = DD.shingle_minhash(df, "text", "doc_id", num_hashes, 5, "xxhash64")

    def _band_key(b):
        concat = F.concat_ws(",", *[F.element_at("signature", b * r + j + 1) for j in range(r)])
        return F.xxhash64(concat)

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


def simhash_C():
    df = Q._normalized_documents(spark, sf_dir)
    max_hamming = 3
    nblocks = max_hamming + 3
    widths = [64 // nblocks + (1 if i < 64 % nblocks else 0) for i in range(nblocks)]
    offs = [sum(widths[:i]) for i in range(nblocks)]
    combos = list(itertools.combinations(range(nblocks), 3))
    sigs = DD.simhash_signatures(df, "text", "doc_id", idf_weighted=True)
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("block"),
                        *[
                            F.shiftrightunsigned(F.col("simhash"), offs[b])
                            .bitwiseAND(F.lit((1 << widths[b]) - 1))
                            .alias(f"v{j}")
                            for j, b in enumerate(combo)
                        ],
                    )
                    for ci, combo in enumerate(combos)
                ]
            )
        ).alias("bv"),
    ).select("id", "simhash", "bv.*")
    keys = ["block", "v0", "v1", "v2"]
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), *keys)
    b = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), *keys)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )


# equality + plan check once
for name, cur, C in [
    ("minhash", lambda: Q.dd_minhash_pairs(spark, sf_dir), minhash_C),
    ("simhash", lambda: Q.dd_simhash_pairs(spark, sf_dir), simhash_C),
]:
    rc = sorted(map(tuple, cur().collect()))
    df_c = C()
    rC = sorted(map(tuple, df_c.collect()))
    assert rc == rC, f"{name}: outputs differ!"
    plan = df_c._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_reuse = plan.count("ReusedExchange") + plan.count("TableCacheQueryStage")
    n_scan = plan.count("Scan parquet")
    print(f"{name}: identical ({len(rc)} rows); ReusedExchange-ish={n_reuse} parquet-scans={n_scan}", flush=True)

for rep in range(3):
    msg = []
    for name, cur, C in [
        ("minhash", lambda: Q.dd_minhash_pairs(spark, sf_dir), minhash_C),
        ("simhash", lambda: Q.dd_simhash_pairs(spark, sf_dir), simhash_C),
    ]:
        t0 = time.monotonic()
        cur().collect()
        t1 = time.monotonic()
        C().collect()
        t2 = time.monotonic()
        msg.append(f"{name}: cur={t1-t0:.3f} C={t2-t1:.3f}")
    print(f"rep{rep}: " + " | ".join(msg) + f" loadavg={os.getloadavg()[0]:.2f}", flush=True)
