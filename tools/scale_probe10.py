"""sf10 scale probe (VERDICT r14 item 5): push the three worst standing
sf1 ratios — dd_simhash_pairs (1.92x), dd_minhash_pairs, i5_impute_knn —
one decade FURTHER (100x the bench scale, 10x the sf1 probe), so the
"would it survive 100x" claim for the dedup/kNN families rests on a
measured two-decade curve instead of one point.

Build: /tmp/mdp_sf10 = 100 copies of the sf0.1 documents + lineitem
tables (the only tables these probes read), with the same anti-phantom
treatments as the sf1 builder (tools/scale_probe.py):

- documents: per-copy SEEDED ALPHABET PERMUTATION cipher on the text.
  The sf1 builder's rotation cipher only has 26 distinct rotations —
  at 100 copies, copies c and c+26 would carry IDENTICAL text and the
  dedup probes would chase 4x phantom cross-copy duplicate mass real
  100x data would not have. A seeded random permutation per copy (copy
  0 = identity; uniqueness asserted) keeps within-copy token structure
  byte-exact and cross-copy shingle overlap nil.
- lineitem: key offsets per copy (referential integrity, no collisions)
  + the r11 numeric jitter (c*0.01 on extendedprice, c*1e-6 on tax) so
  the adaptive-LSH width is not floored by 100x point masses.

Probe protocol (the scale_probe/verify_local discipline): one session,
JVM warmed, tracked caches + the normalized-documents memo released
between probes. Each query runs WARM at sf1 first (same boot, the
denominator) then at sf10; ratio10 = sf10_wall / (10 * sf1_wall) — the
per-decade growth factor, 1.0 = perfectly linear.

Run: python tools/scale_probe10.py [--rebuild]   (sf1 is rebuilt via
tools/scale_probe.py's builder if /tmp was wiped)
"""

from __future__ import annotations

import json
import os
import random
import shutil
import string
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ml_data_pipeline_spark.catalog import load_table  # noqa: E402
from ml_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
SF1 = "/tmp/mdp_sf1"
DST = "/tmp/mdp_sf10"
DST5 = "/tmp/mdp_sf5"
COPIES = 100

# i5's second point runs at sf5 (50 copies, lineitem only), not sf10: the
# kNN candidate stage is DESIGNED linear (occupancy-constant adaptive LSH,
# candidates ~ n * 256 * 2 tables) and measures linear, but linear at 60M
# rows is a ~100 GB transient shuffle spill — more than THIS single host's
# free disk (the sf10 attempt died ENOSPC at 78 GB spilled), while a real
# cluster spreads shuffle spill across every executor's local disk. 30M
# rows fits the host envelope and still measures a 5x span above sf1.
PROBES = [
    ("dd_minhash_pairs", DST, 10),
    ("dd_simhash_pairs", DST, 10),
    ("i5_impute_knn", DST5, 5),
    # after the r15 run retired simhash's 1.92x, the standing sf1 worst is
    # dd_ngram_jaccard (1.62x) — same documents corpus, so its second
    # decade is one more probe over the already-built sf10 build
    ("dd_ngram_jaccard", DST, 10),
    # next on the standing list: q_sessionize (1.39x) — a 10M-row events
    # build (100x users in the same time range, the sf1 builder's shape)
    ("q_sessionize", DST, 10),
    # ...and q5 (1.38x): the snowflake join over the 60M-row fact — the
    # most cluster-like workload in the headline set (AQE broadcast/
    # shuffle join planning two decades above bench scale)
    ("q5_region_revenue", DST, 10),
    # the bench headline's biggest single query — the ranged interpolate
    # plan's second decade over the 60M-row fact. Its RESULT is
    # corpus-sized (the interpolated frame), so the probe materializes it
    # with a noop write (full plan execution, rows consumed executor-side)
    # instead of toPandas — at 60M rows toPandas measures driver transfer
    # and dies on maxResultSize, not the plan under test. The small-result
    # probes keep toPandas (their transfer is nil).
    ("i4_interpolate", DST, 10, "noop"),
    # r16 (VERDICT r15 item 8): the b-family composites were sf1-probed
    # only; cover the second decade for this family too. Three
    # representatives span its kernels — b1 (SMOTE interpolation over the
    # LSH-candidate kNN), b6 (ADASYN density-weighted counts), b8 (the
    # SMOTE∘Tomek cleaning composite); b2/b7/b9/b10 reuse the same
    # balancing kernels. All read only `customer` (1.5M rows at sf10).
    ("b1_smote_counts", DST, 10),
    ("b6_adasyn_counts", DST, 10),
    ("b8_smote_tomek", DST, 10),
]


def _materialize(df, sink: str) -> None:
    if sink == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.toPandas()


def _perm_cipher(copy: int) -> tuple[str, str]:
    """Copy 0 = identity; otherwise a seeded full-alphabet permutation
    (case-aligned so token case structure is preserved)."""
    a = string.ascii_lowercase
    if copy == 0:
        return a + a.upper(), a + a.upper()
    letters = list(a)
    random.Random(10_000 + copy).shuffle(letters)
    p = "".join(letters)
    return a + a.upper(), p + p.upper()


def build() -> None:
    spark = get_spark("scale_probe10_build")
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)

    # --- documents: 100 appends, each a permutation-ciphered copy ---
    docs = load_table(spark, SRC, "documents")
    max_doc = int(docs.agg(F.max("doc_id")).first()[0])
    ciphers = set()
    for c in range(COPIES):
        src_a, dst_a = _perm_cipher(c)
        assert dst_a not in ciphers, "cipher collision would fabricate dups"
        ciphers.add(dst_a)
        cp = docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * (max_doc + 1)))
        if c:
            cp = cp.withColumn("text", F.translate(F.col("text"), src_a, dst_a))
        cp.write.mode("append").parquet(f"{DST}/documents.parquet")
    n_docs = spark.read.parquet(f"{DST}/documents.parquet").count()
    print(f"built documents: {n_docs} rows")

    # --- fact + keyed dims: one crossJoin-with-range pass per table ---
    # strides come from the SHARED key space (the sf1 builder's rule:
    # l_orderkey/o_orderkey must offset by the same max+1 or copy c's
    # lineitems point at phantom orders; in this testdata the per-table
    # maxes coincide, but compute the shared max anyway)
    keyed = {
        "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
    }
    maxes: dict[str, int] = {}
    for t, keys in keyed.items():
        row = load_table(spark, SRC, t).agg(
            *[F.max(k).alias(k) for k in keys]
        ).first()
        for k in keys:
            base = k.split("_", 1)[1]
            maxes[base] = max(maxes.get(base, 0), int(row[k]))
    copies = spark.range(COPIES).withColumnRenamed("id", "__c")
    for t, keys in keyed.items():
        big = load_table(spark, SRC, t).crossJoin(copies)
        for k in keys:
            big = big.withColumn(
                k, F.col(k) + F.col("__c") * (maxes[k.split("_", 1)[1]] + 1)
            )
        if t == "lineitem":
            # the r11 numeric jitter (see module docstring)
            big = big.withColumn(
                "l_extendedprice", F.col("l_extendedprice") + F.col("__c") * 0.01
            ).withColumn("l_tax", F.col("l_tax") + F.col("__c") * 1e-6)
        parts = 64 if t == "lineitem" else 16
        big.drop("__c").repartition(parts).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(f"built {t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()} rows")
    for t in ("nation", "region"):  # SF-constant dims replicate as-is
        load_table(spark, SRC, t).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    _build_events(spark, DST, COPIES)
    with open(f"{DST}/_BUILD_DONE", "w") as fh:
        fh.write("ok")
    spark.stop()


def _build_events(spark, dst: str, copies: int) -> None:
    """events x copies: 100x users in the same time range (denser stream,
    disjoint sessions per copy — the sf1 builder's shape)."""
    ev = load_table(spark, SRC, "events")
    row = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).first()
    cdf = spark.range(copies).withColumnRenamed("id", "__c")
    big = (
        ev.crossJoin(cdf)
        .withColumn("event_id", F.col("event_id") + F.col("__c") * (int(row["e"]) + 1))
        .withColumn("user_id", F.col("user_id") + F.col("__c") * (int(row["u"]) + 1))
        .drop("__c")
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{dst}/events.parquet")
    print(f"built events: {spark.read.parquet(f'{dst}/events.parquet').count()} rows")


def build_sf5() -> None:
    """lineitem-only 50-copy build for the i5 probe (see PROBES note)."""
    spark = get_spark("scale_probe5_build")
    shutil.rmtree(DST5, ignore_errors=True)
    os.makedirs(DST5, exist_ok=True)
    li = load_table(spark, SRC, "lineitem")
    row = li.agg(
        *[F.max(k).alias(k) for k in ("l_orderkey", "l_suppkey", "l_partkey")]
    ).first()
    copies = spark.range(50).withColumnRenamed("id", "__c")
    big = (
        li.crossJoin(copies)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__c") * (int(row["l_orderkey"]) + 1))
        .withColumn("l_suppkey", F.col("l_suppkey") + F.col("__c") * (int(row["l_suppkey"]) + 1))
        .withColumn("l_partkey", F.col("l_partkey") + F.col("__c") * (int(row["l_partkey"]) + 1))
        .withColumn("l_extendedprice", F.col("l_extendedprice") + F.col("__c") * 0.01)
        .withColumn("l_tax", F.col("l_tax") + F.col("__c") * 1e-6)
        .drop("__c")
    )
    big.repartition(64).write.mode("overwrite").parquet(f"{DST5}/lineitem.parquet")
    print(f"built sf5 lineitem: {spark.read.parquet(f'{DST5}/lineitem.parquet').count()} rows")
    with open(f"{DST5}/_BUILD_DONE", "w") as fh:
        fh.write("ok")
    spark.stop()


def _release(queries_mod) -> None:
    from ml_data_pipeline_spark.cache import release_tracked

    release_tracked()
    for _df in queries_mod._NORM_DOCS_CACHE.values():
        _df.unpersist(False)
    queries_mod._NORM_DOCS_CACHE.clear()


def probe() -> None:
    from ml_data_pipeline_spark import queries as Q

    spark = get_spark("scale_probe10")
    spark.read.parquet(f"{DST}/lineitem.parquet").count()  # JVM warm
    only = {a for a in sys.argv[1:] if not a.startswith("-")}
    out: dict[str, dict] = {}
    for entry in PROBES:
        name, dst, factor = entry[0], entry[1], entry[2]
        sink = entry[3] if len(entry) > 3 else "pandas"
        if only and name not in only:
            continue
        t0 = time.monotonic()
        _materialize(Q.ALL_QUERIES[name](spark, SF1), sink)
        sf1_wall = time.monotonic() - t0
        _release(Q)
        t0 = time.monotonic()
        _materialize(Q.ALL_QUERIES[name](spark, dst), sink)
        big_wall = time.monotonic() - t0
        _release(Q)
        ratio = big_wall / (factor * sf1_wall)
        out[name] = {
            "sf1_wall_sec": round(sf1_wall, 2),
            f"sf{factor}_wall_sec": round(big_wall, 2),
            "scale_factor": factor,
            "ratio_vs_linear": round(ratio, 2),
        }
        print(f"{name}: {out[name]}")
    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])
    print(json.dumps({"copies": COPIES, "loadavg_end": load1, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    if not os.path.exists(f"{SF1}/_BUILD_DONE"):
        import importlib

        sp = importlib.import_module("scale_probe")
        sp.build()
    only = {a for a in sys.argv[1:] if not a.startswith("-")}
    need10 = not only or any(
        n in only
        for n in (
            "dd_minhash_pairs",
            "dd_simhash_pairs",
            "dd_ngram_jaccard",
            "q_sessionize",
            "q5_region_revenue",
            "i4_interpolate",
            "b1_smote_counts",
            "b6_adasyn_counts",
            "b8_smote_tomek",
        )
    )
    need5 = not only or "i5_impute_knn" in only
    if need10 and ("--rebuild" in sys.argv or not os.path.exists(f"{DST}/_BUILD_DONE")):
        build()
    if need5 and ("--rebuild" in sys.argv or not os.path.exists(f"{DST5}/_BUILD_DONE")):
        build_sf5()
    probe()
