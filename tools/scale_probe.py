"""One-off sf1 scale probe (VERDICT r8 item 5): empirically confirm the
100-TB plan claims one order of magnitude up from the bench scale.

Builds an sf1-equivalent dataset (10x sf0.1) under /tmp/mdp_sf1 by
replicating each table with key offsets — and, for documents, a per-copy
letter-substitution cipher on the text, so copies are NOT near-duplicates
of each other and the dedup workload scales the way 10x more real data
would (10x pairs, not 100x phantom cross-copy dups; token/shingle
structure within a copy is preserved exactly).

Then times the 5 most expensive headline queries (i4's range-partitioned
interpolation, minhash + simhash banded LSH, q5's snowflake join, the
stored-index incremental probe) and prints per-query wall seconds plus
the sf0.1 baseline ratio. A plan that survives 100x must first survive
10x with ~10x (not 100x) wall time at fixed parallelism.

Run: python tools/scale_probe.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

# anchor on __file__, not CWD (r11 review — mirrors plan_audit/verify_local)
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ml_data_pipeline_spark.catalog import load_table  # noqa: E402
from ml_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/mdp_sf1"
COPIES = 10

# key columns to offset per copy so replicated rows keep referential
# integrity without colliding (offset = copy * (max_key + 1), exact per
# table so joins still line up across tables sharing the key space)
KEYED = {
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    # events: 10x users in the same time range (denser stream, disjoint
    # sessions per copy) — event_id/user_id share the "id" offset base,
    # which only makes the offsets larger, never colliding
    "events": ["event_id", "user_id"],
    # embeddings (r12 verdict item 5): vec_id offsets like any key; label
    # and the vector itself get per-copy treatment below — labels offset
    # to DISJOINT block spaces (10x more blocks of the same size, the way
    # an IVF/cluster blocking key scales with a 10x corpus — NOT 10x
    # bigger blocks, which would quadratically inflate any blockwise op
    # with phantom pairs real data would not have), and the vector is
    # circularly shifted per copy (distances within a copy are permutation-
    # invariant = preserved exactly; cross-copy cosine decorrelates), the
    # numeric analogue of the documents letter cipher.
    "embeddings": ["vec_id"],
}
ASIS = ["nation", "region"]  # SF-constant dims replicate as-is (1 copy)

PROBES = [
    "i4_interpolate",
    "dd_minhash_pairs",
    "dd_simhash_pairs",
    "q5_region_revenue",
    "dd_incremental_indexed",
    # text-family growers (documents-bound, tokenize-heavy)
    "tx_lang_id",
    "tx_quality",
    "dd_ngram_jaccard",
    # events-family (r9 verdict item 7): sessionization windows + one
    # structured-streaming drain, both over the 10x-denser event stream
    "q_sessionize",
    "st_hourly_counts",
    # ML-imputation/balancing family (r10 verdict item 5): the two cleared
    # plan-rescan gates plus one kNN-join balancer, so the LSH-join
    # machinery under I5/I7/B1-B9 has a recorded 10x data point
    "e4_frequency_encode",
    "i9_impute_by_model",
    "b1_smote_counts",
    "i5_impute_knn",
    # r11 verdict item 6: the remaining heavy ML family — hot-deck on the
    # adaptive path (its sf0.1 wall was measured but no 10x ratio existed)
    # and one CV gate so the fold machinery has a 10x data point
    "i7_hot_deck",
    "m5_cross_val",
    # r12: components + hash split over the 10x pair graph (the O(log n)
    # contraction's 10x data point)
    "t14_cluster_safe_split",
    # r13 (VERDICT r12 item 5): the text/retrieval heavies — idf join
    # fan-out, per-term BM25 join + scalar broadcast, and blockwise
    # semantic dedup over the 10x embeddings table
    "tx_tfidf",
    "q_bm25",
    "ss_semantic_dedup",
    # r13: the danger-vote balancers (this round's plan-collapse targets;
    # b1 alone covered the family before) — ADASYN's global density kNN
    # and Borderline's full-corpus vote kNN are the heaviest balancing
    # plans, so their 10x points are measured, not argued
    "b6_adasyn_counts",
    "b7_borderline_counts",
    # r13: the SMOTE-cleaning compositions — tomek/ENN re-run the kNN
    # machinery over the BALANCED frame (5x majority), the largest input
    # any balancing plan sees; b8 is the heaviest probe in the list
    "b8_smote_tomek",
    "b9_smote_enn",
    # r14 (VERDICT r13 item 5): the last unprobed heavies — MICE's chained
    # LR sweeps (iteration-dominated), DBSCAN's eps-neighbor graph, and
    # PageRank's 5 power iterations with per-iteration checkpoint.
    # ml_dbscan itself (the brute exact baseline) was probed ONCE and
    # measured 5.14x (1149s sf1 vs 22.4s warm sf0.1 — 51x wall for 10x
    # data, exactly the documented n²); it stays OUT of the standing list
    # by the same rule as ss_brute_topk, and the IVF scale path is the
    # probed gate instead.
    "i6_impute_mice",
    "ml_dbscan_ivf",
    "q_pagerank",
]


def _cipher(copy: int) -> tuple[str, str]:
    """Letter rotation for documents copy k: tokens differ entirely across
    copies (no cross-copy shingle overlap) while within-copy structure —
    token lengths, duplicates, whitespace — is byte-for-byte preserved."""
    a = string.ascii_lowercase
    A = string.ascii_uppercase
    rot = copy % 26
    return a + A, a[rot:] + a[:rot] + A[rot:] + A[:rot]


def build() -> None:
    spark = get_spark("scale_probe_build")
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    for t in ASIS:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    # offsets from the shared key space: orderkey offsets must agree
    # between lineitem and orders, custkey between orders and customer...
    maxes: dict[str, int] = {}
    for t, keys in KEYED.items():
        df = load_table(spark, SRC, t)
        row = df.agg(*[F.max(k).alias(k) for k in keys]).first()
        for k in keys:
            base = k.split("_", 1)[1]  # l_orderkey/o_orderkey share 'orderkey'
            maxes[base] = max(maxes.get(base, 0), int(row[k]))
    for t, keys in KEYED.items():
        df = load_table(spark, SRC, t)
        lab_base = (
            int(df.agg(F.max("label")).first()[0]) + 1 if t == "embeddings" else 0
        )
        parts = []
        for c in range(COPIES):
            cp = df
            for k in keys:
                off = c * (maxes[k.split("_", 1)[1]] + 1)
                cp = cp.withColumn(k, F.col(k) + F.lit(off))
            if t == "documents":
                src, dst = _cipher(c)
                cp = cp.withColumn("text", F.translate(F.col("text"), src, dst))
            if t == "embeddings":
                # disjoint label blocks per copy + circular vector shift
                # (see the KEYED note); shift by c keeps copy 0 bit-
                # identical to the source and every within-copy distance
                # exact under the permutation
                cp = cp.withColumn("label", F.col("label") + F.lit(c * lab_base))
                if c:
                    # shift by c MOD dim (ADVICE r13): with a plain c, any
                    # COPIES > vector dim made slice() start past the array
                    # end and silently emitted truncated/empty vectors;
                    # the modulo keeps every copy a true rotation.
                    sh = F.lit(c) % F.size("embedding")
                    cp = cp.withColumn(
                        "embedding",
                        F.concat(
                            F.slice(F.col("embedding"), sh + 1, F.size("embedding") - sh),
                            F.slice(F.col("embedding"), F.lit(1), sh),
                        ),
                    )
            if t == "lineitem":
                # numeric analogue of the documents cipher (r11): plain
                # replication duplicates every (extendedprice, tax) pair
                # exactly 10x — phantom point masses that REAL 10x data
                # would not have, which floor the adaptive-LSH width and
                # inflate the i5 kNN probe's constant (measured occupancy
                # 334 vs the 256 target at the 1e-3 width floor). A tiny
                # per-copy offset keeps within-copy duplication (real)
                # while separating the copies.
                cp = cp.withColumn(
                    "l_extendedprice", F.col("l_extendedprice") + F.lit(c * 0.01)
                ).withColumn("l_tax", F.col("l_tax") + F.lit(c * 1e-6))
            parts.append(cp)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()} rows")
    # done-marker LAST (r11 review: the old lineitem.parquet sentinel is
    # written 3rd of 9 — an interrupted build looked complete forever and
    # probed missing or key-misaligned tables)
    with open(f"{DST}/_BUILD_DONE", "w") as fh:
        fh.write("ok")
    spark.stop()


def probe() -> None:
    from ml_data_pipeline_spark.cache import release_tracked
    from ml_data_pipeline_spark.queries import ALL_QUERIES

    spark = get_spark("scale_probe")
    spark.read.parquet(f"{DST}/lineitem.parquet").count()  # JVM warm
    times: dict[str, float] = {}
    for name in PROBES:
        t0 = time.monotonic()
        ALL_QUERIES[name](spark, DST).toPandas()
        times[name] = round(time.monotonic() - t0, 2)
        print(f"{name}: {times[name]}s")
        # release tracked operator caches between probes (the verify_local
        # protocol) — at sf1 a prior probe's pinned 6M-row cache forces
        # the next probe's cache to spill and inflates its wall 3x+
        release_tracked()
        # ... and the untracked normalized-documents memo (r11 review:
        # minhash/simhash pin the full 10x corpus via queries'
        # _NORM_DOCS_CACHE — left pinned, every later probe runs with it
        # occupying executor memory, the exact spill condition this
        # release exists to prevent). Cleared, the next user recomputes
        # and re-caches — honest per-probe isolation.
        from ml_data_pipeline_spark import queries as _Q

        for _df in _Q._NORM_DOCS_CACHE.values():
            _df.unpersist(False)
        _Q._NORM_DOCS_CACHE.clear()
    print(json.dumps({"sf": 1.0, "queries": times, "total": round(sum(times.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    if "--rebuild" in sys.argv or not os.path.exists(f"{DST}/_BUILD_DONE"):
        build()
    probe()
