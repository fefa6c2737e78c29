"""One-off r15 probe: where do dd_minhash_pairs' ~4.8s of construct go?"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_minhash_construct")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

import ml_data_pipeline_spark.queries as Q
from ml_data_pipeline_spark.operators import dedup as DD

for rep in range(3):
    Q._NORM_DOCS_CACHE.clear()
    spark.catalog.clearCache()
    t0 = time.monotonic()
    docs = Q._normalized_documents(spark, sf_dir)
    t1 = time.monotonic()
    sigs_plan = DD.shingle_minhash(docs, "text", "doc_id", 32, 5, "xxhash64")
    t2 = time.monotonic()
    sigs = sigs_plan.localCheckpoint()
    t3 = time.monotonic()
    pairs = DD.minhash_near_duplicates(docs, threshold=0.7)
    t4 = time.monotonic()
    n = pairs.count()
    t5 = time.monotonic()
    print(
        f"rep{rep}: norm_docs={t1-t0:.3f} sig_plan_build={t2-t1:.3f} "
        f"localCheckpoint={t3-t2:.3f} full_construct={t4-t3:.3f} exec_count={t5-t4:.3f} "
        f"rows={n} loadavg={os.getloadavg()[0]:.2f}",
        flush=True,
    )
