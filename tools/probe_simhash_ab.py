"""r16 A/B probe: dd_simhash_pairs cold wall with the Arrow per_tok kernel
vs the JVM explode+groupBy shape, each in a FRESH subprocess session
(interleaved A B A B ... to cancel host drift), timed exactly like bench.py
(generic warm-up, then fn(spark, sf).toPandas()).

Usage: python tools/probe_simhash_ab.py [n_reps_per_variant]
"""

from __future__ import annotations

import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
variant = sys.argv[1]
from ml_data_pipeline_spark.session import get_spark
from ml_data_pipeline_spark.operators import dedup as DD
from ml_data_pipeline_spark.constants import WS_PLUS
from pyspark.sql import functions as F

if variant == "jvm":
    def jvm_per_tok(df, text_col, id_col):
        tk = F.filter(F.split(F.lower(F.col(text_col)), WS_PLUS), lambda t: F.length(t) > 0)
        tks = DD._ensure_parallel(df.select(F.col(id_col).alias("id"), F.explode(tk).alias("t")))
        return tks.groupBy("id", F.xxhash64("t").alias("h")).agg(F.count(F.lit(1)).alias("__cnt"))
    DD._simhash_per_tok_arrow = jvm_per_tok

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_ab")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
from pyspark.sql import Window
tiny = spark.range(1000).select("id", (F.col("id") % 7).alias("k"), F.rand(1).alias("x"))
w = Window.partitionBy("k").orderBy("x")
(tiny.groupBy("k").agg(F.sum("x").alias("s"), F.avg("x").alias("a")).join(tiny, "k")
 .withColumn("r", F.row_number().over(w)).orderBy("k").toPandas())
# mapInPandas worker warm-up parity: the real bench runs i4 (mapInPandas)
# before dd_simhash, so Python workers are warm in BOTH variants there
import pandas as pd
def _noop(it):
    for b in it:
        yield b
spark.range(0, 1000, 1, 32).mapInPandas(_noop, "id long").count()
from ml_data_pipeline_spark.queries import ALL_QUERIES
t0 = time.monotonic()
pdf = ALL_QUERIES["dd_simhash_pairs"](spark, sf_dir).toPandas()
t1 = time.monotonic()
print(f"RESULT {variant} {t1-t0:.3f} rows={len(pdf)}", flush=True)
"""


def steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, list[float]] = {"arrow": [], "jvm": []}
    for r in range(reps):
        for variant in ("arrow", "jvm"):
            s0 = steal()
            out = subprocess.run(
                [sys.executable, "-c", CHILD, variant],
                capture_output=True, text=True, timeout=600,
            )
            s1 = steal()
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
            if not line:
                print(f"rep{r} {variant}: FAILED\n{out.stderr[-2000:]}")
                continue
            t = float(line[0].split()[2])
            results[variant].append(t)
            print(f"rep{r} {variant}: {t:.3f}s steal={(s1-s0)/100:.1f}cs "
                  f"load={os.getloadavg()[0]:.2f}", flush=True)
    for v, ts in results.items():
        if ts:
            print(f"{v}: best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
