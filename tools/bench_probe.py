"""r15 optimization-round measurement harness (guide §1).

For each headline query (or names passed on argv) measures, in one session:
  - construct_s : queries.py function call → DataFrame (driver-side plan build)
  - cold_s      : first .toPandas() — analysis + codegen + exec + driver xfer
  - warm_s      : second .toPandas() — exec + driver transfer (plan cached)
  - noop_s      : third run through the noop sink — exec only, no driver xfer
  - rows        : result cardinality
and writes .explain('formatted') to plans/r15/<query>_<tag>.txt.

Cold-minus-warm isolates the one-time plan/codegen cost; warm-minus-noop
isolates the driver-transfer cost; noop is the pure computation (guide §1.4).

Usage: python tools/bench_probe.py <tag> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_data_pipeline_spark.queries import ALL_QUERIES
from ml_data_pipeline_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_topk_per_group",
    "q_sessionize",
    "i1_impute_mean",
    "i4_interpolate",
    "e3_target_encode",
    "dd_minhash_pairs",
    "dd_simhash_pairs",
    "tx_quality",
    "tx_lang_id",
    "ss_brute_topk",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    plans_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("bench_probe")
    # same generic warm-up as bench.py so cold_s matches the bench's regime
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tiny = spark.range(1000).select("id", (F.col("id") % 7).alias("k"), F.rand(1).alias("x"))
    w = Window.partitionBy("k").orderBy("x")
    (
        tiny.groupBy("k")
        .agg(F.sum("x").alias("s"), F.avg("x").alias("a"))
        .join(tiny, "k")
        .withColumn("r", F.row_number().over(w))
        .orderBy("k")
        .toPandas()
    )

    out = {}
    for name in names:
        fn = ALL_QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        t1 = time.monotonic()
        pdf = df.toPandas()
        t2 = time.monotonic()
        # plans AFTER the first action: module-level memo caches (the
        # documented _NORM_DOCS_CACHE) are in their steady state
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (plans_dir / f"{name}_{tag}.txt").write_text(plan)
        # warm repeat: NEW DataFrame from the query fn (bench always
        # rebuilds), so this still pays construct+analysis, minus JVM/code
        # warm-up effects
        t3 = time.monotonic()
        df2 = fn(spark, sf_dir)
        pdf2 = df2.toPandas()
        t4 = time.monotonic()
        df3 = fn(spark, sf_dir)
        t5 = time.monotonic()
        df3.write.format("noop").mode("overwrite").save()
        t6 = time.monotonic()
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "construct_s": round(t1 - t0, 3),
            "cold_s": round(t2 - t1, 3),
            "warm_s": round(t4 - t3, 3),
            "noop_s": round(t6 - t5, 3),
            "rows": len(pdf),
        }
        assert len(pdf) == len(pdf2)
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTALS " + json.dumps({
        "cold": round(sum(v["cold_s"] for v in out.values()), 3),
        "warm": round(sum(v["warm_s"] for v in out.values()), 3),
        "noop": round(sum(v["noop_s"] for v in out.values()), 3),
        "loadavg": os.getloadavg()[0],
    }))


if __name__ == "__main__":
    main()
