"""One-off r15 probe: does spreading the single-row-group scans help the
scan-rooted headline queries (q1, i1)? A = current, B = _ensure_parallel."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.dedup import _ensure_parallel
from ml_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_scan_parallel")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

import ml_data_pipeline_spark.queries as Q
from ml_data_pipeline_spark.operators import imputation as I


def q1_A():
    return Q.q1_pricing_summary(spark, sf_dir)


def q1_B():
    li = _ensure_parallel(Q._li(spark, sf_dir).where(F.col("l_shipdate") <= F.lit("2000-01-01")))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def i1_A():
    return Q.i1_impute_mean(spark, sf_dir)


def i1_B():
    out = I.impute_mean(_ensure_parallel(Q._li_nulls(spark, sf_dir)), "l_quantity")
    return out.select("l_orderkey", "l_linenumber", F.round("l_quantity", 6).alias("l_quantity"))


pairs = [("q1", q1_A, q1_B), ("i1", i1_A, i1_B)]
for name, A, B in pairs:
    ra = sorted(map(tuple, A().collect()))
    rb = sorted(map(tuple, B().collect()))
    assert ra == rb, f"{name}: outputs differ!"
    print(f"{name}: outputs identical ({len(ra)} rows)", flush=True)

for rep in range(3):
    msg = []
    for name, A, B in pairs:
        t0 = time.monotonic()
        a = A()
        a.write.format("noop").mode("overwrite").save()
        t1 = time.monotonic()
        b = B()
        b.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic()
        msg.append(f"{name}: A={t1-t0:.3f} B={t2-t1:.3f}")
    print(f"rep{rep}: " + " | ".join(msg) + f" loadavg={os.getloadavg()[0]:.2f}", flush=True)
