"""One-off r15 probe: i4 ranged-interpolate shapes.

A = current committed shape (2 passes: summary branch + main pass).
B = single materialized windowed pass (localCheckpoint), summary + join read it.

Checks B's output equals A's, then times construct+noop for each, interleaved.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import imputation as I
from ml_data_pipeline_spark.operators.imputation import _split_points
from ml_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_i4")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

import ml_data_pipeline_spark.queries as Q

column = "l_quantity"
order_cols = ["l_orderkey", "l_linenumber", "l_extendedprice"]


def build_B(df):
    P = spark.sparkContext.defaultParallelism
    c = F.col(column)
    asc = [F.col(x).asc() for x in order_cols]
    desc = [F.col(x).desc() for x in order_cols]
    splits = _split_points(df, order_cols, P)
    terms_sql = " + ".join(f"CAST((`{order_cols[0]}` >= {s[0]}) AS INT)" for s in splits)
    ann = df.withColumn("__pid", F.expr(f"COALESCE({terms_sql}, 0)"))
    w_asc_all = Window.partitionBy("__pid").orderBy(*asc)
    w_fwd = w_asc_all.rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = Window.partitionBy("__pid").orderBy(*desc).rowsBetween(Window.unboundedPreceding, 0)
    lpos = F.row_number().over(w_asc_all)
    val_pos = F.when(c.isNotNull(), F.col("__lpos"))
    ann = ann.withColumn("__lpos", lpos)
    local_prev_v = F.last(F.when(c.isNotNull(), c), ignorenulls=True).over(w_fwd)
    local_prev_p = F.last(val_pos, ignorenulls=True).over(w_fwd)
    local_next_v = F.last(F.when(c.isNotNull(), c), ignorenulls=True).over(w_bwd)
    local_next_p = F.last(val_pos, ignorenulls=True).over(w_bwd)
    mw = ann.select(
        "*",
        local_prev_v.alias("__lprev_v"),
        local_prev_p.alias("__lprev_p"),
        local_next_v.alias("__lnext_v"),
        local_next_p.alias("__lnext_p"),
    ).localCheckpoint()
    summ = mw.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.when(c.isNotNull(), F.struct(F.col("__lpos").alias("p"), c.cast("double").alias("v")))).alias("__first_nn"),
        F.max(F.when(c.isNotNull(), F.struct(F.col("__lpos").alias("p"), c.cast("double").alias("v")))).alias("__last_nn"),
    )
    w_pid = Window.orderBy("__pid")
    w_before = w_pid.rowsBetween(Window.unboundedPreceding, -1)
    w_after = w_pid.rowsBetween(1, Window.unboundedFollowing)
    summ = summ.withColumn("__off", F.coalesce(F.sum("__n").over(w_before), F.lit(0)).cast("long"))
    last_g = F.when(
        F.col("__last_nn").isNotNull(),
        F.struct((F.col("__off") + F.col("__last_nn.p")).alias("p"), F.col("__last_nn.v").alias("v")),
    )
    first_g = F.when(
        F.col("__first_nn").isNotNull(),
        F.struct((F.col("__off") + F.col("__first_nn.p")).alias("p"), F.col("__first_nn.v").alias("v")),
    )
    carries = (
        summ.withColumn("__last_g", last_g)
        .withColumn("__first_g", first_g)
        .select(
            "__pid",
            "__off",
            F.last("__last_g", ignorenulls=True).over(w_before).alias("__cp"),
            F.first("__first_g", ignorenulls=True).over(w_after).alias("__cn"),
        )
        .select(
            "__pid",
            "__off",
            F.col("__cp.p").alias("__cp_p"),
            F.col("__cp.v").alias("__cp_v"),
            F.col("__cn.p").alias("__cn_p"),
            F.col("__cn.v").alias("__cn_v"),
        )
    )
    joined = mw.join(F.broadcast(carries), "__pid")
    gpos = F.col("__off") + F.col("__lpos")
    prev_p = F.coalesce(F.col("__off") + F.col("__lprev_p"), F.col("__cp_p"))
    prev_v = F.when(F.col("__lprev_p").isNotNull(), F.col("__lprev_v")).otherwise(F.col("__cp_v"))
    next_p = F.coalesce(F.col("__off") + F.col("__lnext_p"), F.col("__cn_p"))
    next_v = F.when(F.col("__lnext_p").isNotNull(), F.col("__lnext_v")).otherwise(F.col("__cn_v"))
    interp = prev_v + (next_v - prev_v) * (gpos - prev_p) / (next_p - prev_p)
    filled = F.when(c.isNotNull(), c).otherwise(F.coalesce(interp, prev_v, next_v))
    return joined.withColumn(column, filled).select(*df.columns)


def final_select(out):
    return out.select("l_orderkey", "l_linenumber", F.round("l_quantity", 6).alias("l_quantity"))


# equality once
src = Q._li_nulls(spark, sf_dir)
a_rows = sorted(map(tuple, final_select(I.impute_interpolate_ranged(src, column, order_cols)).collect()))
b_rows = sorted(map(tuple, final_select(build_B(Q._li_nulls(spark, sf_dir))).collect()))
assert a_rows == b_rows, "B output differs!"
print(f"outputs identical: {len(a_rows)} rows", flush=True)

for rep in range(3):
    t0 = time.monotonic()
    a_df = final_select(I.impute_interpolate_ranged(Q._li_nulls(spark, sf_dir), column, order_cols))
    t1 = time.monotonic()
    a_df.write.format("noop").mode("overwrite").save()
    t2 = time.monotonic()
    b_df = final_select(build_B(Q._li_nulls(spark, sf_dir)))
    t3 = time.monotonic()
    b_df.write.format("noop").mode("overwrite").save()
    t4 = time.monotonic()
    print(
        f"rep{rep}: A construct={t1-t0:.3f} noop={t2-t1:.3f} total={t2-t0:.3f} | "
        f"B construct={t3-t2:.3f} noop={t4-t3:.3f} total={t4-t2:.3f} loadavg={os.getloadavg()[0]:.2f}",
        flush=True,
    )
