"""Marketplace analytics report, end to end — the OLAP face of the engine:

revenue concentration (Gini/Lorenz) → ABC brand classification → RFM
customer segmentation → market-basket brand affinities → TPC-H-style
regional revenue — each the same operator its gate query verifies,
composed the way a weekly analytics job would run them.

Every heavy step keeps the 100 TB plan shape: dimension joins broadcast,
ranks run on the distributed ranged_rank kernel (no single-task global
sort), co-occurrence pairs come from an order-key self-equi-join.

Run: python examples/marketplace_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark import queries as Q
from ml_data_pipeline_spark.catalog import load_table
from ml_data_pipeline_spark.operators.profiling import gini_coefficient
from ml_data_pipeline_spark.session import get_spark


def run(spark, sf_dir: str) -> dict:
    report: dict = {}

    # 1. how concentrated is customer revenue? (distributed-rank Gini)
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice")).cast("long").alias("rev")
    )
    g = gini_coefficient(per_cust, "rev", "o_custkey").first()
    report["revenue_gini"] = g["gini"]
    report["n_customers"] = g["n"]

    # 2. which brands carry the business? (ABC classes)
    abc = Q.q_abc_brands(spark, sf_dir)
    report["abc_counts"] = {
        r["abc_class"]: r["n"]
        for r in abc.groupBy("abc_class").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # 3. who are the customers? (RFM quintile segments, top 5 by size)
    rfm = Q.q_rfm_segments(spark, sf_dir)
    report["top_rfm_segments"] = [
        ((r["r_score"], r["f_score"], r["m_score"]), r["n_customers"])
        for r in rfm.orderBy(F.desc("n_customers")).limit(5).collect()
    ]

    # 4. what sells together? (brand lift, top 3)
    basket = Q.q_basket_lift(spark, sf_dir)
    report["top_brand_pairs"] = [
        (r["ba"], r["bb"], r["lift"]) for r in basket.limit(3).collect()
    ]

    # 5. where is the revenue? (TPC-H Q5-shape snowflake)
    region = Q.q5_region_revenue(spark, sf_dir)
    report["top_nation"] = tuple(region.first())

    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    for k, v in run(get_spark("marketplace_analytics_example"), sf).items():
        print(f"{k}: {v}")
