"""Plan-quality audit: for each headline query, report whether filters push
to the parquet scan, how narrow the read schema is, and which join
strategies Catalyst picked.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

This is the evidence loop for the 100 TB design rules (README "Scale
design"): a scan that reads all columns for a 2-column projection, or a
dimension join that sort-merges instead of broadcasting, shows up here
before it shows up as a slow cluster job.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_data_pipeline_spark.queries import ALL_QUERIES
from ml_data_pipeline_spark.session import get_spark

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_topk_per_group",
    "q_sessionize",
    "q_rollup",
    "q_having",
    "q_asof_join",
    "e3_target_encode",
    "i1_impute_mean",
    # round-3 additions: retrieval, CDC history, smoothing, stream-static
    "q_bm25",
    "s16_scd2",
    "q_ewma",
    "st_enriched_segments",
    # TPC-H breadth (late r3): snowflakes, distribution, anti-join
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation",
    "q13_order_distribution",
    "q15_top_supplier",
    "q22_dormant_customers",
    # late-r3 analytics: distributed rank, co-occurrence join, layout key
    "q_gini",
    "q_basket_lift",
    "q_abc_brands",
    "s17_zorder_layout",
    "q_twap",
]


def audit(spark, name: str, df) -> None:
    qe = df._jdf.queryExecution()
    plan = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^\n]*)", plan)
    n_bcast = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    n_shj = plan.count("ShuffledHashJoin")
    n_exch = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    print(f"== {name}")
    print(f"   joins: broadcast={n_bcast} sortmerge={n_smj} shuffledhash={n_shj}; shuffles={n_exch}")
    for p in pushed:
        flt = p.strip()
        print(f"   pushed: {flt[:100] if flt else '(none)'}")
    for s in schemas:
        cols = [c.split(":")[0] for c in s.rstrip(">").split(",") if ":" in c]
        print(f"   scan cols ({len(cols)}): {', '.join(cols[:8])}{'...' if len(cols) > 8 else ''}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("explain_audit")
    for name in names:
        # per-query isolation (r11 review — the plan_audit pattern): one
        # bad name or env-dependent construction must not silently skip
        # every later query in the list
        try:
            audit(spark, name, ALL_QUERIES[name](spark, sf))
        except Exception as exc:
            print(f"ERR  {name}: {type(exc).__name__}: {str(exc)[:120]}")


if __name__ == "__main__":
    main()
