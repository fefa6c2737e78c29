"""Dump .explain('formatted') for named queries to plans/<dir>/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <outdir> <tag> <query> [query ...]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_data_pipeline_spark.queries import ALL_QUERIES
from ml_data_pipeline_spark.session import get_spark

outdir, tag = Path(sys.argv[1]), sys.argv[2]
names = sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("dump_plans")
outdir.mkdir(parents=True, exist_ok=True)
for name in names:
    df = ALL_QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    (outdir / f"{name}_{tag}.txt").write_text(plan)
    print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")
