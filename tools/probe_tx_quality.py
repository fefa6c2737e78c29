"""One-off r15 probe: tx_quality per-task work — what do the two
regexp_counts cost, and does a translate()-based char-class count beat them?

Variants (same spread input):
  A = current quality_score projection
  B = A minus the two regexp_count columns (cost isolation)
  C = A with punct/digit counts via length-translate instead of regexp_count
Checks C == A values first.
"""

from __future__ import annotations

import os
import string
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import text as TX
from ml_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe_tx_quality")
docs = (
    spark.read.parquet(f"{sf_dir}/documents.parquet")
    .select("doc_id", "text")
    .repartition(spark.sparkContext.defaultParallelism)
    .cache()
)
docs.count()

WORD = string.ascii_lowercase + string.ascii_uppercase + string.digits + "_"
WS = " \t\n\x0b\f\r"
t = F.col("text")
n_chars = F.coalesce(F.length(t), F.lit(0))


def A():
    return TX.quality_score(docs)


def C_counts():
    punct = F.coalesce(F.length(t) - F.length(F.translate(t, WORD + WS, "")), F.lit(0))
    # translate REMOVES the listed chars; len(t) - len(translate(t, X, ''))
    # counts chars IN X — so count of NON-word/ws chars = length of the
    # translate that removes word+ws chars
    punct = F.coalesce(F.length(F.translate(t, WORD + WS, "")), F.lit(0))
    digit = F.coalesce(F.length(t) - F.length(F.translate(t, string.digits, "")), F.lit(0))
    return punct, digit


def check_equal():
    punct_c, digit_c = C_counts()
    ref = docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(r"[^\w \t\n\x0B\f\r]")).alias("p_re"),
        F.regexp_count(t, F.lit(r"[0-9]")).alias("d_re"),
        punct_c.alias("p_tr"),
        digit_c.alias("d_tr"),
    )
    bad = ref.where((F.col("p_re") != F.col("p_tr")) | (F.col("d_re") != F.col("d_tr"))).count()
    assert bad == 0, f"{bad} rows differ between regex and translate counts"
    print("translate == regexp_count on all rows", flush=True)


check_equal()

proj_A = docs.select(
    "doc_id",
    F.regexp_count(t, F.lit(r"[^\w \t\n\x0B\f\r]")).alias("p"),
    F.regexp_count(t, F.lit(r"[0-9]")).alias("d"),
)
proj_B = docs.select("doc_id", n_chars.alias("p"), n_chars.alias("d"))
pc, dc = C_counts()
proj_C = docs.select("doc_id", pc.alias("p"), dc.alias("d"))

for rep in range(3):
    out = []
    for lbl, df in [("A_regex", proj_A), ("B_none", proj_B), ("C_translate", proj_C)]:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        out.append(f"{lbl}={time.monotonic()-t0:.3f}")
    print(f"rep{rep}: " + " ".join(out) + f" loadavg={os.getloadavg()[0]:.2f}", flush=True)
