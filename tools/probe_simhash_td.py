"""Cardinality probe behind OPTIMIZATION_r15 negative result 5: measures the
token-occurrence count T, distinct (doc, token-hash) count D, and vocabulary
size V of the headline corpus, to decide whether a single repartition(h)
could replace the simhash signature stage's two exchanges (it cannot: T/D =
2.33 means the raw-token shuffle moves 2.33x the rows, and V=31 keys over 32
cores is maximal skew)."""
import sys
sys.path.insert(0, "/root/repo")
from ml_data_pipeline_spark.session import get_spark
from ml_data_pipeline_spark.queries import _normalized_documents
from pyspark.sql import functions as F
from ml_data_pipeline_spark.operators.dedup import WS_PLUS

spark = get_spark("probe_td")
df = _normalized_documents(spark, "/root/testdata/sf0.1")
toks = F.filter(F.split(F.lower(F.col("text")), WS_PLUS), lambda t: F.length(t) > 0)
tokens = df.select(F.col("doc_id").alias("id"), F.explode(toks).alias("t"))
T = tokens.count()
D = tokens.groupBy("id", F.xxhash64("t").alias("h")).count().count()
ndocs = df.count()
V = tokens.select(F.xxhash64("t").alias("h")).distinct().count()
print(f"docs={ndocs} T={T} D={D} V={V} T/D={T/D:.2f}")
