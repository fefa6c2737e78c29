"""Training-set assembly for a contrastive/LLM fine-tune, end to end:

near-dup components → CLUSTER-SAFE train/test split (eval near-dups can
never leak into train) → tokenizer stats (BPE pair learning + merge
application for token budgeting) → deterministic negative sampling for
contrastive pairs → compaction plan for the output shards → content
fingerprint of the released split (the 16-byte artifact a downstream
consumer verifies).

Every stage is the operator its gate query verifies (tx_bpe_pairs,
tx_bpe_apply, t13_negative_sample, t14_cluster_safe_split,
s19_compaction_plan, s20_content_hash); this script shows them composed
into the release workflow. On a cluster only the input path and session
config change — the plan shapes (bucketed draws, vocab-level merge
chain, inventory-window bin-pack, xor fingerprint) are the 100 TB
shapes already.

Run: python examples/training_set_assembly.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.catalog import load_table
from ml_data_pipeline_spark.operators import components as CC
from ml_data_pipeline_spark.operators import dedup as DD
from ml_data_pipeline_spark.operators.sampling import cluster_safe_split, negative_sample
from ml_data_pipeline_spark.operators.skew import plan_compaction
from ml_data_pipeline_spark.operators.tokenizer import apply_bpe_merges, top_bpe_pairs
from ml_data_pipeline_spark.session import get_spark
from ml_data_pipeline_spark.sources.versioned import content_fingerprint


def main(sf_dir: str) -> None:
    spark = get_spark("training_set_assembly")
    docs = load_table(spark, sf_dir, "documents")

    # 1. near-dup clusters → leakage-safe split
    pairs = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    comp = CC.connected_components(pairs)
    split = cluster_safe_split(docs.select("doc_id"), comp, "doc_id", test_frac=0.2)
    train_ids = split.where(~F.col("is_test")).select("doc_id")
    train = docs.join(train_ids, "doc_id")
    print(f"split: {train_ids.count()} train / {split.where(F.col('is_test')).count()} test docs")

    # 2. tokenizer statistics on TRAIN ONLY (the eval side must not shape
    #    the vocabulary), then token budgets from the learned merges
    merges_df = top_bpe_pairs(train, k=6).collect()
    merges = [(r["pair"][0], r["pair"][1]) for r in merges_df]
    budgets = apply_bpe_merges(train, merges)
    print("top merges:", [r["pair"] for r in merges_df])
    print("token budget:", budgets.agg(F.sum("n_bpe_tokens")).collect()[0][0])

    # 3. contrastive negatives: English anchors, non-English pool
    anchors = train.where(F.col("lang") == "en")
    pool = train.where(F.col("lang") != "en")
    negs = negative_sample(anchors, pool, k=4, id_col="doc_id", n_buckets=16)
    print("contrastive pairs:", negs.count())

    # 4. output layout: pack the per-(lang, source) inventory into ~64 KB shards
    inv = train.groupBy("lang", "source").agg(F.sum("n_chars").alias("bytes"))
    plan = plan_compaction(inv, "bytes", 65536, file_col="source", partition_cols=["lang"])
    print("compaction bins:", plan.select("lang", "bin").distinct().count())

    # 5. release artifact: the fingerprint a consumer re-derives to verify
    fp = content_fingerprint(train, ["doc_id", "lang", "source"]).collect()[0]
    print(f"release fingerprint: n={fp['n_rows']} hash={fp['content_hash']}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
