"""Production incremental dedup with the STORED n-gram index — the flow a
nightly ingest job runs (SURVEY §2.9; the r8-r9 centerpiece):

  day 0:  build_ngram_index(corpus)         — shingle the corpus ONCE,
          persist a gram-bucketed, gram-sorted inverted index
  day N:  probe  — incremental_ngram_jaccard_pairs_indexed(batch, index):
          only the BATCH is shingled; the index side is an in-place
          bucketed read (no corpus-sized exchange, ever)
          reject — drop batch docs that near-dup an accepted doc
          append — append_ngram_index(survivors): folds the accepted docs
          into the index under a manifest-committed batch id, so a retried
          job is a manifest-only no-op and a crash mid-append repairs
          (or fails loudly on a torn store) instead of corrupting Jaccard

The same script is the crash-recovery demo: run the append twice and the
second is a no-op; probe again after the append and the pairs are
unchanged (the probe's own anti-join guard).

At 100 TB the only thing that changes is the paths: the index lives in
the lake as a bucketed table, each nightly batch pays shingling for
ITSELF only, and every join in the probe is an equi-join on the bucketed
gram key.

Run: python examples/incremental_dedup.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.catalog import load_table
from ml_data_pipeline_spark.operators import dedup as DD
from ml_data_pipeline_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("incremental_dedup_example")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # ---- day 0: the standing corpus (90%) and its stored index ----------
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    index_tbl = "example_ngram_index"
    DD.build_ngram_index(corpus, index_tbl, n=3)
    print(f"index built: {spark.table(index_tbl).count()} (gram, id, n) rows")

    # ---- day 1: a batch arrives (10%) — probe before accepting ----------
    batch = docs.where(F.col("doc_id") % 10 == 0)
    pairs = DD.incremental_ngram_jaccard_pairs_indexed(
        batch, index_tbl, n=3, threshold=0.5
    )
    pairs.cache()
    n_pairs = pairs.count()
    print(f"probe: {n_pairs} near-dup pairs touching the batch")

    # reject batch docs that duplicate an ACCEPTED doc (old x new pairs:
    # the old side is the survivor; new x new pairs keep the smaller id)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    losers = (
        pairs.select(
            F.when(
                F.col("id_a").isin(batch_ids) & F.col("id_b").isin(batch_ids),
                F.greatest("id_a", "id_b"),
            )
            .otherwise(
                F.when(F.col("id_a").isin(batch_ids), F.col("id_a")).otherwise(
                    F.col("id_b")
                )
            )
            .alias("doc_id")
        )
        .distinct()
    )
    survivors = batch.join(losers, "doc_id", "left_anti")
    n_batch, n_surv = batch.count(), survivors.count()
    print(f"accept: {n_surv}/{n_batch} batch docs survive dedup")

    # ---- append the survivors under a manifest-committed batch id -------
    bid = DD.append_ngram_index(survivors, index_tbl, n=3)
    print(f"appended under batch id {bid}")

    # retry is a manifest-only no-op (idempotent crash recovery)
    n_before = spark.table(index_tbl).count()
    bid2 = DD.append_ngram_index(survivors, index_tbl, n=3)
    assert bid2 == bid and spark.table(index_tbl).count() == n_before
    print("retried append: manifest no-op, index unchanged")

    # re-probe after the append: the probe's anti-join guard keeps the
    # answer identical (no self-pairs, no double-counted grams)
    pairs2 = DD.incremental_ngram_jaccard_pairs_indexed(
        batch, index_tbl, n=3, threshold=0.5
    )
    assert pairs2.count() == n_pairs
    print("re-probe after append: pairs unchanged — recovery-safe")

    # drop the index AND both companions — the __ids per-doc table too
    # (ADVICE r9: leaving it leaks a stale table + warehouse dir per run)
    DD.drop_ngram_index(spark, index_tbl)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
