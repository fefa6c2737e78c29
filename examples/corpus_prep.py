"""LLM training-corpus preparation pipeline, end to end:

ingest → URL canonicalization + domain blocklist → exact dedup →
near-dup group dedup (MinHash-LSH pairs + connected components,
canonical survivor) → quality gates (C4 rules + Gopher repetition +
unigram-LM outlier score) → script routing → PII redaction → language
composition → BM25 spot-check → sequence packing.

Every stage is the same operator the gate queries exercise; this script
shows how they compose into the workload the engine is designed for
(SURVEY.md §2.9 scale extensions). On a cluster the only changes are the
input path and the session config — the plan shapes (banded LSH joins,
edges-only component iteration, aggregate-then-window) are the 100 TB
shapes already.

Run: python examples/corpus_prep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ml_data_pipeline_spark.catalog import load_table
from ml_data_pipeline_spark.operators import cleaning as CL
from ml_data_pipeline_spark.operators import components as CC
from ml_data_pipeline_spark.operators import dedup as DD
from ml_data_pipeline_spark.operators import packing as PK
from ml_data_pipeline_spark.operators import text as TX
from ml_data_pipeline_spark.session import get_spark


def run(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    report: dict = {"input_docs": docs.count()}

    # 0. crawl hygiene: canonicalize the source URL (here synthesized from
    #    doc_id — the corpus carries no URLs) and drop blocklisted domains
    #    BEFORE any text work, so banned content never costs a shingle
    with_url = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www.site"),
            (F.col("doc_id") % 23).cast("string"),
            F.lit(".example.test/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=crawl"),
        ),
    )
    canon = CL.canonicalize_url(with_url)
    with_domain = canon.withColumn(
        "domain", F.regexp_extract("canonical_url", r"^https?://([^/]+)", 1)
    )
    blocked = spark.createDataFrame([("site13.example.test",)], "domain string")
    docs = CL.blocklist_filter(with_domain, blocked).drop("url", "canonical_url", "domain")
    report["after_blocklist"] = docs.count()

    # 1. exact dedup on the normalized fingerprint (cheap, first)
    fp = TX.fingerprint_md5(docs)
    exact = DD.exact_dedup(fp, subset=["fingerprint"]).drop("fingerprint")
    report["after_exact_dedup"] = exact.count()

    # 2. near-dup pairs -> one survivor (min id) per connected component
    pairs = DD.minhash_near_duplicates(exact, threshold=0.7)
    kept = CC.keep_canonical(exact, pairs, id_col="doc_id")
    report["after_near_dedup"] = kept.count()

    # 3. quality gates: C4 heuristics AND Gopher repetition AND LM score
    c4 = TX.c4_quality_flags(kept, min_words=5)
    c4_pass = kept.join(
        c4.where(F.col("keep")).select(F.col("id").alias("__k")),
        kept["doc_id"] == F.col("__k"),
        "left_semi",
    )
    rep = TX.gopher_repetition_filter(c4_pass)
    rep_pass = c4_pass.join(
        rep.where(F.col("rep_keep")).select(F.col("doc_id").alias("__k")),
        c4_pass["doc_id"] == F.col("__k"),
        "left_semi",
    )
    lm = TX.unigram_logprob(rep_pass)
    cutoff = lm.agg(F.expr("percentile(avg_neg_logp, 0.95)")).first()[0]
    good_ids = lm.where(
        F.col("avg_neg_logp").isNull() | (F.col("avg_neg_logp") <= cutoff)
    ).select(F.col("id").alias("__k"))
    quality = rep_pass.join(good_ids, rep_pass["doc_id"] == F.col("__k"), "left_semi")
    report["after_quality"] = quality.count()

    # 3b. script routing: count docs per dominant writing system (a real
    #     pipeline forks tokenization here; the ASCII corpus is all-latin)
    report["script_routing"] = {
        r["dominant_script"]: r["n"]
        for r in TX.script_stats(quality, id_col="doc_id")
        .groupBy("dominant_script")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # 4. PII redaction (url/email/ip/phone) on the surviving text
    clean = CL.redact_pii(quality)

    # 5. composition report: language x source token totals
    lang_stats = (
        TX.token_count(TX.detect_language(clean))
        .groupBy("lang_pred", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens"))
        .orderBy("lang_pred", "source")
    )
    report["composition_rows"] = lang_stats.count()

    # 6. retrieval spot-check: BM25 top-5 for an audit query
    report["bm25_top5"] = [
        (r["id"], r["bm25"])
        for r in TX.bm25_topk(clean, ["query", "join", "stream"], k=5).collect()
    ]

    # 7. pack into fixed-token-budget training bins
    packed = PK.pack_sequences(TX.token_count(clean), budget=512)
    report["packed_bins"] = packed.select("bin_id").distinct().count()
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    for k, v in run(get_spark("corpus_prep_example"), sf).items():
        print(f"{k}: {v}")
