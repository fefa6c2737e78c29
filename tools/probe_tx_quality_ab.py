"""Interleaved A/B: tx_quality full bench leg (construct + toPandas) with
HEAD's translate() expressions vs the old regexp_count ones, same session."""
import sys, time
sys.path.insert(0, "/root/repo")
from ml_data_pipeline_spark.session import get_spark
from ml_data_pipeline_spark.queries import ALL_QUERIES
from ml_data_pipeline_spark.catalog import load_table
from ml_data_pipeline_spark.operators import text as TX
from ml_data_pipeline_spark.operators.dedup import _ensure_parallel
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_spark("ab_txq")
spark.read.parquet(f"{SF}/documents.parquet").count()

def regex_variant(spark, sf):
    df = load_table(spark, sf, "documents").select("doc_id", "text")
    df = _ensure_parallel(df)
    t = F.col("text")
    toks = TX._tokens(t)
    n_chars = F.coalesce(F.length(t), F.lit(0))
    n_words = F.coalesce(F.size(toks), F.lit(0))
    stop = F.array([F.lit(w) for w in TX.LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    mean_word_len = F.when(n_words > 0, tok_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, F.regexp_count(t, F.lit(r"[^\w \t\n\x0B\f\r]")).cast("double") / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, F.regexp_count(t, F.lit(r"[0-9]")).cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0))
    score = (
        F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(n_words >= 5, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    out = df.select(
        "doc_id",
        n_chars.cast("long").alias("q_n_chars"), n_words.cast("long").alias("q_n_words"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(digit_ratio, 6).alias("q_digit_ratio"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"),
    )
    return out

head_fn = ALL_QUERIES["tx_quality"]
for rep in range(4):
    for name, fn in (("translate", head_fn), ("regex", regex_variant)):
        t0 = time.monotonic()
        pdf = fn(spark, SF).toPandas()
        print(f"rep{rep} {name}: {time.monotonic()-t0:.3f}s rows={len(pdf)}")
