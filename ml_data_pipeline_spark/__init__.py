"""ml_data_pipeline_spark — a from-scratch, PySpark-native analytics engine.

Re-expresses the data-processing and query capabilities of the reference
``DellLoiD/ml-data-pipeline`` (a single-process pandas desktop workbench) as an
idiomatic, cluster-scale Spark engine:

- every operator is a pure function ``DataFrame -> DataFrame`` (lazy, Catalyst-
  optimized) plus a human-readable change description for the lineage layer;
- storage is versioned Parquet directories with a ``_meta.json`` lineage
  sidecar (replacing the reference's ``# META:`` CSV-comment protocol);
- ML operators are MLlib pipelines; nearest-neighbour-family operators
  (KNN impute, hot-deck, SMOTE, near-dup) share one LSH utility;
- beyond the reference's surface: dedup (exact/MinHash/SimHash), similarity
  search over embeddings, text analysis, and Structured Streaming over events.

Layout:
    sources/    robust CSV / parquet / versioned-dataset IO     (SURVEY §2.1)
    operators/  profiling, filters, encoding, imputation,
                sampling, balancing, dedup, similarity, text    (SURVEY §2.2-2.7)
    functions/  column-level expression helpers (hashing, dates)
    ml/         assemble/scale/train/evaluate/tune              (SURVEY §2.8)
    plans/      lineage (change log) + dataset versioning       (SURVEY §1.2)
    streaming/  Structured Streaming over the events table      (SURVEY §2.9)
"""

__version__ = "0.1.0"
