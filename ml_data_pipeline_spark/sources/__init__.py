"""Sources & sinks: robust CSV ingest, versioned Parquet datasets with
lineage metadata, reference-compatible ``# META:`` CSV interchange."""
