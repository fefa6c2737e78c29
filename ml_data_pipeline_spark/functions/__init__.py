"""Column-level expression helpers (pure pyspark.sql.functions compositions)."""
