"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) — first-class components alongside
the crawl engine. All hot paths are built-in pyspark.sql.functions
(JVM-side, codegen) or Arrow-batched pandas UDFs; every deterministic
operator has a bit-exact DuckDB oracle in __spark_entry__.py."""
