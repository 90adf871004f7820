"""Large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) over the documents /
embeddings tables.

These have no counterpart in the reference repo (strictly a forecasting
library); they are the data-engineering layer a 100 TB token pipeline
needs around the rollup engine. Every SQL-expressible operator ships
with a DuckDB oracle twin built from the same cross-engine primitives
(fforma_spark.pipeline.common), so the driver's value-hash gate covers
them too.
"""
