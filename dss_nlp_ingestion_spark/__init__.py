"""dss_nlp_ingestion_spark — a PySpark-native analytics engine.

Brand-new engine reproducing the query and data-processing
capabilities of the reference NLP-ingestion pipeline
(WilliamG-LORA/DSS-NLP-Ingestion, surveyed in SURVEY.md), re-expressed
as idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, with
pandas-UDF stages only where built-in operators cannot express the
semantics.

Layout:
- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC).
- ``catalog``    — parquet table loading / view registration.
- ``functions``  — scalar text/date/NLP function library
                   (SURVEY.md §2.9–§2.11).
- ``operators``  — relational + dedup + similarity + multimodal
                   operators (SURVEY.md §2.3–§2.8, north-star ops).
- ``plans``      — named query registry: every operator exposed as a
                   ``(spark, sf_dir) -> DataFrame`` with an ANSI-SQL
                   oracle for DuckDB cross-checking.
- ``streaming``  — Structured Streaming wrappers (SURVEY.md §2.12).
"""

__version__ = "0.1.0"
