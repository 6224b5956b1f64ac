"""noaa_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference weather-data pipeline
(tee8z/noaa-data-pipeline, surveyed in SURVEY.md), built on the
PySpark DataFrame / SQL API so that Catalyst + Tungsten own the
physical plan. Beyond reference parity it adds the operators a
large-scale training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup),
similarity search, text analysis and multimodal-column plumbing.

Layout:
    session    — tuned SparkSession factory
    tables     — testdata lake loaders / temp-view registration
    plans/     — the query registry (Spark callables + DuckDB oracle SQL)
    operators/ — reusable DataFrame operator implementations
    sources/   — ingestion parsers (station index XML, METAR, DWML)
    functions/ — scalar helpers (uuid7, time, hashing)
    streaming/ — Structured Streaming ingestion & rollups
    events/    — event-store tables + scoring ETL (reference §3.2)
"""

__version__ = "0.1.0"
