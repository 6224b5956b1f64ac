"""Weather domain: the reference pipeline's own data model, re-built
Spark-first.

- ``schemas``  — explicit StructTypes for the two fact tables
  (SURVEY §1.2; reference daemon/src/domains/*/download_*.rs).
- ``lake``     — partitioned parquet layout + pruned readers
  (replaces the reference's filename-timestamp pruning, S10).
- ``queries``  — the three weather read queries (A1/A2/A3 daily
  rollups and station dedup, oracle/src/db/weather_data.rs).
- ``flatten``  — DWML time-layout flattening: 3h grid, interval
  as-of alignment, forward-fill, 2dp coordinate join (W1-W3, J7).
- ``etl``      — event scoring + winner selection (A6, W4,
  oracle/src/oracle.rs:445-617) as declarative plans.
"""
