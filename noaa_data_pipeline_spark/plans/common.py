"""Shared expression helpers for oracle-exact numeric results.

Double-typed SUM/AVG results depend on floating-point addition order,
which differs between Spark's partial/final partitioned aggregation
and a single-threaded oracle. Accumulating in DECIMAL makes the sum
exact (associative), then a final cast back to DOUBLE yields an
identical value in both engines. At 100 TB this costs nothing extra:
decimal sums are still map-side-combined JVM aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,6)"  # wide enough for 100TB-scale sums of price-like values
SQL_DEC = "DECIMAL(30,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact double sum: SUM(CAST(x AS DECIMAL)) cast back to DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact double mean: decimal sum divided by count, both exact."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT({expr})) AS {alias}"
