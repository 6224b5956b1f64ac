"""Outcome permutation generation (SURVEY §2 A7).

The reference enumerates P(n, k) ranking permutations of entry
indices to build the DLC outcome space
(oracle/src/db/outcome_generator.rs:5-18, used with k=3 at signing).
Driver-side itertools is the right tool — the output is an outcome
*catalog*, not a data-scale frame — but a Spark builder is provided
for the >500-entry regime the reference's comment calls out as
too slow single-threaded (outcome_generator.rs:64).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def outcome_permutations(n: int, k: int) -> list[tuple[int, ...]]:
    """All orderings of k winners drawn from n entries."""
    return list(permutations(range(n), k))


def count_permutations(n: int, k: int) -> int:
    out = 1
    for i in range(n, n - k, -1):
        out *= i
    return out


def outcome_permutations_df(spark: SparkSession, n: int, k: int = 3) -> DataFrame:
    """Distributed P(n, 3) enumeration: cross-join three index ranges
    and filter distinctness. Scale: partitions the first index across
    the cluster, so the 63.5M rows of P(400, 3) stream in parallel
    instead of materializing in one process."""
    if k != 3:
        raise NotImplementedError("distributed builder is specialized to k=3 (signing top-3)")
    idx = spark.range(n)
    a = idx.select(F.col("id").alias("first"))
    b = idx.select(F.col("id").alias("second"))
    c = idx.select(F.col("id").alias("third"))
    return (
        a.join(b, F.col("first") != F.col("second"))
        .join(c, (F.col("third") != F.col("first")) & (F.col("third") != F.col("second")))
    )
