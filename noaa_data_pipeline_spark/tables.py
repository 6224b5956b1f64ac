"""Testdata lake access.

The driver provides a deterministic TPC-H-ish star schema plus
``events`` (a timestamped activity stream), ``documents`` (text
corpus) and ``embeddings`` (vector table) as one parquet file per
table (TESTDATA.md). Mirrors the reference's "logical table = union
of parquet files" model (SURVEY §1.1, oracle/src/db/weather_data.rs:101-104):
``spark.read.parquet`` on a path/glob with mergeSchema gives the
same union-by-name semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Schema-drift-tolerant union read (reference's
    ``union_by_name=true``, SURVEY §2 S9) is a mergeSchema read.

    ``events.ts`` has shipped in three parquet encodings across driver
    rounds — nanosecond timestamps (Spark's vectorized reader rejects
    them), microsecond no-timezone timestamps (read as TIMESTAMP_NTZ),
    and plain TIMESTAMP. Normalize all three to session-TZ TIMESTAMP:
    the session TZ is pinned to UTC (session.py), so the NTZ→TZ cast is
    value-preserving and every downstream epoch/watermark expression
    (unix_micros, window, cast-to-double) resolves identically to the
    DuckDB oracle's naive-UTC reading.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.option("mergeSchema", "true").parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # int64 nanos: truncate to micros, same as DuckDB's
            # TIMESTAMP_NS -> TIMESTAMP cast.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """CREATE-TABLE-AS-SELECT equivalent (reference ui/main.js:112-123,
    SURVEY §2 S11): expose every table as a temp view for spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
