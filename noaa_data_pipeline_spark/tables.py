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

    ``events.ts`` is nanosecond-precision parquet, which Spark's
    vectorized reader rejects; read it as raw int64 nanos and truncate
    to microseconds — the same truncation DuckDB applies when casting
    TIMESTAMP_NS to TIMESTAMP, so both engines see identical values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.option("mergeSchema", "true").parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
