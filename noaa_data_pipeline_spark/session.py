"""SparkSession factory with deployment-aware defaults.

Two profiles, chosen by the master URL:

- **cluster** (any non-local master): AQE on — runtime partition
  coalescing, skew-join splitting, and dynamic broadcast demotion
  are what keep 100 TB shuffles healthy; initial shuffle partitions
  are a ceiling AQE coalesces down from.
- **local** (``local[...]``): AQE off and static partitions sized to
  the core count. On sub-GB inputs AQE's per-stage scheduling
  barriers cost more than its re-planning saves (~30-50% measured
  on the sf0.1 bench) and there is no skew or cluster to adapt to.
  ``SPARK_GRAFT_AQE=1`` forces it back on for local scale testing.

Shared in both profiles: UTC session timezone (timestamp semantics
match an ANSI/DuckDB oracle), Arrow for every pandas exchange, and a
generous broadcast threshold (dimension tables broadcast instead of
shuffling the fact side).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "noaa-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    is_local = master.startswith("local")
    aqe = (not is_local) or os.environ.get("SPARK_GRAFT_AQE") == "1"
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
