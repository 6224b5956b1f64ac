"""Streaming lake ingestion: inbox -> partitioned lake exactly-once,
then compaction of the small appended files."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from noaa_data_pipeline_spark.weather import lake, queries, streaming_ingest
from noaa_data_pipeline_spark.weather.schemas import OBSERVATION_SCHEMA

T0 = dt.datetime(2024, 8, 11, 0, 0, 0)


def _obs_rows(hour: int):
    gen = T0 + dt.timedelta(hours=hour)
    return [
        (
            st, f"{st} name", 44.9, -93.2, gen, 10.0 + hour, "celcius",
            180, "degrees true", hour % 9, "knots", 5.0, "celcius",
        )
        for st in ["KMSP", "KSEA"]
    ]


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    return (
        str(tmp_path_factory.mktemp("inbox")),
        str(tmp_path_factory.mktemp("lake2")),
        str(tmp_path_factory.mktemp("ckpt")),
    )


def test_ingest_two_batches_exactly_once(spark, dirs):
    inbox, root, ckpt = dirs
    # hour-0 snapshot arrives
    spark.createDataFrame(_obs_rows(0), OBSERVATION_SCHEMA).write.mode("append").parquet(inbox)
    streaming_ingest.ingest_stream(spark, inbox, root, "observations", ckpt)
    # hour-1 snapshot arrives; re-run (hour-0 files must NOT re-ingest)
    spark.createDataFrame(_obs_rows(1), OBSERVATION_SCHEMA).write.mode("append").parquet(inbox)
    streaming_ingest.ingest_stream(spark, inbox, root, "observations", ckpt)

    ob = lake.read_lake(spark, root, "observations")
    assert ob.count() == 4  # 2 stations x 2 hours, no duplicates
    daily = {r.station_id: r for r in queries.observations_daily(ob).collect()}
    assert daily["KMSP"].temp_low == 10.0 and daily["KMSP"].temp_high == 11.0

    part = os.path.join(root, "file_type=observations", f"ingest_date={T0.date()}")
    n_files_before = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert n_files_before >= 2  # one small file per micro-batch

    stats = {
        (r.file_type, str(r.ingest_date)): r.n_files
        for r in streaming_ingest.lake_file_stats(spark, root).collect()
    }
    assert stats[("observations", str(T0.date()))] == n_files_before


def test_compaction_preserves_rows(spark, dirs):
    _, root, _ = dirs
    n = streaming_ingest.compact_partition(
        spark, root, "observations", str(T0.date()), target_files=1
    )
    assert n == 4
    part = os.path.join(root, "file_type=observations", f"ingest_date={T0.date()}")
    assert len([f for f in os.listdir(part) if f.endswith(".parquet")]) == 1
    assert lake.read_lake(spark, root, "observations").count() == 4
