"""Daemon tick: one pull-parse-flatten-snapshot pass — the Spark
composition of the reference daemon's hourly ``process_data``
(daemon/src/main.rs:52-103):

1. fetch + parse the station index, US-filter (S1/S3)
2. fetch DWML forecasts in <=50-station batches, flatten each
   document through the declarative grid/as-of/fill plan (S2/S4)
3. fetch METAR observations, drop incomplete rows, semi-join the
   station index (S5/P8)
4. append both as hourly snapshots into the partitioned lake (S6)
5. optionally upload the reference-shaped parquet drop-box files to
   an oracle endpoint (S7) — the uploader is a callable so tests can
   point it at the stdlib HTTP shim

Everything network-shaped goes through the injectable
``fetcher.XmlFetcher``; the container has no outbound network, so
production URLs only ever appear as caller-provided parameters.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import flatten, lake, sources
from .fetcher import STATION_BATCH, FetchError, RateLimitExceeded, XmlFetcher, split_stations


def fetch_forecast_frames(
    spark: SparkSession,
    fetcher: XmlFetcher,
    stations: DataFrame,
    make_url: Callable[[list[str]], str],
    now: dt.datetime,
    batch_size: int = STATION_BATCH,
) -> tuple[DataFrame | None, list[list[str]]]:
    """Batched DWML fetch -> one flattened forecast frame.

    Each <=``batch_size``-station request returns one DWML document
    (download_forecast.rs:683-718); every document flattens through
    the single-window plan and the per-batch frames union by name.
    Failed batches are collected, not fatal."""
    ids = [r.station_id for r in stations.select("station_id").collect()]
    out: DataFrame | None = None
    failed: list[list[str]] = []
    for batch in split_stations(ids, batch_size):
        try:
            xml = fetcher.fetch_xml(make_url(batch))
            # parse failures (error documents served with 200, mangled
            # timestamps) fail THIS batch, not the whole tick — the
            # reference's per-batch retry task does the same
            # (download_forecast.rs:705-716 logs and counts down)
            locations, layouts, readings, generated_at = sources.dwml_frames(
                spark, xml.encode()
            )
        except (FetchError, RateLimitExceeded, ValueError):
            failed.append(batch)
            continue
        flat = flatten.flatten_forecasts(
            spark, locations, stations, layouts, readings, now, generated_at or now
        )
        out = flat if out is None else out.unionByName(flat)
    return out, failed


def daemon_tick(
    spark: SparkSession,
    fetcher: XmlFetcher,
    lake_root: str,
    station_index_url: str,
    forecast_url: Callable[[list[str]], str],
    observation_url: str,
    now: dt.datetime | None = None,
    upload: Callable[[str, DataFrame], None] | None = None,
) -> dict[str, int]:
    """One hourly pass; returns row counts per written snapshot.

    ``upload(kind, df)`` — when given — receives each snapshot frame
    for the drop-box leg (send_parquet_files, main.rs:99-102)."""
    now = now or dt.datetime.utcnow()
    counts: dict[str, int] = {}

    index_xml = fetcher.fetch_xml_gzip(station_index_url)
    stations = sources.station_index_df(spark, index_xml.encode())

    forecasts, failed = fetch_forecast_frames(
        spark, fetcher, stations, forecast_url, now
    )
    counts["forecast_batches_failed"] = len(failed)
    if forecasts is not None:
        # persist: the frame has three consumers (snapshot write,
        # count, upload) and the flatten plan is the tick's most
        # expensive stage — without it each consumer re-executes it
        forecasts = forecasts.persist()
        try:
            lake.write_snapshot(forecasts, lake_root, lake.FORECASTS, now)
            counts[lake.FORECASTS] = forecasts.count()
            if upload is not None:
                upload(lake.FORECASTS, forecasts)
        finally:
            forecasts.unpersist()

    metar_xml = fetcher.fetch_xml_gzip(observation_url)
    metars = sources.metar_df(spark, metar_xml.encode())
    observations = sources.observations_from_metar(metars, stations).persist()
    try:
        lake.write_snapshot(observations, lake_root, lake.OBSERVATIONS, now)
        counts[lake.OBSERVATIONS] = observations.count()
        if upload is not None:
            upload(lake.OBSERVATIONS, observations)
    finally:
        observations.unpersist()
    return counts
