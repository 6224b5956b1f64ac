"""Full daemon pass over fake transports: station index (gzip) ->
batched DWML forecasts -> METAR observations -> partitioned lake ->
multipart upload into the oracle's HTTP shim — the reference's
process_data (main.rs:52-103) end-to-end, network replaced by
fixtures."""

from __future__ import annotations

import datetime as dt
import gzip
import io
import json
import os
import urllib.request

from noaa_data_pipeline_spark.weather import daemon, http_api, lake, queries
from noaa_data_pipeline_spark.weather.event_store import EventStore
from noaa_data_pipeline_spark.weather.fetcher import XmlFetcher
from tests.test_weather_sources import DWML, METAR_XML, STATIONS_XML

NOW = dt.datetime(2024, 8, 11, 0, 0, 0)

# the DWML fixture's point1 (44.90, -93.20) must match a station at
# 2dp; the STATIONS_XML KMSP sits at (44.88, -93.22), so serve an
# index whose KMSP matches the DWML coordinates instead
INDEX_XML = STATIONS_XML.replace(b"44.88", b"44.90").replace(b"-93.22", b"-93.20")
METAR_FIX = METAR_XML.replace(b"44.88", b"44.90").replace(b"-93.22", b"-93.20")


def _transport(url, timeout, headers):
    if "stations" in url:
        return 200, gzip.compress(INDEX_XML)
    if "forecast" in url:
        return 200, DWML.encode()
    if "metar" in url:
        return 200, METAR_FIX
    return 404, b""


def test_daemon_tick_end_to_end(spark, tmp_path_factory):
    lake_root = str(tmp_path_factory.mktemp("daemon_lake"))
    seen_urls: list[str] = []

    def transport(url, timeout, headers):
        seen_urls.append(url)
        return _transport(url, timeout, headers)

    counts = daemon.daemon_tick(
        spark,
        XmlFetcher(transport=transport),
        lake_root,
        station_index_url="http://test/stations.cache.xml.gz",
        forecast_url=lambda batch: "http://test/forecast?ids=" + ",".join(batch),
        observation_url="http://test/metar.cache.xml.gz",
        now=NOW,
    )
    # 2 US stations -> one 50-station batch -> one DWML fetch
    assert counts["forecast_batches_failed"] == 0
    assert counts[lake.FORECASTS] == 57  # point1/KMSP, one week of 3h slots
    assert counts[lake.OBSERVATIONS] == 1  # KMSP only (KSEA no temp)
    assert sum("forecast" in u for u in seen_urls) == 1

    # the lake reads back through the pruned readers + daily rollup
    fc = lake.read_lake(spark, lake_root, lake.FORECASTS)
    daily = queries.forecasts_daily(fc, ["KMSP"], NOW, NOW + dt.timedelta(days=1))
    rows = {r.date: r for r in daily.collect()}
    assert rows["2024-08-11"].temp_high == 33  # max over the day's grid
    ob = lake.read_lake(spark, lake_root, lake.OBSERVATIONS)
    assert queries.observations_daily(ob).collect()[0].temp_high == 21.1


def test_daemon_tick_uploads_to_oracle_shim(spark, tmp_path_factory):
    """The drop-box leg (S7): the daemon posts each snapshot as
    multipart parquet to the oracle's HTTP shim; the oracle lists and
    serves it back byte-identically."""
    lake_root = str(tmp_path_factory.mktemp("daemon_lake2"))
    store = EventStore(spark, str(tmp_path_factory.mktemp("daemon_store")))
    files_dir = str(tmp_path_factory.mktemp("oracle_files"))
    app = http_api.WeatherApp(spark, lake_root, store, files_dir)
    srv, base = http_api.serve_background(app)
    try:
        uploaded: list[str] = []

        def upload(kind: str, df) -> None:
            # the drop-box filename carries the UPLOAD time (the
            # reference's now_utc, main.rs:85) — the download route
            # locates the file by this date, which must match the
            # date folder the upload wrote into
            stamp = (
                dt.datetime.now(dt.timezone.utc)
                .replace(microsecond=0)
                .isoformat()
                .replace("+00:00", "Z")
            )
            name = f"{kind}_{stamp}.parquet"
            buf = io.BytesIO()
            df.toPandas().to_parquet(buf)
            boundary = "xDAEMONx"
            body = (
                (
                    f"--{boundary}\r\n"
                    f'Content-Disposition: form-data; name="file"; filename="{name}"\r\n\r\n'
                ).encode()
                + buf.getvalue()
                + f"\r\n--{boundary}--\r\n".encode()
            )
            req = urllib.request.Request(
                f"{base}/file/{name}",
                data=body,
                headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
                method="POST",
            )
            urllib.request.urlopen(req).read()
            uploaded.append(name)

        daemon.daemon_tick(
            spark,
            XmlFetcher(transport=_transport),
            lake_root,
            station_index_url="http://test/stations.cache.xml.gz",
            forecast_url=lambda b: "http://test/forecast",
            observation_url="http://test/metar.cache.xml.gz",
            now=NOW,
            upload=upload,
        )
        assert len(uploaded) == 2
        with urllib.request.urlopen(f"{base}/files?forecasts=true") as resp:
            names = json.loads(resp.read())["file_names"]
        assert any(n.startswith("forecasts_") for n in names)
        # round-trip: the uploaded parquet serves back byte-identical
        name = uploaded[0]
        with urllib.request.urlopen(f"{base}/file/{name}") as resp:
            data = resp.read()
        day_dir = os.path.join(files_dir, dt.date.today().isoformat())
        with open(os.path.join(day_dir, name), "rb") as fh:
            assert fh.read() == data
    finally:
        srv.shutdown()
