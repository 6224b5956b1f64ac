"""Station-index + METAR ingestion: XML parse, US filter, required-
field drops, station semi-join (SURVEY §2 S3/S5/P8)."""

from __future__ import annotations

import gzip

from noaa_data_pipeline_spark.weather import sources

STATIONS_XML = b"""<?xml version="1.0"?>
<wx_station_index>
  <Station><station_id>KMSP</station_id><station_name>Minneapolis</station_name>
    <state>MN</state><country>US</country><latitude>44.88</latitude><longitude>-93.22</longitude></Station>
  <Station><station_id>CYYZ</station_id><station_name>Toronto</station_name>
    <state>ON</state><country>CA</country><latitude>43.68</latitude><longitude>-79.63</longitude></Station>
  <Station><station_id>KSEA</station_id><station_name>Seattle</station_name>
    <state>WA</state><country>US</country><latitude>47.44</latitude><longitude>-122.31</longitude></Station>
  <Station><station_id>PGUM</station_id><station_name>Guam</station_name>
    <state>GU</state><country>US</country><latitude>13.48</latitude><longitude>144.8</longitude></Station>
</wx_station_index>
"""

METAR_XML = b"""<?xml version="1.0"?>
<response><data>
  <METAR><station_id>KMSP</station_id><observation_time>2024-08-11T00:53:00Z</observation_time>
    <latitude>44.88</latitude><longitude>-93.22</longitude><temp_c>21.1</temp_c>
    <wind_dir_degrees>180</wind_dir_degrees><wind_speed_kt>8</wind_speed_kt><dewpoint_c>12.2</dewpoint_c></METAR>
  <METAR><station_id>KSEA</station_id><observation_time>2024-08-11T00:53:00Z</observation_time>
    <latitude>47.44</latitude><longitude>-122.31</longitude>
    <wind_dir_degrees>200</wind_dir_degrees><wind_speed_kt>5</wind_speed_kt></METAR>
  <METAR><station_id>CYYZ</station_id><observation_time>2024-08-11T00:53:00Z</observation_time>
    <latitude>43.68</latitude><longitude>-79.63</longitude><temp_c>19.0</temp_c></METAR>
</data></response>
"""


def test_station_index_filters_non_us_states(spark):
    df = sources.station_index_df(spark, STATIONS_XML)
    got = {r.station_id for r in df.collect()}
    # CYYZ: country CA; PGUM: US but GU not in the 50-state list
    assert got == {"KMSP", "KSEA"}


def test_station_index_handles_gzip(spark):
    df = sources.station_index_df(spark, gzip.compress(STATIONS_XML))
    assert df.count() == 2


def test_metar_to_observations(spark):
    stations = sources.station_index_df(spark, STATIONS_XML)
    metars = sources.metar_df(spark, METAR_XML)
    obs = sources.observations_from_metar(metars, stations).collect()
    # KSEA dropped (no temp_c), CYYZ dropped (not in index)
    assert [r.station_id for r in obs] == ["KMSP"]
    r = obs[0]
    assert r.station_name == "Minneapolis"
    assert r.temperature_value == 21.1
    assert r.wind_speed == 8
    assert r.temperature_unit_code == "celcius"
    assert r.generated_at.isoformat().startswith("2024-08-11T00:53:00")
