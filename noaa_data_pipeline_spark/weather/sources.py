"""Ingestion sources: station index + METAR observations.

The XML fetch/parse is driver-side Python (SURVEY §2 S1-S5 — the
reference's token-bucket HTTP client is operational plumbing, not a
data-plane operator); everything relational — the US-state filter,
required-field row drops, and the station-index semi-join — is a
Spark plan.

Scale: station index and METAR snapshots are single-digit-MB hourly
files; they enter Spark via createDataFrame and immediately become
the broadcast side of joins against the lake.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import STATION_SCHEMA

# The 50-state whitelist the reference filters the station index by
# (daemon/src/coordinates.rs:34-124).
US_STATES = [
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA",
    "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD",
    "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ",
    "NM", "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI", "SC",
    "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV", "WI", "WY",
]


def _maybe_gunzip(payload: bytes) -> bytes:
    return gzip.decompress(payload) if payload[:2] == b"\x1f\x8b" else payload


def parse_station_index(xml_bytes: bytes) -> list[tuple]:
    """stations.cache.xml -> (station_id, name, state, country, lat, lon)
    rows (reference coordinates.rs:126-161; S3)."""
    root = ET.fromstring(_maybe_gunzip(xml_bytes).decode("utf-8", "replace"))
    rows = []
    for st in root.iter("Station"):
        get = lambda tag: (st.findtext(tag) or "").strip()  # noqa: E731
        try:
            lat, lon = float(get("latitude")), float(get("longitude"))
        except ValueError:
            continue
        rows.append((get("station_id"), get("station_name"), get("state"), get("country"), lat, lon))
    return rows


def station_index_df(spark: SparkSession, xml_bytes: bytes) -> DataFrame:
    """S3 as a plan: parse driver-side, then the country/state filter
    is a Catalyst predicate."""
    raw = spark.createDataFrame(
        parse_station_index(xml_bytes),
        "station_id string, station_name string, state string, country string, "
        "latitude double, longitude double",
    )
    return (
        raw.filter((F.col("country") == "US") & F.col("state").isin(US_STATES))
        .select("station_id", "station_name", "latitude", "longitude")
    )


def parse_metar(xml_bytes: bytes) -> list[tuple]:
    """metars.cache.xml -> raw observation tuples (S5 parse half,
    download_observations.rs:125-222). Missing fields surface as None
    so the drop policy stays in the Spark plan."""
    root = ET.fromstring(_maybe_gunzip(xml_bytes).decode("utf-8", "replace"))
    rows = []
    for m in root.iter("METAR"):
        get = lambda tag: m.findtext(tag)  # noqa: E731
        num = lambda tag: (  # noqa: E731
            None if get(tag) is None or get(tag).strip() == "" else float(get(tag))
        )
        rows.append(
            (
                get("station_id"),
                get("observation_time"),
                num("latitude"),
                num("longitude"),
                num("temp_c"),
                num("wind_dir_degrees"),
                num("wind_speed_kt"),
                num("dewpoint_c"),
            )
        )
    return rows


def metar_df(spark: SparkSession, xml_bytes: bytes) -> DataFrame:
    return spark.createDataFrame(
        parse_metar(xml_bytes),
        "station_id string, observation_time string, latitude double, longitude double, "
        "temp_c double, wind_dir_degrees double, wind_speed_kt double, dewpoint_c double",
    )


def observations_from_metar(metars: DataFrame, stations: DataFrame) -> DataFrame:
    """S5/P8 relational half: drop rows missing temp/coords/time
    (download_observations.rs:243-250), keep only indexed stations,
    attach station_name — a broadcast join standing in for the
    reference's per-row HashMap lookup. Output matches
    OBSERVATION_SCHEMA minus the unit-code constants added here."""
    cleaned = metars.dropna(subset=["temp_c", "latitude", "longitude", "observation_time"])
    st = F.broadcast(stations.select("station_id", "station_name"))
    return (
        cleaned.join(st, "station_id")  # inner = semi-join + name attach
        .select(
            "station_id",
            "station_name",
            "latitude",
            "longitude",
            F.to_timestamp("observation_time").alias("generated_at"),
            F.col("temp_c").alias("temperature_value"),
            F.lit("celcius").alias("temperature_unit_code"),
            F.col("wind_dir_degrees").cast("long").alias("wind_direction"),
            F.lit("degrees true").alias("wind_direction_unit_code"),
            F.col("wind_speed_kt").cast("long").alias("wind_speed"),
            F.lit("knots").alias("wind_speed_unit_code"),
            F.col("dewpoint_c").alias("dewpoint_value"),
            F.lit("celcius").alias("dewpoint_unit_code"),
        )
    )


def station_schema_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, STATION_SCHEMA)
