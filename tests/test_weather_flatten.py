"""Flattener semantics (W1-W3, J7) verified two ways: a hand-built
DWML-like fixture with known expected values, and an independent
pure-Python reimplementation of the reference's procedural fill
(download_forecast.rs:316-589) run over the same inputs."""

from __future__ import annotations

import datetime as dt

import pytest

from noaa_data_pipeline_spark.weather import flatten

NOW = dt.datetime(2024, 8, 11, 0, 0, 0)
GEN = dt.datetime(2024, 8, 10, 23, 45, 0)

# Two layouts: k1 = 6-hourly (4 ranges), k2 = 12-hourly (2 ranges).
LAYOUTS = [
    ("k1", i, NOW + dt.timedelta(hours=6 * i)) for i in range(4)
] + [
    ("k2", i, NOW + dt.timedelta(hours=12 * i)) for i in range(2)
]

# loc1: max_temp on k2 with a missing middle... only 2 values; wind on k1
# with an unparseable gap at seq=1 and a late value at seq=2.
READINGS = [
    ("loc1", "max_temp", "k2", 0, "30"),
    ("loc1", "max_temp", "k2", 1, "33"),
    ("loc1", "wind_speed", "k1", 0, "5"),
    ("loc1", "wind_speed", "k1", 1, None),  # empty <value/> -> carry prev
    ("loc1", "wind_speed", "k1", 2, "9"),
    ("loc1", "wind_speed", "k1", 3, "4"),
    # loc2 has no readings at all -> all-null forecast rows
]

LOCATIONS = [("loc1", "44.90", "-93.20"), ("loc2", "10.00", "10.00")]
STATIONS = [("KMSP", "Minneapolis", 44.9, -93.2)]  # loc2 unmatched -> dropped


def procedural_fill(grid_times, layouts, readings, field):
    """Independent model of the reference's add_data/get_interval
    loop: for each grid time take the value at the latest range whose
    start <= t, falling back to the carried previous value."""
    by_layout: dict[str, list] = {}
    for key, seq, start in layouts:
        by_layout.setdefault(key, []).append((seq, start))
    for v in by_layout.values():
        v.sort()
    out, prev = [], None
    series = [(k, s, v) for (_, f, k, s, v) in readings if f == field]
    for t in grid_times:
        val = prev
        for key, seq, raw in series:
            starts = by_layout[key]
            idx = None
            for j, (_, start) in enumerate(starts):
                if start <= t:
                    idx = j
                else:
                    break
            if idx is not None and idx == seq and raw is not None:
                val = raw
                prev = raw
        out.append(val)
    return out


@pytest.fixture(scope="module")
def flat(spark):
    locations = spark.createDataFrame(
        LOCATIONS, "location_key string, latitude string, longitude string"
    )
    stations = spark.createDataFrame(
        STATIONS, "station_id string, station_name string, latitude double, longitude double"
    )
    layouts = spark.createDataFrame(LAYOUTS, "layout_key string, seq int, start_time timestamp")
    readings = spark.createDataFrame(
        READINGS, "location_key string, field string, layout_key string, seq int, raw_value string"
    )
    return flatten.flatten_forecasts(
        spark, locations, stations, layouts, readings, NOW, GEN
    ).orderBy("begin_time")


def test_grid_shape_and_station_join(flat):
    rows = flat.collect()
    # one week of 3h slots inclusive = 57; loc2 dropped (no station)
    assert len(rows) == 57
    assert {r.station_id for r in rows} == {"KMSP"}
    assert rows[0].begin_time == NOW
    assert rows[0].end_time == NOW + dt.timedelta(hours=3)
    assert rows[-1].begin_time == NOW + dt.timedelta(days=7)
    assert all(r.generated_at == GEN for r in rows)
    assert rows[0].temperature_unit_code == "fahrenheit"
    assert rows[0].wind_speed_unit_code == "knots"


def test_forward_fill_matches_procedural_model(flat):
    rows = flat.collect()
    grid_times = [r.begin_time for r in rows]
    for field, col in [("max_temp", "max_temp"), ("wind_speed", "wind_speed")]:
        expected = [
            None if v is None else int(v)
            for v in procedural_fill(grid_times, LAYOUTS, READINGS, field)
        ]
        got = [getattr(r, col) for r in rows]
        assert got == expected, f"{field}: {got[:10]} != {expected[:10]}"


def test_tie_break_deterministic_under_repartition(spark):
    """Two series for the same (location, field) whose ranges start
    at the same instant: the winner must be decided by the carried
    (layout_key, seq) ordinals, not physical row order, so the output
    is identical under any partition layout (the reference's
    document-order walk is deterministic; a
    monotonically_increasing_id tiebreak was not)."""
    layouts = spark.createDataFrame(
        [("ka", 0, NOW), ("kb", 0, NOW)],
        "layout_key string, seq int, start_time timestamp",
    )
    # same start_time, conflicting values: kb > ka lexicographically,
    # so "20" must win at every grid slot
    readings_rows = [
        ("loc1", "max_temp", "ka", 0, "10"),
        ("loc1", "max_temp", "kb", 0, "20"),
    ]
    locations = spark.createDataFrame(
        [("loc1", "44.90", "-93.20")], "location_key string, latitude string, longitude string"
    )
    stations = spark.createDataFrame(
        STATIONS, "station_id string, station_name string, latitude double, longitude double"
    )
    outputs = []
    for n_parts in (1, 2, 7):
        readings = spark.createDataFrame(
            readings_rows,
            "location_key string, field string, layout_key string, seq int, raw_value string",
        ).repartition(n_parts)
        rows = (
            flatten.flatten_forecasts(spark, locations, stations, layouts, readings, NOW, GEN)
            .orderBy("begin_time")
            .collect()
        )
        outputs.append([(r.begin_time, r.max_temp) for r in rows])
        assert all(r.max_temp == 20 for r in rows)
    assert outputs[0] == outputs[1] == outputs[2]


def test_fill_values_spotcheck(flat):
    rows = {r.begin_time: r for r in flat.collect()}
    # max_temp: k2 range 0 covers [NOW, NOW+12h) -> 30; range 1 -> 33 onward
    assert rows[NOW].max_temp == 30
    assert rows[NOW + dt.timedelta(hours=9)].max_temp == 30
    assert rows[NOW + dt.timedelta(hours=12)].max_temp == 33
    assert rows[NOW + dt.timedelta(days=3)].max_temp == 33  # carried to horizon
    # wind: range1 (6-12h) has no value -> carries 5; range2 -> 9; range3 -> 4
    assert rows[NOW].wind_speed == 5
    assert rows[NOW + dt.timedelta(hours=6)].wind_speed == 5
    assert rows[NOW + dt.timedelta(hours=12)].wind_speed == 9
    assert rows[NOW + dt.timedelta(hours=18)].wind_speed == 4
    # fields with no series at all stay null
    assert rows[NOW].min_temp is None
    assert rows[NOW].liquid_precipitation_amt is None
