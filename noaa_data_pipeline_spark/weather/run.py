"""ETL orchestration: the reference's POST /oracle/update flow
(oracle/src/oracle.rs:314-389) as one batch routine.

Per active (unattested) event: refresh weather from the lake
(forecast required, observed only once the observation window has
started — oracle.rs:700-757), score entries, and attest events whose
signing date has passed. Event status derivation mirrors
db/mod.rs:447-471 (Live / Running / Completed / Signed).

The schnorr attestation itself is out of engine scope (SURVEY §2
F13): ``sign_stub`` produces a clearly-marked placeholder over the
same winning-bytes message the reference signs.
"""

from __future__ import annotations

import datetime as dt
import math
import uuid as uuidlib

from pyspark.sql import SparkSession

from . import etl, lake, queries
from .event_store import EventStore

EVENT_WINDOW = dt.timedelta(days=1)  # "all events are only a day long"


def event_status(ev, now: dt.datetime) -> str:
    if ev.attestation_signature is not None:
        return "signed"
    if now < ev.observation_date:
        return "live"
    if now < ev.observation_date + EVENT_WINDOW:
        return "running"
    return "completed"


def _round_half_away(x: float) -> int:
    """Rust ``f64::round`` semantics: halves round away from zero
    (21.5 -> 22, -21.5 -> -22). Python's builtin ``round`` is
    banker's rounding and diverges on exact .5 ties."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def sign_stub(winning_bytes: bytes) -> bytes:
    """Deterministic placeholder for the schnorr attestation secret —
    same message bytes, no key material. NOT cryptography."""
    return b"stub-attestation:" + winning_bytes


def _event_weather(spark: SparkSession, root: str, ev, now: dt.datetime):
    start = ev.observation_date
    end = start + EVENT_WINDOW
    stations = list(ev.locations)
    fc_lake = lake.read_lake(
        spark, root, lake.FORECASTS, start=queries.scan_start_widened(start), end=end
    )
    fc_daily = queries.forecasts_daily(fc_lake, stations, start, end).filter(
        f"date = '{start.date().isoformat()}'"
    )
    ob_daily = None
    if now >= start:  # observation window has started
        ob_lake = lake.read_lake(spark, root, lake.OBSERVATIONS, start=start, end=end)
        ob_daily = queries.observations_daily(ob_lake, stations, start, end)
    return fc_daily, ob_daily


def run_etl(store: EventStore, lake_root: str, now: dt.datetime) -> dict[str, str]:
    """One ETL pass; returns {event_id: resulting status}."""
    spark = store.spark
    results: dict[str, str] = {}
    active = [
        ev
        for ev in store.read("events").collect()
        if ev.attestation_signature is None
    ]
    for ev in active:
        fc_daily, ob_daily = _event_weather(spark, lake_root, ev, now)
        # weather snapshot rows (J8: forecast required, observed optional)
        fc_rows = {r.station_id: r for r in fc_daily.collect()}
        ob_rows = {r.station_id: r for r in ob_daily.collect()} if ob_daily is not None else {}
        snapshot = []
        for station in ev.locations:
            fc = fc_rows.get(station)
            if fc is None:
                continue
            ob = ob_rows.get(station)
            observed = (
                None
                if ob is None
                else (
                    ob.start_time,
                    None if ob.temp_low is None else _round_half_away(ob.temp_low),
                    None if ob.temp_high is None else _round_half_away(ob.temp_high),
                    ob.wind_speed,
                )
            )
            forecasted = (fc.start_time, fc.temp_low, fc.temp_high, fc.wind_speed)
            snapshot.append((str(uuidlib.uuid4()), ev.id, station, observed, forecasted))
        if snapshot:
            store.add_weather_snapshot(snapshot)

        if ob_rows:
            entries, choices_wide = store.event_entries(ev.id)
            scored = etl.score_entries(
                entries.select(entries.id.alias("entry_id"), "event_id"),
                etl.choices_long(choices_wide),
                fc_daily,
                ob_daily,
            )
            store.update_scores(scored)

        status = event_status(ev, now)
        if status == "completed" and ev.signing_date < now:
            # ALL entries, scored or not: the canonical index list is
            # built from the full id-sorted entry set
            # (oracle.rs:598-607); filtering unscored entries here
            # would shift the 0-based indices and corrupt the
            # attestation bytes.
            entries, _ = store.event_entries(ev.id)
            scored = entries.select(entries.id.alias("entry_id"), "event_id", "score")
            win = etl.winners(scored).collect()
            if win:
                wb = etl.get_winning_bytes([w.canonical_idx for w in win])
                store.sign_event(ev.id, sign_stub(wb))
                status = "signed"
        results[ev.id] = status
    return results
