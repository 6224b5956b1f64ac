"""CLI entrypoints: the binary-parity surface (serve / daemon / etl /
query / sql). serve is exercised in-process over a real socket; etl
runs the golden fixture store end-to-end; query/sql go through the
argparse path."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from noaa_data_pipeline_spark.__main__ import build_parser, cmd_etl, cmd_query, cmd_sql
from tests.test_event_store_etl import NOW, _build_fixture


class _Capture:
    def __init__(self, capsys):
        self.capsys = capsys

    def lines(self):
        return [
            json.loads(line)
            for line in self.capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ]


def test_query_subcommand(spark, capsys):
    args = build_parser().parse_args(
        ["query", "q1_pricing_summary", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]
    )
    assert cmd_query(args) == 0
    rows = _Capture(capsys).lines()
    assert rows and "l_returnflag" in rows[0]


def test_query_subcommand_unknown_name(capsys):
    args = build_parser().parse_args(["query", "no_such_query"])
    assert cmd_query(args) == 2


def test_sql_subcommand_guarded(spark, capsys):
    args = build_parser().parse_args(
        ["sql", "SELECT COUNT(*) AS n FROM region", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert cmd_sql(args) == 0
    assert _Capture(capsys).lines() == [{"n": 5}]

    from noaa_data_pipeline_spark.sql_surface import SqlGuardError

    bad = build_parser().parse_args(
        ["sql", "DROP TABLE region", "--sf-dir", "/root/testdata/sf0.001"]
    )
    with pytest.raises(SqlGuardError):
        cmd_sql(bad)


def test_etl_subcommand_signs_golden_store(spark, tmp_path_factory, capsys):
    store, lake_root, event_id = _build_fixture(spark, tmp_path_factory)
    args = build_parser().parse_args(
        ["etl", "--lake", lake_root, "--store", store.root, "--now", NOW.isoformat()]
    )
    assert cmd_etl(args) == 0
    out = _Capture(capsys).lines()[-1]
    assert out == {event_id: "signed"}


def test_serve_subcommand_route(spark, tmp_path_factory):
    from noaa_data_pipeline_spark.weather import http_api
    from noaa_data_pipeline_spark.weather.event_store import EventStore

    store, lake_root, _ = _build_fixture(spark, tmp_path_factory)
    app = http_api.WeatherApp(
        spark, lake_root, store, str(tmp_path_factory.mktemp("cli_files"))
    )
    srv = http_api.make_server(app)  # the serve subcommand's server
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address[:2]
        with urllib.request.urlopen(f"http://{host}:{port}/stations") as resp:
            body = json.loads(resp.read())
        assert {r["station_id"] for r in body} == {"PFNO", "KSAW", "PAPG", "KWMC"}
    finally:
        srv.shutdown()
