"""S1/S2 fetch-loop behavior with fake clock/sleep/transport: token
accounting, wait-then-fail sequencing, retry/backoff, gzip handling,
and the 50-station batch fan-out (utils.rs:102-231,
download_forecast.rs:683-718)."""

from __future__ import annotations

import gzip

import pytest

from noaa_data_pipeline_spark.weather.fetcher import (
    FetchError,
    RateLimiter,
    RateLimitExceeded,
    XmlFetcher,
    fetch_batched,
    split_stations,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.slept: list[float] = []

    def now(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.slept.append(s)
        self.t += s


def test_rate_limiter_consumes_and_refills():
    clk = FakeClock()
    rl = RateLimiter(capacity=2, refill_rate=0.1, clock=clk.now, sleep=clk.sleep)
    assert rl.try_acquire() and rl.try_acquire()  # burst capacity
    # empty now; one 20s wait refills 2 tokens (0.1/s), acquire succeeds
    assert rl.try_acquire()
    assert clk.slept == [20.0]


def test_rate_limiter_gives_up_after_three_waits():
    clk = FakeClock()
    rl = RateLimiter(capacity=1, refill_rate=0.0, clock=clk.now, sleep=clk.sleep)
    assert rl.try_acquire()
    assert not rl.try_acquire()  # rate 0: waits can't help
    assert clk.slept == [20.0, 20.0, 20.0]  # exactly 3 waits (utils.rs:137-144)


def test_rate_limiter_clamps_at_capacity():
    clk = FakeClock()
    rl = RateLimiter(capacity=3, refill_rate=10.0, clock=clk.now, sleep=clk.sleep)
    clk.t += 1000  # long idle: tokens must clamp at 3, not 10000
    rl._refill()
    assert rl.tokens == 3.0


def _transport_script(script):
    """script: list of results; exception instances raise."""
    calls = []

    def transport(url, timeout, headers):
        calls.append((url, timeout, headers.get("User-Agent")))
        result = script[min(len(calls) - 1, len(script) - 1)]
        if isinstance(result, Exception):
            raise result
        return result

    return transport, calls


def test_fetch_retries_then_succeeds():
    clk = FakeClock()
    transport, calls = _transport_script(
        [ConnectionError("boom"), (503, b""), (200, b"<xml/>")]
    )
    f = XmlFetcher(transport=transport, retries=3, sleep=clk.sleep)
    assert f.fetch_xml("http://example.test/x") == "<xml/>"
    assert len(calls) == 3
    assert clk.slept == [0.5, 1.0]  # exponential backoff between attempts
    assert calls[0][2] == "noaa-data-pipeline-spark"


def test_fetch_fails_after_exhausting_retries():
    clk = FakeClock()
    transport, calls = _transport_script([(500, b"")])
    f = XmlFetcher(transport=transport, retries=3, sleep=clk.sleep)
    with pytest.raises(FetchError, match="after 4 attempts"):
        f.fetch_xml("http://example.test/x")
    assert len(calls) == 4


def test_fetch_respects_rate_limiter():
    clk = FakeClock()
    rl = RateLimiter(capacity=1, refill_rate=0.0, clock=clk.now, sleep=clk.sleep)
    transport, _ = _transport_script([(200, b"ok")])
    f = XmlFetcher(transport=transport, rate_limiter=rl, sleep=clk.sleep)
    assert f.fetch_xml("u") == "ok"
    with pytest.raises(RateLimitExceeded):
        f.fetch_xml("u")


def test_fetch_xml_gzip_decodes():
    payload = gzip.compress("<dwml>data</dwml>".encode())
    transport, _ = _transport_script([(200, payload)])
    f = XmlFetcher(transport=transport)
    assert f.fetch_xml_gzip("u") == "<dwml>data</dwml>"
    # plain bodies pass through unchanged
    transport2, _ = _transport_script([(200, b"<plain/>")])
    assert XmlFetcher(transport=transport2).fetch_xml_gzip("u") == "<plain/>"


def test_split_stations_batches_of_50():
    stations = [f"S{i}" for i in range(120)]
    batches = split_stations(stations)
    assert [len(b) for b in batches] == [50, 50, 20]
    assert [s for b in batches for s in b] == stations


def test_fetch_batched_collects_failures():
    def transport(url, timeout, headers):
        if "S2" in url:
            return (500, b"")
        return (200, url.encode())

    f = XmlFetcher(transport=transport, retries=0)
    rows, failed = fetch_batched(
        f,
        ["S1", "S2", "S3"],
        make_url=lambda batch: "http://x/" + ",".join(batch),
        parse=lambda text: [text],
        size=1,
    )
    assert rows == ["http://x/S1", "http://x/S3"]
    assert failed == [["S2"]]
