"""Ingest fetch loop (S1/S2): token-bucket rate limiting, retrying
XML fetch, and the 50-station NDFD request batcher — the last pieces
of the reference's daemon-side plumbing (daemon/src/utils.rs:102-231,
download_forecast.rs:683-718).

Everything time- and IO-dependent is injectable (clock, sleep,
transport) so the behavior is unit-testable without network or real
waits; the default transport is urllib. The container has no outbound
network, so production fetches are exercised only through fakes in
tests/test_fetcher.py — the control flow (token accounting, wait/
retry sequencing, backoff, gzip handling, batch fan-out) is the part
under test and is real.
"""

from __future__ import annotations

import gzip
import time
import urllib.request
from collections.abc import Callable, Iterable

DEFAULT_USER_AGENT = "noaa-data-pipeline-spark"
STATION_BATCH = 50  # stations per NDFD request (download_forecast.rs:684)

# transport: (url, timeout_s, headers) -> (status_code, body_bytes)
Transport = Callable[[str, float, dict], tuple[int, bytes]]


def urllib_transport(url: str, timeout: float, headers: dict) -> tuple[int, bytes]:
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.read()


class RateLimiter:
    """Token bucket (utils.rs:102-147): ``capacity`` tokens, refilled
    at ``refill_rate`` tokens/second; an acquire that finds the bucket
    empty sleeps ``wait_s`` and retries up to ``max_waits`` times
    before giving up.

    One deliberate divergence: the reference adds
    ``min(elapsed * rate, capacity)`` tokens per refill without
    clamping the total, so an idle limiter accumulates unbounded
    burst; here the balance clamps at ``capacity`` (standard token
    bucket)."""

    def __init__(
        self,
        capacity: int,
        refill_rate: float,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.capacity = float(capacity)
        self.refill_rate = float(refill_rate)
        self.tokens = float(capacity)
        self._clock = clock
        self._sleep = sleep
        self._last_refill = clock()

    def _refill(self) -> None:
        now = self._clock()
        self.tokens = min(
            self.tokens + (now - self._last_refill) * self.refill_rate, self.capacity
        )
        self._last_refill = now

    def try_acquire(
        self, tokens: float = 1.0, max_waits: int = 3, wait_s: float = 20.0
    ) -> bool:
        waits = 0
        while True:
            self._refill()
            if tokens <= self.tokens:
                self.tokens -= tokens
                return True
            if waits >= max_waits:
                return False
            waits += 1
            self._sleep(wait_s)


class RateLimitExceeded(Exception):
    pass


class FetchError(Exception):
    pass


class XmlFetcher:
    """Rate-limited, retrying XML fetch (utils.rs:149-231): each call
    acquires one token (raising after the limiter's waits are
    exhausted), then attempts the request up to ``retries`` extra
    times with exponential backoff on transport errors or non-2xx
    statuses. ``fetch_xml_gzip`` transparently gunzips."""

    def __init__(
        self,
        transport: Transport = urllib_transport,
        rate_limiter: RateLimiter | None = None,
        user_agent: str = DEFAULT_USER_AGENT,
        retries: int = 3,
        timeout: float = 20.0,
        backoff_base: float = 0.5,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.transport = transport
        self.rate_limiter = rate_limiter
        self.user_agent = user_agent
        self.retries = retries
        self.timeout = timeout
        self.backoff_base = backoff_base
        self._sleep = sleep

    def _fetch(self, url: str) -> bytes:
        if self.rate_limiter is not None and not self.rate_limiter.try_acquire(1.0):
            raise RateLimitExceeded("Rate limit exceeded after retries")
        headers = {"User-Agent": self.user_agent}
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            if attempt:
                self._sleep(self.backoff_base * (2 ** (attempt - 1)))
            try:
                status, body = self.transport(url, self.timeout, headers)
            except Exception as exc:  # noqa: BLE001 — transient transport error
                last = exc
                continue
            if 200 <= status < 300:
                return body
            last = FetchError(f"error response from request: {status}")
        raise FetchError(f"fetch failed after {self.retries + 1} attempts: {last}")

    def fetch_xml(self, url: str) -> str:
        return self._fetch(url).decode("utf-8", "replace")

    def fetch_xml_gzip(self, url: str) -> str:
        body = self._fetch(url)
        if body[:2] == b"\x1f\x8b":
            body = gzip.decompress(body)
        return body.decode("utf-8", "replace")


def split_stations(stations: Iterable[str], size: int = STATION_BATCH) -> list[list[str]]:
    """The NDFD batcher (download_forecast.rs:683-686 via
    split_cityweather): at most ``size`` stations per request URL."""
    out: list[list[str]] = []
    batch: list[str] = []
    for s in stations:
        batch.append(s)
        if len(batch) == size:
            out.append(batch)
            batch = []
    if batch:
        out.append(batch)
    return out


def fetch_batched(
    fetcher: XmlFetcher,
    stations: Iterable[str],
    make_url: Callable[[list[str]], str],
    parse: Callable[[str], list],
    size: int = STATION_BATCH,
) -> tuple[list, list[list[str]]]:
    """Fan a station list out over batched requests (the reference
    spawns a task per batch; here sequential — the daemon loop is
    hourly and latency-insensitive). Failed batches are collected,
    not fatal (download_forecast.rs:705-716 logs and counts down).

    Returns (parsed rows from successful batches, failed batches)."""
    rows: list = []
    failed: list[list[str]] = []
    for batch in split_stations(stations, size):
        try:
            rows.extend(parse(fetcher.fetch_xml(make_url(batch))))
        except (FetchError, RateLimitExceeded):
            failed.append(batch)
    return rows, failed
