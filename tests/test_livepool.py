"""Live-fetch pool body (fetch/livepool.py) — mocked-session unit tests.

The sandbox has no aiohttp/network, so these drive run_fetch_batch with a
fake async session + fake clock and verify the reference's pool contract
(http_client.py:110-181): per-host cap, global cap, deadline sleep math,
error → code 0.
"""

from __future__ import annotations

import asyncio

import pytest

from spark_frontier.fetch.livepool import run_fetch_batch


class FakeResp:
    def __init__(self, status: int, body: bytes):
        self.status = status
        self._body = body

    async def read(self) -> bytes:
        return self._body


class FakeSession:
    """Counts concurrent GETs globally and per host."""

    def __init__(self, responses=None, delay: float = 0.001, fail=()):
        self.responses = responses or {}
        self.delay = delay
        self.fail = set(fail)
        self.active = 0
        self.active_by_host = {}
        self.max_active = 0
        self.max_by_host = {}
        self.got = []

    async def __aenter__(self):
        return self

    async def __aexit__(self, *a):
        return False

    async def get(self, url, headers=None):
        host = url.split("/")[2]
        self.active += 1
        self.active_by_host[host] = self.active_by_host.get(host, 0) + 1
        self.max_active = max(self.max_active, self.active)
        self.max_by_host[host] = max(
            self.max_by_host.get(host, 0), self.active_by_host[host]
        )
        try:
            await asyncio.sleep(self.delay)
            self.got.append((url, (headers or {}).get("User-Agent")))
            if url in self.fail:
                raise ConnectionError("boom")
            return self.responses.get(url, FakeResp(200, b"ok"))
        finally:
            self.active -= 1
            self.active_by_host[host] -= 1


class FakeClock:
    """Virtual time: sleep() advances a logical clock instantly."""

    def __init__(self, t0: float = 1000.0):
        self.t = t0
        self.sleeps = []

    def now(self) -> float:
        return self.t

    async def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s
        await asyncio.sleep(0)


def _rows(host: str, n: int, deadline=None):
    return [
        {"url": f"https://{host}/p{i}", "host": host,
         "politeness_deadline": deadline, "ua": f"ua-{i}"}
        for i in range(n)
    ]


def test_per_host_cap_enforced():
    session = FakeSession()
    rows = _rows("a.com", 40) + _rows("b.com", 40)
    out = run_fetch_batch(rows, lambda: session, per_host_limit=3,
                          total_limit=50, clock=FakeClock())
    assert len(out) == 80 and all(r["http_code"] == 200 for r in out)
    assert session.max_by_host["a.com"] <= 3
    assert session.max_by_host["b.com"] <= 3


def test_total_cap_enforced():
    session = FakeSession()
    rows = _rows("a.com", 30) + _rows("b.com", 30) + _rows("c.com", 30)
    run_fetch_batch(rows, lambda: session, per_host_limit=10,
                    total_limit=5, clock=FakeClock())
    assert session.max_active <= 5


def test_deadline_sleep_math():
    """A row whose deadline is in the future sleeps exactly until it;
    past deadlines don't sleep."""
    clock = FakeClock(t0=1000.0)
    session = FakeSession(delay=0.0)
    rows = [
        {"url": "https://a.com/x", "host": "a.com",
         "politeness_deadline": 1002.5, "ua": None},
        {"url": "https://a.com/y", "host": "a.com",
         "politeness_deadline": 999.0, "ua": None},
    ]
    out = run_fetch_batch(rows, lambda: session, per_host_limit=1,
                          total_limit=10, clock=clock)
    assert [r["http_code"] for r in out] == [200, 200]
    # one sleep of 2.5 s (the future deadline); the past one slept 0 times
    assert clock.sleeps == [pytest.approx(2.5)]


def test_connection_error_maps_to_code_0():
    session = FakeSession(fail={"https://a.com/p1"})
    out = run_fetch_batch(_rows("a.com", 3), lambda: session,
                          clock=FakeClock())
    codes = {r["url"]: r["http_code"] for r in out}
    assert codes["https://a.com/p1"] == 0
    assert codes["https://a.com/p0"] == 200


def test_ua_header_passed_through():
    session = FakeSession()
    run_fetch_batch(_rows("a.com", 2), lambda: session, clock=FakeClock())
    uas = dict(session.got)
    assert uas["https://a.com/p0"] == "ua-0"
    assert uas["https://a.com/p1"] == "ua-1"


def test_results_keep_input_order():
    session = FakeSession()
    rows = _rows("a.com", 5) + _rows("b.com", 5)
    out = run_fetch_batch(rows, lambda: session, clock=FakeClock())
    assert [r["url"] for r in out] == [r["url"] for r in rows]


def test_stalled_body_read_times_out():
    """ADVICE r3: a server that ACCEPTS the connection but stalls the body
    must not hold the pool's semaphores forever — the single wait_for now
    covers get()+read(), so the row resolves to code 0 within timeout_s."""

    class StallResp:
        status = 200

        async def read(self):
            await asyncio.sleep(30)  # never finishes within the timeout

    session = FakeSession(responses={"https://h.com/p0": StallResp()})
    out = run_fetch_batch(
        _rows("h.com", 1), lambda: session, timeout_s=0.05
    )
    assert out[0]["http_code"] == 0 and out[0]["body"] is None
