"""Live HTTP fetch pool — the deployment body behind ``live_fetch``.

Reference: /root/reference/src/crawler/http_client.py:110-181 — an aiohttp
session with ``TCPConnector(limit=50, limit_per_host=10)``, per-request
user-agent rotation, and politeness waits before each GET.

The pool logic is PURE asyncio (no Spark, no aiohttp import at module
level) so it unit-tests with a mocked session and a fake clock; the Spark
wiring in ``fetcher.live_fetch`` partitions the batch by host and runs
``run_fetch_batch`` inside ``mapInPandas`` with a real aiohttp session
factory. Deployment therefore needs ZERO new code — only aiohttp on the
executors.

Concurrency contract (http_client.py:118-123):
- at most ``total_limit`` requests in flight per pool (default 50)
- at most ``per_host_limit`` per host (default 10)
- each row's ``politeness_deadline`` is honored in wall clock: the task
  sleeps until the deadline before issuing its GET (the deadline column IS
  the token-bucket acquire, computed by ratelimit.assign_deadlines)
"""

from __future__ import annotations

import asyncio
from datetime import datetime, timezone


class _RealClock:
    def now(self) -> float:
        return datetime.now(timezone.utc).timestamp()

    async def sleep(self, s: float) -> None:
        await asyncio.sleep(s)


def _deadline_epoch(dl) -> float | None:
    if dl is None:
        return None
    if isinstance(dl, (int, float)):
        return float(dl)
    if isinstance(dl, datetime):
        if dl.tzinfo is None:
            dl = dl.replace(tzinfo=timezone.utc)
        return dl.timestamp()
    return None


async def _fetch_all(
    rows: list[dict],
    session,
    per_host_limit: int,
    total_limit: int,
    timeout_s: float,
    clock,
) -> list[dict]:
    total_sem = asyncio.Semaphore(total_limit)
    host_sems: dict[str, asyncio.Semaphore] = {}

    async def _one(row: dict) -> dict:
        host = row.get("host") or ""
        sem = host_sems.setdefault(host, asyncio.Semaphore(per_host_limit))
        async with total_sem, sem:
            # politeness: the deadline is an absolute wall-clock floor
            dl = _deadline_epoch(row.get("politeness_deadline"))
            if dl is not None:
                wait = dl - clock.now()
                if wait > 0:
                    await clock.sleep(wait)
            headers = {"User-Agent": row["ua"]} if row.get("ua") else {}

            async def _get_and_read():
                resp = await session.get(row["url"], headers=headers)
                return int(resp.status), await resp.read()

            try:
                # ONE deadline covers connect+headers AND the body read: a
                # server that accepts the connection but stalls the body
                # must not hold the pool's semaphores forever
                code, body = await asyncio.wait_for(
                    _get_and_read(), timeout=timeout_s
                )
            except Exception:
                # connection error / timeout → status 0, like the
                # hermetic fetch's missing-URL convention
                body, code = None, 0
            return {
                "url": row["url"],
                "http_code": code,
                "body": body,
                "fetched_at": clock.now(),
            }

    return list(await asyncio.gather(*[_one(r) for r in rows]))


def run_fetch_batch(
    rows: list[dict],
    session_factory,
    per_host_limit: int = 10,
    total_limit: int = 50,
    timeout_s: float = 15.0,
    clock=None,
) -> list[dict]:
    """Fetch one partition's rows through an async session pool.

    ``session_factory``: async context manager factory returning an object
    with ``async get(url, headers=...) -> resp`` where resp has ``status``
    and ``async read()`` (aiohttp.ClientSession satisfies this; tests pass
    a mock). ``clock``: now()/sleep() pair, injectable for deterministic
    deadline tests. Results keep input order.
    """
    clock = clock or _RealClock()

    async def _run():
        async with session_factory() as session:
            return await _fetch_all(
                rows, session, per_host_limit, total_limit, timeout_s, clock
            )

    return asyncio.run(_run())
