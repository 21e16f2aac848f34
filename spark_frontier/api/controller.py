"""EP3: trigger / status / auto-loop control surface.

Reference: /root/reference/src/api/server.py —
- POST /api/crawl/start (:345-362): kicks a background crawl over selected
  sites; 409-style rejection while one is already running (:351-355)
- GET  /api/crawl/status (:171-202): module-global progress dict
  (is_running, sites_processed, urls_found, articles_saved, errors)
- auto-scheduler loop re-triggering every 15 min (:121-149)

Spark shape: the crawl cycle is a batch job, so the controller runs it on
a daemon thread and exposes the cycle's live ``CycleReport`` counters (the
same funnel the reference's status dict carries). History comes from the
SnapStore's crawl_logs snapshot summaries — the committed, resumable
record — rather than process memory.

``serve_http`` wraps the controller in a stdlib ThreadingHTTPServer
(GET /status, GET /history, POST /crawl/start, POST /auto/start,
POST /auto/stop) so the parity surface is reachable without any
third-party web framework; deployments that want FastAPI can mount the
same controller.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from datetime import datetime, timezone

from spark_frontier.pipeline.crawl import CycleReport, run_crawl_cycle
from spark_frontier.storage import SnapStore


@dataclass
class _RunState:
    run_id: int = 0
    is_running: bool = False
    started_at: str | None = None
    finished_at: str | None = None
    error: str | None = None
    report: CycleReport = field(default_factory=CycleReport)


class CrawlController:
    """Reference api/server.py parity: one crawl at a time, live progress,
    committed history, optional auto-loop."""

    def __init__(self, spark, world: dict, store: SnapStore, **cycle_kwargs):
        self._spark = spark
        self._world = world
        self._store = store
        self._kwargs = cycle_kwargs
        self._lock = threading.Lock()
        self._state = _RunState()
        self._thread: threading.Thread | None = None
        self._auto_stop = threading.Event()
        self._auto_thread: threading.Thread | None = None
        self.cleanups_run = 0  # T10 cadence observability (tests/status)

    # -- trigger (server.py:345-362) ---------------------------------------

    def start(
        self,
        days: int = 7,
        site_ids: list[str] | None = None,
        batch_ts: datetime | None = None,
    ) -> dict:
        """Kick a crawl in the background. Returns {accepted, run_id} or
        {accepted: False, reason} when one is already running (the
        reference returns 409 'A crawl is already in progress')."""
        with self._lock:
            if self._state.is_running:
                return {
                    "accepted": False,
                    "reason": "crawl already in progress",
                    "run_id": self._state.run_id,
                }
            self._state = _RunState(
                run_id=self._state.run_id + 1,
                is_running=True,
                started_at=datetime.now(timezone.utc).isoformat(),
            )
            state = self._state

        world = dict(self._world)
        if site_ids is not None:
            from pyspark.sql import functions as F

            world["sites"] = world["sites"].filter(
                F.col("site_id").isin(site_ids)
                & F.col("is_active")
            )
        ts = batch_ts or datetime.now(timezone.utc).replace(tzinfo=None)

        def _run():
            try:
                run_crawl_cycle(
                    self._spark, world, self._store, batch_ts=ts, days=days,
                    report=state.report, **self._kwargs,
                )
            except Exception as e:  # surfaced via status, like the reference
                state.error = f"{type(e).__name__}: {e}"
            finally:
                state.finished_at = datetime.now(timezone.utc).isoformat()
                state.is_running = False

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()
        return {"accepted": True, "run_id": state.run_id}

    def wait(self, timeout: float | None = None) -> bool:
        t = self._thread
        if t is not None:
            t.join(timeout)
            return not t.is_alive()
        return True

    # -- status (server.py:171-202) -----------------------------------------

    def status(self) -> dict:
        s = self._state
        return {
            "run_id": s.run_id,
            "is_running": s.is_running,
            "started_at": s.started_at,
            "finished_at": s.finished_at,
            "error": s.error,
            "auto_loop": self._auto_thread is not None
            and self._auto_thread.is_alive(),
            "cleanups_run": self.cleanups_run,
            "progress": s.report.as_dict(),
        }

    def history(self, limit: int = 20) -> list[dict]:
        """Committed per-cycle lineage from the crawl_logs snapshot
        summaries — survives restarts (unlike the reference's in-memory
        status dict)."""
        h = self._store.table("crawl_logs").history()
        return [
            {"snapshot_id": x["snapshot_id"], "ts": x["ts"],
             "summary": x["summary"]}
            for x in h[-limit:]
        ]

    # -- auto loop (server.py:121-149) ---------------------------------------

    def start_auto_loop(
        self,
        interval_s: float = 900.0,
        days: int = 7,
        cleanup_every_n_ticks: int | None = 96,
        cleanup_ttl_days: int = 2,
    ) -> None:
        """Re-trigger every interval (reference default 15 min). Skips a
        tick if a crawl is still running, like the reference's guard.

        CLEANUP CADENCE (crawl_scheduler.py:71-76 registers a daily
        ``_cleanup_job``): every ``cleanup_every_n_ticks``-th tick runs
        ``retention_cleanup`` before triggering the crawl — 96 ticks at the
        15-min default ≈ 24 h. The cleanup is skipped (coalesced to the
        next eligible tick) while a crawl is still running: it rewrites the
        links table and must not race an in-flight cycle's commits.
        ``None`` disables it."""
        if self._auto_thread is not None and self._auto_thread.is_alive():
            return
        self._auto_stop.clear()

        def _loop():
            from spark_frontier.pipeline.crawl import retention_cleanup

            tick = 0
            while not self._auto_stop.is_set():
                tick += 1
                if (cleanup_every_n_ticks
                        and tick % cleanup_every_n_ticks == 0
                        and not self._state.is_running):
                    try:
                        retention_cleanup(
                            self._store, self._spark,
                            now=datetime.now(timezone.utc).replace(tzinfo=None),
                            ttl_days=cleanup_ttl_days,
                        )
                        self.cleanups_run += 1
                    except Exception:  # never kills the loop
                        pass
                self.start(days=days)
                if self._auto_stop.wait(interval_s):
                    break

        self._auto_thread = threading.Thread(target=_loop, daemon=True)
        self._auto_thread.start()

    def stop_auto_loop(self) -> None:
        self._auto_stop.set()
        if self._auto_thread is not None:
            self._auto_thread.join(timeout=5)


def serve_http(controller: CrawlController, port: int = 0):
    """Stdlib HTTP wrapper; returns the (started) server — call
    ``server.server_address`` for the bound port, ``server.shutdown()`` to
    stop. Endpoints: GET /status, GET /history, POST /crawl/start
    (json body: {days, site_ids, batch_ts?}), POST /auto/start {interval_s},
    POST /auto/stop."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/status":
                self._send(200, controller.status())
            elif self.path == "/history":
                self._send(200, controller.history())
            elif self.path == "/sites":
                # reference cli.py show_sites / GET sites parity
                rows = controller._world["sites"].orderBy("site_seq").collect()
                self._send(200, {
                    "sites": [
                        {"site_id": r["site_id"], "name": r["name"],
                         "domain": r["domain"],
                         "is_active": bool(r["is_active"]),
                         "last_crawl_at": str(r["last_crawl_at"])
                         if r["last_crawl_at"] else None}
                        for r in rows
                    ]
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n) or b"{}") if n else {}
            if self.path == "/crawl/start":
                ts = body.get("batch_ts")
                out = controller.start(
                    days=int(body.get("days", 7)),
                    site_ids=body.get("site_ids"),
                    batch_ts=datetime.fromisoformat(ts) if ts else None,
                )
                self._send(202 if out["accepted"] else 409, out)
            elif self.path == "/auto/start":
                controller.start_auto_loop(
                    interval_s=float(body.get("interval_s", 900.0))
                )
                self._send(202, {"auto_loop": True})
            elif self.path == "/auto/stop":
                controller.stop_auto_loop()
                self._send(200, {"auto_loop": False})
            else:
                self._send(404, {"error": "not found"})

        def log_message(self, *a):  # quiet in tests
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
