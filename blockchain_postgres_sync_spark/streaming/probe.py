"""Liveness / readiness HTTP probe (S10).

The reference consumer serves a metrics+readiness endpoint next to the
ingest loop (bin/consumer.rs:33-46): a background channel polls the newest
key-block timestamp every 60 s (LAST_TIMESTAMP_QUERY, bin/consumer.rs:9-11)
and the service reports unready once the age exceeds 300 s
(MAX_BLOCK_AGE, bin/consumer.rs:12).

Engine analog: a stdlib ThreadingHTTPServer on ``metrics_port`` with

- ``GET /live``   -> 200 always (process is up)
- ``GET /ready``  -> 200 while the newest key block is fresher than
  ``max_block_age_secs``; 503 with the age otherwise (or when the store is
  empty)
- ``GET /metrics``-> text/plain ``block_age_seconds`` gauge

Freshness is read through :func:`plans.sql.liveness_age_seconds` on the
caller-provided store, re-evaluated at most once per ``poll_interval_secs``
(the reference's poll cadence) so probes never drive Spark jobs at request
rate.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

#: reference defaults (bin/consumer.rs:10-12, config/consumer.rs:26-28)
POLL_INTERVAL_SECS = 60
MAX_BLOCK_AGE_SECS = 300
DEFAULT_METRICS_PORT = 9090


class LivenessProbe:
    """Serves /live /ready /metrics for a TableStore-backed consumer."""

    def __init__(
        self,
        store,
        port: int = DEFAULT_METRICS_PORT,
        max_block_age_secs: float = MAX_BLOCK_AGE_SECS,
        poll_interval_secs: float = POLL_INTERVAL_SECS,
    ):
        self._store = store
        self._port = port
        self._max_age = max_block_age_secs
        self._poll = poll_interval_secs
        self._cached_age: float | None = None
        self._cached_at: float = 0.0
        self._lock = threading.Lock()
        self._server: ThreadingHTTPServer | None = None

    # -- freshness ------------------------------------------------------

    def age_seconds(self) -> float | None:
        """Newest-key-block age, cached for poll_interval_secs."""
        from ..plans.sql import liveness_age_seconds

        with self._lock:
            now = time.monotonic()
            if now - self._cached_at > self._poll:
                self._cached_age = liveness_age_seconds(self._store)
                self._cached_at = now
            return self._cached_age

    def ready(self) -> tuple[bool, float | None]:
        age = self.age_seconds()
        return (age is not None and age <= self._max_age), age

    # -- http -----------------------------------------------------------

    def start(self) -> int:
        """Start serving on a daemon thread; returns the bound port (an
        ephemeral one when constructed with port=0, for tests)."""
        probe = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/live":
                    self._send(200, b'{"status":"up"}', "application/json")
                elif self.path == "/ready":
                    ok, age = probe.ready()
                    body = json.dumps(
                        {"ready": ok, "block_age_seconds": age}
                    ).encode()
                    self._send(200 if ok else 503, body, "application/json")
                elif self.path == "/metrics":
                    _, age = probe.ready()
                    val = "NaN" if age is None else f"{age:.3f}"
                    body = (
                        "# TYPE block_age_seconds gauge\n"
                        f"block_age_seconds {val}\n"
                    ).encode()
                    self._send(200, body, "text/plain; version=0.0.4")
                else:
                    self._send(404, b"not found", "text/plain")

        self._server = ThreadingHTTPServer(("127.0.0.1", self._port), Handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
