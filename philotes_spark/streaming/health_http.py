"""HTTP health surface for the CDC ingest pipeline (SURVEY §2A A25).

Mirrors the reference's health server endpoints
(``internal/cdc/health/health.go:230-293``):

- ``GET /health``        → full health JSON; 200 when healthy/degraded,
                           503 when unhealthy
- ``GET /health/live``   → liveness: always 200 while the process serves
- ``GET /health/ready``  → readiness: 200 when the pipeline can process,
                           503 otherwise

Pure stdlib (``http.server`` on a daemon thread) — on a real deployment
this sits next to the Spark driver; Kubernetes probes point at it exactly
as they do at the reference's server. The health payload is whatever the
supplied ``health_fn`` returns (``CdcIngestPipeline.health()``: state,
query activity, listener metrics, backpressure stats).
"""

from __future__ import annotations

import json
import threading
import time
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _rfc3339() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


class HealthServer:
    """Serve a pipeline's health dict over HTTP.

    ``health_fn`` is called per request (no caching: probes must see the
    live state). ``ready_fn`` defaults to the payload's ``healthy`` flag.
    ``port=0`` binds an ephemeral port (tests); read ``.port`` after
    ``start()``.
    """

    def __init__(
        self,
        health_fn: Callable[[], dict],
        ready_fn: Callable[[], bool] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self.health_fn = health_fn
        self.ready_fn = ready_fn or (lambda: bool(health_fn().get("healthy")))
        self.host = host
        self._port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        if self._server is not None:
            return self._server.server_address[1]
        return self._port

    def start(self) -> "HealthServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # noqa: A003 - quiet probes
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 - http.server API
                if self.path == "/health/live":
                    # alive iff the server answers (health.go:274-279)
                    self._send(200, {"status": "alive", "timestamp": _rfc3339()})
                elif self.path == "/health/ready":
                    try:
                        ready = outer.ready_fn()
                    except Exception:  # a throwing probe is "not ready"
                        ready = False
                    if ready:
                        self._send(200, {"status": "ready", "timestamp": _rfc3339()})
                    else:
                        self._send(
                            503, {"status": "not_ready", "timestamp": _rfc3339()}
                        )
                elif self.path == "/health":
                    try:
                        payload = outer.health_fn()
                        code = 200 if payload.get("healthy") else 503
                    except Exception as exc:  # health probe must not 500-loop
                        payload, code = {"healthy": False, "error": str(exc)}, 503
                    self._send(code, payload)
                else:
                    self._send(404, {"error": "not found"})

        self._server = ThreadingHTTPServer((self.host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="philotes-health", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
