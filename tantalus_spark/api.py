"""Thin HTTP/JSON facade over the service layer (SURVEY.md §2.1 S10).

The reference's front door is a DRF router of filtered REST endpoints
(``tantalus/api/urls.py:9-31``, 18 routes) behind JWT auth
(``tantalus/settings.py:182-189``). This module closes that network gap
with a stdlib-only server — no web framework in the image, none needed:

    GET /api/                     -> endpoint directory
    GET /api/<endpoint>/?p=v&...  -> {"count": N, "results": [...]}

Every query param is validated against the endpoint's FILTERSET (unknown
params are a 400 naming the legal set, mirroring api/views.py:75-80);
``page`` / ``page_size`` paginate DRF-style. Auth is a bearer-token hook:
pass ``token=...`` to require ``Authorization: Bearer <token>`` — the seam
where a production deployment verifies a real JWT.

Driver-side by design: responses are page-sized (10/50/100, like the
reference's page sizes), so the facade only ever collects a page while the
filtering/joining runs in Spark executors. It is a front door, not a data
plane — bulk egress goes through the parquet/CSV sinks.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse

from tantalus_spark.catalog.loader import Database
from tantalus_spark.operators.services import (
    FILTERSETS, UnknownFilterError, api_list)

_RESERVED = {"page", "page_size"}


def _coerce(key: str, value: str) -> object:
    """Query-string params arrive as strings; give the lookups their
    natural Python types (Spark casts scalars against column types)."""
    if key.endswith("__in"):
        return value.split(",")
    if key.endswith("__isnull"):
        return value.lower() in ("1", "true", "yes")
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    return value


class _Handler(BaseHTTPRequestHandler):
    server: "ApiServer"

    def log_message(self, *args) -> None:  # quiet test output
        pass

    def _send(self, status: int, payload: dict) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 - http.server API
        srv: ApiServer = self.server  # type: ignore[assignment]
        if srv.token is not None:
            auth = self.headers.get("Authorization", "")
            if auth != f"Bearer {srv.token}":
                self._send(401, {"detail": "invalid or missing bearer token"})
                return
        url = urlparse(self.path)
        parts = [p for p in url.path.split("/") if p]
        if parts == ["api"]:
            self._send(200, {"endpoints": sorted(FILTERSETS)})
            return
        if len(parts) != 2 or parts[0] != "api":
            self._send(404, {"detail": f"no route {url.path!r}"})
            return
        endpoint = parts[1]
        if endpoint not in FILTERSETS:
            self._send(404, {"detail": f"unknown endpoint {endpoint!r}"})
            return
        raw = dict(parse_qsl(url.query, keep_blank_values=True))
        try:
            page = int(raw.pop("page", "1"))
            page_size = int(raw.pop("page_size", "10"))
        except ValueError:
            self._send(400, {"detail": "page/page_size must be integers"})
            return
        params = {k: _coerce(k, v) for k, v in raw.items()}
        try:
            result = api_list(srv.db, endpoint, params,
                              page=page, page_size=page_size)
        except UnknownFilterError as exc:
            self._send(400, {"detail": str(exc)})
            return
        self._send(200, {
            "count": result.total,
            "page": page,
            "page_size": page_size,
            "results": [r.asDict() for r in result.rows.collect()],
        })


class ApiServer(ThreadingHTTPServer):
    """``ApiServer(db).serve_background()`` → (host, port); call
    ``shutdown()`` to stop. Binds port 0 by default (ephemeral)."""

    def __init__(self, db: Database, host: str = "127.0.0.1", port: int = 0,
                 token: str | None = None) -> None:
        super().__init__((host, port), _Handler)
        self.db = db
        self.token = token
        self._thread: threading.Thread | None = None

    def serve_background(self) -> tuple[str, int]:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self.server_address[0], self.server_address[1]
