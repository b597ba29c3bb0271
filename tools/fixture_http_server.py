"""Local fixture HTTP server for exercising the REAL network
transports (operators/transport.py) without leaving the machine — the
test double of the site the reference crawls.

Routes (all GET):

- ``/listing?kidx=&keyword=&page=&slots=`` — JSON array of
  [keyword, page, slot, job_id, title, company_url] rows computed with
  the SAME arithmetic as the crawl source's deterministic fake, so a
  crawl through the HTTP transport must equal a crawl through the fake
  (and therefore still matches the DuckDB oracle).
- ``/badlisting?...`` — like /listing but every ``page == 1`` request
  answers 500 (exercises the reader's retry + error budget).
- ``/detail/<key>`` — 200, body ``payload-for-<key>``.
- ``/flaky/<key>?fails=N`` — 503 for the first N requests of that
  exact path+query, then 200 (exercises transient retry).
- ``/gone/...`` — 404 (exercises permanent failure, no retry).
- ``/ua`` — 200, body = the request's User-Agent header (UA rotation).
- ``/slow/<key>?delay=S`` — sleeps S seconds then 200 (timeouts).

Standalone (for deploy/smoke.sh): ``python tools/fixture_http_server.py
[port]`` prints ``listening on http://127.0.0.1:<port>`` and serves
until killed. Tests import start_fixture_server()/shutdown instead.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _listing_rows(kidx: int, keyword: str, page: int, slots: int) -> list[list]:
    rows = []
    for slot in range(slots):
        job_id = kidx * 10_000 + page * 100 + slot
        rows.append(
            [
                keyword,
                page,
                slot,
                job_id,
                f"job-{keyword}-{job_id}",
                f"https://example.com/company/{job_id % 37}",
            ]
        )
    return rows


class FixtureHandler(BaseHTTPRequestHandler):
    server: "FixtureServer"

    def log_message(self, *args) -> None:  # keep pytest output clean
        pass

    def _send(self, code: int, body: bytes, ctype: str = "text/plain") -> None:
        self.send_response(code)
        self.send_header("Content-Type", f"{ctype}; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 - stdlib naming
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        with self.server.lock:
            self.server.hits[self.path] = self.server.hits.get(self.path, 0) + 1
            n_hit = self.server.hits[self.path]
        parts = [p for p in u.path.split("/") if p]
        route = parts[0] if parts else ""
        if route in ("listing", "badlisting"):
            page = int(q.get("page", 0))
            if route == "badlisting" and page == 1:
                self._send(500, b"listing backend exploded")
                return
            rows = _listing_rows(
                int(q.get("kidx", 0)),
                q.get("keyword", ""),
                page,
                int(q.get("slots", 10)),
            )
            self._send(200, json.dumps(rows).encode(), "application/json")
        elif route == "detail":
            key = parts[1] if len(parts) > 1 else ""
            self._send(200, f"payload-for-{key}".encode())
        elif route == "flaky":
            fails = int(q.get("fails", 1))
            if n_hit <= fails:
                self._send(503, b"try again")
            else:
                key = parts[1] if len(parts) > 1 else ""
                self._send(200, f"payload-for-{key}".encode())
        elif route == "gone":
            self._send(404, b"not here, never will be")
        elif route == "jobpage":
            # the job-detail page itself (r11): the SAME deterministic
            # markup the transport synthesizer and the SQL oracle
            # render, served over real HTTP — the extraction pipeline's
            # honest test double of the reference's target site
            from etl_dagster_service_crawler_spark.functions.html import (
                render_job_page,
            )

            doc_id = int(parts[1]) if len(parts) > 1 else 0
            page = render_job_page(doc_id, q.get("s", ""), q.get("l", ""))
            self._send(200, page.encode(), "text/html")
        elif route == "ua":
            # echoes the caller's User-Agent — exercises UA rotation
            self._send(200, (self.headers.get("User-Agent") or "").encode())
        elif route == "slow":
            time.sleep(float(q.get("delay", 1.0)))
            key = parts[1] if len(parts) > 1 else ""
            self._send(200, f"payload-for-{key}".encode())
        else:
            self._send(404, b"unknown fixture route")


class FixtureServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr):
        super().__init__(addr, FixtureHandler)
        self.lock = threading.Lock()
        self.hits: dict[str, int] = {}


def start_fixture_server(port: int = 0) -> tuple[FixtureServer, str]:
    """Start on 127.0.0.1:<port> (0 = ephemeral) in a daemon thread.
    Returns (server, base_url); call server.shutdown() when done."""
    srv = FixtureServer(("127.0.0.1", port))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def main() -> int:
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    srv, base = start_fixture_server(port)
    print(f"listening on {base}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
