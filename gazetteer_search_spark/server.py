"""HTTP serving front over the engine — REST route parity.

Analog of the reference's RestExpress server (server/REServerRoutes.java:40-67
registers GET /search on an always-on process; api/SearchAPIAdapter.java:22-102
adapts request params to SearchOptions; api/ResultsWrapper.java:10-151 is the
response envelope). Here: stdlib ``http.server`` over a SearchEngine whose
LocalExecutor answers each request driver-side in milliseconds — no Spark job
per request, matching the reference's always-on serving shape.

Routes:
    GET /search?q=...&size=k&lang=...&repo=...&distinct=true&prefix=false
        -> the ``search_response`` envelope (parsed_query, total_hits +
           relation, trimmed, answer_time_ms, hits with matched_queries[])
    GET /healthz -> {"ok": true}
"""

from __future__ import annotations

import json
from dataclasses import replace
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _make_handler(engine, default_opts):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 — http.server API
            u = urlparse(self.path)
            if u.path == "/healthz":
                self._send(200, {"ok": True})
                return
            if u.path != "/search":
                self._send(404, {"error": "not found", "routes": ["/search"]})
                return
            qs = parse_qs(u.query)

            def _one(name, default=None):
                v = qs.get(name)
                return v[0] if v else default

            try:
                opts = replace(
                    default_opts,
                    k=int(_one("size", default_opts.k)),
                    lang=_one("lang"),
                    repo=_one("repo"),
                    path_prefix=_one("path_prefix"),
                    distinct=_one("distinct", "false").lower() == "true",
                    prefix=_one("prefix", str(default_opts.prefix)).lower()
                    == "true",
                    # lat/lon distance-sort analog (SearchAPIAdapter
                    # LAT_PARAM/LON_PARAM): closer-in-the-tree wins ties
                    near_path=_one("near"),
                )
                self._send(
                    200,
                    engine.search_response(
                        _one("q", ""),
                        opts,
                        # mark: opaque client token echoed back (the
                        # reference's "mark" header); verbose: full doc
                        # detail per hit (verbose_address analog)
                        mark=_one("mark"),
                        verbose=_one("verbose", "false").lower() == "true",
                    ),
                )
            except Exception as e:  # surface the reason, keep serving
                self._send(400, {"error": str(e)})

        def log_message(self, *args) -> None:  # quiet access log
            pass

    return Handler


def make_server(engine, options, host: str = "127.0.0.1", port: int = 0):
    """Build (not start) the HTTP server; port 0 binds an ephemeral port
    (``server_address[1]`` reports it). Caller runs ``serve_forever()``."""
    return ThreadingHTTPServer((host, port), _make_handler(engine, options))
