"""HTTP serving front over the engine — REST route parity.

Analog of the reference's RestExpress server (server/REServerRoutes.java:40-67
registers GET /search on an always-on process; api/SearchAPIAdapter.java:22-102
adapts request params to SearchOptions; api/ResultsWrapper.java:10-151 is the
response envelope). Here: stdlib ``http.server`` over a SearchEngine whose
LocalExecutor answers each request driver-side in milliseconds — no Spark job
per request, matching the reference's always-on serving shape.

Routes:
    GET /search?q=...&size=k&page=n&lang=...&repo=...&distinct=true&
            prefix=false&near=...&mark=...&verbose=true
        -> the ``search_response`` envelope (parsed_query, total_hits +
           relation, trimmed, answer_time_ms, hits with matched_queries[]);
           ``page`` is the reference's 1-based from/size offset paging
           (PAGE_PARAM) — keyset pagination (search_after) remains the
           scale form
    POST /sendq  body {"groups": [{"group_id", "terms", "required"?,
            "weight"?, "term_weights"?, "name"?}], "msm"?, "k"?, "lang"?,
            "repo"?, "distinct"?, "near"?}
        -> raw structured query executed directly against the executor,
           bypassing the analyzer ladder — the SendQAPI analog
           (api/SendQAPI.java wraps a raw ES query body verbatim;
           REServerRoutes.java:69)
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
                size = int(_one("size", default_opts.k))
                page = max(1, int(_one("page", 1)))
                opts = replace(
                    default_opts,
                    # from/size offset paging (PAGE_PARAM): fetch page*size,
                    # return the last `size` — the reference pages the same
                    # way; keyset (search_after) is the unbounded-depth form
                    k=size * page,
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
                resp = engine.search_response(
                    _one("q", ""),
                    opts,
                    # mark: opaque client token echoed back (the
                    # reference's "mark" header); verbose: full doc
                    # detail per hit (verbose_address analog)
                    mark=_one("mark"),
                    verbose=_one("verbose", "false").lower() == "true",
                )
                if page > 1:
                    resp["page"] = page
                    resp["hits"] = resp["hits"][(page - 1) * size :]
                self._send(200, resp)
            except Exception as e:  # surface the reason, keep serving
                self._send(400, {"error": str(e)})

        def do_POST(self) -> None:  # noqa: N802 — http.server API
            if urlparse(self.path).path != "/sendq":
                self._send(404, {"error": "not found", "routes": ["/sendq"]})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
                from gazetteer_search_spark.search.engine import TermGroup

                groups = [
                    TermGroup(
                        group_id=int(g["group_id"]),
                        terms=tuple(g["terms"]),
                        required=bool(g.get("required", True)),
                        weight=float(g.get("weight", 1.0)),
                        term_weights=(
                            tuple(float(w) for w in g["term_weights"])
                            if g.get("term_weights")
                            else None
                        ),
                        name=g.get("name"),
                    )
                    for g in body.get("groups", [])
                ]
                opts = replace(
                    default_opts,
                    k=int(body.get("k", default_opts.k)),
                    lang=body.get("lang"),
                    repo=body.get("repo"),
                    distinct=bool(body.get("distinct", False)),
                    near_path=body.get("near"),
                )
                msm = int(body.get("msm", sum(1 for g in groups if g.required)))
                rows = engine.search_rung_rows(groups, msm, opts)
                self._send(
                    200,
                    {
                        "hits": [
                            {
                                "doc_id": r.doc_id,
                                "score": round(float(r.score), 4),
                                "repo": r.repo,
                                "path": r.path,
                                "lang": r.lang,
                            }
                            for r in rows
                        ]
                    },
                )
            except Exception as e:
                self._send(400, {"error": str(e)})

        def log_message(self, *args) -> None:  # quiet access log
            pass

    return Handler


def make_server(engine, options, host: str = "127.0.0.1", port: int = 0):
    """Build (not start) the HTTP server; port 0 binds an ephemeral port
    (``server_address[1]`` reports it). Caller runs ``serve_forever()``."""
    return ThreadingHTTPServer((host, port), _make_handler(engine, options))
