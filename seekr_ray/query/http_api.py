"""REST façade over the query engine — response-shape parity with the
reference's Spring controllers:

* ``GET /api/search?query=...&page=0&size=10`` ->
  ``{"results": [{"url", "title", "score", "snippet"}], "totalCount": N}``
  (``SearchController.java:27-51``: 400 on blank query, 400 +
  empty-response body on negative page, size clamped to 10 outside
  (0, 100]);
* ``GET /api/suggestions?q=...`` -> JSON list of strings
  (``SearchSuggestionsController.java:21-33``: 400 on blank q);
* ``GET /`` -> the static search page (``webui/index.html``) — flow
  parity with the reference's React app (``Web Interface/src/App.jsx``,
  ``SearchSuggestions.jsx``): debounced suggestions, paged results,
  ``<strong>``-highlighted snippets; vanilla JS so no build step.

Stdlib ``ThreadingHTTPServer`` on purpose — no web framework ships in
this environment, and the serving state (segment store, caches) already
lives in ``QueryEngine`` / the ``SearchService`` actor pool; the HTTP
layer is a thin adapter over either.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_WEBUI_PATH = os.path.join(os.path.dirname(__file__), "webui", "index.html")


class SearchHTTPServer:
    """Serves one QueryEngine (or any object with ``search``/``suggest``
    of the same signatures, e.g. a SearchService pool)."""

    def __init__(self, backend, host: str = "127.0.0.1", port: int = 0):
        self.backend = backend
        # ThreadingHTTPServer runs one thread per request, but
        # QueryEngine's OrderedDict caches and QueryLogWriter buffer are
        # not thread-safe (interleaved move_to_end/popitem can raise;
        # a concurrently-appended log record could be dropped mid-flush).
        # The façade serializes backend calls; concurrent serving is the
        # SearchService actor pool's job, where each actor IS serial.
        self._backend_lock = threading.Lock()
        # pre-build the FastSS correction index (derived from the
        # immutable vocabulary): built lazily it would run inside
        # _backend_lock on the first zero-hit query, stalling every
        # concurrent search for the build's duration (ADVICE r3)
        warm = getattr(backend, "_correction_index", None)
        if callable(warm):
            try:
                warm()
            except Exception:  # serving must not die on a warmup fault
                pass
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _json(self, code: int, obj=None) -> None:
                body = b"" if obj is None else json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (stdlib API)
                url = urlparse(self.path)
                qs = parse_qs(url.query)
                try:
                    if url.path == "/api/search":
                        return self._search(qs)
                    if url.path == "/api/suggestions":
                        return self._suggestions(qs)
                    if url.path in ("/", "/index.html"):
                        return self._page()
                    return self._json(404, {"error": "not found"})
                except Exception:  # 500 parity (SearchController catch-all)
                    return self._json(500)

            def _search(self, qs) -> None:
                query = (qs.get("query") or [""])[0]
                if not query.strip():
                    return self._json(400)
                try:
                    page = int((qs.get("page") or ["0"])[0])
                    size = int((qs.get("size") or ["10"])[0])
                except ValueError:
                    return self._json(400)
                if page < 0:
                    return self._json(400, {"results": [], "totalCount": 0})
                if size <= 0 or size > 100:
                    size = 10
                # extras beyond the reference surface: ?scorer=bm25
                # (plain free-text ranking; results carry doc_id+score)
                # and ?mode=auto|wand|bmw|bmw_cold for its evaluation
                # strategy — the reference's two params stay default
                scorer = (qs.get("scorer") or ["tfidf"])[0]
                mode = (qs.get("mode") or ["auto"])[0]
                if scorer not in ("tfidf", "bm25") or mode not in (
                    "auto",
                    "wand",
                    "bmw",
                    "bmw_cold",
                ):
                    return self._json(400)
                if scorer == "bm25":
                    bm25 = getattr(outer.backend, "bm25_topk", None)
                    if bm25 is None:
                        return self._json(400)
                    try:
                        with outer._backend_lock:
                            hits = bm25(
                                query, k=(page + 1) * size, mode=mode
                            )
                            # true candidate count (docs holding any query
                            # term — the same set bm25 scores), NOT the
                            # retrieved-k length, so totalCount agrees
                            # with the tfidf branch and is page-stable
                            th = getattr(outer.backend, "total_hits", None)
                            total = th(query) if th is not None else len(hits)
                    except ValueError:  # boolean/phrase query
                        return self._json(400)
                    pg = hits[page * size : (page + 1) * size]
                    return self._json(
                        200,
                        {
                            "results": [
                                {"docId": d, "score": s} for d, s in pg
                            ],
                            "totalCount": total,
                            "scorer": "bm25",
                        },
                    )
                with outer._backend_lock:
                    out = outer.backend.search(query, page=page, size=size)
                body = {
                    "results": [
                        {
                            "url": r["url"],
                            "title": r["title"],
                            "score": r["score"],
                            "snippet": r["snippet"],
                        }
                        for r in out["results"]
                    ],
                    "totalCount": out["total_count"],
                }
                # extras: zero-hit queries get a "did you mean" built
                # from edit-distance-1 vocabulary corrections
                if out["total_count"] == 0:
                    correct = getattr(
                        outer.backend, "suggest_correction", None
                    )
                    if correct is not None:
                        with outer._backend_lock:
                            fixes = correct(query)
                        if fixes:
                            import re as _re

                            fixed = query
                            for orig, corr in fixes.items():
                                fixed = _re.sub(
                                    rf"\b{_re.escape(orig)}\b",
                                    corr,
                                    fixed,
                                    flags=_re.IGNORECASE,
                                )
                            body["didYouMean"] = fixed
                return self._json(200, body)

            def _page(self) -> None:
                with open(_WEBUI_PATH, "rb") as f:
                    body = f.read()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _suggestions(self, qs) -> None:
                q = (qs.get("q") or [""])[0]
                if not q.strip():
                    return self._json(400)
                with outer._backend_lock:
                    out = outer.backend.suggest(q)
                return self._json(200, out)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address
        self._thread: threading.Thread | None = None

    def start(self) -> "SearchHTTPServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def serve(index_dir: str, host: str = "127.0.0.1", port: int = 8080):
    """Blocking entry point (CLI ``serve`` command)."""
    from .engine import QueryEngine

    server = SearchHTTPServer(QueryEngine(index_dir), host=host, port=port)
    print(f"serving {index_dir} on http://{server.host}:{server.port}/api/search")
    try:
        server._httpd.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
