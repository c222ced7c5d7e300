"""`serve` — buffer pipeline results for paged retrieval with
continuation tokens (reference builtins/operators/serve.cpp:39-230: a
pipeline ending in `serve <id>` buffers slices; HTTP clients long-poll
with continuation tokens).

Driver-side component: wraps ``ds.iter_batches`` (streaming, with
backpressure) and caches served pages so a token can be re-fetched
(at-least-once client semantics). Plug into any HTTP framework by
exposing ``get(token)``.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa


class TokenExpiredError(LookupError):
    """The requested page was evicted from the bounded replay cache."""


class Server:
    """Paged access to a Dataset's rows.

    >>> srv = Server(ds, page_size=1000)
    >>> page, next_token = srv.get(None)   # first page
    >>> page2, t2 = srv.get(next_token)
    ... until next_token is None
    """

    def __init__(self, ds, page_size: int = 1000, max_cached_pages: int = 64):
        import threading

        self._iter = iter(
            ds.iter_batches(batch_size=page_size, batch_format="pyarrow")
        )
        self._pages: dict[int, pa.Table] = {}
        self._next = 0
        self._done = False
        self._max_cached = max_cached_pages
        # HttpServer serves from a ThreadingHTTPServer: concurrent gets
        # must not race the underlying iterator
        self._lock = threading.Lock()

    def get(self, token: int | None) -> tuple[pa.Table | None, int | None]:
        """Return (page, next_token); next_token None ⇒ stream exhausted.
        Passing a previously returned token re-serves that page.

        Raises :class:`TokenExpiredError` when the token's page was
        already evicted from the bounded replay cache — silently
        advancing past lost data would be invisible data loss for an
        at-least-once client that fell behind."""
        with self._lock:
            return self._get_locked(token)

    def _get_locked(self, token: int | None) -> tuple[pa.Table | None, int | None]:
        token = 0 if token is None else int(token)
        while token >= self._next and not self._done:
            try:
                batch = next(self._iter)
            except StopIteration:
                self._done = True
                break
            self._pages[self._next] = batch
            self._next += 1
            # bound the replay cache
            if len(self._pages) > self._max_cached:
                self._pages.pop(min(self._pages), None)
        page = self._pages.get(token)
        if page is None:
            if token >= self._next:
                return None, None  # past the end of the stream
            raise TokenExpiredError(
                f"page {token} was evicted from the replay cache "
                f"(oldest cached: {min(self._pages, default=self._next)}); "
                "increase max_cached_pages or consume pages in order"
            )
        next_token: int | None = token + 1
        if token + 1 >= self._next and self._done:
            next_token = None
        return page, next_token


def serve(ds, page_size: int = 1000) -> Server:
    return Server(ds, page_size=page_size)


class HttpServer:
    """REST surface over :class:`Server` (reference
    builtins/operators/serve.cpp:39-230 — `POST /serve` long-polling with
    continuation tokens, here over Python's stdlib http.server):

    ``GET /serve/<id>?token=N`` →
    ``{"rows": [...], "next_token": N+1 | null}``; 404 unknown id, 410
    (gone) for an evicted token. Runs on a daemon thread; localhost only.

    >>> hs = HttpServer({"q1": server}); port = hs.start()
    >>> requests.get(f"http://127.0.0.1:{port}/serve/q1")
    """

    def __init__(self, servers: dict[str, Server]):
        self.servers = servers
        self._httpd = None

    def start(self, port: int = 0) -> int:
        import http.server
        import json
        import threading
        from urllib.parse import parse_qs, urlparse

        servers = self.servers

        class _Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                parts = [p for p in u.path.split("/") if p]
                if len(parts) != 2 or parts[0] != "serve":
                    self.send_error(404)
                    return
                srv = servers.get(parts[1])
                if srv is None:
                    self.send_error(404)
                    return
                q = parse_qs(u.query)
                token = int(q["token"][0]) if "token" in q else None
                try:
                    page, nxt = srv.get(token)
                except TokenExpiredError:
                    self.send_error(410, "token expired")
                    return
                body = json.dumps(
                    {
                        "rows": page.to_pylist() if page is not None else [],
                        "next_token": nxt,
                    },
                    default=str,
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", port), _Handler)
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


def openapi(server_ids: "list[str] | None" = None) -> dict:
    """OpenAPI 3 document for the serve surface (reference
    operators/openapi.cpp dumps the node API spec; serve.cpp:39-130
    carries the original /serve schema)."""
    return {
        "openapi": "3.0.0",
        "info": {"title": "tenzir_ray serve API", "version": "1"},
        "paths": {
            "/serve/{id}": {
                "get": {
                    "summary": "Fetch one result page by continuation token",
                    "parameters": [
                        {"name": "id", "in": "path", "required": True,
                         "schema": {"type": "string"},
                         **({"description": f"one of {server_ids}"}
                            if server_ids else {})},
                        {"name": "token", "in": "query", "required": False,
                         "schema": {"type": "integer"}},
                    ],
                    "responses": {
                        "200": {
                            "description": "a page of rows + next token",
                            "content": {"application/json": {"schema": {
                                "type": "object",
                                "properties": {
                                    "rows": {"type": "array",
                                             "items": {"type": "object"}},
                                    "next_token": {"type": "integer",
                                                   "nullable": True},
                                },
                            }}},
                        },
                        "404": {"description": "unknown serve id"},
                        "410": {"description": "token expired (page evicted)"},
                    },
                }
            }
        },
    }


def openapi_dataset(server_ids: "list[str] | None" = None):
    """The spec as a one-row Dataset (the reference `openapi` operator
    emits it as an event)."""
    import json

    import ray.data

    return ray.data.from_items([{"spec": json.dumps(openapi(server_ids))}])
