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
        self._iter = iter(
            ds.iter_batches(batch_size=page_size, batch_format="pyarrow")
        )
        self._pages: dict[int, pa.Table] = {}
        self._next = 0
        self._done = False
        self._max_cached = max_cached_pages

    def get(self, token: int | None) -> tuple[pa.Table | None, int | None]:
        """Return (page, next_token); next_token None ⇒ stream exhausted.
        Passing a previously returned token re-serves that page.

        Raises :class:`TokenExpiredError` when the token's page was
        already evicted from the bounded replay cache — silently
        advancing past lost data would be invisible data loss for an
        at-least-once client that fell behind."""
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
