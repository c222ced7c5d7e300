"""URL parsing + canonicalization stages for web-corpus pipelines.

Training-data ingest over crawled corpora needs per-URL structure
(host / registered-domain grouping, path routing) and a canonical form
for URL-level dedup. Both stages are single-regex vectorized pandas
passes (the RFC 3986 appendix-B split regex — one C-level pass per
batch, no per-row Python parser), so they run as plain ``map_batches``
functions.

Reference parity note: the reference has no URL operators — this module
is part of the engine's training-data extension surface (SURVEY.md §2
extensions), like stages/text.py.
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pandas as pd

from tenzir_ray._ship import ship_by_value

# RFC 3986 appendix B, split into scheme / authority / path / query /
# fragment. Applied with pandas .str.extract → one vectorized pass.
_URL_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$")
# authority = [userinfo@]host[:port]; host may be a bracketed IPv6 literal
_AUTH_RE = re.compile(r"^(?:([^@]*)@)?(\[[^\]]*\]|[^:]*)(?::(\d*))?$")

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443",
                  "ftp": "21"}
# tracking parameters dropped by canonical_url; the lookahead pins the
# parameter-name END so fbclid2=... / gclid_src=... are NOT stripped
_TRACKING_RE = re.compile(
    r"(^|&)(?:utm_[^&=]*|fbclid|gclid)(?:=[^&]*)?(?=&|$)")


def _split(urls: pd.Series) -> pd.DataFrame:
    parts = urls.astype("string").str.extract(_URL_RE)
    parts.columns = ["scheme", "authority", "path", "query", "fragment"]
    auth = parts["authority"].str.extract(_AUTH_RE)
    auth.columns = ["userinfo", "host", "port"]
    return pd.concat([parts, auth], axis=1)


def _obj(s: pd.Series) -> np.ndarray:
    """String-dtype series → object ndarray with None (not pd.NA) for
    nulls — pd.NA leaks "<NA>" into downstream string compares."""
    return s.astype(object).where(s.notna(), None).to_numpy(dtype=object)


def parse_url(ds, column: str = "url", prefix: str = "url_",
              batch_size: int = 16384):
    """Split a URL column into ``<prefix>scheme / host / port / path /
    query / fragment`` columns (RFC 3986 component split; absent
    components are null, port is nullable int64). Null input rows yield
    all-null components."""

    def _parse(df: pd.DataFrame):
        import pyarrow as pa

        p = _split(df[column])
        df[prefix + "scheme"] = _obj(p["scheme"])
        df[prefix + "host"] = _obj(p["host"])
        port = pd.to_numeric(p["port"], errors="coerce")
        # out-of-range ports (junk crawl URLs) become null, not an
        # int64 wraparound
        port = port.where((port >= 0) & (port <= 65535))
        df[prefix + "port"] = port.astype("Int64")
        # a present-but-empty path is null-distinct from absent ("" vs null
        # would hash apart) — normalize both to null
        for comp in ("path", "query", "fragment"):
            v = p[comp]
            df[prefix + comp] = _obj(v.where(v.notna() & (v != "")))
        # emit Arrow blocks so the nullable port is a canonical
        # int64-with-nulls column; strip the pandas schema metadata or
        # to_pandas() faithfully restores the Int64 extension dtype
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(_parse, batch_format="pandas",
                          batch_size=batch_size)


def canonical_url(ds, column: str = "url", out: str = "canonical_url",
                  batch_size: int = 16384):
    """Canonical URL for exact URL-level dedup: lowercase scheme + host,
    strip default ports (http:80 / https:443 / ...), drop the fragment,
    drop tracking query params (``utm_*`` / ``fbclid`` / ``gclid``;
    remaining params keep their order), empty path becomes ``/`` when an
    authority is present. Purely syntactic — no network, no IDNA."""

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        p = _split(df[column])
        scheme = p["scheme"].str.lower()
        host = p["host"].str.lower()
        port = p["port"]
        # strip the scheme's default port and empty ":" leftovers; an
        # unknown scheme has no default (fillna keeps the comparison
        # boolean — a pd.NA there makes np.where raise on e.g.
        # rtsp://h:554/p) and its explicit port is always kept
        default = scheme.map(_DEFAULT_PORTS).fillna("")
        keep_port = (port.notna() & (port != "") & (port != default))
        keep_port = keep_port.fillna(False).astype(bool)
        q = (p["query"].fillna("")
             .str.replace(_TRACKING_RE, "", regex=True)
             .str.replace(r"^&", "", regex=True))
        path = p["path"].fillna("")
        has_auth = p["authority"].notna()
        path = path.where(~(has_auth & (path == "")), "/")
        parts = [
            scheme.fillna("") + np.where(scheme.notna(), ":", ""),
            np.where(has_auth, "//", ""),
            np.where(p["userinfo"].notna(),
                     p["userinfo"].fillna("") + "@", ""),
            host.fillna(""),
            np.where(keep_port, ":" + port.fillna(""), ""),
            path,
            np.where(q != "", "?", ""),
            q,
        ]
        canon = parts[0]
        for piece in parts[1:]:
            canon = canon + piece
        df[out] = _obj(canon.where(df[column].notna()))
        # Arrow out: a pandas pass-through block would re-wrap nullable
        # int columns from upstream (e.g. parse_url's port) as pandas
        # Int64 extension dtype — keep the canonical Arrow types instead
        import pyarrow as pa

        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(_canon, batch_format="pandas",
                          batch_size=batch_size)


def url_decode(ds, column: str, out: "str | None" = None,
               plus_as_space: bool = False, batch_size: int = 16384):
    """Percent-decode a string column (``%41`` → ``A``; invalid escapes
    pass through untouched, errors='replace' for invalid UTF-8 —
    crawled data never raises). ``plus_as_space`` applies the
    form-encoding convention (``+`` → space) first."""
    from urllib.parse import unquote, unquote_plus

    fn = unquote_plus if plus_as_space else unquote
    out = out or column

    def _dec(df: pd.DataFrame) -> pd.DataFrame:
        df[out] = [
            fn(s, errors="replace") if isinstance(s, str) else None
            for s in df[column].to_numpy(dtype=object)
        ]
        return df

    return ds.map_batches(_dec, batch_format="pandas",
                          batch_size=batch_size)


def url_encode(ds, column: str, out: "str | None" = None,
               safe: str = "/", batch_size: int = 16384):
    """Percent-encode a string column (RFC 3986 unreserved chars kept;
    ``safe`` adds bytes to keep verbatim, path-slash by default)."""
    from urllib.parse import quote

    out = out or column

    def _enc(df: pd.DataFrame) -> pd.DataFrame:
        df[out] = [
            quote(s, safe=safe) if isinstance(s, str) else None
            for s in df[column].to_numpy(dtype=object)
        ]
        return df

    return ds.map_batches(_enc, batch_format="pandas",
                          batch_size=batch_size)


def url_host(ds, column: str = "url", out: str = "host",
             batch_size: int = 16384):
    """Just the lowercased host — the usual per-site grouping key."""

    def _host(df: pd.DataFrame) -> pd.DataFrame:
        p = _split(df[column])
        df[out] = _obj(p["host"].str.lower())
        return df

    return ds.map_batches(_host, batch_format="pandas",
                          batch_size=batch_size)


ship_by_value(sys.modules[__name__])
