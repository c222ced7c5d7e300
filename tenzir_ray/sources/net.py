"""Network connectors (reference connectors/tcp.cpp,
operators/tcp-listen.cpp, connectors/udp.cpp, connectors/curl.cpp):
byte-stream sources/sinks are DRIVER-side generators/helpers — sockets
are outside the Dataset model (SURVEY §2.1), so the driver owns the
accept/read loop and feeds the yielded batches into pipelines (parsers,
`ray.data.from_items`, `LakeTable.apply_changes` epochs).

All implementations are stdlib-only and loopback-tested in this sandbox;
on a real deployment they bind whatever interface you pass.
"""

from __future__ import annotations

import socket
import socketserver
import threading


class TcpLineListener:
    """`tcp-listen` analog: accept connections, split received bytes on
    newlines, buffer complete lines. ``drain()`` returns-and-clears the
    buffered lines; ``stop()`` shuts the server down.

    >>> srv = TcpLineListener(); port = srv.start()
    >>> ... clients connect and send ...
    >>> lines = srv.drain()
    """

    def __init__(self, host: str = "127.0.0.1"):
        self.host = host
        self._lines: list[str] = []
        self._lock = threading.Lock()
        self._server = None

    def start(self, port: int = 0) -> int:
        outer = self

        class _Handler(socketserver.StreamRequestHandler):
            def handle(self):
                buf = b""
                while True:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        break
                    buf += chunk
                    lines = buf.split(b"\n")
                    buf = lines.pop()
                    if lines:
                        with outer._lock:
                            outer._lines.extend(
                                x.decode("utf-8", errors="replace") for x in lines
                            )
                if buf:
                    with outer._lock:
                        outer._lines.append(buf.decode("utf-8", errors="replace"))

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((self.host, port), _Handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self._server.server_address[1]

    def drain(self) -> list[str]:
        with self._lock:
            out, self._lines = self._lines, []
        return out

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


class UdpListener:
    """`udp` analog: one buffered string per received datagram."""

    def __init__(self, host: str = "127.0.0.1"):
        self.host = host
        self._msgs: list[str] = []
        self._lock = threading.Lock()
        self._sock = None
        self._thread = None
        self._stop = threading.Event()

    def start(self, port: int = 0) -> int:
        self._stop.clear()  # allow stop() → start() restarts
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((self.host, port))
        self._sock.settimeout(0.2)

        def _loop():
            while not self._stop.is_set():
                try:
                    data, _addr = self._sock.recvfrom(65536)
                except socket.timeout:
                    continue
                except OSError:
                    break
                with self._lock:
                    self._msgs.append(data.decode("utf-8", errors="replace"))

        self._thread = threading.Thread(target=_loop, daemon=True)
        self._thread.start()
        return self._sock.getsockname()[1]

    def drain(self) -> list[str]:
        with self._lock:
            out, self._msgs = self._msgs, []
        return out

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1)
        if self._sock is not None:
            self._sock.close()
            self._sock = None


def send_lines_tcp(lines, host: str, port: int) -> int:
    """`tcp` save-side analog: newline-join and send; returns bytes sent."""
    blob = ("\n".join(lines) + "\n").encode()
    with socket.create_connection((host, port), timeout=10) as s:
        s.sendall(blob)
    return len(blob)


def send_datagrams_udp(messages, host: str, port: int) -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        for m in messages:
            s.sendto(m.encode(), (host, port))
    finally:
        s.close()
    return len(messages)


def _auth_header(auth) -> dict[str, str]:
    """``("user", "pass")`` → Basic, ``"token"`` → Bearer, dict → as-is."""
    if auth is None:
        return {}
    if isinstance(auth, dict):
        return dict(auth)
    if isinstance(auth, (tuple, list)) and len(auth) == 2:
        import base64

        cred = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
        return {"Authorization": f"Basic {cred}"}
    return {"Authorization": f"Bearer {auth}"}


def http_request(
    url: str,
    method: str = "GET",
    data: bytes | None = None,
    json_body=None,
    headers: dict[str, str] | None = None,
    auth=None,
    timeout: float = 30.0,
) -> tuple[int, dict[str, str], bytes]:
    """One HTTP exchange (the curl.cpp primitive: method + body + headers
    + auth, reference connectors/curl.cpp:1-385). Returns
    ``(status, response_headers, body)``; raises on transport errors,
    returns 4xx/5xx statuses instead of raising."""
    import json as _json
    import urllib.error
    import urllib.request

    hdrs = {**(headers or {}), **_auth_header(auth)}
    if json_body is not None:
        data = _json.dumps(json_body).encode()
        hdrs.setdefault("Content-Type", "application/json")
    req = urllib.request.Request(url, data=data, headers=hdrs,
                                 method=method.upper())
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _jpath(doc, path: str | None):
    """Dotted-path lookup into nested dicts (``"data.items"``); None/''
    → the document itself; missing key → None."""
    if not path:
        return doc
    for part in path.split("."):
        if not isinstance(doc, dict) or part not in doc:
            return None
        doc = doc[part]
    return doc


def read_http_json(
    url: str,
    timeout: float = 30.0,
    *,
    method: str = "GET",
    data: bytes | None = None,
    json_body=None,
    headers: dict[str, str] | None = None,
    auth=None,
    items_path: str | None = None,
    paginate: dict | None = None,
    max_pages: int = 1000,
):
    """`http` (curl) load analog with the reference connector's breadth:
    any method, request body, headers, basic/bearer auth, and the three
    common pagination styles. Rows come from ``items_path`` (dotted path
    into the response, e.g. ``"data.items"``) or the root list/object.

    ``paginate`` selects the style:

    - ``{"kind": "next_url", "path": "next"}`` — each page carries the
      full next-page URL at ``path`` (null/absent → done);
    - ``{"kind": "token_param", "param": "cursor", "path": "next_token"}``
      — pass the token from ``path`` back as query param (GET) / body
      field (POST with ``json_body``);
    - ``{"kind": "page_param", "param": "page", "start": 1}`` — count
      pages upward until one returns no rows.

    Driver-side fetch by design — a paginated API walk is inherently
    sequential; fan-out over MANY independent urls belongs in
    ``map_batches`` over a url column (each actor calls
    :func:`http_request`)."""
    import urllib.parse

    import ray.data

    def _fetch(u: str, body=json_body):
        status, _h, raw = http_request(
            u, method=method, data=data, json_body=body,
            headers=headers, auth=auth, timeout=timeout,
        )
        if status >= 400:
            raise IOError(f"HTTP {status} from {u}: {raw[:200]!r}")
        import json as _json

        return _json.loads(raw)

    def _rows(doc) -> list:
        part = _jpath(doc, items_path)
        if part is None:
            return []
        return part if isinstance(part, list) else [part]

    rows: list = []
    if paginate is None:
        rows = _rows(_fetch(url))
    elif paginate["kind"] == "next_url":
        u = url
        for _ in range(max_pages):
            doc = _fetch(u)
            rows.extend(_rows(doc))
            u = _jpath(doc, paginate.get("path", "next"))
            if not u:
                break
    elif paginate["kind"] == "token_param":
        param = paginate.get("param", "token")
        tok = paginate.get("start")
        for _ in range(max_pages):
            if method.upper() == "GET" or json_body is None:
                sep = "&" if "?" in url else "?"
                u = url if tok is None else (
                    f"{url}{sep}{param}={urllib.parse.quote(str(tok))}"
                )
                doc = _fetch(u)
            else:
                body = dict(json_body)
                if tok is not None:
                    body[param] = tok
                doc = _fetch(url, body=body)
            rows.extend(_rows(doc))
            tok = _jpath(doc, paginate.get("path", "next_token"))
            if tok is None:
                break
    elif paginate["kind"] == "page_param":
        param = paginate.get("param", "page")
        page = paginate.get("start", 1)
        for _ in range(max_pages):
            sep = "&" if "?" in url else "?"
            got = _rows(_fetch(f"{url}{sep}{param}={page}"))
            if not got:
                break
            rows.extend(got)
            page += 1
    else:
        raise ValueError(f"unknown paginate kind {paginate['kind']!r}")
    if not rows:
        import pyarrow as pa

        return ray.data.from_arrow(pa.table({}))
    return ray.data.from_items(rows)


class _HttpPoster:
    """Actor-pool batch poster for :func:`write_http` — one request per
    batch, body NDJSON or a JSON array. Runs ON WORKERS: at scale each
    node posts its own blocks; the driver never funnels the data."""

    def __init__(self, url: str, method: str, headers, auth, fmt: str,
                 timeout: float):
        self.url = url
        self.method = method
        self.headers = {"Content-Type": "application/x-ndjson"
                        if fmt == "ndjson" else "application/json",
                        **(headers or {}), **_auth_header(auth)}
        self.fmt = fmt
        self.timeout = timeout

    def __call__(self, batch):
        import pandas as pd
        import pyarrow as pa

        df = batch.to_pandas()
        payload = df.to_json(orient="records", lines=(self.fmt == "ndjson"),
                             date_format="iso")
        status, _h, _b = http_request(
            self.url, method=self.method, data=payload.encode(),
            headers=self.headers, timeout=self.timeout,
        )
        if status >= 400:
            raise IOError(f"write_http: HTTP {status} posting batch")
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64()),
                         "status": pa.array([status], pa.int64())})


def write_http(ds, url: str, *, method: str = "POST",
               headers: dict[str, str] | None = None, auth=None,
               format: str = "ndjson", batch_size: int = 4096,
               concurrency=(1, 4), timeout: float = 30.0) -> dict:
    """`http` save analog (curl.cpp save side): POST/PUT the dataset to
    an endpoint, one request per batch, from the workers. Returns
    ``{"rows": total, "requests": n}``."""
    stats = ds.map_batches(
        _HttpPoster,
        fn_constructor_args=(url, method, headers, auth, format, timeout),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).to_pandas()
    return {"rows": int(stats["rows"].sum()) if len(stats) else 0,
            "requests": int(len(stats))}


import sys as _sys

from tenzir_ray._ship import ship_by_value as _ship

_ship(_sys.modules[__name__])
