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


def read_http_json(url: str, timeout: float = 30.0):
    """`http` (curl) load analog: GET a JSON document (object → one row,
    array → one row per element) into a Dataset. Driver-side fetch —
    fan-out per-URL fetching belongs in map_batches over a URL column."""
    import json
    import urllib.request

    import ray.data

    with urllib.request.urlopen(url, timeout=timeout) as r:
        doc = json.loads(r.read())
    rows = doc if isinstance(doc, list) else [doc]
    return ray.data.from_items(rows)
