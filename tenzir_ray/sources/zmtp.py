"""Minimal ZMTP 3.0 wire protocol (the ZeroMQ transport) over stdlib
sockets — PUSH/PULL and PUB/SUB, NULL security mechanism.

The reference's ``zmq`` connector (plugins/zmq) wraps libzmq; the
sandbox has no pyzmq, so this implements the PUBLIC wire spec
(https://rfc.zeromq.org/spec/23/ — ZMTP 3.0) directly, the same
discipline as the stdlib MMDB reader (sources/mmdb.py):

- 64-octet greeting: signature ``FF 8*00 7F``, version 3.0, mechanism
  "NULL" (20 octets, null-padded), as-server octet, 31-octet filler;
- READY command handshake carrying the ``Socket-Type`` property;
- frames: flags octet (bit 0 MORE, bit 1 LONG, bit 2 COMMAND), then a
  1-octet size (short) or 8-octet network-order size (LONG), then body;
- SUB subscriptions as 3.0-style messages: ``0x01 + topic`` subscribe,
  ``0x00 + topic`` cancel; a PUB socket forwards a message when ANY
  subscription is a prefix of its first frame.

Interop note: framing and handshake follow the RFC and are exercised
end-to-end against this module's own peer in tests (PUSH→PULL
multipart, PUB→SUB topic filtering, >255-byte LONG frames); a real
libzmq endpoint has not been reachable from this environment.
"""

from __future__ import annotations

import socket
import struct
import threading

_SIGNATURE = b"\xff" + b"\x00" * 8 + b"\x7f"
_VERSION = bytes([3, 0])
_MECH = b"NULL" + b"\x00" * 16
_FILLER = b"\x00" * 31

_FLAG_MORE = 0x01
_FLAG_LONG = 0x02
_FLAG_COMMAND = 0x04

_VALID_TYPES = {"PUSH", "PULL", "PUB", "SUB", "PAIR"}
#: socket types each type may talk to (spec 23, socket compatibility)
_COMPAT = {
    "PUSH": {"PULL"}, "PULL": {"PUSH"},
    "PUB": {"SUB"}, "SUB": {"PUB"},
    "PAIR": {"PAIR"},
}


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed during ZMTP exchange")
        buf += chunk
    return buf


def _send_frame(sock: socket.socket, body: bytes, more: bool = False,
                command: bool = False) -> None:
    flags = (_FLAG_MORE if more else 0) | (_FLAG_COMMAND if command else 0)
    if len(body) > 255:
        sock.sendall(bytes([flags | _FLAG_LONG])
                     + struct.pack(">Q", len(body)) + body)
    else:
        sock.sendall(bytes([flags, len(body)]) + body)


def _recv_frame(sock: socket.socket) -> tuple[int, bytes]:
    flags = _recv_exact(sock, 1)[0]
    if flags & _FLAG_LONG:
        (size,) = struct.unpack(">Q", _recv_exact(sock, 8))
    else:
        size = _recv_exact(sock, 1)[0]
    return flags, _recv_exact(sock, size)


def _ready_command(socket_type: str) -> bytes:
    name = b"READY"
    prop_name = b"Socket-Type"
    val = socket_type.encode()
    return (bytes([len(name)]) + name
            + bytes([len(prop_name)]) + prop_name
            + struct.pack(">I", len(val)) + val)


def _parse_ready(body: bytes) -> dict[str, bytes]:
    nlen = body[0]
    name = body[1:1 + nlen]
    if name != b"READY":
        raise ConnectionError(f"expected READY, got {name!r}")
    props: dict[str, bytes] = {}
    i = 1 + nlen
    while i < len(body):
        pn = body[i]
        pname = body[i + 1:i + 1 + pn].decode()
        i += 1 + pn
        (vlen,) = struct.unpack(">I", body[i:i + 4])
        props[pname] = body[i + 4:i + 4 + vlen]
        i += 4 + vlen
    return props


class ZmtpSocket:
    """One ZMTP peer connection (after greeting + READY handshake)."""

    def __init__(self, sock: socket.socket, socket_type: str,
                 as_server: bool):
        if socket_type not in _VALID_TYPES:
            raise ValueError(f"unknown socket type {socket_type!r}")
        self.sock = sock
        self.socket_type = socket_type
        self.subscriptions: list[bytes] = []  # PUB side: peer's topics
        self._lock = threading.Lock()
        # greeting (both directions; NULL mechanism)
        sock.sendall(_SIGNATURE + _VERSION + _MECH
                     + bytes([1 if as_server else 0]) + _FILLER)
        sig = _recv_exact(sock, 10)
        if sig[0] != 0xFF or sig[9] != 0x7F:
            raise ConnectionError("bad ZMTP signature")
        major = _recv_exact(sock, 1)[0]
        if major < 3:
            raise ConnectionError(f"peer ZMTP major {major} < 3")
        _recv_exact(sock, 1)  # minor
        mech = _recv_exact(sock, 20)
        if mech.rstrip(b"\x00") != b"NULL":
            raise ConnectionError(f"unsupported mechanism {mech!r}")
        _recv_exact(sock, 1 + 31)  # as-server + filler
        # READY handshake
        _send_frame(sock, _ready_command(socket_type), command=True)
        flags, body = _recv_frame(sock)
        if not flags & _FLAG_COMMAND:
            raise ConnectionError("expected READY command frame")
        props = _parse_ready(body)
        peer_type = props.get("Socket-Type", b"").decode()
        if peer_type and peer_type not in _COMPAT[socket_type]:
            raise ConnectionError(
                f"{socket_type} cannot talk to {peer_type}")

    # -- data plane ------------------------------------------------------
    def send_multipart(self, frames: list[bytes]) -> None:
        with self._lock:
            for f in frames[:-1]:
                _send_frame(self.sock, f, more=True)
            _send_frame(self.sock, frames[-1])

    def send(self, data: bytes) -> None:
        self.send_multipart([data])

    def recv_multipart(self) -> list[bytes]:
        frames: list[bytes] = []
        while True:
            flags, body = _recv_frame(self.sock)
            if flags & _FLAG_COMMAND:
                continue  # ignore heartbeats etc.
            frames.append(body)
            if not flags & _FLAG_MORE:
                return frames

    # -- SUB/PUB ----------------------------------------------------------
    def subscribe(self, topic: bytes = b"") -> None:
        if self.socket_type != "SUB":
            raise ValueError("subscribe() is a SUB operation")
        _send_frame(self.sock, b"\x01" + topic)

    def unsubscribe(self, topic: bytes = b"") -> None:
        if self.socket_type != "SUB":
            raise ValueError("unsubscribe() is a SUB operation")
        _send_frame(self.sock, b"\x00" + topic)

    def poll_subscriptions(self, timeout: float = 0.2) -> None:
        """PUB side: drain pending subscribe/cancel messages."""
        self.sock.settimeout(timeout)
        try:
            while True:
                flags, body = _recv_frame(self.sock)
                if flags & _FLAG_COMMAND or not body:
                    continue
                topic = body[1:]
                if body[0] == 1:
                    self.subscriptions.append(topic)
                elif body[0] == 0 and topic in self.subscriptions:
                    self.subscriptions.remove(topic)
        except (socket.timeout, TimeoutError):
            pass
        finally:
            self.sock.settimeout(None)

    def publish(self, frames: list[bytes]) -> bool:
        """PUB send with prefix filtering against the peer's
        subscriptions; returns whether the message was forwarded."""
        if self.socket_type != "PUB":
            raise ValueError("publish() is a PUB operation")
        if not any(frames[0].startswith(t) for t in self.subscriptions):
            return False
        self.send_multipart(frames)
        return True

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def zmq_connect(endpoint: str, socket_type: str,
                timeout: float = 10.0) -> ZmtpSocket:
    """``tcp://host:port`` client side."""
    host, port = _parse_tcp(endpoint)
    s = socket.create_connection((host, port), timeout=timeout)
    s.settimeout(None)
    return ZmtpSocket(s, socket_type, as_server=False)


class ZmqListener:
    """``tcp://host:port`` bind side; ``accept()`` yields peers."""

    def __init__(self, endpoint: str, socket_type: str):
        host, port = _parse_tcp(endpoint)
        self.socket_type = socket_type
        self.server = socket.socket()
        self.server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.server.bind((host, port))
        self.server.listen(8)
        self.port = self.server.getsockname()[1]

    def accept(self, timeout: float | None = None) -> ZmtpSocket:
        self.server.settimeout(timeout)
        conn, _ = self.server.accept()
        return ZmtpSocket(conn, self.socket_type, as_server=True)

    def close(self) -> None:
        self.server.close()


def _parse_tcp(endpoint: str) -> tuple[str, int]:
    if not endpoint.startswith("tcp://"):
        raise ValueError(f"only tcp:// endpoints supported, got {endpoint!r}")
    hostport = endpoint[6:]
    host, _, port = hostport.rpartition(":")
    return host or "127.0.0.1", int(port)


# ---------------------------------------------------------------------------
# Dataset glue (the connector surface, TcpLineListener-style)


def read_zmq_pull(endpoint: str, max_messages: int,
                  timeout: float = 30.0):
    """Bind a PULL socket, drain ``max_messages`` single-frame messages,
    return them as a one-column Dataset (driver-side accept loop, like
    the tcp/udp listeners — parse downstream with parse_ndjson etc.)."""
    import pyarrow as pa
    import ray.data

    listener = ZmqListener(endpoint, "PULL")
    msgs: list[bytes] = []
    try:
        peer = listener.accept(timeout=timeout)
        # the timeout also bounds each recv — a producer that pushes
        # fewer than max_messages then idles (or disconnects) must not
        # hang the driver or lose what was already drained
        peer.sock.settimeout(timeout)
        while len(msgs) < max_messages:
            try:
                msgs.append(b"".join(peer.recv_multipart()))
            except (socket.timeout, TimeoutError, ConnectionError, OSError):
                break
        peer.close()
    finally:
        listener.close()
    return ray.data.from_arrow(
        pa.table({"data": pa.array(msgs, pa.binary())}))


def write_zmq_push(ds, endpoint: str, column: str = "data",
                   timeout: float = 10.0) -> int:
    """Connect a PUSH socket and send one message per row (driver-side
    drain — a bounded alert/export sink, like write_email)."""
    peer = zmq_connect(endpoint, "PUSH", timeout=timeout)
    n = 0
    try:
        for batch in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=4096):
            for v in batch.column(column):
                raw = v.as_py()
                if raw is None:
                    continue
                peer.send(raw.encode() if isinstance(raw, str) else raw)
                n += 1
    finally:
        peer.close()
    return n
