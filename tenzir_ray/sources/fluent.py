"""Fluentd/fluent-bit Forward protocol over stdlib sockets, with a
pure-Python MessagePack subset.

The reference's fluent-bit plugin spawns the fluent-bit binary and
bridges events over MessagePack (its only published benchmark is this
bridge: web/blog/switching-fluentbit-from-json-to-msgpack — 150 k
events/s vs 50 k over JSON). No binary or msgpack library exists in
this sandbox, so this implements the PUBLIC specs directly:

- MessagePack (msgpack.org spec): nil/bool/int (all widths)/float64/
  str/bin/array/map + the fluentd EventTime ext type (0x00, 8 bytes
  seconds+nanoseconds) — encoder and decoder;
- Fluentd Forward protocol (github.com/fluent/fluentd/wiki/Forward-
  Protocol-Specification-v1): Message mode ``[tag, time, record]``,
  Forward mode ``[tag, [[time, record], ...]]`` and PackedForward
  (entries as a concatenated msgpack binary), optional chunk ``ack``.

``read_fluent_forward`` binds a TCP listener (what fluent-bit's
``out_forward`` connects to), drains events and returns a Dataset of
``(tag, time, record_json)`` rows; ``write_fluent_forward`` is the
client half (used by the loopback tests, and usable as a sink toward a
real fluentd). Both ends are exercised against each other in
tests/test_round4_ops.py across all three transport modes; a real
fluent-bit binary has not been runnable in this environment.
"""

from __future__ import annotations

import io
import json
import socket
import struct

# ---------------------------------------------------------------------------
# MessagePack subset


def pack(obj) -> bytes:
    out = io.BytesIO()
    _pack_into(out, obj)
    return out.getvalue()


def _pack_into(out: io.BytesIO, o) -> None:
    if o is None:
        out.write(b"\xc0")
    elif o is True:
        out.write(b"\xc3")
    elif o is False:
        out.write(b"\xc2")
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.write(bytes([o]))
        elif -32 <= o < 0:
            out.write(struct.pack("b", o))
        elif 0 <= o <= 0xFF:
            out.write(b"\xcc" + bytes([o]))
        elif 0 <= o <= 0xFFFF:
            out.write(b"\xcd" + struct.pack(">H", o))
        elif 0 <= o <= 0xFFFFFFFF:
            out.write(b"\xce" + struct.pack(">I", o))
        elif 0 <= o:
            out.write(b"\xcf" + struct.pack(">Q", o))
        elif o >= -(1 << 7):
            out.write(b"\xd0" + struct.pack(">b", o))
        elif o >= -(1 << 15):
            out.write(b"\xd1" + struct.pack(">h", o))
        elif o >= -(1 << 31):
            out.write(b"\xd2" + struct.pack(">i", o))
        else:
            out.write(b"\xd3" + struct.pack(">q", o))
    elif isinstance(o, float):
        out.write(b"\xcb" + struct.pack(">d", o))
    elif isinstance(o, str):
        b = o.encode()
        n = len(b)
        if n <= 31:
            out.write(bytes([0xA0 | n]))
        elif n <= 0xFF:
            out.write(b"\xd9" + bytes([n]))
        elif n <= 0xFFFF:
            out.write(b"\xda" + struct.pack(">H", n))
        else:
            out.write(b"\xdb" + struct.pack(">I", n))
        out.write(b)
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out.write(b"\xc4" + bytes([n]))
        elif n <= 0xFFFF:
            out.write(b"\xc5" + struct.pack(">H", n))
        else:
            out.write(b"\xc6" + struct.pack(">I", n))
        out.write(bytes(o))
    elif isinstance(o, EventTime):
        out.write(b"\xd7\x00" + struct.pack(">II", o.sec, o.nsec))
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.write(bytes([0x90 | n]))
        elif n <= 0xFFFF:
            out.write(b"\xdc" + struct.pack(">H", n))
        else:
            out.write(b"\xdd" + struct.pack(">I", n))
        for v in o:
            _pack_into(out, v)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.write(bytes([0x80 | n]))
        elif n <= 0xFFFF:
            out.write(b"\xde" + struct.pack(">H", n))
        else:
            out.write(b"\xdf" + struct.pack(">I", n))
        for k, v in o.items():
            _pack_into(out, k)
            _pack_into(out, v)
    else:
        raise TypeError(f"msgpack: cannot pack {type(o).__name__}")


class EventTime:
    """fluentd ext type 0: (seconds, nanoseconds)."""

    def __init__(self, sec: int, nsec: int = 0):
        self.sec = int(sec)
        self.nsec = int(nsec)

    def __float__(self):
        return self.sec + self.nsec / 1e9

    def __eq__(self, other):
        return (isinstance(other, EventTime)
                and (self.sec, self.nsec) == (other.sec, other.nsec))

    def __repr__(self):
        return f"EventTime({self.sec}, {self.nsec})"


class _Truncated(ValueError):
    """Incomplete input — retry once more bytes arrive."""


class _Corrupt(ValueError):
    """Malformed/unsupported input — more bytes can never fix it."""


class Unpacker:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0

    def has_more(self) -> bool:
        return self.i < len(self.d)

    def _take(self, n: int) -> bytes:
        b = self.d[self.i:self.i + n]
        if len(b) < n:
            raise _Truncated("msgpack: truncated input")
        self.i += n
        return b

    def unpack(self):
        c = self._take(1)[0]
        if c <= 0x7F:
            return c
        if c >= 0xE0:
            return c - 256
        if 0x80 <= c <= 0x8F:
            return self._map(c & 0x0F)
        if 0x90 <= c <= 0x9F:
            return self._arr(c & 0x0F)
        if 0xA0 <= c <= 0xBF:
            return self._take(c & 0x1F).decode()
        if c == 0xC0:
            return None
        if c == 0xC2:
            return False
        if c == 0xC3:
            return True
        if c == 0xC4:
            return self._take(self._take(1)[0])
        if c == 0xC5:
            return self._take(struct.unpack(">H", self._take(2))[0])
        if c == 0xC6:
            return self._take(struct.unpack(">I", self._take(4))[0])
        if c == 0xCA:
            return struct.unpack(">f", self._take(4))[0]
        if c == 0xCB:
            return struct.unpack(">d", self._take(8))[0]
        if c == 0xCC:
            return self._take(1)[0]
        if c == 0xCD:
            return struct.unpack(">H", self._take(2))[0]
        if c == 0xCE:
            return struct.unpack(">I", self._take(4))[0]
        if c == 0xCF:
            return struct.unpack(">Q", self._take(8))[0]
        if c == 0xD0:
            return struct.unpack(">b", self._take(1))[0]
        if c == 0xD1:
            return struct.unpack(">h", self._take(2))[0]
        if c == 0xD2:
            return struct.unpack(">i", self._take(4))[0]
        if c == 0xD3:
            return struct.unpack(">q", self._take(8))[0]
        if 0xD4 <= c <= 0xD8:  # fixext1/2/4/8/16
            t = self._take(1)[0]
            body = self._take(1 << (c - 0xD4))
            if t == 0 and len(body) == 8:
                s, ns = struct.unpack(">II", body)
                return EventTime(s, ns)
            return (t, body)
        if c in (0xC7, 0xC8, 0xC9):  # ext8/16/32
            n = (self._take(1)[0] if c == 0xC7
                 else struct.unpack(">H", self._take(2))[0] if c == 0xC8
                 else struct.unpack(">I", self._take(4))[0])
            t = self._take(1)[0]
            body = self._take(n)
            if t == 0 and n == 8:
                s, ns = struct.unpack(">II", body)
                return EventTime(s, ns)
            return (t, body)
        if c == 0xD9:
            return self._take(self._take(1)[0]).decode()
        if c == 0xDA:
            return self._take(struct.unpack(">H", self._take(2))[0]).decode()
        if c == 0xDB:
            return self._take(struct.unpack(">I", self._take(4))[0]).decode()
        if c == 0xDC:
            return self._arr(struct.unpack(">H", self._take(2))[0])
        if c == 0xDD:
            return self._arr(struct.unpack(">I", self._take(4))[0])
        if c == 0xDE:
            return self._map(struct.unpack(">H", self._take(2))[0])
        if c == 0xDF:
            return self._map(struct.unpack(">I", self._take(4))[0])
        raise _Corrupt(f"msgpack: unsupported type byte 0x{c:02x}")

    def _arr(self, n: int) -> list:
        return [self.unpack() for _ in range(n)]

    def _map(self, n: int) -> dict:
        return {self.unpack(): self.unpack() for _ in range(n)}


def unpack(data: bytes):
    return Unpacker(data).unpack()


# ---------------------------------------------------------------------------
# Forward protocol


def _entries_of(payload) -> list[tuple]:
    """Normalize one decoded forward message to [(tag, time, record)]."""
    tag = payload[0]
    second = payload[1]
    out = []
    if isinstance(second, (bytes, bytearray)):  # PackedForward
        u = Unpacker(bytes(second))
        while u.has_more():
            t, rec = u.unpack()
            out.append((tag, t, rec))
    elif isinstance(second, list):  # Forward
        for t, rec in second:
            out.append((tag, t, rec))
    else:  # Message mode: [tag, time, record, (option)]
        out.append((tag, second, payload[2]))
    return out


def read_fluent_forward(port: int = 0, host: str = "127.0.0.1",
                        max_events: int = 10_000, timeout: float = 30.0,
                        _ready=None):
    """Bind a Forward-protocol listener (fluent-bit's ``out_forward``
    target), accept one producer, drain up to ``max_events`` and return
    a Dataset of ``(tag, time, record)`` rows (record re-encoded as a
    JSON string column — parse downstream with parse_ndjson's column
    mode). Sends chunk ``ack`` replies when the producer requests them."""
    import pyarrow as pa
    import ray.data

    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    srv.settimeout(timeout)
    if _ready is not None:
        _ready(srv.getsockname()[1])
    rows: list[tuple] = []
    try:
        conn, _ = srv.accept()
        conn.settimeout(timeout)
        buf = b""
        while len(rows) < max_events:
            try:
                chunk = conn.recv(65536)
            except (socket.timeout, TimeoutError):
                break
            if not chunk:
                break
            buf += chunk
            # decode as many complete top-level objects as available
            while True:
                u = Unpacker(buf)
                try:
                    msg = u.unpack()
                except _Truncated:
                    break  # need more bytes
                # _Corrupt propagates: a bad frame can never become
                # decodable, so stalling on it would silently drop every
                # later event — fail loudly instead
                buf = buf[u.i:]
                # option position depends on the mode: Forward/Packed
                # carry entries at [1] and opt at [2]; Message mode has
                # record at [2] (also a map!) and opt at [3]
                if isinstance(msg[1], (bytes, bytearray, list)):
                    opt = (msg[2] if len(msg) > 2
                           and isinstance(msg[2], dict) else None)
                else:
                    opt = (msg[3] if len(msg) > 3
                           and isinstance(msg[3], dict) else None)
                rows.extend(_entries_of(msg))
                if opt and "chunk" in opt:
                    conn.sendall(pack({"ack": opt["chunk"]}))
                if len(rows) >= max_events:
                    break
        conn.close()
    finally:
        srv.close()
    tags, times, recs = [], [], []
    for tag, t, rec in rows[:max_events]:
        tags.append(tag)
        times.append(float(t) if isinstance(t, EventTime) else float(t))
        recs.append(json.dumps(rec, sort_keys=True))
    return ray.data.from_arrow(pa.table({
        "tag": pa.array(tags, pa.string()),
        "time": pa.array(times, pa.float64()),
        "record": pa.array(recs, pa.string()),
    }))


def write_fluent_forward(events, host: str, port: int, tag: str = "tenzir",
                         mode: str = "forward", timeout: float = 10.0,
                         require_ack: bool = False) -> int:
    """Client half (fluent-bit's out_forward shape): ``events`` is a
    list of ``(time, record_dict)``. Modes: message | forward |
    packed_forward."""
    if mode not in ("message", "forward", "packed_forward"):
        raise ValueError(f"unknown mode {mode!r}")
    s = socket.create_connection((host, port), timeout=timeout)
    try:
        opt = {"chunk": "c1"} if require_ack else None
        if mode == "message":
            for t, rec in events:
                msg = [tag, t, rec] + ([opt] if opt else [])
                s.sendall(pack(msg))
                if opt:
                    _await_ack(s, opt["chunk"])
        elif mode == "forward":
            msg = [tag, [[t, r] for t, r in events]] + ([opt] if opt else [])
            s.sendall(pack(msg))
            if opt:
                _await_ack(s, opt["chunk"])
        else:
            blob = b"".join(pack([t, r]) for t, r in events)
            msg = [tag, blob] + ([opt] if opt else [])
            s.sendall(pack(msg))
            if opt:
                _await_ack(s, opt["chunk"])
        return len(events)
    finally:
        s.close()


def _await_ack(s: socket.socket, chunk: str) -> None:
    buf = b""
    while True:
        got = s.recv(4096)
        if not got:
            # peer closed without acking (e.g. the listener hit its
            # max_events cap) — error out, never spin on empty reads
            raise ConnectionError(
                f"connection closed before ack for chunk {chunk!r}")
        buf += got
        try:
            resp = unpack(buf)
        except _Truncated:
            continue
        if resp.get("ack") != chunk:
            raise ConnectionError(f"bad ack {resp!r}")
        return
