"""Minimal AMQP 0-9-1 wire client over stdlib sockets.

The reference's amqp plugin (plugins/amqp, ~754 LoC around librabbitmq)
loads from / saves to an AMQP broker. No client library exists in this
sandbox, so — like the MMDB reader and the ZMTP transport — this
implements the PUBLIC protocol (amqp-0-9-1 spec, framing section 4.2)
directly:

- frames: ``type(1) channel(2) size(4) payload 0xCE``; METHOD(1),
  HEADER(2), BODY(3), HEARTBEAT(8);
- connection negotiation: protocol header ``AMQP\\x00\\x00\\x09\\x01``,
  Connection.Start/Start-Ok (PLAIN: ``\\0user\\0pass``),
  Tune/Tune-Ok, Open/Open-Ok;
- Channel.Open/Open-Ok, Queue.Declare/Declare-Ok;
- Basic.Publish = method + content HEADER (class-id, weight, body
  size, property flags) + BODY frames split at frame-max;
- Basic.Get/Get-Ok/Get-Empty for pull-style consumption.

The framing and both handshake directions are exercised end-to-end in
tests against an in-process broker double speaking the server half of
the same grammar (tests/test_round4_ops.py); a real RabbitMQ endpoint
has not been reachable from this environment (documented, same status
as the kafka/SQS adapters' network halves).
"""

from __future__ import annotations

import socket
import struct

_FRAME_METHOD = 1
_FRAME_HEADER = 2
_FRAME_BODY = 3
_FRAME_HEARTBEAT = 8
_FRAME_END = 0xCE

_PROTO_HEADER = b"AMQP\x00\x00\x09\x01"


def _shortstr(s: str) -> bytes:
    b = s.encode()
    if len(b) > 255:
        raise ValueError("shortstr too long")
    return bytes([len(b)]) + b


def _longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0

    def u8(self) -> int:
        self.i += 1
        return self.d[self.i - 1]

    def u16(self) -> int:
        (v,) = struct.unpack_from(">H", self.d, self.i)
        self.i += 2
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.d, self.i)
        self.i += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.d, self.i)
        self.i += 8
        return v

    def shortstr(self) -> str:
        n = self.u8()
        s = self.d[self.i:self.i + n].decode()
        self.i += n
        return s

    def longstr(self) -> bytes:
        n = self.u32()
        b = self.d[self.i:self.i + n]
        self.i += n
        return b


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, int, bytes]:
    """(frame_type, channel, payload)."""
    head = _recv_exact(sock, 7)
    ftype, channel, size = struct.unpack(">BHI", head)
    payload = _recv_exact(sock, size)
    end = _recv_exact(sock, 1)[0]
    if end != _FRAME_END:
        raise ConnectionError(f"bad frame end 0x{end:02x}")
    return ftype, channel, payload


def write_frame(sock: socket.socket, ftype: int, channel: int,
                payload: bytes) -> None:
    sock.sendall(struct.pack(">BHI", ftype, channel, len(payload))
                 + payload + bytes([_FRAME_END]))


def method_payload(class_id: int, method_id: int, args: bytes = b"") -> bytes:
    return struct.pack(">HH", class_id, method_id) + args


class AmqpClient:
    """One connection + one channel; publish/get over a named queue."""

    def __init__(self, host: str, port: int = 5672, user: str = "guest",
                 password: str = "guest", vhost: str = "/",
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)
        self.frame_max = 131072
        self._handshake(user, password, vhost)
        self._open_channel()

    # -- negotiation -----------------------------------------------------
    def _expect_method(self, class_id: int, method_id: int) -> _Reader:
        while True:
            ftype, _ch, payload = read_frame(self.sock)
            if ftype == _FRAME_HEARTBEAT:
                continue
            if ftype != _FRAME_METHOD:
                raise ConnectionError(f"expected METHOD, got type {ftype}")
            r = _Reader(payload)
            c, m = r.u16(), r.u16()
            if (c, m) != (class_id, method_id):
                raise ConnectionError(
                    f"expected ({class_id},{method_id}), got ({c},{m})")
            return r

    def _handshake(self, user: str, password: str, vhost: str) -> None:
        self.sock.sendall(_PROTO_HEADER)
        self._expect_method(10, 10)  # Connection.Start (args ignored)
        plain = b"\x00" + user.encode() + b"\x00" + password.encode()
        startok = (struct.pack(">I", 0)        # client-properties: empty table
                   + _shortstr("PLAIN")
                   + _longstr(plain)
                   + _shortstr("en_US"))
        write_frame(self.sock, _FRAME_METHOD, 0,
                    method_payload(10, 11, startok))
        r = self._expect_method(10, 30)  # Connection.Tune
        channel_max = r.u16()
        frame_max = r.u32()
        heartbeat = r.u16()
        del channel_max, heartbeat
        if frame_max:
            self.frame_max = min(self.frame_max, frame_max)
        tuneok = struct.pack(">HIH", 1, self.frame_max, 0)
        write_frame(self.sock, _FRAME_METHOD, 0,
                    method_payload(10, 31, tuneok))
        openargs = _shortstr(vhost) + _shortstr("") + b"\x00"
        write_frame(self.sock, _FRAME_METHOD, 0,
                    method_payload(10, 40, openargs))
        self._expect_method(10, 41)  # Connection.Open-Ok

    def _open_channel(self) -> None:
        write_frame(self.sock, _FRAME_METHOD, 1,
                    method_payload(20, 10, _shortstr("")))
        self._expect_method(20, 11)

    # -- operations --------------------------------------------------------
    def queue_declare(self, queue: str) -> None:
        args = (struct.pack(">H", 0) + _shortstr(queue)
                + b"\x00"                 # passive/durable/... bit flags
                + struct.pack(">I", 0))   # empty arguments table
        write_frame(self.sock, _FRAME_METHOD, 1,
                    method_payload(50, 10, args))
        self._expect_method(50, 11)

    def publish(self, queue: str, body: bytes,
                exchange: str = "") -> None:
        args = (struct.pack(">H", 0) + _shortstr(exchange)
                + _shortstr(queue) + b"\x00")  # mandatory/immediate bits
        write_frame(self.sock, _FRAME_METHOD, 1,
                    method_payload(60, 40, args))
        header = struct.pack(">HHQH", 60, 0, len(body), 0)  # no props
        write_frame(self.sock, _FRAME_HEADER, 1, header)
        cap = self.frame_max - 8
        # zero-size content carries NO body frames (spec 4.2.6)
        for i in range(0, len(body), cap):
            write_frame(self.sock, _FRAME_BODY, 1, body[i:i + cap])

    def get(self, queue: str) -> bytes | None:
        """Basic.Get — one message or None (Get-Empty)."""
        args = struct.pack(">H", 0) + _shortstr(queue) + b"\x01"  # no-ack
        write_frame(self.sock, _FRAME_METHOD, 1,
                    method_payload(60, 70, args))
        ftype, _ch, payload = read_frame(self.sock)
        if ftype != _FRAME_METHOD:
            raise ConnectionError("expected Get-Ok/Get-Empty method")
        r = _Reader(payload)
        c, m = r.u16(), r.u16()
        if (c, m) == (60, 72):  # Get-Empty
            return None
        if (c, m) != (60, 71):
            raise ConnectionError(f"unexpected method ({c},{m})")
        ftype, _ch, hp = read_frame(self.sock)
        if ftype != _FRAME_HEADER:
            raise ConnectionError("expected content HEADER after Get-Ok")
        hr = _Reader(hp)
        hr.u16()  # class-id
        hr.u16()  # weight
        size = hr.u64()
        body = b""
        while len(body) < size:
            ftype, _ch, bp = read_frame(self.sock)
            if ftype != _FRAME_BODY:
                raise ConnectionError("expected BODY frame")
            body += bp
        return body

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Dataset glue


def read_amqp(host: str, queue: str, max_messages: int, port: int = 5672,
              user: str = "guest", password: str = "guest",
              vhost: str = "/", timeout: float = 30.0):
    """Drain up to ``max_messages`` from a queue into a one-column
    Dataset (driver-side pull loop; parse downstream)."""
    import pyarrow as pa
    import ray.data

    cli = AmqpClient(host, port, user, password, vhost, timeout=timeout)
    msgs: list[bytes] = []
    try:
        cli.queue_declare(queue)
        while len(msgs) < max_messages:
            m = cli.get(queue)
            if m is None:
                break
            msgs.append(m)
    finally:
        cli.close()
    return ray.data.from_arrow(
        pa.table({"data": pa.array(msgs, pa.binary())}))


def write_amqp(ds, host: str, queue: str, column: str = "data",
               port: int = 5672, user: str = "guest",
               password: str = "guest", vhost: str = "/",
               timeout: float = 30.0) -> int:
    """Publish one message per row to a queue (bounded driver-side
    sink, like write_email/write_zmq)."""
    cli = AmqpClient(host, port, user, password, vhost, timeout=timeout)
    n = 0
    try:
        cli.queue_declare(queue)
        for batch in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=4096):
            for v in batch.column(column):
                raw = v.as_py()
                if raw is None:
                    continue
                cli.publish(
                    queue, raw.encode() if isinstance(raw, str) else raw)
                n += 1
    finally:
        cli.close()
    return n
