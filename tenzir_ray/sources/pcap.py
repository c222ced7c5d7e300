"""PCAP reading + decapsulation (reference formats/pcap.cpp framing,
operators/decapsulate.cpp link/net/transport parsing) — pure-stdlib
implementations of the PUBLIC libpcap classic file format
(https://wiki.wireshark.org/Development/LibpcapFileFormat) and the
Ethernet/IPv4/TCP-UDP header layouts.

``read_pcap`` yields one row per captured packet (ts, caplen, origlen,
raw bytes); ``decapsulate`` parses the classic Ethernet→IPv4→TCP/UDP
stack into typed columns (non-IPv4/other protocols keep nulls — the
reference behaves the same for unknown layers).
"""

from __future__ import annotations

import struct
import sys

import numpy as np
import pyarrow as pa

from tenzir_ray._ship import ship_by_value

_MAGIC_US_LE = 0xA1B2C3D4  # microsecond timestamps, little-endian
_MAGIC_NS_LE = 0xA1B23C4D


def write_pcap(path: str, packets: list[tuple[float, bytes]],
               linktype: int = 1) -> None:
    """Minimal classic-pcap writer (test fixtures; linktype 1 = Ethernet)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", _MAGIC_US_LE, 2, 4, 0, 0, 65535, linktype))
        for ts, data in packets:
            sec = int(ts)
            usec = int(round((ts - sec) * 1e6))
            f.write(struct.pack("<IIII", sec, usec, len(data), len(data)))
            f.write(data)


def _parse_pcap_bytes(blob: bytes) -> list[dict]:
    if len(blob) < 24:
        raise ValueError("truncated pcap: no global header")
    magic_le = struct.unpack_from("<I", blob, 0)[0]
    magic_be = struct.unpack_from(">I", blob, 0)[0]
    if magic_le in (_MAGIC_US_LE, _MAGIC_NS_LE):
        endian, magic = "<", magic_le
    elif magic_be in (_MAGIC_US_LE, _MAGIC_NS_LE):
        endian, magic = ">", magic_be
    else:
        raise ValueError(f"not a classic pcap file (magic {magic_le:#x})")
    frac_div = 1e9 if magic == _MAGIC_NS_LE else 1e6
    linktype = struct.unpack_from(endian + "I", blob, 20)[0]
    rows, off, idx = [], 24, 0
    while off + 16 <= len(blob):
        sec, frac, caplen, origlen = struct.unpack_from(endian + "IIII", blob, off)
        off += 16
        data = blob[off : off + caplen]
        off += caplen
        rows.append(
            {
                "packet_idx": idx,
                "ts": sec + frac / frac_div,
                "caplen": caplen,
                "origlen": origlen,
                "linktype": linktype,
                "data": data,
            }
        )
        idx += 1
    return rows


def read_pcap(paths: "str | list[str]"):
    """One row per packet across the given pcap file(s) — one read task
    per file (packet framing is sequential within a file by format)."""
    import ray.data

    paths = [paths] if isinstance(paths, str) else list(paths)

    def _load(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                for r in _parse_pcap_bytes(f.read()):
                    r["path"] = p
                    rows.append(r)
        return pa.Table.from_pylist(rows)

    return ray.data.from_items([{"path": p} for p in paths]).map_batches(
        _load, batch_format="pyarrow", batch_size=1
    )


def _decap_one(data: bytes) -> dict:
    out: dict = {
        "eth_src": None, "eth_dst": None, "eth_type": None,
        "src_ip": None, "dst_ip": None, "ip_proto": None, "ttl": None,
        "src_port": None, "dst_port": None, "tcp_flags": None,
        "payload_len": None,
    }
    if len(data) < 14:
        return out
    dst, src, etype = data[0:6], data[6:12], struct.unpack_from("!H", data, 12)[0]
    out["eth_dst"] = dst.hex(":")
    out["eth_src"] = src.hex(":")
    out["eth_type"] = etype
    if etype != 0x0800 or len(data) < 34:  # IPv4 only
        return out
    ver_ihl = data[14]
    ihl = (ver_ihl & 0x0F) * 4
    if (ver_ihl >> 4) != 4 or len(data) < 14 + ihl:
        return out
    out["ttl"] = data[14 + 8]
    proto = data[14 + 9]
    out["ip_proto"] = proto
    out["src_ip"] = ".".join(str(b) for b in data[14 + 12 : 14 + 16])
    out["dst_ip"] = ".".join(str(b) for b in data[14 + 16 : 14 + 20])
    l4 = 14 + ihl
    if proto == 6 and len(data) >= l4 + 14:  # TCP
        out["src_port"], out["dst_port"] = struct.unpack_from("!HH", data, l4)
        data_off = (data[l4 + 12] >> 4) * 4
        out["tcp_flags"] = data[l4 + 13]
        out["payload_len"] = max(0, len(data) - l4 - data_off)
    elif proto == 17 and len(data) >= l4 + 8:  # UDP
        out["src_port"], out["dst_port"] = struct.unpack_from("!HH", data, l4)
        out["payload_len"] = max(0, len(data) - l4 - 8)
    return out


def decapsulate(ds, data_column: str = "data"):
    """Parse Ethernet/IPv4/TCP-UDP headers out of raw packet bytes
    (reference operators/decapsulate.cpp); unknown layers stay null."""

    def _decap(batch: pa.Table) -> pa.Table:
        parsed = [
            _decap_one(d or b"") for d in batch.column(data_column).to_pylist()
        ]
        cols = pa.Table.from_pylist(parsed)
        batch = batch.drop_columns([data_column])
        for f in cols.schema:
            batch = batch.append_column(f.name, cols.column(f.name))
        return batch

    return ds.map_batches(_decap, batch_format="pyarrow")



def read_nic(interface: str = "lo", max_packets: int = 1000,
             timeout: float = 10.0, promiscuous: bool = False):
    """LIVE packet capture from a network interface (the reference's
    `nic` loader, plugins/nic wraps libpcap) via a raw AF_PACKET socket
    — stdlib-only, requires CAP_NET_RAW/root. One row per captured
    frame in exactly :func:`read_pcap`'s schema (packet_idx, ts,
    caplen, origlen, linktype=1 ethernet, data), so `decapsulate`
    composes unchanged. The capture loop is driver-side (a NIC is a
    single physical source); decode fans out downstream."""
    import socket as _socket
    import time as _time

    import ray.data

    ETH_P_ALL = 0x0003
    s = _socket.socket(_socket.AF_PACKET, _socket.SOCK_RAW,
                       _socket.htons(ETH_P_ALL))
    rows = []
    try:
        s.bind((interface, 0))
        if promiscuous:
            import struct as _struct

            # PACKET_ADD_MEMBERSHIP / PACKET_MR_PROMISC (if_packet.h)
            ifidx = _socket.if_nametoindex(interface)
            mreq = _struct.pack("iHH8s", ifidx, 1, 0, b"")
            s.setsockopt(263, 1, mreq)  # SOL_PACKET, PACKET_ADD_MEMBERSHIP
        s.settimeout(min(0.25, timeout))
        deadline = _time.monotonic() + timeout
        idx = 0
        while len(rows) < max_packets and _time.monotonic() < deadline:
            try:
                data, _addr = s.recvfrom(65535)
            except (_socket.timeout, TimeoutError):
                continue
            rows.append({
                "packet_idx": idx,
                "ts": _time.time(),
                "caplen": len(data),
                "origlen": len(data),
                "linktype": 1,  # LINKTYPE_ETHERNET
                "data": data,
            })
            idx += 1
    finally:
        s.close()
    if not rows:
        return ray.data.from_arrow(pa.table({
            "packet_idx": pa.array([], pa.int64()),
            "ts": pa.array([], pa.float64()),
            "caplen": pa.array([], pa.int64()),
            "origlen": pa.array([], pa.int64()),
            "linktype": pa.array([], pa.int64()),
            "data": pa.array([], pa.binary()),
        }))
    return ray.data.from_items(rows)


ship_by_value(sys.modules[__name__])
