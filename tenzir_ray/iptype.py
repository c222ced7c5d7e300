"""Typed IP / subnet values — the reference's first-class `ip`/`subnet`
types (libtenzir/include/tenzir/type.hpp:674,727 model ips as extension
types over fixed_size_binary(16), IPv4 embedded v4-mapped; subnet adds a
prefix length) re-expressed over Arrow + numpy:

- storage: either plain dotted-quad STRINGS (the engine's default — what
  log parsers emit) or ``fixed_size_binary(16)`` v4-mapped bytes
  (``::ffff:a.b.c.d``), with lossless round-trip between the two;
- kernels: fully vectorized subnet membership for both storages (u32
  mask-compare for IPv4 strings, two-u64 mask-compare for 16-byte ips) —
  the same masking approach as state.context.SubnetTable's
  longest-prefix kernel, specialized to one CIDR;
- expression integration: ``expr.compile_filter`` compiles
  ``src_ip in 10.0.0.0/8`` (CIDR literals, web/docs/language/
  expressions.md) through :func:`subnet_mask`.

Malformed ips are no-match / null, never an error (security-log reality).
"""

from __future__ import annotations

import ipaddress
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value

_V4_PREFIX = b"\x00" * 10 + b"\xff\xff"  # ::ffff:0:0/96, the v4-mapped block


def _parse_v4_u32(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized dotted-quad parse: (uint32 array, valid mask)."""
    s = values.astype("object")
    # reject leading-zero octets ("010.1.2.3") so the fast path agrees
    # with ipaddress / the reference's strict ip type, which treat them
    # as invalid rather than decimal (ADVICE r3)
    valid = s.str.fullmatch(
        r"(0|[1-9]\d{0,2})(\.(0|[1-9]\d{0,2})){3}", na=False)
    u32 = np.zeros(len(s), dtype=np.uint32)
    if valid.any():
        parts = s[valid].str.split(".", expand=True).astype(np.int64)
        ok = (parts <= 255).all(axis=1).to_numpy()
        idx = np.flatnonzero(valid.to_numpy())
        p = parts.to_numpy()
        u32[idx[ok]] = (
            (p[ok, 0] << 24) | (p[ok, 1] << 16) | (p[ok, 2] << 8) | p[ok, 3]
        ).astype(np.uint32)
        v = valid.to_numpy().copy()
        v[idx[~ok]] = False
        return u32, v
    return u32, valid.to_numpy()


def ip_strings_to_bytes16(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """String ips → fixed_size_binary(16), IPv4 v4-mapped (type.hpp:674
    convention). IPv6 strings go through ``ipaddress`` per UNIQUE value
    (dictionary-encoded first — v6 literals are rare in v4-heavy logs);
    malformed/null → null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pd.Series(col.to_pandas(), dtype="object")
    u32, v4 = _parse_v4_u32(s)
    n = len(s)
    buf = np.zeros((n, 16), dtype=np.uint8)
    buf[:, 10:12] = 0xFF
    be = u32[v4]
    buf[v4, 12] = (be >> 24) & 0xFF
    buf[v4, 13] = (be >> 16) & 0xFF
    buf[v4, 14] = (be >> 8) & 0xFF
    buf[v4, 15] = be & 0xFF
    valid = v4.copy()
    rest = ~v4 & s.notna().to_numpy()
    if rest.any():
        cache: dict[str, bytes | None] = {}
        for i in np.flatnonzero(rest):
            v = s.iloc[i]
            b = cache.get(v, b"")
            if b == b"":
                try:
                    ipv = ipaddress.ip_address(v)
                    b = (
                        _V4_PREFIX + ipv.packed
                        if ipv.version == 4
                        else ipv.packed
                    )
                except ValueError:
                    b = None
                cache[v] = b
            if b is not None:
                buf[i] = np.frombuffer(b, dtype=np.uint8)
                valid[i] = True
    data = pa.py_buffer(buf.tobytes())
    mask = pa.array(valid, pa.bool_())
    arr = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(16), n, [None, data]
    )
    # apply nulls via if_else (from_buffers validity bitmaps are fiddly)
    import pyarrow.compute as pc

    return pc.if_else(mask, arr, pa.scalar(None, pa.binary(16)))


def bytes16_to_ip_strings(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """fixed_size_binary(16) → canonical string form (dotted quad for
    v4-mapped, compressed v6 otherwise). Vectorized for the v4 case."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    null_mask = np.asarray(col.is_null())
    raw = np.zeros((n, 16), dtype=np.uint8)
    valid_bytes = col.drop_null()
    if len(valid_bytes):
        packed = np.frombuffer(
            b"".join(valid_bytes.to_pylist()), dtype=np.uint8
        ).reshape(-1, 16)
        raw[~null_mask] = packed
    is_v4 = (raw[:, :10] == 0).all(axis=1) & (raw[:, 10] == 0xFF) & (raw[:, 11] == 0xFF)
    out = np.empty(n, dtype=object)
    v4i = np.flatnonzero(is_v4 & ~null_mask)
    if len(v4i):
        o = raw[v4i, 12:16].astype(str)
        out[v4i] = pd.Series(o[:, 0]).str.cat([o[:, 1], o[:, 2], o[:, 3]], sep=".").to_numpy()
    for i in np.flatnonzero(~is_v4 & ~null_mask):
        out[i] = str(ipaddress.ip_address(bytes(raw[i])))
    out[null_mask] = None
    return pa.array(out, pa.string())


def parse_cidr(cidr: str) -> tuple[bytes, int]:
    """CIDR → (16-byte network base, v6-relative prefix length).
    IPv4 prefixes shift by 96 into the v4-mapped block."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 4:
        return _V4_PREFIX + net.network_address.packed, net.prefixlen + 96
    return net.network_address.packed, net.prefixlen


def _mask128(plen: int) -> tuple[np.uint64, np.uint64]:
    """(hi, lo) uint64 mask for a v6-relative prefix length."""
    if plen <= 0:
        return np.uint64(0), np.uint64(0)
    if plen >= 128:
        return np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0xFFFFFFFFFFFFFFFF)
    if plen <= 64:
        hi = np.uint64((0xFFFFFFFFFFFFFFFF << (64 - plen)) & 0xFFFFFFFFFFFFFFFF)
        return hi, np.uint64(0)
    lo = np.uint64((0xFFFFFFFFFFFFFFFF << (128 - plen)) & 0xFFFFFFFFFFFFFFFF)
    return np.uint64(0xFFFFFFFFFFFFFFFF), lo


def subnet_mask(
    col: pa.Array | pa.ChunkedArray, cidr: str, with_valid: bool = False
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Vectorized ``ip in cidr`` over a STRING or fixed_size_binary(16)
    column → numpy bool mask (malformed/null ips → False). With
    ``with_valid=True`` also returns the validity mask so negated
    membership can exclude null/malformed ips (three-valued logic:
    ``ip not in net`` must not keep garbage — ADVICE r3)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    base, plen = parse_cidr(cidr)
    if pa.types.is_fixed_size_binary(col.type):
        n = len(col)
        null_mask = np.asarray(col.is_null())
        raw = np.zeros((n, 16), dtype=np.uint8)
        vb = col.drop_null()
        if len(vb):
            raw[~null_mask] = np.frombuffer(
                b"".join(vb.to_pylist()), dtype=np.uint8
            ).reshape(-1, 16)
        words = raw.view(">u8").astype(np.uint64).reshape(-1, 2)
        hi_m, lo_m = _mask128(plen)
        b = np.frombuffer(base, dtype=">u8").astype(np.uint64)
        hit = ((words[:, 0] & hi_m) == (np.uint64(b[0]) & hi_m)) & (
            (words[:, 1] & lo_m) == (np.uint64(b[1]) & lo_m)
        )
        hit[null_mask] = False
        return (hit, ~null_mask) if with_valid else hit
    # string storage: IPv4 fast path — parse to u32, lift to the
    # v4-mapped 128-bit form (hi=0, lo=0x0000ffff<<32 | u32) and apply
    # the same two-u64 mask-compare (uniform across any prefix length).
    # Rows the v4 parser rejects but that contain ':' fall back to a
    # per-element IPv6 parse (cast_ip() is the scale path for v6-heavy
    # columns; this keeps string v6 correct rather than silently False).
    s = pd.Series(col.to_pandas(), dtype="object")
    u32, valid = _parse_v4_u32(s)
    hi = np.zeros(len(s), dtype=np.uint64)
    lo = np.uint64(0x0000FFFF00000000) | u32.astype(np.uint64)
    v6_rows = np.flatnonzero(
        ~valid
        & s.str.contains(":", regex=False, na=False).to_numpy(dtype=bool)
    )
    for i in v6_rows:
        try:
            packed = ipaddress.ip_address(s.iloc[i]).packed
        except ValueError:
            continue
        if len(packed) == 4:  # "::ffff:1.2.3.4" style still maps to v4
            packed = _V4_PREFIX + packed
        w = np.frombuffer(packed, dtype=">u8").astype(np.uint64)
        hi[i], lo[i] = w[0], w[1]
        valid[i] = True
    hi_m, lo_m = _mask128(plen)
    b = np.frombuffer(base, dtype=">u8").astype(np.uint64)
    hit = (
        valid
        & ((hi & hi_m) == (np.uint64(b[0]) & hi_m))
        & ((lo & lo_m) == (np.uint64(b[1]) & lo_m))
    )
    return (hit, valid) if with_valid else hit


# ---------------------------------------------------------------------------
# dataset-level transforms


def cast_ip(ds, columns: str | list[str]):
    """String ip columns → fixed_size_binary(16) typed columns."""
    cols = [columns] if isinstance(columns, str) else list(columns)

    def _cast(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, ip_strings_to_bytes16(batch.column(c)))
        return batch

    return ds.map_batches(_cast, batch_format="pyarrow")


def ip_to_string(ds, columns: str | list[str]):
    """Typed 16-byte ip columns → canonical strings (round-trip)."""
    cols = [columns] if isinstance(columns, str) else list(columns)

    def _uncast(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, bytes16_to_ip_strings(batch.column(c)))
        return batch

    return ds.map_batches(_uncast, batch_format="pyarrow")


ship_by_value(sys.modules[__name__])
