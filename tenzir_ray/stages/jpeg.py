"""Baseline JPEG (ITU-T T.81 SOF0) codec in numpy + stdlib.

Closes the one remaining real-decode gap in the multimodal family
(stages/multimodal.py previously raised NotImplementedError for JPEG
payloads; BMP/PPM/PNG/WAV were already real). Implemented straight from
the public spec (ITU-T T.81 / ISO 10918-1):

- decoder: baseline sequential DCT, 8-bit, grayscale or YCbCr with
  4:4:4 / 4:2:2 / 4:2:0 subsampling, restart intervals, byte-stuffing.
  Huffman decoding uses a canonical 16-bit peek table (one numpy array
  lookup per symbol instead of bit-by-bit tree walking); dequantize +
  zigzag + IDCT run vectorized over ALL blocks of a component at once
  (IDCT-II as two 8x8 basis-matrix multiplies).
- encoder: the same path in reverse with the Annex K example quantization
  tables (scaled by a libjpeg-style quality knob) and the Annex K
  "typical" Huffman tables; 4:4:4 or 4:2:0.

Per-block entropy coding is a Python loop (inherent to Huffman's serial
bit stream); everything per-pixel is numpy. At engine level JPEG decode
runs inside the DecodeImage actor pool (multimodal.py) where batches are
small and the pool scales out, so a serial entropy loop per image is the
right trade.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from tenzir_ray._ship import ship_by_value

# ---------------------------------------------------------------------------
# shared tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 example quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II basis: B[u, x] = c(u) * cos((2x+1) u pi / 16) / 2
_B = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """coef (n, 8, 8) frequency blocks → spatial (n, 8, 8): two batched
    8×8 matmuls (Bᵀ·C·B). einsum(optimize=True) recomputed its
    contraction path on EVERY call — a fixed ~0.5 ms tax that dominated
    small-image (MJPEG frame) decodes."""
    return _B.T @ coef @ _B


def _fdct_blocks(pix: np.ndarray) -> np.ndarray:
    """spatial (n, 8, 8) → frequency (n, 8, 8): B·P·Bᵀ batched."""
    return _B @ pix @ _B.T


def _canonical_codes(bits, values):
    """(bits, values) → list of (code, length, symbol) per T.81 C.2."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length, values[k]))
            code += 1
            k += 1
        code <<= 1
    return out


class _PeekTable:
    """16-bit peek Huffman decoder: one table index per symbol.

    Construction is cached per (bits, values) — an MJPEG stream (and
    most encoders) reuses the same DHT across every frame, so repeated
    decodes skip the 64Ki-entry table build (real decoders share
    tables the same way)."""

    _cache: dict = {}

    def __new__(cls, bits, values):
        key = (bytes(bits), bytes(values))
        hit = cls._cache.get(key)
        if hit is not None:
            return hit
        self = super().__new__(cls)
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.len = np.zeros(1 << 16, dtype=np.int8)
        for code, length, symbol in _canonical_codes(bits, values):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            self.sym[lo:hi] = symbol
            self.len[lo:hi] = length
        if len(cls._cache) >= 64:  # bounded: 4 tables/stream typical
            cls._cache.clear()
        cls._cache[key] = self
        return self


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-stuffing removed lazily; stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-stuffed marker is hit

    def _fill(self, want: int):
        while self.nbits < want:
            if self.pos >= len(self.data):
                self.marker = 0xD9  # truncated stream: behave like EOI
            if self.marker is not None:
                # past end: pad with zeros (spec: decoder may read past
                # the final bits into padding)
                self.acc = (self.acc << 8) & 0xFFFFFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.marker = nxt
                    self.pos += 1
                    self.acc = (self.acc << 8) & 0xFFFFFFFFFFFF
                    self.nbits += 8
                    continue
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def align_restart(self):
        """Consume padding + RSTn marker at a restart boundary."""
        self.nbits = 0
        self.acc = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.marker = None
            return
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("jpeg: missing restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG → uint8 array (h, w) gray or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _PeekTable] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qt[tid] = vals
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _PeekTable(bits, values)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF,
                    "qt": seg[8 + 3 * i],
                })
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: only baseline sequential (SOF0) supported, got SOF marker 0x{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF0")
            ns = seg[0]
            if ns < len(frame["comps"]):
                raise ValueError(
                    "jpeg: non-interleaved (multi-scan) baseline files "
                    "unsupported — one interleaved scan per image only")
            scan = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tables = seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append({**comp, "dc": tables >> 4, "ac": tables & 0xF})
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff, restart_interval
            )
        pos += seglen
    raise ValueError("jpeg: no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # coefficient planes per component, in 8x8 block grid
    planes = []
    for c in scan:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        planes.append(np.zeros((bh * bw, 64), dtype=np.int32))
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    n_mcu = mcux * mcuy

    def read_block(dc_tab: _PeekTable, ac_tab: _PeekTable, pred: int):
        coef = np.zeros(64, dtype=np.int32)
        p16 = reader.peek16()
        t = int(dc_tab.sym[p16])
        ln = int(dc_tab.len[p16])
        if ln == 0:
            raise ValueError("jpeg: bad DC huffman code")
        reader.skip(ln)
        diff = _extend(reader.take(t), t)
        pred += diff
        coef[0] = pred
        k = 1
        while k < 64:
            p16 = reader.peek16()
            rs = int(ac_tab.sym[p16])
            ln = int(ac_tab.len[p16])
            if ln == 0:
                raise ValueError("jpeg: bad AC huffman code")
            reader.skip(ln)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("jpeg: AC run past block end")
            coef[k] = _extend(reader.take(s), s)
            k += 1
        return coef, pred

    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_restart()
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            dc_tab = huff[(0, c["dc"])]
            ac_tab = huff[(1, c["ac"])]
            bw = mcux * c["h"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef, preds[ci] = read_block(dc_tab, ac_tab, preds[ci])
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    planes[ci][row * bw + col] = coef

    # dequantize + unzigzag + IDCT, vectorized per component
    out_comps = []
    for ci, c in enumerate(scan):
        q = qt[c["qt"]]
        deq = planes[ci].astype(np.float64) * q[None, :]
        blocks = deq[:, UNZIGZAG].reshape(-1, 8, 8)
        spatial = _idct_blocks(blocks) + 128.0
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        img = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (nearest, the common box replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        out_comps.append(img[:h, :w])

    if len(out_comps) == 1:
        return np.clip(out_comps[0], 0, 255).astype(np.uint8)
    y, cb, cr = out_comps[0], out_comps[1] - 128.0, out_comps[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-padding per spec

    def restart(self, n: int):
        """Byte-align and emit RSTn (raw marker, never stuffed)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n % 8)])


def _enc_maps(bits, values):
    m = {}
    for code, length, symbol in _canonical_codes(bits, values):
        m[symbol] = (code, length)
    return m


def _encode_component(blocks: np.ndarray, q: np.ndarray, dc_map, ac_map,
                      writer: _BitWriter, pred: int) -> int:
    """blocks (n, 8, 8) pixel-domain (-128 centered) → entropy stream."""
    coef = _fdct_blocks(blocks)
    zz = coef.reshape(-1, 64)[:, ZIGZAG]
    quant = np.round(zz / q[None, :]).astype(np.int32)
    for blk in quant:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        mag = abs(diff)
        t = mag.bit_length()
        code, ln = dc_map[t]
        writer.put(code, ln)
        if t:
            writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        nz = np.nonzero(blk[1:])[0]
        k = 1
        for idx in nz:
            pos = int(idx) + 1
            run = pos - k
            while run >= 16:
                code, ln = ac_map[0xF0]
                writer.put(code, ln)
                run -= 16
            v = int(blk[pos])
            s = abs(v).bit_length()
            code, ln = ac_map[(run << 4) | s]
            writer.put(code, ln)
            writer.put(v if v >= 0 else v + (1 << s) - 1, s)
            k = pos + 1
        if k < 64:
            code, ln = ac_map[0x00]  # EOB
            writer.put(code, ln)
    return pred


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded to 8-multiples → (n, 8, 8), row-major block order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:, w:] = padded[:, w - 1:w]
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 → baseline JPEG bytes.

    ``subsample=True`` writes 4:2:0 chroma (exercises the decoder's MCU
    interleave + upsample path); default is 4:4:4. ``restart_interval``
    (MCUs per restart segment, 0 = off) emits DRI + RSTn markers.
    """
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    # DQT stores (and the quantizer consumes) the table in ZIGZAG order
    # (T.81 B.2.4.1) — the natural-order Annex K tables are reordered here
    qy = _quality_scale(QT_LUMA, quality)[ZIGZAG].astype(np.float64)
    qc = _quality_scale(QT_CHROMA, quality)[ZIGZAG].astype(np.float64)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes(qy.astype(np.uint8).tolist()))
    if not gray:
        seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8).tolist()))
    # SOF0
    if gray:
        comps = bytes([1, 0x11, 0])
        ncomp = 1
    else:
        sub = 0x22 if subsample else 0x11
        comps = bytes([1, sub, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    for cls, tid, (bits, values) in (
        (0, 0, HT_DC_LUMA), (1, 0, HT_AC_LUMA),
        *(() if gray else ((0, 1, HT_DC_CHROMA), (1, 1, HT_AC_CHROMA))),
    ):
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))
    if gray:
        seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    writer = _BitWriter()
    rst_count = 0

    def maybe_restart(m: int, preds: list) -> None:
        nonlocal rst_count
        if restart_interval and m and m % restart_interval == 0:
            writer.restart(rst_count)
            rst_count += 1
            preds[:] = [0] * len(preds)

    if gray:
        yp = img.astype(np.float64) - 128.0
        blks = _to_blocks(yp)
        dcm, acm = _enc_maps(*HT_DC_LUMA), _enc_maps(*HT_AC_LUMA)
        preds = [0]
        for i in range(blks.shape[0]):
            maybe_restart(i, preds)
            preds[0] = _encode_component(blks[i:i + 1], qy, dcm, acm,
                                         writer, preds[0])
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        dc_l, ac_l = _enc_maps(*HT_DC_LUMA), _enc_maps(*HT_AC_LUMA)
        dc_c, ac_c = _enc_maps(*HT_DC_CHROMA), _enc_maps(*HT_AC_CHROMA)
        if not subsample:
            # 4:4:4 non-interleaved block order == interleaved (1x1 MCUs)
            preds = [0, 0, 0]
            blks = [_to_blocks(p) for p in (y, cb, cr)]
            n = blks[0].shape[0]
            maps = [(dc_l, ac_l, qy), (dc_c, ac_c, qc), (dc_c, ac_c, qc)]
            for i in range(n):
                maybe_restart(i, preds)
                for ci in range(3):
                    dcm, acm, q = maps[ci]
                    preds[ci] = _encode_component(
                        blks[ci][i:i + 1], q.astype(np.float64),
                        dcm, acm, writer, preds[ci])
        else:
            # 4:2:0 — chroma box-averaged 2x; MCU = 4 Y + 1 Cb + 1 Cr
            ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
            ypad = np.empty((ph, pw))
            ypad[:h, :w] = y
            ypad[h:, :w] = y[-1:, :]
            ypad[:, w:] = ypad[:, w - 1:w]
            cbp = np.empty((ph, pw)); crp = np.empty((ph, pw))
            cbp[:h, :w] = cb; crp[:h, :w] = cr
            cbp[h:, :w] = cb[-1:, :]; crp[h:, :w] = cr[-1:, :]
            cbp[:, w:] = cbp[:, w - 1:w]; crp[:, w:] = crp[:, w - 1:w]
            cb2 = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            mcux, mcuy = pw // 16, ph // 16
            preds = [0, 0, 0]
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(my * mcux + mx, preds)
                    for by in range(2):
                        for bx in range(2):
                            blk = ypad[my * 16 + by * 8: my * 16 + by * 8 + 8,
                                       mx * 16 + bx * 8: mx * 16 + bx * 8 + 8]
                            preds[0] = _encode_component(
                                blk[None], qy,
                                dc_l, ac_l, writer, preds[0])
                    cblk = cb2[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8]
                    preds[1] = _encode_component(
                        cblk[None], qc,
                        dc_c, ac_c, writer, preds[1])
                    rblk = cr2[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8]
                    preds[2] = _encode_component(
                        rblk[None], qc,
                        dc_c, ac_c, writer, preds[2])
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


ship_by_value(sys.modules[__name__])
