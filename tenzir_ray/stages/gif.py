"""GIF87a/89a codec — dependency-free, implemented from the GIF89a
specification (CompuServe, 1990) and the LZW variant it defines
(variable-width codes, LSB-first packing, CLEAR/END control codes,
4096-entry dictionary). Completes the real-image-format family next to
BMP/PPM/PNG (stages/multimodal.py) and baseline JPEG (stages/jpeg.py):
palette decode, interlace, transparency, multi-frame animation with
disposal compositing, plus an encoder (single- and multi-frame) used by
the roundtrip tests and gates.

Scale shape: the codec is a per-payload kernel invoked inside the
existing actor-pool stages (DecodeImage / ResizeImage / FrameSampler) —
small batches, binary columns, zero driver involvement.

Reference analog: none (the reference has no image plugins); this is
part of the multimodal training-data surface.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from tenzir_ray._ship import ship_by_value

GIF_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    """GIF LZW → palette indices. Variable code width starting at
    ``min_code+1`` bits, LSB-first bit packing."""
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(npix, dtype=np.uint8)
    pos = 0

    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code + 1
                prev = None
                continue
            if code == end:
                return out[:pos] if pos < npix else out
            if code < len(table) and (code < clear or code > end):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"gif: bad LZW code {code}")
            n = len(entry)
            if pos + n > npix:  # tolerate over-long streams
                n = npix - pos
            out[pos:pos + n] = np.frombuffer(entry[:n], dtype=np.uint8)
            pos += n
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if pos >= npix:
                return out
    return out[:pos]


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    codes: list[tuple[int, int]] = []  # (code, width)
    code_size = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    codes.append((clear, code_size))
    w = b""
    for k in indices.tobytes():
        kb = bytes([k])
        wk = w + kb
        if wk in table:
            w = wk
            continue
        codes.append((table[w], code_size))
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        w = kb
        if next_code == 4096:
            codes.append((clear, code_size))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code + 1
    if w:
        codes.append((table[w], code_size))
    codes.append((end, code_size))

    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoding


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _sub_blocks(buf: bytes, off: int) -> tuple[bytes, int]:
    parts = []
    while True:
        n = buf[off]
        off += 1
        if n == 0:
            break
        parts.append(buf[off:off + n])
        off += n
    return b"".join(parts), off


def gif_frames(data: bytes):
    """Decode every frame, composited per the disposal method. Yields
    ``(h, w, 3) uint8`` RGB arrays (one per image block)."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    W, H = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_index = data[11]
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, off).reshape(n, 3)
        off += n * 3

    if gct is not None and bg_index < len(gct):
        bg = gct[bg_index].astype(np.uint8)
    else:
        bg = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg, (H, W, 3)).copy()
    transparent: int | None = None
    disposal = 0

    while off < len(data):
        b = data[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[off]
            off += 1
            if label == 0xF9:  # graphics control
                body, off = _sub_blocks(data, off)
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
            else:  # comment / plain text / application — skip
                _, off = _sub_blocks(data, off)
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", data, off)
        off += 8
        ipacked = data[off]
        off += 1
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(data, np.uint8, n * 3, off).reshape(n, 3)
            off += n * 3
        if lct is None:
            raise ValueError("gif: image without any color table")
        min_code = data[off]
        off += 1
        lzw, off = _sub_blocks(data, off)
        idx = _lzw_decode(lzw, min_code, w * h)
        if len(idx) < w * h:  # truncated stream: pad with bg index
            idx = np.concatenate(
                [idx, np.zeros(w * h - len(idx), np.uint8)])
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        region = canvas[top:top + h, left:left + w]
        prev_region = region.copy()
        rgb = lct[np.minimum(rows, len(lct) - 1)]
        if transparent is not None:
            opaque = rows != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        yield canvas.copy()
        if disposal == 2:  # restore to background color
            canvas[top:top + h, left:left + w] = bg
        elif disposal == 3:  # restore to previous
            canvas[top:top + h, left:left + w] = prev_region
        transparent = None
        disposal = 0


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as ``(h, w, 3) uint8`` RGB."""
    for frame in gif_frames(data):
        return frame
    raise ValueError("gif: no image blocks")


# ------------------------------------------------------------- encoding


def _palettize(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Exact palette when the union of colors fits 256, else 3-3-2
    posterization (documented lossy fallback)."""
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(stacked, axis=0)
    if len(colors) > 256:
        pal = np.zeros((256, 3), np.uint8)
        codes = np.arange(256, dtype=np.int64)
        pal[:, 0] = (codes >> 5) * 255 // 7
        pal[:, 1] = ((codes >> 2) & 0x07) * 255 // 7
        pal[:, 2] = (codes & 0x03) * 255 // 3
        idxs = [((f[..., 0] >> 5).astype(np.uint8) << 5
                 | (f[..., 1] >> 5).astype(np.uint8) << 2
                 | (f[..., 2] >> 6).astype(np.uint8))
                for f in frames]
        return pal, idxs
    pal = np.zeros((max(2, len(colors)), 3), np.uint8)
    pal[:len(colors)] = colors
    # map each pixel to its palette index via a dense key lookup
    key = (colors[:, 0].astype(np.int64) << 16
           | colors[:, 1].astype(np.int64) << 8
           | colors[:, 2].astype(np.int64))
    lut = dict(zip(key.tolist(), range(len(colors))))
    idxs = []
    for f in frames:
        fk = (f[..., 0].astype(np.int64) << 16
              | f[..., 1].astype(np.int64) << 8
              | f[..., 2].astype(np.int64))
        idxs.append(np.vectorize(lut.__getitem__, otypes=[np.uint8])(fk))
    return pal, idxs


def encode_gif(img_or_frames, delay_cs: int = 4) -> bytes:
    """Encode one RGB array (single-frame GIF) or a list of same-shape
    RGB arrays (animated GIF89a with per-frame graphics control).
    Lossless when ≤256 distinct colors overall."""
    frames = ([np.asarray(img_or_frames)]
              if isinstance(img_or_frames, np.ndarray)
              else [np.asarray(f) for f in img_or_frames])
    for f in frames:
        if f.ndim != 3 or f.shape[2] != 3 or f.dtype != np.uint8:
            raise ValueError("encode_gif: frames must be (h, w, 3) uint8")
        if f.shape != frames[0].shape:
            raise ValueError("encode_gif: all frames must share one shape")
    h, w = frames[0].shape[:2]
    pal, idxs = _palettize(frames)
    # GCT size: power of two ≥ len(pal), ≥ 2 entries
    bits = max(1, int(np.ceil(np.log2(len(pal)))))
    n = 1 << bits
    full = np.zeros((n, 3), np.uint8)
    full[:len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) & 0x07))  # GCT flag + size
    out += b"\x00\x00"  # bg index, aspect
    out += full.tobytes()
    animated = len(frames) > 1
    if animated:
        # NETSCAPE2.0 loop-forever application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    for fidx in idxs:
        if animated:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
            out += b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(min_code)
        lzw = _lzw_encode(fidx.reshape(-1), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


ship_by_value(sys.modules[__name__])
