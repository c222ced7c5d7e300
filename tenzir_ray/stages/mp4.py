"""MP4 / ISO Base Media File Format demuxer — spec-implemented from the
public box grammar (ISO/IEC 14496-12: size+fourcc box walk, 64-bit
largesize, moov/trak/mdia/minf/stbl hierarchy) plus the QuickTime-era
'jpeg'/'mjpa' Motion-JPEG sample entries. This is a DEMUXER, not a
codec: it resolves the full sample table (stsd codec fourcc, stsz
sizes, stsc sample→chunk runs, stco/co64 chunk offsets, stts timing)
into absolute (offset, size) sample locations, so Motion-JPEG tracks
decode for REAL through stages/jpeg.py while avc1/hev1 payloads remain
an honest NotImplementedError (no H.26x codec in this container —
their stream METADATA still parses: codec, dims, frame count, exact
duration). ``build_mp4`` muxes a structurally valid single-track file
(ftyp+mdat+moov, one chunk per sample) for tests and SQL-predictable
gate corpora.

Reference analog: the reference ships no video handling at all; this
serves the multimodal-pipeline axis (opaque binary columns + typed
metadata + actor-pool decode stages).
"""

from __future__ import annotations

import struct


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", data, i)[0]
        typ = data[i + 4:i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            if i + 16 > end:
                return
            size = struct.unpack_from(">Q", data, i + 8)[0]
            body = i + 16
        elif size == 0:  # box extends to the end of the enclosing space
            size = end - i
        if size < 8 or i + size > end:
            return  # malformed/truncated — stop walking, keep what we have
        yield typ, body, i + size
        i += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for typ, b, e in _walk(data, start, end):
        if typ == fourcc:
            return b, e
    return None


def _full(data: bytes, body: int) -> tuple[int, int]:
    """FullBox header: returns (version, first byte after version+flags)."""
    return data[body], body + 4


def _parse_stsd(data: bytes, b: int, e: int) -> dict:
    _, p = _full(data, b)
    n = struct.unpack_from(">I", data, p)[0]
    p += 4
    out = {"codec": "", "width": 0, "height": 0}
    if n >= 1 and p + 8 <= e:
        entry_size = struct.unpack_from(">I", data, p)[0]
        out["codec"] = data[p + 4:p + 8].decode("latin-1")
        # VisualSampleEntry: 8 box + 6 reserved + 2 data_ref_index +
        # 16 predefined/reserved → width/height at +32 (14496-12 §12.1.3)
        if entry_size >= 36 and p + 36 <= e:
            out["width"], out["height"] = struct.unpack_from(">HH", data, p + 32)
    return out


def _parse_track(data: bytes, b: int, e: int) -> dict | None:
    mdia = _find(data, b, e, b"mdia")
    if mdia is None:
        return None
    hdlr = _find(data, *mdia, b"hdlr")
    kind = ""
    if hdlr is not None:
        handler = data[hdlr[0] + 8:hdlr[0] + 12]
        kind = {b"vide": "video", b"soun": "audio"}.get(handler,
                                                        handler.decode("latin-1"))
    mdhd = _find(data, *mdia, b"mdhd")
    timescale, duration = 0, 0
    if mdhd is not None:
        ver, p = _full(data, mdhd[0])
        if ver == 1:
            timescale, duration = struct.unpack_from(">IQ", data, p + 16)
        else:
            timescale, duration = struct.unpack_from(">II", data, p + 8)
    minf = _find(data, *mdia, b"minf")
    stbl = _find(data, *minf, b"stbl") if minf else None
    if stbl is None:
        return None
    tr: dict = {"kind": kind, "timescale": timescale,
                "duration_s": duration / timescale if timescale else 0.0}
    stsd = _find(data, *stbl, b"stsd")
    tr.update(_parse_stsd(data, *stsd) if stsd else
              {"codec": "", "width": 0, "height": 0})

    # sample sizes
    sizes: list[int] = []
    stsz = _find(data, *stbl, b"stsz")
    if stsz is not None:
        _, p = _full(data, stsz[0])
        fixed, count = struct.unpack_from(">II", data, p)
        sizes = ([fixed] * count if fixed
                 else list(struct.unpack_from(f">{count}I", data, p + 8)))
    tr["n_samples"] = len(sizes)

    # chunk offsets (stco 32-bit / co64 64-bit)
    offsets: list[int] = []
    stco = _find(data, *stbl, b"stco")
    if stco is not None:
        _, p = _full(data, stco[0])
        cnt = struct.unpack_from(">I", data, p)[0]
        offsets = list(struct.unpack_from(f">{cnt}I", data, p + 4))
    else:
        co64 = _find(data, *stbl, b"co64")
        if co64 is not None:
            _, p = _full(data, co64[0])
            cnt = struct.unpack_from(">I", data, p)[0]
            offsets = list(struct.unpack_from(f">{cnt}Q", data, p + 4))

    # sample→chunk runs: (first_chunk, samples_per_chunk, desc_idx),
    # each run applies until the next entry's first_chunk
    runs: list[tuple[int, int]] = []
    stsc = _find(data, *stbl, b"stsc")
    if stsc is not None:
        _, p = _full(data, stsc[0])
        cnt = struct.unpack_from(">I", data, p)[0]
        for k in range(cnt):
            first, per, _d = struct.unpack_from(">III", data, p + 4 + 12 * k)
            runs.append((first, per))

    # resolve absolute (offset, size) per sample
    locs: list[tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(offsets, start=1):
        per = 1
        for first, cnt_per in runs:
            if first <= ci:
                per = cnt_per
            else:
                break
        off = coff
        for _ in range(per):
            if si >= len(sizes):
                break
            locs.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    tr["samples"] = locs
    return tr


def mp4_info(data: bytes) -> dict | None:
    """Container metadata from a full box walk: brand, movie duration,
    per-track codec/dims/sample count/exact duration. None when the
    file is not ISO-BMFF (no ftyp/moov)."""
    boxes = {t: (b, e) for t, b, e in _walk(data, 0, len(data))}
    if b"moov" not in boxes:
        return None
    brand = ""
    if b"ftyp" in boxes:
        fb, _fe = boxes[b"ftyp"]
        brand = data[fb:fb + 4].decode("latin-1")
    mb, me = boxes[b"moov"]
    out: dict = {"brand": brand, "tracks": []}
    mvhd = _find(data, mb, me, b"mvhd")
    if mvhd is not None:
        ver, p = _full(data, mvhd[0])
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", data, p + 16)
        else:
            ts, dur = struct.unpack_from(">II", data, p + 8)
        out["duration_s"] = dur / ts if ts else 0.0
    for typ, b, e in _walk(data, mb, me):
        if typ == b"trak":
            tr = _parse_track(data, b, e)
            if tr is not None:
                out["tracks"].append(tr)
    return out if out["tracks"] or "duration_s" in out else None


#: Motion-JPEG sample-entry fourccs whose samples are plain baseline
#: JPEG images (decodable by stages/jpeg.py)
MJPEG_CODECS = {"jpeg", "mjpa", "mjpb"}


def mp4_video_samples(data: bytes) -> tuple[dict, list[bytes]] | None:
    """The first video track's metadata and raw sample payloads, or
    None when the file isn't MP4 / has no video track."""
    info = mp4_info(data)
    if info is None:
        return None
    for tr in info["tracks"]:
        if tr["kind"] == "video":
            return tr, [data[o:o + s] for o, s in tr["samples"]]
    return None


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def build_mp4(frames: list[bytes], fps: int = 10, width: int = 0,
              height: int = 0, codec: bytes = b"jpeg",
              timescale: int = 1000) -> bytes:
    """Mux a structurally valid single-video-track MP4 (ftyp + mdat +
    moov; one chunk per sample — the layout every muxer accepts).
    With codec=b'jpeg' and baseline-JPEG frames the result demuxes AND
    decodes for real; sizes/offsets/durations are spec-exact."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    base = len(ftyp) + 8  # first sample starts after the mdat header
    offs, sizes, o = [], [], base
    for f in frames:
        offs.append(o)
        sizes.append(len(f))
        o += len(f)

    delta = timescale // fps
    dur = delta * len(frames)
    n = len(frames)

    sample_entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1)
                        + b"\x00" * 16
                        + struct.pack(">HH", width, height)
                        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
                        + b"\x00" * 4 + struct.pack(">H", 1)
                        + b"\x00" * 32
                        + struct.pack(">Hh", 24, -1))
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stts = _box(b"stts", struct.pack(">II", 0, 1)
                + struct.pack(">II", n, delta))
    stsc = _box(b"stsc", struct.pack(">II", 0, 1)
                + struct.pack(">III", 1, 1, 1))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, n)
                + struct.pack(f">{n}I", *sizes))
    stco = _box(b"stco", struct.pack(">II", 0, n)
                + struct.pack(f">{n}I", *offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url_ = _box(b"url ", struct.pack(">I", 1))  # flag: data in this file
    dref = _box(b"dref", struct.pack(">II", 0, 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _box(b"vmhd", struct.pack(">I", 1) + b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                + b"\x00" * 12 + b"video\x00")
    mdhd = _box(b"mdhd", struct.pack(">I", 0)
                + struct.pack(">IIII", 0, 0, timescale, dur)
                + struct.pack(">HH", 0x55C4, 0))  # 'und' language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">I", 7)  # enabled|in-movie|preview
                + struct.pack(">IIII", 0, 0, 1, 0)
                + struct.pack(">I", dur) + b"\x00" * 12
                + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(b"mvhd", struct.pack(">I", 0)
                + struct.pack(">IIII", 0, 0, timescale, dur)
                + struct.pack(">IHH", 0x10000, 0x100, 0)
                + b"\x00" * 8
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


import sys as _sys

from tenzir_ray._ship import ship_by_value as _ship

_ship(_sys.modules[__name__])
