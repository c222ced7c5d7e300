"""MPEG audio (MP3) frame parsing — spec-implemented from the public
header syntax (ISO/IEC 11172-3 §2.4.1.3 for MPEG-1, ISO/IEC 13818-3 for
MPEG-2, plus the de-facto MPEG-2.5 extension), the same metadata surface
ffprobe exposes. This is a FRAME-LEVEL parser: sync walk, per-frame
header decode, exact sample-accurate duration (CBR and VBR alike — the
walk sums real per-frame sample counts instead of trusting a Xing
header), ID3v2/ID3v1 tag skipping. Full PCM synthesis (huffman + IMDCT +
polyphase filterbank) stays an honest NotImplementedError in
stages/multimodal.py — this container has no audio codecs — but
sample_rate/channels/duration/bitrate now decode for REAL.

Reference analog: the reference ships no audio decoding at all; this
serves the multimodal-pipeline axis (opaque binary columns + typed
metadata stages).
"""

from __future__ import annotations

# bitrate tables in kbps, indexed by header bitrate_index 1..14
# (index 0 = "free format", index 15 = forbidden)
_BITRATES = {
    # (version_group, layer): table ; version_group 1 = MPEG-1, 2 = MPEG-2/2.5
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

# sample-rate tables in Hz, indexed by header sampling_frequency 0..2
_RATES = {
    3: [44100, 48000, 32000],   # version bits 11 = MPEG-1
    2: [22050, 24000, 16000],   # version bits 10 = MPEG-2
    0: [11025, 12000, 8000],    # version bits 00 = MPEG-2.5
}

#: samples per frame by (version_group, layer)
_SAMPLES = {
    (1, 1): 384, (1, 2): 1152, (1, 3): 1152,
    (2, 1): 384, (2, 2): 1152, (2, 3): 576,
}


def _parse_header(b: bytes, i: int) -> dict | None:
    """Decode the 4-byte frame header at offset i, or None if not a
    valid sync/field combination."""
    if i + 4 > len(b):
        return None
    b0, b1, b2, b3 = b[i], b[i + 1], b[i + 2], b[i + 3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 0x3   # 00=2.5 01=reserved 10=2 11=1
    layer_bits = (b1 >> 1) & 0x3     # 01=III 10=II 11=I
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits           # 1, 2 or 3
    vgroup = 1 if version_bits == 3 else 2
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        # free-format (0) needs out-of-band frame size — decline honestly
        return None
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3           # 11 = single channel
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx] * 1000
    rate = _RATES[version_bits][rate_idx]
    if layer == 1:
        size = (12 * bitrate // rate + padding) * 4
    elif vgroup == 1 or layer == 2:
        size = 144 * bitrate // rate + padding
    else:                             # MPEG-2/2.5 layer III: 576 samples
        size = 72 * bitrate // rate + padding
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[version_bits],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": rate,
        "channels": 1 if mode == 3 else 2,
        "samples": _SAMPLES[(vgroup, layer)],
        "size": size,
    }


def _skip_id3v2(b: bytes) -> int:
    """Offset past a leading ID3v2 tag (syncsafe 28-bit size)."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
        | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    return 10 + size + (10 if len(b) > 5 and (b[5] & 0x10) else 0)


def parse_frames(data: bytes, max_resync: int = 4096) -> list[dict]:
    """Walk every frame in an MPEG audio stream: skip ID3v2, then decode
    header → jump frame size, resyncing over at most ``max_resync`` junk
    bytes between frames (broadcast streams carry garbage; a parser that
    trusts the first sync blindly mis-walks them). Each entry carries
    ``offset`` in addition to the header fields. Stops at a trailing
    ID3v1 tag ('TAG', 128 bytes)."""
    frames: list[dict] = []
    i = _skip_id3v2(data)
    n = len(data)
    while i + 4 <= n:
        if data[i:i + 3] == b"TAG" and n - i == 128:
            break  # ID3v1 trailer
        h = _parse_header(data, i)
        if h is None:
            # resync: scan forward for the next plausible header
            j = data.find(b"\xff", i + 1, i + 1 + max_resync)
            while 0 <= j and j + 4 <= n:
                if _parse_header(data, j) is not None:
                    break
                j = data.find(b"\xff", j + 1, i + 1 + max_resync)
            if j < 0 or j + 4 > n or _parse_header(data, j) is None:
                break
            i = j
            continue
        h["offset"] = i
        frames.append(h)
        i += h["size"]
    return frames


def mp3_info(data: bytes) -> dict | None:
    """Stream-level metadata from a full frame walk: exact duration (sum
    of per-frame samples ÷ that frame's rate — correct for VBR without a
    Xing header), average bitrate, vbr flag. None when no frame parses
    (not an MPEG audio stream)."""
    frames = parse_frames(data)
    if not frames:
        return None
    dur = sum(f["samples"] / f["sample_rate"] for f in frames)
    rates = {f["bitrate"] for f in frames}
    return {
        "sample_rate": frames[0]["sample_rate"],
        "channels": frames[0]["channels"],
        "duration_s": dur,
        "frames": len(frames),
        "bitrate_kbps": (sum(f["bitrate"] for f in frames)
                         / len(frames) / 1000.0),
        "vbr": len(rates) > 1,
        "version": frames[0]["version"],
        "layer": frames[0]["layer"],
    }


def build_frames(n_frames: int, bitrate_kbps: int = 128,
                 sample_rate: int = 44100, channels: int = 2,
                 fill: int = 0) -> bytes:
    """Construct a structurally-valid MPEG-1 Layer III stream (header +
    zero-fill payloads) — spec-exact sizes/sync, silent garbage audio.
    For tests and SQL-predictable gate corpora (no encoder exists in
    this container; the headers are the real product here)."""
    idx = _BITRATES[(1, 3)].index(bitrate_kbps)
    ridx = _RATES[3].index(sample_rate)
    b1 = 0xE0 | (3 << 3) | (1 << 1) | 1          # MPEG-1, layer III
    b2 = (idx << 4) | (ridx << 2)                 # no padding
    b3 = (0x3 << 6) if channels == 1 else 0x00    # mono / stereo
    size = 144 * bitrate_kbps * 1000 // sample_rate
    frame = bytes([0xFF, b1, b2, b3]) + bytes([fill]) * (size - 4)
    return frame * n_frames


import sys as _sys

from tenzir_ray._ship import ship_by_value as _ship
_ship(_sys.modules[__name__])
