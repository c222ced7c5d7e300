"""Multimodal columns: images/audio/video as opaque `binary` columns with
typed metadata; decode/feature/resize stages as actor-pool map_batches.

Decode is REAL for the dependency-free formats this container can
handle end-to-end:

- images: uncompressed 24-bit **BMP** and binary **PPM (P6)** — parsed
  straight out of the payload bytes with numpy (no PIL/opencv needed);
- audio: **WAV** (PCM) via the stdlib ``wave`` module + numpy features
  (RMS, zero-crossing rate, duration);
- compressed formats (png/jpeg/mp3/video) remain STUBBED behind
  ``NotImplementedError`` unless ``fake=True`` (deterministic fake keyed
  on the content hash) — the decode libraries are not in this container,
  but the Ray-side plumbing (schema, batch sizing, actor signature,
  output layout) is identical and fully exercised by the real formats.

Design notes for 100 TB: binary payload rows are large → small
``batch_size`` (32-256), ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas well), actor pools with per-actor state, and
``target_max_block_size`` raised so blocks aren't split absurdly small.
"""

from __future__ import annotations

import hashlib
import io
import struct
import sys
import wave

import numpy as np
import pyarrow as pa

from tenzir_ray._ship import ship_by_value

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),  # JSON sidecar metadata
    ]
)


# ---------------------------------------------------------------------------
# real codecs (dependency-free formats)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER)."""
    h, w, _ = rgb.shape
    row_pad = (-(w * 3)) % 4
    body_size = (w * 3 + row_pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + body_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_size, 2835, 2835, 0, 0)
    # BMP stores rows bottom-up, BGR
    bgr = rgb[::-1, :, ::-1]
    rows = bytearray()
    pad = b"\x00" * row_pad
    for r in range(h):
        rows += bgr[r].tobytes() + pad
    return header + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Parse an uncompressed 24-bit BMP into an (h, w, 3) RGB uint8 array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    row_bytes = w * 3 + ((-(w * 3)) % 4)
    arr = np.frombuffer(data, dtype=np.uint8, count=row_bytes * abs(h), offset=off)
    arr = arr.reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm(data: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) payload into (h, w, 3) RGB uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts, idx = [], 2
    while len(parts) < 3:
        while idx < len(data) and data[idx : idx + 1].isspace():
            idx += 1
        if data[idx : idx + 1] == b"#":  # comment line
            idx = data.index(b"\n", idx) + 1
            continue
        start = idx
        while idx < len(data) and not data[idx : idx + 1].isspace():
            idx += 1
        parts.append(int(data[start:idx]))
    idx += 1  # single whitespace after maxval
    w, h, _maxval = parts
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=idx)
    return arr.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, rate: int = 16000, channels: int = 1) -> bytes:
    """PCM16 WAV writer via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """(rate, channels, int16 samples[frames, channels]) from WAV bytes."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate, channels = f.getframerate(), f.getnchannels()
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        raw = f.readframes(f.getnframes())
    arr = np.frombuffer(raw, dtype=np.int16).reshape(-1, channels)
    return rate, channels, arr


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media table with REAL payloads: BMP images and WAV
    audio (decodable end-to-end), plus raw 'video' blobs for the stub
    path."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads, mimes = [], []
    for k in kinds:
        if k == "image":
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(img))
            mimes.append("image/bmp")
        elif k == "audio":
            dur = int(rng.integers(400, 4000))
            t = np.arange(dur)
            freq = float(rng.uniform(100, 1000))
            samples = (np.sin(2 * np.pi * freq * t / 16000) * 12000).astype(np.int16)
            payloads.append(encode_wav(samples))
            mimes.append("audio/wav")
        else:
            payloads.append(
                rng.integers(0, 256, size=int(rng.integers(128, 4096)),
                             dtype=np.uint8).tobytes()
            )
            mimes.append("video/raw")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "meta": pa.array(["{}"] * n, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# stages


class DecodeImage:
    """Actor-pool image decode stage.

    BMP/PPM payloads decode for real (numpy parser, once-per-actor setup
    cost is nil by design); other formats raise unless ``fake=True``
    (a real deployment would load PIL/torchvision ONCE here — same
    signature, same output schema)."""

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim

    def _features(self, img: np.ndarray) -> np.ndarray:
        gray = img.mean(axis=2)
        feats = np.array(
            [
                img[..., 0].mean(), img[..., 1].mean(), img[..., 2].mean(),
                gray.std(),
                gray[: gray.shape[0] // 2].mean(),
                gray[gray.shape[0] // 2 :].mean(),
                gray[:, : gray.shape[1] // 2].mean(),
                gray[:, gray.shape[1] // 2 :].mean(),
            ],
            dtype=np.float32,
        ) / 255.0
        out = np.zeros(self.feature_dim, dtype=np.float32)
        out[: min(len(feats), self.feature_dim)] = feats[: self.feature_dim]
        return out

    def _decode_one(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if payload[:2] == b"BM":
            img = decode_bmp(payload)
        elif payload[:2] == b"P6":
            img = decode_ppm(payload)
        elif self.fake:
            digest = hashlib.sha256(payload).digest()
            h = 16 + digest[0] % 64
            w = 16 + digest[1] % 64
            feats = np.frombuffer(digest[: 4 * self.feature_dim], dtype=np.uint8)[
                : self.feature_dim
            ].astype(np.float32) / 255.0
            return h, w, 3, feats
        else:
            raise NotImplementedError(
                "compressed image decode (png/jpeg) requires PIL/opencv, "
                "not present in this container — BMP/PPM decode for real, "
                "or construct with fake=True for plumbing tests"
            )
        return img.shape[0], img.shape[1], img.shape[2], self._features(img)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, cs, feats = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            h, w, c, f = self._decode_one(payload or b"")
            hs.append(h); ws.append(w); cs.append(c); feats.append(f.tolist())
        return batch.drop_columns(["payload"]).append_column(
            "height", pa.array(hs, pa.int32())
        ).append_column("width", pa.array(ws, pa.int32())).append_column(
            "channels", pa.array(cs, pa.int32())
        ).append_column("features", pa.array(feats, pa.list_(pa.float32())))


def decode_images(ds, fake: bool = False, concurrency=(1, 2), batch_size: int = 64):
    """Binary-payload decode as an actor pool; small batches (large rows)."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_args=(fake,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImage:
    """Real image resize stage (nearest-neighbor via numpy index grids):
    BMP/PPM in → BMP out at (out_h, out_w). The canonical
    preprocess-for-training transform."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h = out_h
        self.out_w = out_w

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        ri = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
        ci = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
        return img[ri[:, None], ci[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("payload").to_pylist():
            payload = payload or b""
            if payload[:2] == b"BM":
                img = decode_bmp(payload)
            elif payload[:2] == b"P6":
                img = decode_ppm(payload)
            else:
                raise NotImplementedError("resize supports BMP/PPM payloads")
            out.append(encode_bmp(self._resize(img)))
        i = batch.schema.get_field_index("payload")
        return batch.set_column(i, "payload", pa.array(out, pa.binary()))


def resize_images(ds, out_h: int, out_w: int, concurrency=(1, 2),
                  batch_size: int = 64):
    return ds.map_batches(
        ResizeImage,
        fn_constructor_args=(out_h, out_w),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class DecodeAudio:
    """Real WAV (PCM16) decode + features: sample rate, channels,
    duration, RMS, zero-crossing rate."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, chans, durs, rms, zcr = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            payload = payload or b""
            if payload[:4] == b"RIFF":
                rate, ch, samples = decode_wav(payload)
                x = samples[:, 0].astype(np.float64)
                rates.append(rate)
                chans.append(ch)
                durs.append(len(samples) / rate)
                rms.append(float(np.sqrt((x * x).mean())) if len(x) else 0.0)
                zcr.append(
                    float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
                    if len(x) > 1 else 0.0
                )
            elif self.fake:
                digest = hashlib.sha256(payload).digest()
                rates.append(16000)
                chans.append(1)
                durs.append(digest[0] / 16.0)
                rms.append(digest[1] / 255.0)
                zcr.append(digest[2] / 255.0)
            else:
                raise NotImplementedError(
                    "compressed audio (mp3/ogg) needs external codecs; WAV "
                    "decodes for real, or construct with fake=True"
                )
        return batch.drop_columns(["payload"]).append_column(
            "sample_rate", pa.array(rates, pa.int32())
        ).append_column("channels", pa.array(chans, pa.int32())).append_column(
            "duration_s", pa.array(durs, pa.float64())
        ).append_column("rms", pa.array(rms, pa.float64())).append_column(
            "zcr", pa.array(zcr, pa.float64())
        )


def decode_audio(ds, fake: bool = False, concurrency=(1, 2), batch_size: int = 64):
    return ds.map_batches(
        DecodeAudio,
        fn_constructor_args=(fake,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame-sample stage (stub): emits one row per sampled frame
    index — the explode plumbing is real, frame extraction is fake
    (video codecs are not in this container)."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video decode not available in container")
        ids, frames = [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            n_frames = max(1, len(payload or b"") // 256)
            for i in range(0, n_frames, self.every_n):
                ids.append(mid)
                frames.append(i)
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()), "frame_idx": pa.array(frames, pa.int32())}
        )


def sample_frames(ds, every_n: int = 10, fake: bool = True,
                  concurrency=(1, 2), batch_size: int = 32):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(every_n, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


ship_by_value(sys.modules[__name__])
