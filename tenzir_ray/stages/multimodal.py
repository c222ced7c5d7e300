"""Multimodal columns: images/audio/video as opaque `binary` columns with
typed metadata; decode/feature stages as actor-pool map_batches.

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this container): ``DecodeImage`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder (seeded
by content hash) produces (height, width, channels) + a tiny feature
vector so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested end-to-end.

Design notes for 100 TB: binary payload rows are large → small
``batch_size`` (32-256), ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas well), actor pools with per-actor model state, and
``target_max_block_size`` raised so blocks aren't split absurdly small.
"""

from __future__ import annotations

import hashlib
import sys

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


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (binary payloads) for tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(128, 4096, n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                ["image/png" if k == "image" else f"{k}/raw" for k in kinds], pa.string()
            ),
            "meta": pa.array(["{}"] * n, pa.string()),
        }
    )


class DecodeImage:
    """Actor-pool image decode stage.

    Real implementation would load PIL/torchvision ONCE here; the
    container has neither, so decode is a deterministic fake keyed on the
    payload's sha256 when ``fake=True``, else NotImplementedError.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim

    def _decode_one(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/opencv, not present in this "
                "container — construct with fake=True for plumbing tests"
            )
        digest = hashlib.sha256(payload).digest()
        h = 16 + digest[0] % 64
        w = 16 + digest[1] % 64
        feats = np.frombuffer(digest[: 4 * self.feature_dim], dtype=np.uint8)[
            : self.feature_dim
        ].astype(np.float32) / 255.0
        return h, w, 3, feats

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


class FrameSampler:
    """Video frame-sample stage (stub): emits one row per sampled frame
    index — the explode plumbing is real, frame extraction is fake."""

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
