"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The Ray-side plumbing (schemas, batch sizing for wide binary rows, actor
signatures, output layout) is real and tested; the media DECODE itself is
STUBBED — the container has no image/audio libraries — behind
``decoder="fake"`` (deterministic bytes-derived features) or
``decoder="real"`` which raises NotImplementedError until a codec library
is installed. Swapping in a real decoder changes ONE method.

Batch-size note (memory-aware, ray_guide): wide binary rows must ride in
SMALL batches — size batch_size so batch_bytes x concurrency fits the
worker heap; these stages default to 64-row batches.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("width", pa.int32()),            # typed metadata (kind-dependent)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media(n: int = 256, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[np.arange(n) % 3]
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(((np.arange(n) * 37) % 1024 + 64).astype(np.int32)),
        "height": pa.array(((np.arange(n) * 53) % 768 + 64).astype(np.int32)),
        "sample_rate": pa.array(np.where(kinds == "audio", 16000, 0).astype(np.int32)),
        "duration_ms": pa.array(((np.arange(n) * 97) % 30000).astype(np.int32)),
    })


class ImageDecode:
    """Actor-pool stage: payload → pixel features.

    decoder="fake": deterministic digest-derived 8-dim feature (pipeline
    plumbing testable without codec libs). decoder="real": plug a real
    image library here — NotImplementedError until one is installed.
    """

    def __init__(self, decoder: str = "fake") -> None:
        self.decoder = decoder
        if decoder == "real":  # probe for a real codec lib once per actor
            try:
                import PIL  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode requires an imaging library; "
                    "this container has none — use decoder='fake'"
                ) from e

    def _features(self, payload: bytes) -> np.ndarray:
        d = hashlib.blake2b(payload, digest_size=32).digest()
        return np.frombuffer(d, dtype=np.uint32).astype(np.float32) / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p.as_py()) for p in batch.column("payload")]
        return batch.drop_columns(["payload"]).append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), 8))
        )


class ImageResize:
    """Actor-pool stage: target-size metadata transform + (stub) payload
    re-encode. Real resize goes in _resize_payload."""

    def __init__(self, target: int = 256, decoder: str = "fake") -> None:
        self.target = target
        self.decoder = decoder

    def _resize_payload(self, payload: bytes, w: int, h: int) -> bytes:
        if self.decoder == "real":
            raise NotImplementedError("real resize requires an imaging library")
        # deterministic fake: truncate/pad payload proportionally
        scale = (self.target * self.target) / max(1, w * h)
        n = max(16, min(len(payload), int(len(payload) * scale)))
        return payload[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy()
        h = batch.column("height").to_numpy()
        scale = self.target / np.maximum(w, h).clip(min=1)
        nw = np.maximum(1, (w * scale)).astype(np.int32)
        nh = np.maximum(1, (h * scale)).astype(np.int32)
        payloads = [
            self._resize_payload(p.as_py(), int(wi), int(hi))
            for p, wi, hi in zip(batch.column("payload"), w, h)
        ]
        out = batch.drop_columns(["payload", "width", "height"])
        return (
            out.append_column("payload", pa.array(payloads, pa.binary()))
            .append_column("width", pa.array(nw))
            .append_column("height", pa.array(nh))
        )


class FrameSample:
    """Video → frame rows (flat_map shape): every ``every_ms`` milliseconds,
    one frame row. Frame extraction stubbed (payload slice); the explode
    plumbing and output schema are real."""

    def __init__(self, every_ms: int = 1000, decoder: str = "fake") -> None:
        self.every_ms = every_ms
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ts, frames = [], [], []
        for mid, kind, dur, p in zip(batch.column("media_id").to_pylist(),
                                     batch.column("kind").to_pylist(),
                                     batch.column("duration_ms").to_pylist(),
                                     batch.column("payload")):
            if kind != "video":
                continue
            payload = p.as_py()
            n_frames = max(1, dur // self.every_ms)
            for i in range(n_frames):
                if self.decoder == "real":
                    raise NotImplementedError("real frame decode requires a video library")
                lo = (i * 64) % max(1, len(payload) - 64)
                ids.append(mid)
                ts.append(i * self.every_ms)
                frames.append(payload[lo:lo + 64])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_ts_ms": pa.array(ts, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def media_pipeline(n: int = 256):
    """Demo pipeline: synth corpus → decode features (images) + frame
    sampling (videos), small batches for wide binary rows."""
    import ray.data as rd

    ds = rd.from_arrow(synth_media(n)).repartition(8)
    images = ds.filter(lambda r: r["kind"] == "image")
    feats = images.map_batches(ImageDecode, batch_format="pyarrow",
                               batch_size=64, concurrency=(1, 4))
    frames = ds.map_batches(FrameSample, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 4))
    return feats, frames
