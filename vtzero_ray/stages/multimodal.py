"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

Three decoder modes:
- ``decoder="numpy"``: REAL pixel decode via the pure-NumPy codecs —
  the 24-bit BMP codec below (encode_bmp/decode_bmp), the PNG codec in
  stages/png.py (stdlib zlib inflate + all five scanline filters) and
  the baseline JPEG codec in stages/jpeg.py (Huffman entropy coding,
  4:4:4/4:2:0, restart markers), format-sniffed per payload. Decode,
  pixel features, nearest-neighbor resize and frame extraction all
  operate on actual pixels with no external library.
- ``decoder="fake"``: deterministic bytes-derived features (plumbing
  testable on arbitrary payloads).
- ``decoder="real"``: plug a media library (Pillow/ffmpeg) here for
  formats beyond BMP/PNG/JPEG — NotImplementedError until one is
  installed; swapping it in changes ONE method per stage.

Batch-size note (memory-aware, ray_guide): wide binary rows must ride in
SMALL batches — size batch_size so batch_bytes x concurrency fits the
worker heap; these stages default to 64-row batches.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

# name imports at module scope (worker bodies dispatch to sibling codecs;
# function-local package imports fail under ship-by-value). Acyclic: bmp/
# gif/jpeg are leaves and png imports only those leaves.
from .bmp import decode_bmp, encode_bmp
from .gif import decode_gif_indexed, encode_gif
from .jpeg import encode_jpeg
from .png import decode_image, encode_png, sniff_image

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


# ---------------------------------------------------------------------------
# pure-NumPy BMP codec lives in stages/bmp.py (leaf module shared with
# the png dispatch); decode_bmp/encode_bmp are re-exported above.
# ---------------------------------------------------------------------------


def synth_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels: (id*7 + x*13 + y*31 + c*97) % 256 — the
    same closed form the SQL oracle reproduces with generate_series."""
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((media_id * 7 + x * 13 + y * 31 + c * 97) % 256).astype(np.uint8)


def _bmp_dims(media_id: int) -> tuple[int, int]:
    return 8 + (media_id * 37) % 25, 8 + (media_id * 53) % 25


def synth_media_bmp(n: int = 128) -> pa.Table:
    """Deterministic REAL-BMP image corpus (media_id-derived pixels)."""
    ids = np.arange(n, dtype=np.int64)
    payloads, ws, hs = [], [], []
    for i in ids:
        w, h = _bmp_dims(int(i))
        payloads.append(encode_bmp(synth_pixels(int(i), w, h)))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(ids),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
    })


def split_bmp_frames(payload: bytes) -> list[bytes]:
    """Concatenated-BMP 'video' container → list of frame bytes. Each
    frame's extent is the file-size field of its header; a malformed
    tail raises ValueError rather than looping."""
    frames = []
    off = 0
    while off < len(payload):
        if payload[off:off + 2] != b"BM" or off + 6 > len(payload):
            raise ValueError(f"bad frame header at offset {off}")
        (size,) = struct.unpack_from("<I", payload, off + 2)
        if size < 54 or off + size > len(payload):
            raise ValueError(f"bad frame size {size} at offset {off}")
        frames.append(payload[off:off + size])
        off += size
    return frames


def _png_dims(media_id: int) -> tuple[int, int]:
    return 8 + (media_id * 41) % 25, 8 + (media_id * 29) % 25


def synth_media_png(n: int = 128) -> pa.Table:
    """Deterministic REAL-PNG image corpus: the same media_id-derived
    pixel formula as the BMP corpus, PNG-encoded with filter type
    ``media_id % 5`` — so a full sweep exercises every defilter branch
    (None/Sub/Up/Average/Paeth) against the SQL pixel oracle."""
    from .png import encode_png

    ids = np.arange(n, dtype=np.int64)
    payloads, ws, hs = [], [], []
    for i in ids:
        w, h = _png_dims(int(i))
        payloads.append(encode_png(synth_pixels(int(i), w, h),
                                   filter_type=int(i) % 5))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(ids),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
    })


def _jpeg_dims(media_id: int) -> tuple[int, int]:
    return 8 + (media_id * 43) % 25, 8 + (media_id * 23) % 25


def synth_media_jpeg(n: int = 128) -> pa.Table:
    """Deterministic REAL-JPEG image corpus — exact through a LOSSY
    codec: grayscale, quality 100 (all-ones quant tables) and one
    constant value per 8x8 block, value = (id*7 + (x//8)*13 +
    (y//8)*31) % 256. Flat blocks carry a single integer DC coefficient
    (8*(v-128)), which quantizes, Huffman-codes and inverse-transforms
    back to v with zero error, so the SQL pixel-formula oracle checks
    every byte of the entropy decode. Edge padding replicates the last
    real pixel, which shares its 8-wide block, so boundary blocks stay
    flat. Restart interval cycles media_id % 3 (0 = none), exercising
    DRI/RSTn segmentation and the destuffer across the corpus."""
    from .jpeg import encode_jpeg

    ids = np.arange(n, dtype=np.int64)
    payloads, ws, hs = [], [], []
    for i in ids:
        w, h = _jpeg_dims(int(i))
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        px = ((int(i) * 7 + bx[None, :] * 13 + by[:, None] * 31) % 256
              ).astype(np.uint8)
        payloads.append(encode_jpeg(px, quality=100,
                                    restart_interval=int(i) % 3))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(ids),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
    })


def _gif_dims(media_id: int) -> tuple[int, int]:
    return 8 + (media_id * 47) % 25, 8 + (media_id * 19) % 25


def synth_media_gif(n: int = 128) -> pa.Table:
    """Deterministic REAL-GIF image corpus: palette size cycles
    2^((id % 4) + 5) (32..256 colors, so the LZW min-code-size and
    color-table-size fields vary), palette entry j = ((j*7)%256,
    (j*13)%256, (j*29)%256), pixel index = (id*11 + x*3 + y*5) %
    palette_size, and odd ids are INTERLACED — the full decode matrix
    (LZW widths, GCT sizes, interlace passes) against one SQL
    closed form."""
    from .gif import encode_gif

    ids = np.arange(n, dtype=np.int64)
    payloads, ws, hs = [], [], []
    for i in ids:
        w, h = _gif_dims(int(i))
        ps = 1 << ((int(i) % 4) + 5)
        j = np.arange(ps, dtype=np.int64)
        pal = np.stack([(j * 7) % 256, (j * 13) % 256, (j * 29) % 256],
                       axis=1).astype(np.uint8)
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        idx = ((int(i) * 11 + x * 3 + y * 5) % ps).astype(np.uint8)
        payloads.append(encode_gif(idx, pal, interlace=bool(i % 2)))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(ids),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
    })


class ImageStats:
    """REAL pixel statistics from encoded image payloads (format-sniffed:
    PNG, BMP, baseline JPEG or GIF) — integer channel sums so the DuckDB
    oracle reproduces them exactly. Dimensions come from the decoded
    pixels, NOT the metadata columns.

    STATELESS, so drive it as a task-pool stage (pass an INSTANCE to
    map_batches, no concurrency arg): actor-pool spin-up costs more than
    the decode on small corpora, and there is no per-actor setup to
    amortize. ImageDecode below (which probes codec libs once) is the
    actor-pool example."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload")):
            px = decode_image(p.as_py()).astype(np.int64)
            ids.append(mid)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            s = px.sum(axis=(0, 1))
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(np.array(ws, np.int32)),
            "height": pa.array(np.array(hs, np.int32)),
            "sum_r": pa.array(sr, pa.int64()),
            "sum_g": pa.array(sg, pa.int64()),
            "sum_b": pa.array(sb, pa.int64()),
        })


# backwards-compatible name: the BMP-only corpus flows through the same
# sniffing stage (a BMP payload decodes identically)
BMPStats = ImageStats


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
                    "this container has none — use decoder='fake' or "
                    "decoder='numpy' (pure-NumPy BMP/PNG/JPEG)"
                ) from e

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder == "numpy":
            # REAL pixel-derived features from the pure-NumPy codecs
            # (format-sniffed: PNG via stages/png.py or 24-bit BMP)
            px = decode_image(payload).astype(np.float64)
            gray = px.mean(axis=2)
            h, w, _ = px.shape
            return np.array([w, h,
                             px[:, :, 0].mean(), px[:, :, 1].mean(),
                             px[:, :, 2].mean(), gray.std(),
                             gray.min(), gray.max()], np.float32)
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
        if self.decoder == "numpy":
            # REAL nearest-neighbor resize via the pure-NumPy codecs;
            # the output re-encodes in the SOURCE format (PNG stays PNG)
            if sniff_image(payload) == "gif":
                # palette images resize in INDEX space (exact — no
                # re-quantization) and keep their color table
                idx, pal = decode_gif_indexed(payload)
                sh, sw = idx.shape
                scale = self.target / max(sh, sw, 1)
                nh = max(1, int(sh * scale))
                nw = max(1, int(sw * scale))
                yi = np.minimum((np.arange(nh) / scale).astype(np.int64),
                                sh - 1)
                xi = np.minimum((np.arange(nw) / scale).astype(np.int64),
                                sw - 1)
                return encode_gif(np.ascontiguousarray(idx[yi][:, xi]), pal)
            px = decode_image(payload)
            sh, sw = px.shape[:2]
            scale = self.target / max(sh, sw, 1)
            nw = max(1, int(sw * scale))
            nh = max(1, int(sh * scale))
            yi = np.minimum((np.arange(nh) / scale).astype(np.int64), sh - 1)
            xi = np.minimum((np.arange(nw) / scale).astype(np.int64), sw - 1)
            out = np.ascontiguousarray(px[yi][:, xi])
            kind = sniff_image(payload)
            if kind == "png":
                return encode_png(out)
            if kind == "jpeg":
                return encode_jpeg(out, quality=90)
            return encode_bmp(out)
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
            if self.decoder == "numpy":
                # REAL frame extraction: the "video" container is a
                # concatenation of BMP frames; each frame's extent is its
                # declared file size (header offset 2)
                for i, frame in enumerate(split_bmp_frames(payload)):
                    ids.append(mid)
                    ts.append(i * self.every_ms)
                    frames.append(frame)
                continue
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
