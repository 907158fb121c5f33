"""Pure-NumPy + stdlib-zlib PNG codec — the second REAL image codec in
this container (next to the BMP codec in multimodal.py; no Pillow/ffmpeg
is installed, so both codecs are library-free by construction).

Scope (documented, validated, errors loud):
- decode: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 6
  (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
  interlace 0 only. Chunk CRCs are verified. Malformed input raises
  ValueError — never crashes the process (same contract as decode_bmp).
- encode: color type 2 (RGB), one IDAT, selectable per-row filter
  (default 0) — the filter knob exists so tests can exercise every
  defilter path against a numpy ground truth.

Vectorization: None/Up defilter whole rows at once; Sub is an exact
per-channel-lane cumsum mod 256 (vectorized); Average/Paeth carry an
intra-row data dependency, so those rows fall back to a per-pixel-group
scan — acceptable because the stage processes many images per batch in
parallel actors, and corpora we encode ourselves use filters 0-2.
"""

from __future__ import annotations

import struct
import zlib


import numpy as np

# name imports at module scope: decode_image dispatches to the sibling
# codecs inside Ray workers, where function-local package imports fail
# under ship-by-value. bmp/gif/jpeg are LEAF modules, so this is acyclic
# (multimodal imports THIS module's names, never the reverse).
from .bmp import decode_bmp
from .gif import decode_gif
from .jpeg import decode_jpeg

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(px: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (color type 2, 8-bit, one IDAT).

    ``filter_type`` applies the SAME filter to every row (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) — exposed so tests can round-trip every
    defilter branch; 0 is the hot-path default (zlib does the work).
    """
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    h, w, _ = px.shape
    raw = px.astype(np.int16)
    if filter_type == 0:
        filt = px
    else:
        left = np.zeros_like(raw)
        left[:, 1:] = raw[:, :-1]
        up = np.zeros_like(raw)
        up[1:] = raw[:-1]
        if filter_type == 1:
            filt = ((raw - left) % 256).astype(np.uint8)
        elif filter_type == 2:
            filt = ((raw - up) % 256).astype(np.uint8)
        elif filter_type == 3:
            filt = ((raw - (left + up) // 2) % 256).astype(np.uint8)
        else:  # Paeth
            ul = np.zeros_like(raw)
            ul[1:, 1:] = raw[:-1, :-1]
            filt = ((raw - _paeth(left, up, ul)) % 256).astype(np.uint8)
    scan = np.empty((h, 1 + 3 * w), np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = filt.reshape(h, 3 * w)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan.tobytes(), level))
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise (int16 in, int16 out)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _parse_chunks(data: bytes):
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("not a PNG payload")
    off = 8
    while off + 12 <= len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4:off + 8]
        body = data[off + 8:off + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", data, off + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in PNG chunk {tag!r}")
        yield tag, body
        off += 12 + ln
        if tag == b"IEND":
            return
    raise ValueError("PNG ended without IEND")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array: (h, w) for grayscale, (h, w, 3)
    for RGB/palette, (h, w, 4) for RGBA. Raises ValueError on anything
    outside the documented scope."""
    ihdr = None
    plte = None
    idat = []
    for tag, body in _parse_chunks(data):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={ctype} comp={comp})")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if w == 0 or h == 0:
        raise ValueError("bad PNG dimensions")
    ch = _CHANNELS[ctype]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG deflate stream: {e}") from None
    stride = 1 + ch * w
    if len(raw) != stride * h:
        raise ValueError(f"bad PNG data length {len(raw)} != {stride * h}")
    scan = np.frombuffer(raw, np.uint8).reshape(h, stride)
    px = _defilter(scan[:, 1:].copy(), scan[:, 0], ch).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index out of range")
        return plte[idx]
    if ctype == 0:
        return px[:, :, 0]
    return px


def _defilter(rows: np.ndarray, ftypes: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters in place. rows: (h, w*bpp) uint8 of
    filtered bytes; ftypes: (h,) filter byte per row."""
    h, rb = rows.shape
    prev = np.zeros(rb, np.int16)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y].astype(np.int16)
        if f == 0:
            pass
        elif f == 1:   # Sub: exact cumsum mod 256 per channel lane
            cur = cur.reshape(-1, bpp).cumsum(axis=0, dtype=np.int64) % 256
            cur = cur.reshape(rb).astype(np.int16)
        elif f == 2:   # Up: whole-row vector add
            cur = (cur + prev) % 256
        elif f == 3:   # Average: intra-row dependency → pixel-group scan
            out = np.empty(rb, np.int16)
            left = np.zeros(bpp, np.int16)
            for x in range(0, rb, bpp):
                px = (cur[x:x + bpp] + (left + prev[x:x + bpp]) // 2) % 256
                out[x:x + bpp] = px
                left = px
            cur = out
        elif f == 4:   # Paeth: intra-row dependency → pixel-group scan
            out = np.empty(rb, np.int16)
            left = np.zeros(bpp, np.int16)
            ul = np.zeros(bpp, np.int16)
            for x in range(0, rb, bpp):
                up = prev[x:x + bpp]
                px = (cur[x:x + bpp] + _paeth(left, up, ul)) % 256
                out[x:x + bpp] = px
                ul = up.copy()
                left = px
            cur = out
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        rows[y] = cur.astype(np.uint8)
        prev = cur
    return rows


def sniff_image(payload: bytes) -> str:
    """'png' | 'bmp' | 'jpeg' | 'gif' | 'unknown' from magic bytes."""
    if payload[:8] == _SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


def decode_image(payload: bytes) -> np.ndarray:
    """Format-sniffing decode: PNG, BMP, baseline JPEG or GIF → uint8
    RGB (h, w, 3). Grayscale expands to 3 channels; RGBA drops alpha;
    GIF palettes expand to RGB (documented)."""
    kind = sniff_image(payload)
    if kind == "png":
        px = decode_png(payload)
        if px.ndim == 2:
            return np.repeat(px[:, :, None], 3, axis=2)
        return px[:, :, :3]
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "jpeg":
        px = decode_jpeg(payload)
        if px.ndim == 2:
            return np.repeat(px[:, :, None], 3, axis=2)
        return px
    if kind == "gif":
        return decode_gif(payload)
    raise ValueError("payload is not PNG, BMP, JPEG or GIF")
