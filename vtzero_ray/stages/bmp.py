"""Pure-NumPy BMP codec — 24-bit uncompressed BITMAPINFOHEADER, no image
library needed. A LEAF module (imports nothing from the package) so both
`stages/png.py` (format dispatch) and `stages/multimodal.py` (media
stages) can import it at module scope without a cycle: worker-executed
UDF bodies cannot do function-local package imports under ship-by-value,
and cyclic by-value module pickles recurse in cloudpickle.
"""

from __future__ import annotations

import struct

import numpy as np

# plain format strings, NOT struct.Struct instances — compiled Struct
# objects don't pickle, and these globals ride into Ray workers with
# every stage that references the codec
_BMP_HEADER = "<2sIHHI"          # magic, file size, res, res, data offset
_BMP_INFO = "<IiiHHIIiiII"       # BITMAPINFOHEADER


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up
    rows, BGR order, 4-byte row padding)."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = px.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # flip + RGB→BGR
    body = rows.tobytes()
    info = struct.pack(_BMP_INFO, 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack(_BMP_HEADER, b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB (top-down).
    Malformed input raises ValueError — never crashes the process."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _file_size, _, _, offset = struct.unpack_from(_BMP_HEADER, data, 0)
    (hdr, w, h, planes, bpp, comp, *_rest) = struct.unpack_from(_BMP_INFO, data, 14)
    if hdr < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr} bpp={bpp} comp={comp})")
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    flip = h > 0          # positive height = bottom-up storage
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    need = offset + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} < {need}")
    rows = np.frombuffer(data, np.uint8, count=stride * h, offset=offset)
    px = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
    return px[::-1] if flip else px
