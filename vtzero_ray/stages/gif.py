"""Pure-Python/NumPy GIF codec — the container's fifth REAL media
codec (after BMP, PNG, baseline JPEG, WAV), covering the one major
compression family the others don't: dictionary coding (LZW).

Scope: GIF87a/89a static images — global/local color table, variable
code-width LZW with clear/EOI handling and table-full reset, interlaced
row order, extension-block skipping. Animated GIFs decode to their
FIRST frame. Malformed payloads raise loud ValueErrors (the PNG/JPEG
error posture); nothing is silently clamped.

LZW width-bump timing follows giflib exactly (symmetric on both sides):
the encoder checks ``next_to_assign >= 1 << width`` AFTER writing each
code and BEFORE the assignment that follows it; the decoder bumps after
each table assignment when ``next >= 1 << width``. Both sides therefore
switch widths at the same stream position — the classic off-by-one that
breaks naive LZW implementations is covered by round-trip tests over
images long enough to cross several width boundaries.

Reference semantics (what to compute) come from the GIF89a
specification; the implementation is original NumPy/Python like the
sibling codecs (stages/png.py, stages/jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

_LSD = "<HHBBB"          # logical screen descriptor (after 6-byte magic)
_IMG_DESC = "<HHHHB"     # image descriptor (after the 0x2C separator)
_MAX_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW bitstream
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit reader over the concatenated data sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF: LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-flavor LZW: emits clear first, resets on table-full, ends
    with EOI. ``indices`` is a flat uint8 array of palette indices, all
    < 2**mcs."""
    clear = 1 << mcs
    end = clear + 1
    bw = _BitWriter()
    width = mcs + 1
    next_code = end + 1
    table: dict = {}

    def emit(code: int) -> None:
        nonlocal width
        bw.write(code, width)
        # giflib timing: bump after writing, before the assignment
        if next_code >= (1 << width) and width < _MAX_WIDTH:
            width += 1

    emit(clear)
    px = indices.tolist()
    if not px:
        emit(end)
        return bw.flush()
    cur = px[0]
    for k in px[1:]:
        key = (cur, k)
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        emit(cur)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << _MAX_WIDTH):
            emit(clear)
            table.clear()
            width = mcs + 1
            next_code = end + 1
        cur = k
    emit(cur)
    emit(end)
    return bw.flush()


def lzw_decode(data: bytes, mcs: int, n_expected: int) -> np.ndarray:
    """Inverse of lzw_encode → flat uint8 index array of exactly
    ``n_expected`` pixels (loud error on short/long streams)."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"GIF: bad LZW min code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    br = _BitReader(data)
    out = bytearray()
    width = mcs + 1
    table: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = end + 1
    prev = -1
    while True:
        code = br.read(width)
        if code == clear:
            width = mcs + 1
            del table[end + 1:]
            next_code = end + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError(f"GIF: first LZW code {code} not a root")
            out += table[code]
            prev = code
            continue
        if code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        if next_code < (1 << _MAX_WIDTH):
            table.append(table[prev] + entry[:1])
            next_code += 1
            if next_code >= (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = code
        if len(out) > n_expected:
            raise ValueError("GIF: LZW stream produced too many pixels")
    if len(out) != n_expected:
        raise ValueError(
            f"GIF: LZW stream produced {len(out)} of {n_expected} pixels")
    return np.frombuffer(bytes(out), np.uint8)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _interlace_order(h: int) -> np.ndarray:
    """Row output order of an interlaced GIF (4 passes)."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def _sub_blocks(payload: bytes) -> bytes:
    """Data sub-blocks → one byte string (255-byte chunks, 0 ends)."""
    out = bytearray()
    i = 0
    while i < len(payload):
        out.append(min(255, len(payload) - i))
        out += payload[i:i + 255]
        i += 255
    out.append(0)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → GIF89a
    bytes with a global color table. Palette length must be a power of
    two in [2, 256]; every index must be < len(palette)."""
    h, w = indices.shape
    n = len(palette)
    if n < 2 or n > 256 or n & (n - 1):
        raise ValueError(f"GIF: palette size {n} not a power of two in [2,256]")
    if indices.max(initial=0) >= n:
        raise ValueError("GIF: index out of palette range")
    bits = max(1, int(n).bit_length() - 1)       # n == 2**bits
    mcs = max(2, bits)
    head = b"GIF89a" + struct.pack(_LSD, w, h, 0x80 | (bits - 1), 0, 0)
    gct = palette.astype(np.uint8).tobytes()
    desc = b"\x2c" + struct.pack(_IMG_DESC, 0, 0, w, h,
                                 0x40 if interlace else 0)
    rows = indices[_interlace_order(h)] if interlace else indices
    lzw = lzw_encode(rows.reshape(-1), mcs)
    return head + gct + desc + bytes([mcs]) + _sub_blocks(lzw) + b"\x3b"


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("GIF: truncated sub-block body")
        out += data[pos:pos + n]
        pos += n


def decode_gif_indexed(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes → ((h, w) uint8 indices, (n, 3) uint8 palette) of the
    FIRST image block. Skips extension blocks; honors local color
    tables and interlacing; loud ValueError on malformed input."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("GIF: truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from(_LSD, data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("GIF: truncated global color table")
        palette = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension: label + blocks
            if pos >= len(data):
                raise ValueError("GIF: truncated extension")
            pos += 1
            _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF: truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack_from(_IMG_DESC, data, pos)
        pos += 9
        pal = palette
        if ipacked & 0x80:                      # local color table
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("GIF: truncated local color table")
            pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: no color table for image")
        if w == 0 or h == 0:
            raise ValueError("GIF: zero-sized image")
        if pos >= len(data):
            raise ValueError("GIF: missing LZW min code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        flat = lzw_decode(lzw, mcs, w * h)
        if int(flat.max(initial=0)) >= len(pal):
            raise ValueError("GIF: pixel index outside color table")
        px = flat.reshape(h, w)
        if ipacked & 0x40:                      # deinterlace
            out = np.empty_like(px)
            out[_interlace_order(h)] = px
            px = out
        return px, pal.copy()
    raise ValueError("GIF: no image block before trailer")


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB of the first frame."""
    idx, pal = decode_gif_indexed(data)
    return pal[idx]
