"""Minimal protobuf wire codec (the subset MVT needs), pure Python + NumPy.

This replaces protozero in the reference (vtzero uses protozero's
pbf_builder/pbf_message; see /root/reference/include/vtzero/types.hpp:92-114
for the fixed tag layout). Only the wire features MVT uses are implemented:
varint, zigzag, fixed32/fixed64, length-delimited, packed-uint32 fields.

Hot-path helpers are vectorized over NumPy arrays (packed command streams,
batch varint encoding) so `map_batches` kernels never loop per byte.
"""

from __future__ import annotations

import struct

import numpy as np

# wire types
WT_VARINT = 0
WT_FIXED64 = 1
WT_LEN = 2
WT_FIXED32 = 5

_U64_MASK = (1 << 64) - 1


def tag_byte(field: int, wire_type: int) -> bytes:
    """Encode a field tag. All MVT fields are < 16 → single byte."""
    key = (field << 3) | wire_type
    if key < 0x80:
        return bytes([key])
    return encode_varint(key)


def encode_varint(value: int) -> bytes:
    """Scalar varint encode of a non-negative (or 64-bit wrapped) int."""
    value &= _U64_MASK
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf, pos: int) -> tuple[int, int]:
    """Decode a varint from ``buf`` at ``pos`` → (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        try:
            b = buf[pos]
        except IndexError:
            raise ValueError("end of buffer while reading varint") from None
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def zigzag_encode32(value: int) -> int:
    """protozero::encode_zigzag32 equivalent (wraps to uint32 space)."""
    v = value & 0xFFFFFFFF
    if v >= 0x80000000:
        v -= 1 << 32
    return ((v << 1) ^ (v >> 31)) & 0xFFFFFFFF


def zigzag_decode32(value: int) -> int:
    """protozero::decode_zigzag32 equivalent."""
    return (value >> 1) ^ -(value & 1)


def zigzag_encode64(value: int) -> int:
    v = value
    return ((v << 1) ^ (v >> 63)) & _U64_MASK


def zigzag_decode64(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


# ---------------------------------------------------------------------------
# vectorized helpers (NumPy)
# ---------------------------------------------------------------------------

def zigzag_encode32_np(values: np.ndarray) -> np.ndarray:
    """Vectorized zigzag32: int32/int64 array → uint32 array.

    Matches spec 4.3.2 ParameterInteger encoding used at
    /root/reference/include/vtzero/builder.hpp:617-618.
    """
    v = values.astype(np.int32, copy=False)
    return ((v.astype(np.uint32) << np.uint32(1)) ^ (v >> 31).astype(np.uint32))


def zigzag_decode32_np(values: np.ndarray) -> np.ndarray:
    """Vectorized zigzag32 decode: uint32 array → int64 array (pre-wrap)."""
    v = values.astype(np.uint32, copy=False)
    return ((v >> np.uint32(1)).astype(np.int64)) ^ -((v & np.uint32(1)).astype(np.int64))


def encode_varints_np(values: np.ndarray) -> bytes:
    """Varint-encode a uint64 array into one bytes blob (vectorized).

    Computes per-value byte length, then fills an output byte array with at
    most 10 vectorized passes (one per varint byte position) — no per-value
    Python loop. This is the hot inner writer for packed geometry fields.
    """
    v = values.astype(np.uint64, copy=False)
    n = v.shape[0]
    if n == 0:
        return b""
    nbits = varint_lengths_np(v)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbits, out=offsets[1:])
    total = int(offsets[-1])
    out = np.empty(total, dtype=np.uint8)
    maxlen = int(nbits.max())
    starts = offsets[:-1]
    shifted = v.copy()
    for k in range(maxlen):
        mask = nbits > k
        idx = starts[mask] + k
        byte = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbits[mask] > (k + 1)).astype(np.uint8) << np.uint8(7)
        out[idx] = byte | cont
        shifted >>= np.uint64(7)
    return out.tobytes()


_VARINT_THRESHOLDS = [np.uint64(1 << (7 * k)) for k in range(1, 10)]


def varint_lengths_np(values: np.ndarray) -> np.ndarray:
    """Per-value varint byte length for a uint64 array (branch-free:
    one vectorized >= per possible extra byte, early-exited on max)."""
    v = values.astype(np.uint64, copy=False)
    lens = np.ones(v.shape[0], dtype=np.int64)
    if v.shape[0] == 0:
        return lens
    vmax = v.max()
    for t in _VARINT_THRESHOLDS:
        if vmax < t:
            break
        lens += v >= t
    return lens


def decode_packed_uint32(data: bytes) -> np.ndarray:
    """Decode a packed repeated-uint32 payload into a uint32 NumPy array.

    Small payloads (the common single-point-feature case) take a scalar
    path — the vectorized path's array setup costs ~20µs, which dominates
    3-element streams. Large payloads are fully vectorized: find varint
    boundaries from the continuation bits, then combine byte groups.
    """
    if len(data) <= 32:
        vals = []
        pos = 0
        n = len(data)
        while pos < n:
            v, pos = decode_varint(data, pos)
            vals.append(v & 0xFFFFFFFF)
        return np.array(vals, dtype=np.uint32)
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint32)
    is_last = (raw & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("end of buffer while reading varint")
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if lengths.max() > 10:
        raise ValueError("varint too long")
    vals = np.zeros(ends.shape[0], dtype=np.uint64)
    payload = (raw & 0x7F).astype(np.uint64)
    maxlen = int(lengths.max())
    for k in range(maxlen):
        mask = lengths > k
        vals[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return vals.astype(np.uint32)


# ---------------------------------------------------------------------------
# field writers (scalar, for builder metadata — not per-point hot path)
# ---------------------------------------------------------------------------

def field_varint(field: int, value: int) -> bytes:
    return tag_byte(field, WT_VARINT) + encode_varint(value)


def field_bytes(field: int, payload: bytes) -> bytes:
    return tag_byte(field, WT_LEN) + encode_varint(len(payload)) + payload


def field_fixed32(field: int, value: float) -> bytes:
    return tag_byte(field, WT_FIXED32) + struct.pack("<f", value)


def field_fixed64(field: int, value: float) -> bytes:
    return tag_byte(field, WT_FIXED64) + struct.pack("<d", value)


def iter_fields(data: bytes):
    """Iterate protobuf fields of a message: yields (field, wire_type, value).

    value is: int for varint, bytes view (memoryview) for length-delimited,
    4/8-byte memoryview for fixed32/64.
    """
    view = memoryview(data)
    pos = 0
    n = len(view)
    while pos < n:
        key, pos = decode_varint(view, pos)
        field = key >> 3
        wt = key & 0x7
        if wt == WT_VARINT:
            value, pos = decode_varint(view, pos)
        elif wt == WT_LEN:
            length, pos = decode_varint(view, pos)
            if pos + length > n:
                raise ValueError("end of buffer while reading length-delimited field")
            value = view[pos:pos + length]
            pos += length
        elif wt == WT_FIXED32:
            if pos + 4 > n:
                raise ValueError("end of buffer while reading fixed32")
            value = view[pos:pos + 4]
            pos += 4
        elif wt == WT_FIXED64:
            if pos + 8 > n:
                raise ValueError("end of buffer while reading fixed64")
            value = view[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, value
