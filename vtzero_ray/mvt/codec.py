"""Geometry command-stream codec (MVT spec 4.3), NumPy-vectorized.

Re-implements, from the spec and observed reference behavior, what
vtzero's geometry_decoder and feature builders compute:

- CommandInteger pack/unpack: ``(id & 0x7) | (count << 3)`` with
  MoveTo=1, LineTo=2, ClosePath=7
  (/root/reference/include/vtzero/geometry.hpp:85-118).
- ParameterIntegers are zigzag-encoded deltas from a cursor that starts at
  (0,0) per feature and persists across parts
  (/root/reference/include/vtzero/builder.hpp:690-694,843-856,1019-1040).
- Decode tolerates int32 wraparound of the cursor
  (/root/reference/include/vtzero/geometry.hpp:261-269); encode enforces the
  2^29-1 point cap (/root/reference/include/vtzero/builder.hpp:375-382).

Exception messages match the reference's geometry_exception texts so
conformance tests can assert them verbatim.
"""

from __future__ import annotations

import numpy as np

from ..exceptions import GeometryError
from .pbf import zigzag_decode32_np, zigzag_encode32_np

CMD_MOVE_TO = 1
CMD_LINE_TO = 2
CMD_CLOSE_PATH = 7

MAX_COMMAND_COUNT = (1 << 29) - 1  # geometry.hpp:115-118

GEOM_UNKNOWN = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

RING_OUTER = 0
RING_INNER = 1
RING_INVALID = 2


def command_integer(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def get_command_id(ci: int) -> int:
    return ci & 0x7


def get_command_count(ci: int) -> int:
    return ci >> 3


def _check_num_points(n: int) -> int:
    # builder.hpp:375-382
    if n >= (1 << 29):
        raise GeometryError("Maximum of 2^29 - 1 points allowed in geometry")
    return n


def _as_xy(part) -> tuple[np.ndarray, np.ndarray]:
    a = np.asarray(part)
    if a.ndim == 2 and a.shape[1] == 2:
        return a[:, 0].astype(np.int64), a[:, 1].astype(np.int64)
    raise ValueError("geometry part must be an (n, 2) array of x,y")


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def encode_point(parts) -> np.ndarray:
    """Encode a (multi)point: one MoveTo(count) then zigzag deltas.

    ``parts`` is an (n,2) array (multipoint = n>1). Mirrors
    point_feature_builder::add_points/set_point (builder.hpp:668-713):
    cursor chains across the points.
    """
    xs, ys = _as_xy(parts)
    n = _check_num_points(xs.shape[0])
    if n == 0:
        raise AssertionError("add_points() must be called with 0 < count < 2^29")
    dx = np.diff(xs, prepend=0)
    dy = np.diff(ys, prepend=0)
    cmds = np.empty(1 + 2 * n, dtype=np.uint32)
    cmds[0] = command_integer(CMD_MOVE_TO, n)
    cmds[1::2] = zigzag_encode32_np(dx)
    cmds[2::2] = zigzag_encode32_np(dy)
    return cmds


def encode_linestring(parts) -> np.ndarray:
    """Encode a (multi)linestring: per part MoveTo(1) + LineTo(count-1).

    ``parts`` is a list of (n,2) arrays. The cursor persists across parts
    (builder.hpp:843-856). Raises GeometryError on zero-length segments with
    the reference's message.
    """
    out = []
    cx = cy = 0
    for part in parts:
        xs, ys = _as_xy(part)
        n = _check_num_points(xs.shape[0])
        if n <= 1:
            raise AssertionError("add_linestring() must be called with 1 < count < 2^29")
        dx = np.diff(xs, prepend=cx)
        dy = np.diff(ys, prepend=cy)
        # zero-length segment check applies to LineTo segments only
        # (the MoveTo delta may be zero): builder.hpp:850-852
        if np.any((dx[1:] == 0) & (dy[1:] == 0)):
            raise GeometryError("Zero-length segments in linestrings are not allowed.")
        cmds = np.empty(2 + 2 * n, dtype=np.uint32)
        cmds[0] = command_integer(CMD_MOVE_TO, 1)
        cmds[1] = zigzag_encode32_np(dx[:1])[0]
        cmds[2] = zigzag_encode32_np(dy[:1])[0]
        cmds[3] = command_integer(CMD_LINE_TO, n - 1)
        cmds[4::2] = zigzag_encode32_np(dx[1:])
        cmds[5::2] = zigzag_encode32_np(dy[1:])
        out.append(cmds)
        cx, cy = int(xs[-1]), int(ys[-1])
    if not out:
        raise AssertionError("linestring feature needs at least one part")
    return np.concatenate(out)


def encode_polygon(rings) -> np.ndarray:
    """Encode a (multi)polygon: per ring MoveTo(1)+LineTo(n-2)+ClosePath.

    Each ring is an (n,2) array INCLUDING the closing point (n>=4,
    last == first), matching polygon_feature_builder::add_ring/set_point
    (builder.hpp:975-1060): the closing point is consumed by ClosePath and
    the cursor stays at the last LineTo point.
    """
    out = []
    cx = cy = 0
    for ring in rings:
        xs, ys = _as_xy(ring)
        n = _check_num_points(xs.shape[0])
        if n <= 3:
            raise AssertionError("add_ring() must be called with 3 < count < 2^29")
        if xs[-1] != xs[0] or ys[-1] != ys[0]:
            raise GeometryError("Last point in a ring must be the same as the first point.")
        body_x, body_y = xs[:-1], ys[:-1]
        dx = np.diff(body_x, prepend=cx)
        dy = np.diff(body_y, prepend=cy)
        if np.any((dx[1:] == 0) & (dy[1:] == 0)):
            raise GeometryError("Zero-length segments in rings are not allowed.")
        m = n - 1  # points emitted as MoveTo+LineTo
        cmds = np.empty(3 + 2 * m, dtype=np.uint32)
        cmds[0] = command_integer(CMD_MOVE_TO, 1)
        cmds[1] = zigzag_encode32_np(dx[:1])[0]
        cmds[2] = zigzag_encode32_np(dy[:1])[0]
        cmds[3] = command_integer(CMD_LINE_TO, m - 1)
        cmds[4:-1:2] = zigzag_encode32_np(dx[1:])
        cmds[5::2] = zigzag_encode32_np(dy[1:])
        cmds[-1] = command_integer(CMD_CLOSE_PATH, 1)
        out.append(cmds)
        cx, cy = int(body_x[-1]), int(body_y[-1])
    if not out:
        raise AssertionError("polygon feature needs at least one ring")
    return np.concatenate(out)


def encode_geometry(geom_type: int, parts) -> np.ndarray:
    if geom_type == GEOM_POINT:
        p = parts[0] if isinstance(parts, list) else parts
        if isinstance(parts, list) and len(parts) > 1:
            p = np.concatenate([np.asarray(x) for x in parts])
        return encode_point(p)
    if geom_type == GEOM_LINESTRING:
        return encode_linestring(parts)
    if geom_type == GEOM_POLYGON:
        return encode_polygon(parts)
    raise GeometryError("unknown geometry type")


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

class _Decoder:
    """Sequential command-group reader over a uint32 array.

    Mirrors detail::geometry_decoder (geometry.hpp:176-381): the cursor is
    int32 with tolerated wraparound, counts are capped by ``max_count``.
    Point runs are decoded vectorized (zigzag + cumsum), not per point.
    """

    def __init__(self, cmds: np.ndarray, max_count: int) -> None:
        self.cmds = np.asarray(cmds, dtype=np.uint32)
        self.pos = 0
        self.n = self.cmds.shape[0]
        self.max_count = max_count
        self.cx = 0
        self.cy = 0

    def done(self) -> bool:
        return self.pos >= self.n

    def next_command(self, expected_id: int) -> int | None:
        """Advance past a command integer; returns count or None at end."""
        if self.pos >= self.n:
            return None
        ci = int(self.cmds[self.pos])
        cid = get_command_id(ci)
        if cid != expected_id:
            raise GeometryError(f"expected command {expected_id} but got {cid}")
        if expected_id == CMD_CLOSE_PATH:
            # spec 4.3.3.3 "A ClosePath command MUST have a command count of 1"
            if get_command_count(ci) != 1:
                raise GeometryError("ClosePath command count is not 1")
            count = 0
        else:
            count = get_command_count(ci)
            if count > self.max_count:
                raise GeometryError("count too large")
        self.pos += 1
        return count

    def take_points(self, count: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode ``count`` cursor-relative points (vectorized; scalar fast
        path for the tiny runs that dominate point tiles)."""
        end = self.pos + 2 * count
        if end > self.n:
            raise GeometryError("too few points in geometry")
        params = self.cmds[self.pos:end]
        self.pos = end
        if count <= 4:
            p = params.tolist()
            xs = np.empty(count, dtype=np.int32)
            ys = np.empty(count, dtype=np.int32)
            cx, cy = self.cx, self.cy
            for i in range(count):
                vx, vy = p[2 * i], p[2 * i + 1]
                cx = (cx + ((vx >> 1) ^ -(vx & 1))) & 0xFFFFFFFF
                cy = (cy + ((vy >> 1) ^ -(vy & 1))) & 0xFFFFFFFF
                cx = cx - 0x100000000 if cx >= 0x80000000 else cx
                cy = cy - 0x100000000 if cy >= 0x80000000 else cy
                xs[i] = cx
                ys[i] = cy
            self.cx = cx
            self.cy = cy
            return xs, ys
        dx = zigzag_decode32_np(params[0::2])
        dy = zigzag_decode32_np(params[1::2])
        # int64 cumsum then int32 wrap == per-step int32 wrap (mod 2^32 adds
        # are associative; |delta| <= 2^31 and count < 2^29 so no i64 overflow)
        xs = (self.cx + np.cumsum(dx)).astype(np.uint32).astype(np.int32)
        ys = (self.cy + np.cumsum(dy)).astype(np.uint32).astype(np.int32)
        self.cx = int(xs[-1])
        self.cy = int(ys[-1])
        return xs, ys


def decode_point(cmds: np.ndarray, max_count: int | None = None) -> np.ndarray:
    """Decode a (multi)point per spec 4.3.4.2 → (n,2) int32 array."""
    if max_count is None:
        max_count = len(cmds) // 2
    d = _Decoder(cmds, max_count)
    count = d.next_command(CMD_MOVE_TO)
    if count is None:
        raise GeometryError("expected MoveTo command (spec 4.3.4.2)")
    if count == 0:
        raise GeometryError("MoveTo command count is zero (spec 4.3.4.2)")
    xs, ys = d.take_points(count)
    if not d.done():
        raise GeometryError("additional data after end of geometry (spec 4.3.4.2)")
    return np.stack([xs, ys], axis=1)


def decode_linestring(cmds: np.ndarray, max_count: int | None = None) -> list[np.ndarray]:
    """Decode a (multi)linestring per spec 4.3.4.3 → list of (n,2) arrays."""
    if max_count is None:
        max_count = len(cmds) // 2
    d = _Decoder(cmds, max_count)
    parts: list[np.ndarray] = []
    while True:
        count = d.next_command(CMD_MOVE_TO)
        if count is None:
            break
        if count != 1:
            raise GeometryError("MoveTo command count is not 1 (spec 4.3.4.3)")
        fx, fy = d.take_points(1)
        count = d.next_command(CMD_LINE_TO)
        if count is None:
            raise GeometryError("expected LineTo command (spec 4.3.4.3)")
        if count == 0:
            raise GeometryError("LineTo command count is zero (spec 4.3.4.3)")
        xs, ys = d.take_points(count)
        part = np.empty((count + 1, 2), dtype=np.int32)
        part[0, 0] = fx[0]
        part[0, 1] = fy[0]
        part[1:, 0] = xs
        part[1:, 1] = ys
        parts.append(part)
    return parts


def decode_polygon(cmds: np.ndarray, max_count: int | None = None) -> list[tuple[np.ndarray, int, int]]:
    """Decode a (multi)polygon per spec 4.3.4.4.

    Returns a list of (ring_points_with_close, signed_area_x2, ring_type);
    ring classification matches geometry.hpp:162-169 (sum>0 outer on
    screen-y-down axes, <0 inner, ==0 invalid).
    """
    if max_count is None:
        max_count = len(cmds) // 2
    d = _Decoder(cmds, max_count)
    rings: list[tuple[np.ndarray, int, int]] = []
    while True:
        count = d.next_command(CMD_MOVE_TO)
        if count is None:
            break
        if count != 1:
            raise GeometryError("MoveTo command count is not 1 (spec 4.3.4.4)")
        sx, sy = d.take_points(1)
        count = d.next_command(CMD_LINE_TO)
        if count is None:
            raise GeometryError("expected LineTo command (spec 4.3.4.4)")
        xs, ys = d.take_points(count) if count > 0 else (np.empty(0, np.int32), np.empty(0, np.int32))
        if d.next_command(CMD_CLOSE_PATH) is None:
            raise GeometryError("expected ClosePath command (spec 4.3.4.4)")
        ring = np.empty((count + 2, 2), dtype=np.int32)
        ring[0, 0] = sx[0]
        ring[0, 1] = sy[0]
        ring[1:-1, 0] = xs
        ring[1:-1, 1] = ys
        ring[-1] = ring[0]
        # shoelace 2x area with int64 cross products (det, geometry.hpp:120-123)
        ax = ring[:-1, 0].astype(np.int64)
        ay = ring[:-1, 1].astype(np.int64)
        bx = ring[1:, 0].astype(np.int64)
        by = ring[1:, 1].astype(np.int64)
        s = int(np.sum(ax * by - bx * ay))
        rt = RING_OUTER if s > 0 else (RING_INNER if s < 0 else RING_INVALID)
        rings.append((ring, s, rt))
    return rings


def decode_geometry(cmds: np.ndarray, geom_type: int, max_count: int | None = None):
    """Dispatch on geometry type (geometry.hpp:448-462)."""
    if geom_type == GEOM_POINT:
        return decode_point(cmds, max_count)
    if geom_type == GEOM_LINESTRING:
        return decode_linestring(cmds, max_count)
    if geom_type == GEOM_POLYGON:
        return decode_polygon(cmds, max_count)
    raise GeometryError("unknown geometry type")
