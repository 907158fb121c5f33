"""vtzero-check-equivalent tile validator (the conformance gate).

Reproduces the rules and grading of
/root/reference/examples/vtzero-check.cpp:21-229:
exit grades 0 ok / 1 warning / 2 error / 3 fatal; layer-level checks
(empty/duplicate names :188-200, no-features warning :208-211, no-layers
warning :215-218) and per-geometry checks via the handler (:51-168):
point beyond [-extent, 2*extent] warning, linestring <2 points,
duplicate consecutive points, ring <4 points, zero-area ring,
first ring not outer.
"""

from __future__ import annotations

import numpy as np

from . import codec
from ..exceptions import GeometryError
from .decoder import VectorTile
from .pbf import decode_varint

OK = 0
WARNING = 1
ERROR = 2
FATAL = 3


def _check_point_scalar(geometry_data: bytes, extent: int, diags, ctx: str) -> None:
    """Scalar decode+bounds for POINT features (same error semantics as
    codec.decode_point; avoids per-feature numpy setup — the hot
    validation path for point corpora)."""
    vals = []
    pos = 0
    n = len(geometry_data)
    while pos < n:
        v, pos = decode_varint(geometry_data, pos)
        vals.append(v & 0xFFFFFFFF)
    if not vals:
        raise GeometryError("expected MoveTo command (spec 4.3.4.2)")
    ci = vals[0]
    if ci & 0x7 != 1:
        raise GeometryError(f"expected command 1 but got {ci & 0x7}")
    count = ci >> 3
    if count == 0:
        raise GeometryError("MoveTo command count is zero (spec 4.3.4.2)")
    if count > n // 2:
        raise GeometryError("count too large")
    if len(vals) - 1 < 2 * count:
        raise GeometryError("too few points in geometry")
    if len(vals) - 1 > 2 * count:
        raise GeometryError("additional data after end of geometry (spec 4.3.4.2)")
    cx = cy = 0
    lo, hi = -extent, 2 * extent
    for i in range(count):
        vx, vy = vals[1 + 2 * i], vals[2 + 2 * i]
        cx = (cx + ((vx >> 1) ^ -(vx & 1))) & 0xFFFFFFFF
        cy = (cy + ((vy >> 1) ^ -(vy & 1))) & 0xFFFFFFFF
        cx = cx - 0x100000000 if cx >= 0x80000000 else cx
        cy = cy - 0x100000000 if cy >= 0x80000000 else cy
        if cx < lo or cy < lo or cx > hi or cy > hi:
            diags.append((WARNING, f"Warning{ctx}point waaaay beyond the extent"))


def _check_points_location(points: np.ndarray, extent: int, diags, ctx: str) -> None:
    lo, hi = -extent, 2 * extent
    xs = points[:, 0].astype(np.int64)
    ys = points[:, 1].astype(np.int64)
    n_out = int(np.count_nonzero((xs < lo) | (ys < lo) | (xs > hi) | (ys > hi)))
    for _ in range(n_out):
        diags.append((WARNING, f"Warning{ctx}point waaaay beyond the extent"))


def _dup_count(points: np.ndarray) -> int:
    if points.shape[0] < 2:
        return 0
    same = (points[1:] == points[:-1]).all(axis=1)
    return int(np.count_nonzero(same))


def check_tile(data: bytes) -> tuple[int, list[tuple[int, str]]]:
    """Validate one serialized tile → (return_code, diagnostics).

    Diagnostics are (severity, message) tuples; severities follow the
    reference's grading.
    """
    diags: list[tuple[int, str]] = []
    code = OK

    def grade(severity: int) -> None:
        nonlocal code
        code = max(code, severity)

    layer_names: set[bytes] = set()
    tile = VectorTile(data)
    layer_num = 0
    feature_num = -1
    try:
        for layer in tile.layers():
            if layer.name == b"":
                diags.append((ERROR, f"Error in layer {layer_num}: name is empty (spec 4.1)"))
                grade(ERROR)
            if layer.name in layer_names:
                diags.append((
                    ERROR,
                    f"Error in layer {layer_num}: name is duplicate of previous layer "
                    f"('{layer.name.decode('utf-8', 'replace')}') (spec 4.1)",
                ))
                grade(ERROR)
            layer_names.add(layer.name)

            feature_num = 0
            extent = layer.extent
            for feature in layer.features():
                ctx = f" in layer {layer_num} in feature {feature_num} in geometry: "
                if feature.geom_type == codec.GEOM_POINT:
                    _check_point_scalar(feature.geometry_data, extent, diags, ctx)
                    feature_num += 1
                    continue
                decoded = feature.decode_geometry()
                if feature.geom_type == codec.GEOM_POINT:
                    _check_points_location(decoded, extent, diags, ctx)
                elif feature.geom_type == codec.GEOM_LINESTRING:
                    for part in decoded:
                        if part.shape[0] < 2:
                            diags.append((ERROR, f"Error{ctx}Not enough points in linestring"))
                            grade(ERROR)
                        d = _dup_count(part)
                        for _ in range(d):
                            diags.append((ERROR, f"Error{ctx}Duplicate point in linestring"))
                            grade(ERROR)
                        _check_points_location(part, extent, diags, ctx)
                elif feature.geom_type == codec.GEOM_POLYGON:
                    for ring_idx, (ring, _area2, rt) in enumerate(decoded):
                        if ring.shape[0] < 4:
                            diags.append((ERROR, f"Error{ctx}Not enough points in ring"))
                            grade(ERROR)
                        d = _dup_count(ring)
                        for _ in range(d):
                            diags.append((ERROR, f"Error{ctx}Duplicate point in ring"))
                            grade(ERROR)
                        if rt == codec.RING_INVALID:
                            diags.append((ERROR, f"Error{ctx}Invalid ring with area 0"))
                            grade(ERROR)
                        if ring_idx == 0 and rt != codec.RING_OUTER:
                            diags.append((ERROR, f"Error{ctx}First ring isn't an outer ring"))
                            grade(ERROR)
                        _check_points_location(ring, extent, diags, ctx)
                feature_num += 1
            if feature_num == 0:
                diags.append((WARNING, f"Warning: No features in layer {layer_num} (spec 4.1)"))
                grade(WARNING)
            feature_num = -1
            layer_num += 1
        if layer_num == 0:
            diags.append((WARNING, "Warning: No layers in vector tile (spec 4.1)"))
            grade(WARNING)
    except Exception as e:  # fatal: malformed pbf / spec violations
        where = f"layer {layer_num}"
        if feature_num >= 0:
            where += f" in feature {feature_num}"
        diags.append((FATAL, f"Fatal error in {where}: {e}"))
        grade(FATAL)

    # recompute grade from diagnostics (warnings appended by helpers)
    for sev, _ in diags:
        code = max(code, sev)
    return code, diags
