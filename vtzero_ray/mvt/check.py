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
from ..exceptions import FormatError, GeometryError
from .decoder import Feature, VectorTile

OK = 0
WARNING = 1
ERROR = 2
FATAL = 3


def _check_point_scalar(buf, pos: int, n: int, extent: int, diags, ctx: str) -> None:
    """Scalar decode+bounds for POINT features (same error semantics as
    codec.decode_point; avoids per-feature numpy setup and byte copies —
    the hot validation path for point corpora). ``pos``/``n`` delimit the
    geometry payload within ``buf``."""
    vals = []
    gbytes = n - pos
    while pos < n:
        v = buf[pos]
        pos += 1
        if v & 0x80:
            v &= 0x7F
            shift = 7
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
        vals.append(v & 0xFFFFFFFF)
    if not vals:
        raise GeometryError("expected MoveTo command (spec 4.3.4.2)")
    ci = vals[0]
    if ci & 0x7 != 1:
        raise GeometryError(f"expected command 1 but got {ci & 0x7}")
    count = ci >> 3
    if count == 0:
        raise GeometryError("MoveTo command count is zero (spec 4.3.4.2)")
    if count > gbytes // 2:
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
            lbuf = layer.data
            for fspan in layer._feature_spans:
                # inline minimal feature parse (type/geometry/tag parity):
                # building a full Feature object measured ~2x the cost of
                # the validation itself on point corpora; spans avoid a
                # per-feature byte copy
                fbuf = lbuf
                fpos, fn = fspan
                ftype = 0
                fgeom = None
                tags_ok = True
                malformed = None
                while fpos < fn:
                    fkey = fbuf[fpos]
                    fpos += 1
                    if fkey & 0x80:
                        fkey &= 0x7F
                        shift = 7
                        while True:
                            fb_ = fbuf[fpos]
                            fpos += 1
                            fkey |= (fb_ & 0x7F) << shift
                            if not fb_ & 0x80:
                                break
                            shift += 7
                    ffield = fkey >> 3
                    fwt = fkey & 0x7
                    if fwt == 0:
                        v = fbuf[fpos]
                        fpos += 1
                        if v & 0x80:
                            v &= 0x7F
                            shift = 7
                            while True:
                                fb_ = fbuf[fpos]
                                fpos += 1
                                v |= (fb_ & 0x7F) << shift
                                if not fb_ & 0x80:
                                    break
                                shift += 7
                        if ffield == 3:
                            if v > 3:
                                malformed = "Unknown geometry type (spec 4.3.4)"
                                break
                            ftype = v
                    elif fwt == 2:
                        ln = fbuf[fpos]
                        fpos += 1
                        if ln & 0x80:
                            ln &= 0x7F
                            shift = 7
                            while True:
                                fb_ = fbuf[fpos]
                                fpos += 1
                                ln |= (fb_ & 0x7F) << shift
                                if not fb_ & 0x80:
                                    break
                                shift += 7
                        if ffield == 4:
                            if fgeom is not None:
                                malformed = "Feature has more than one geometry field"
                                break
                            if ln > 0:  # empty geometry field == missing
                                fgeom = (fpos, fpos + ln)
                        elif ffield == 2:
                            raw = fbuf[fpos:fpos + ln]
                            if sum(1 for bb in raw if bb < 0x80) % 2:
                                malformed = "unpaired property key/value indexes (spec 4.4)"
                                break
                        fpos += ln
                    elif fwt == 5:
                        fpos += 4
                    elif fwt == 1:
                        fpos += 8
                    else:
                        malformed = f"unsupported wire type {fwt}"
                        break
                if malformed is None and fgeom is None:
                    malformed = "Missing geometry field in feature (spec 4.2)"
                if malformed is not None:
                    raise FormatError(malformed)
                ctx = f" in layer {layer_num} in feature {feature_num} in geometry: "
                if ftype == codec.GEOM_POINT:
                    _check_point_scalar(fbuf, fgeom[0], fgeom[1], extent, diags, ctx)
                    feature_num += 1
                    continue
                feature = Feature(layer, lbuf, fspan)
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
