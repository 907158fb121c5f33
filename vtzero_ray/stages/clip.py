"""Geometry clipping to a (buffered) tile box — the "clip" step of the
north rule's geoparse → assign → clip → encode pipeline.

The reference (mapbox/vtzero) encodes pre-clipped geometry and its
fixture corpus includes clipped-square tiles (test/fixture_tests.cpp
910-988, cases 053-056); the clipping itself happens upstream in that
stack. Here it is a first-class vectorized stage:

- ``liang_barsky``: segment ∩ axis-aligned box, whole-array NumPy — the
  parametric formulation (one divide + min/max per axis) chosen over
  Cohen-Sutherland because it is branch-free and therefore vectorizes.
  Every float expression is mirrored token-for-token by the DuckDB
  oracle SQL (``__ray_entry__.oracle_sql: clipped_segments_z2``), so
  clipped integer coordinates are bit-identical across engines.
- ``chain_parts``: surviving segments → multi-part polylines (a part
  breaks where a segment was clipped away or endpoints no longer meet).
- ``clip_ring``: Sutherland-Hodgman polygon ∩ box, vectorized per
  half-plane (4 passes over the whole ring, no per-vertex Python).

Scale shape: clipping is embarrassingly parallel per segment; the only
replication is one row per (segment, candidate tile) where candidates
come from the segment's buffered bbox — bounded by the tile span of a
segment, independent of corpus size.
"""

from __future__ import annotations

import numpy as np

# sentinels instead of +-inf: the SQL mirror uses the same literals so
# GREATEST/LEAST never see NULL/inf (DuckDB float div-by-zero -> NULL)
_TMIN = -1e300
_TMAX = 1e300


def liang_barsky(x0, y0, x1, y1, lo: float, hi: float):
    """Clip N segments to the box [lo, hi]^2 (single NumPy pass).

    Inputs are int64 world/tile coordinates; returns ``(keep, cx0, cy0,
    cx1, cy1)`` with rounded int64 clipped endpoints. ``keep`` is False
    for segments outside the box, touching it only at a point (t0 == t1)
    or rounding to zero length. Zero-length INPUT segments must be
    dropped by the caller (consecutive-duplicate dedup) — with both
    deltas zero the parametric form is undefined.
    """
    x0f = x0.astype(np.float64)
    y0f = y0.astype(np.float64)
    dxf = (x1 - x0).astype(np.float64)
    dyf = (y1 - y0).astype(np.float64)
    lo = float(lo)
    hi = float(hi)

    with np.errstate(divide="ignore", invalid="ignore"):
        tlo_x = (lo - x0f) / dxf
        thi_x = (hi - x0f) / dxf
        tlo_y = (lo - y0f) / dyf
        thi_y = (hi - y0f) / dyf

    te_x = np.where(dxf > 0, tlo_x, np.where(dxf < 0, thi_x, _TMIN))
    tx_x = np.where(dxf > 0, thi_x, np.where(dxf < 0, tlo_x, _TMAX))
    te_y = np.where(dyf > 0, tlo_y, np.where(dyf < 0, thi_y, _TMIN))
    tx_y = np.where(dyf > 0, thi_y, np.where(dyf < 0, tlo_y, _TMAX))

    rej_x = (dxf == 0) & ((x0f < lo) | (x0f > hi))
    rej_y = (dyf == 0) & ((y0f < lo) | (y0f > hi))

    t0 = np.maximum(0.0, np.maximum(te_x, te_y))
    t1 = np.minimum(1.0, np.minimum(tx_x, tx_y))
    keep = ~rej_x & ~rej_y & (t0 < t1)

    cx0 = np.floor(x0f + t0 * dxf + 0.5).astype(np.int64)
    cy0 = np.floor(y0f + t0 * dyf + 0.5).astype(np.int64)
    cx1 = np.floor(x0f + t1 * dxf + 0.5).astype(np.int64)
    cy1 = np.floor(y0f + t1 * dyf + 0.5).astype(np.int64)
    keep &= (cx0 != cx1) | (cy0 != cy1)
    return keep, cx0, cy0, cx1, cy1


def chain_parts(seg_idx, cx0, cy0, cx1, cy1):
    """Surviving segments of ONE polyline (sorted by seg_idx) → parts.

    A new part starts where the previous segment index isn't
    consecutive (a segment in between was clipped away) or the previous
    clipped end doesn't meet this clipped start (both were shortened).
    Returns ``(offs, px, py)``: flat point arrays with ``offs`` (P+1)
    delimiting each part — the layout stages/encode_lines consumes.
    """
    n = seg_idx.shape[0]
    if n == 0:
        return (np.zeros(1, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    new_part = np.ones(n, dtype=bool)
    new_part[1:] = ((seg_idx[1:] != seg_idx[:-1] + 1)
                    | (cx0[1:] != cx1[:-1]) | (cy0[1:] != cy1[:-1]))
    # part p with k segments contributes k+1 points
    part_id = np.cumsum(new_part) - 1
    n_parts = int(part_id[-1]) + 1
    segs_per_part = np.bincount(part_id, minlength=n_parts)
    pts_per_part = segs_per_part + 1
    offs = np.zeros(n_parts + 1, np.int64)
    np.cumsum(pts_per_part, out=offs[1:])
    px = np.empty(int(offs[-1]), np.int64)
    py = np.empty(int(offs[-1]), np.int64)
    # scatter: each segment's END point at its slot; each part's start
    # point at the part's base offset
    slot = np.arange(n, dtype=np.int64) + part_id + 1  # 1 gap per part head
    px[slot] = cx1
    py[slot] = cy1
    px[offs[:-1]] = cx0[new_part]
    py[offs[:-1]] = cy0[new_part]
    return offs, px, py


def clip_ring(xy: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Sutherland-Hodgman: closed ring (n,2) ∩ box [lo,hi]^2 → clipped
    ring (m,2) float64 (caller rounds/dedups). Vectorized per half-plane:
    4 passes, each O(ring) NumPy, no per-vertex Python loop."""
    pts = np.asarray(xy, dtype=np.float64)
    # (axis, sign): keep x>=lo, x<=hi, y>=lo, y<=hi
    for axis, bound, keep_ge in ((0, lo, True), (0, hi, False),
                                 (1, lo, True), (1, hi, False)):
        if pts.shape[0] == 0:
            break
        cur = pts
        prv = np.roll(cur, 1, axis=0)
        vc = cur[:, axis]
        vp = prv[:, axis]
        in_c = vc >= bound if keep_ge else vc <= bound
        in_p = vp >= bound if keep_ge else vp <= bound
        # intersection of each edge (prv->cur) with the boundary line
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (bound - vp) / (vc - vp)
            # nan/inf rows (vc == vp) are never emitted: emit_ix requires
            # in_c != in_p, impossible when both share the boundary value
            ix = prv + t[:, None] * (cur - prv)
        ix[:, axis] = bound  # exact on the boundary
        # emit order per edge: [intersection?] [current?]
        emit_ix = in_c != in_p
        emit_cur = in_c
        total = emit_ix.sum() + emit_cur.sum()
        out = np.empty((total, 2), np.float64)
        # interleave: for each edge, intersection comes before current
        order = np.repeat(np.arange(cur.shape[0]), 2)
        which = np.tile(np.array([0, 1]), cur.shape[0])
        take = np.where(which == 0, emit_ix[order], emit_cur[order])
        src_ix = order[take & (which == 0)]
        # build by walking the emit pattern without a Python loop:
        sel = np.where(take)[0]
        edge = order[sel]
        is_ix = which[sel] == 0
        out[is_ix.nonzero()[0]] = ix[edge[is_ix]]
        out[(~is_ix).nonzero()[0]] = cur[edge[~is_ix]]
        pts = out
    return pts
