"""Vectorized linestring encoding: all polyline GEOMETRY bytes for a
bucket computed in one numpy pass (zigzag deltas → varint scatter), with
per-feature framing/interning through the scalar builder (features per
tile are few; points per feature are many — the split mirrors how vtzero
separates pure geometry encoding from per-layer interning state,
builder.hpp:843-856 cursor semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()

from ..mvt import codec
from ..mvt.builder import TileBuilder
from ..mvt.pbf import varint_lengths_np
from ..mvt.values import VT_UINT, encode_value
from .encode import write_varints_at, zigzag32_np


def polyline_geometry_payloads(offs: np.ndarray, px: np.ndarray,
                               py: np.ndarray
                               ) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Single-part linestring geometry payloads for MANY features at once.

    ``offs`` (F+1) delimits each feature's points in px/py (already
    dedup'd of consecutive duplicates, every feature >= 2 points).
    Command stream per feature: MoveTo(1) x0 y0, LineTo(n-1) dx dy... —
    identical to codec.encode_linestring of one part. Returns the varint
    blob plus per-feature byte spans.
    """
    F = offs.shape[0] - 1
    counts = (offs[1:] - offs[:-1]).astype(np.int64)
    n_pts = int(counts.sum())
    if F == 0:
        return b"", np.zeros(0, np.int64), np.zeros(0, np.int64)

    # per-point deltas with per-feature reset (first point absolute)
    px = px.astype(np.int64)
    py = py.astype(np.int64)
    dx = np.empty(n_pts, np.int64)
    dy = np.empty(n_pts, np.int64)
    dx[0] = px[0]
    dy[0] = py[0]
    dx[1:] = px[1:] - px[:-1]
    dy[1:] = py[1:] - py[:-1]
    first = offs[:-1].astype(np.int64)
    dx[first] = px[first]
    dy[first] = py[first]
    zx = zigzag32_np(dx.astype(np.int32))
    zy = zigzag32_np(dy.astype(np.int32))

    # value stream layout per feature: [Move, x0, y0, Line, x1, y1, ...]
    vals_per_feat = 2 * counts + 2
    vstart = np.zeros(F + 1, np.int64)
    np.cumsum(vals_per_feat, out=vstart[1:])
    total = int(vstart[-1])
    vals = np.empty(total, np.uint64)
    vals[vstart[:-1]] = 9  # MoveTo, count 1
    vals[vstart[:-1] + 3] = (((counts - 1) << 3) | 2).astype(np.uint64)  # LineTo
    ra = np.arange(n_pts, dtype=np.int64) - np.repeat(first, counts)
    base = np.repeat(vstart[:-1], counts)
    xpos = base + np.where(ra == 0, 1, 2 * ra + 2)
    vals[xpos] = zx
    vals[xpos + 1] = zy

    lens = varint_lengths_np(vals)
    bstart = np.zeros(total + 1, np.int64)
    np.cumsum(lens, out=bstart[1:])
    buf = np.zeros(int(bstart[-1]), np.uint8)
    write_varints_at(buf, bstart[:-1], vals, lens)
    feat_s = bstart[vstart[:-1]]
    feat_e = bstart[vstart[1:]]
    return buf.tobytes(), feat_s, feat_e


def _enc_uint(v: int) -> bytes:
    return encode_value(v, VT_UINT)


class LinePathAssembler:
    """map_groups callable over a BUCKET of tile-assigned points: emits one
    site_paths tile row per (z,x,y), geometry vectorized across the whole
    bucket, framing/interning through the scalar builder (byte-identical
    to the per-feature path, asserted in tests)."""

    def __init__(self, layer_name: str = "site_paths", extent: int = 4096,
                 site_mod: int = 50) -> None:
        self.layer_name = layer_name
        self.extent = extent
        self.site_mod = site_mod
        self.__name__ = "LinePathAssembler"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return self._empty()
        doc_id = batch.column("doc_id").to_numpy()
        site = (doc_id % self.site_mod).astype(np.int64)
        batch = batch.append_column("site", pa.array(site))
        order = pa.compute.sort_indices(
            batch, sort_keys=[("z", "ascending"), ("x", "ascending"),
                              ("y", "ascending"), ("site", "ascending"),
                              ("doc_id", "ascending")])
        batch = batch.take(order).combine_chunks()
        z = batch.column("z").to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        site = batch.column("site").to_numpy()
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        n = len(batch)

        new_grp = np.empty(n, bool)
        new_grp[0] = True
        new_grp[1:] = (z[1:] != z[:-1]) | (x[1:] != x[:-1]) | \
            (y[1:] != y[:-1]) | (site[1:] != site[:-1])
        grp_id = np.cumsum(new_grp) - 1
        n_pages = np.bincount(grp_id)
        # drop consecutive duplicate points within each group (T5: zero-
        # length segments are illegal, builder.hpp:850-852)
        keep = np.empty(n, bool)
        keep[0] = True
        keep[1:] = (px[1:] != px[:-1]) | (py[1:] != py[:-1])
        keep |= new_grp
        kept_grp = grp_id[keep]
        kept_px = px[keep]
        kept_py = py[keep]
        kept_counts = np.bincount(kept_grp, minlength=n_pages.shape[0])
        good = kept_counts >= 2  # paths with <2 surviving points skipped

        # offsets over the kept points of GOOD groups only
        sel = good[kept_grp]
        g_px = kept_px[sel]
        g_py = kept_py[sel]
        g_counts = kept_counts[good]
        offs = np.zeros(g_counts.shape[0] + 1, np.int64)
        np.cumsum(g_counts, out=offs[1:])
        blob, fs, fe = polyline_geometry_payloads(offs, g_px, g_py)

        # per-tile assembly (features per tile are few)
        gfirst = np.flatnonzero(new_grp)  # first row index of each group
        good_groups = np.flatnonzero(good)
        out = {"z": [], "x": [], "y": [], "mvt": [], "n_features": []}
        fi = 0
        i = 0
        while i < good_groups.shape[0]:
            g0 = good_groups[i]
            r0 = gfirst[g0]
            tz, tx, ty = int(z[r0]), int(x[r0]), int(y[r0])
            tb = TileBuilder()
            lb = tb.add_layer(self.layer_name, 2, self.extent)
            nf = 0
            while i < good_groups.shape[0]:
                g = good_groups[i]
                r = gfirst[g]
                if int(z[r]) != tz or int(x[r]) != tx or int(y[r]) != ty:
                    break
                s = int(site[r])
                lb.add_feature_encoded(
                    codec.GEOM_LINESTRING, None, feature_id=s,
                    props=[("site", _enc_uint(s)),
                           ("n_pages", _enc_uint(int(n_pages[g])))],
                    geom_payload=blob[fs[fi]:fe[fi]],
                )
                nf += 1
                fi += 1
                i += 1
            out["z"].append(tz)
            out["x"].append(tx)
            out["y"].append(ty)
            out["mvt"].append(tb.serialize())
            out["n_features"].append(nf)
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "mvt": pa.array(out["mvt"], pa.binary()),
            "n_features": pa.array(out["n_features"], pa.int64()),
        })

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table({
            "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
            "n_features": pa.array([], pa.int64()),
        })
