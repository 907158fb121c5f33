"""Tile overzoom: derive z+1 child tiles from already-encoded z tiles.

The tile-serving operation every pyramid store needs (tippecanoe /
tileserver "overzooming"): when a deeper zoom is requested than was
materialized, the parent tile's geometry is re-quantized into its four
children by an exact integer transform — coordinates double, the high bit
picks the child, the remainder is the child-local coordinate:

    cpx = 2·px;  dx = cpx // extent;  px' = cpx − dx·extent
    child = (z+1, 2x+dx, 2y+dy)

This is a PURE per-parent-tile transform: every feature of a child tile
lives in exactly one parent tile, so overzoom is ONE ``map_batches`` scan
over the tile table — NO shuffle, no corpus re-read. At 100 TB that is
the whole point: a z→z+1 (or z→z+k, chained) pyramid extension touches
only the tile bytes, never the source pages.

Semantics note (why this is not "re-encode at z+1"): overzoom scales the
z-quantized coordinates, so a child pixel is ``2·floor(frac(fx)·extent)
mod extent`` — the standard lossy overzoom — while a direct z+1 encode
quantizes the full-precision projection. The SQL oracle mirrors the
overzoom formula exactly (scale AFTER the z-floor).

Scope: single-point features with string properties — the flagship tile
schema (reference builder semantics: point_feature_builder,
/root/reference/include/vtzero/builder.hpp:713-780). Line/polygon
overzoom additionally needs a clip against the child extent
(stages/clip.liang_barsky); tiles containing other layouts raise loudly
rather than emit wrong bytes.

Re-encoding rides the SAME byte path as the original tile shuffle
(stages/encode_segmented.encode_sorted_point_tiles): decode→overzoom→
re-encode of an unsplit tile at the same zoom is byte-idempotent with the
assembler output, asserted in tests/test_overzoom.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# module-level imports only: UDF bodies run in Ray workers where
# function-local package imports fail under ship-by-value (the
# pipelines/tiling.validate_tiles precedent)
from ..mvt import codec
from ..mvt.builder import PolygonFeatureBuilder, TileBuilder
from ..mvt.decode_fast import (_ragged_take, binary_column_parts,
                               multipoint_coords)
from ..mvt.values import VT_UINT, decode_value
from ..pipelines.clip_paths import _encode_tile_group
from ..pipelines.decode import decode_tiles_batch_v
from ..stages.clip import clip_ring, liang_barsky
from ..stages.encode_segmented import encode_sorted_point_tiles


def _decode_string_values(vals: pa.Array) -> pa.Array:
    """Vectorized MVT value-message → utf8 decode for STRING values.

    A string value is field 1, wire type 2: ``0x0a · varint(len) · bytes``
    (reference vtzero/value.hpp string_value_type). Raises on any other
    value type — overzoom only re-encodes the string-property layout.
    """
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    data, starts, ends = binary_column_parts(vals)
    lens = ends - starts
    n = len(vals)
    if n == 0:
        return pa.array([], pa.string())
    if not (lens >= 2).all():
        raise ValueError("overzoom: truncated property value message")
    if (data[starts] != 0x0A).any():
        raise ValueError("overzoom: non-string property value")
    b0 = data[starts + 1].astype(np.int64)
    two = b0 >= 0x80
    hdr = np.where(two, 3, 2)
    slen = b0.copy()
    if two.any():
        if not (lens[two] >= 3).all():
            raise ValueError("overzoom: truncated length varint")
        b1 = data[starts[two] + 2].astype(np.int64)
        if (b1 >= 0x80).any():
            raise ValueError("overzoom: string value longer than 16383")
        slen[two] = (b0[two] & 0x7F) | (b1 << 7)
    if (hdr + slen != lens).any():
        raise ValueError("overzoom: value message length mismatch")
    payload = _ragged_take(data, starts + hdr, slen)
    off = np.zeros(n + 1, np.int32)
    np.cumsum(slen, out=off[1:])
    return pa.Array.from_buffers(
        pa.utf8(), n,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(payload.tobytes())],
    )


_EMPTY = pa.table({
    "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
    "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
    "n_features": pa.array([], pa.int64()),
})


def _point_tile_features(batch: pa.Table):
    """Decode a batch of pages POINT tiles → flat per-feature arrays
    ``(z, x, y, fid, px, py, url, lang)`` (int64 coords, Arrow strings) —
    the assembler's input vocabulary. Shared by overzoom (transform then
    re-encode locally) and downzoom (transform then the standard tile
    shuffle). Returns None for a batch that decodes to zero features;
    raises loudly on any non-(single-point, url/lang) layout."""
    feats = decode_tiles_batch_v(batch, with_props=True, with_geometry=True)
    errs = feats.column("error")
    if pa.compute.any(pa.compute.is_valid(errs)).as_py():
        bad = feats.filter(pa.compute.is_valid(errs))
        raise ValueError(
            f"overzoom: undecodable input tile: {bad.column('error')[0]}")
    n = len(feats)
    if n == 0:
        return None
    gt = feats.column("geom_type").to_numpy()
    if (gt != 1).any():
        raise ValueError("overzoom: only point layers are supported "
                         "(line/polygon overzoom needs a clip stage)")
    feat_of, px, py, bad = multipoint_coords(feats.column("geom_cmds"))
    if bad.any() or feat_of.shape[0] != n or (np.diff(feat_of) <= 0).any():
        raise ValueError("overzoom: expected single-point geometries")
    npp = feats.column("n_props").to_numpy()
    if (npp != 2).any():
        raise ValueError("overzoom: expected exactly (url, lang) props")
    keys = feats.column("prop_keys")
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    kflat = keys.flatten()
    kexp = pa.array(["url", "lang"] * n)
    if len(kflat) != len(kexp) or not pa.compute.all(
            pa.compute.equal(kflat, kexp)).as_py():
        raise ValueError("overzoom: unexpected property keys")
    vals = feats.column("prop_vals_raw")
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    vflat = _decode_string_values(vals.flatten())
    url = vflat.take(pa.array(np.arange(n, dtype=np.int64) * 2))
    lang = vflat.take(pa.array(np.arange(n, dtype=np.int64) * 2 + 1))
    z = feats.column("z").to_numpy().astype(np.int64)
    x = feats.column("x").to_numpy().astype(np.int64)
    y = feats.column("y").to_numpy().astype(np.int64)
    fid = feats.column("feature_id").to_numpy().astype(np.uint64)
    return z, x, y, fid, px.astype(np.int64), py.astype(np.int64), url, lang


class OverzoomPoints:
    """map_batches kernel: parent tile rows (z,x,y,mvt) → child tile rows.

    Stateless aside from configuration; one vectorized decode + one
    vectorized re-encode per batch, all-integer coordinate math.
    """

    def __init__(self, layer_name: str = "pages", extent: int = 4096) -> None:
        if extent % 2:
            raise ValueError("overzoom requires an even extent")
        self.layer_name = layer_name.encode("utf-8")
        self.extent = extent
        self.__name__ = "OverzoomPoints"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY
        dec = _point_tile_features(batch)
        if dec is None:
            return _EMPTY
        z, x, y, fid, px, py, url, lang = dec
        n = z.shape[0]
        ext = self.extent
        cpx = 2 * px
        cpy = 2 * py
        dx = cpx // ext
        dy = cpy // ext
        lpx = (cpx - dx * ext).astype(np.int64)
        lpy = (cpy - dy * ext).astype(np.int64)
        cz = z + 1
        cx = 2 * x + dx
        cy = 2 * y + dy

        order = np.lexsort((fid, cy, cx, cz))
        key_changed = np.empty(n, dtype=bool)
        key_changed[0] = True
        zo, xo, yo = cz[order], cx[order], cy[order]
        key_changed[1:] = ((zo[1:] != zo[:-1]) | (xo[1:] != xo[:-1])
                           | (yo[1:] != yo[:-1]))
        seg = np.flatnonzero(key_changed)
        starts = np.append(seg, n).astype(np.int64)
        oi = pa.array(order)
        mvts = encode_sorted_point_tiles(
            starts, fid[order], lpx[order], lpy[order],
            url.take(oi), lang.take(oi),
            layer_name=self.layer_name, extent=ext,
        )
        return pa.table({
            "z": pa.array(zo[seg].astype(np.int32)),
            "x": pa.array(xo[seg].astype(np.int32)),
            "y": pa.array(yo[seg].astype(np.int32)),
            "mvt": pa.array(mvts, pa.binary()),
            "n_features": pa.array(starts[1:] - starts[:-1]),
        })


class OverzoomPaths:
    """map_batches kernel: parent CLIPPED-PATH tile rows (z,x,y,mvt) →
    z+1 child tiles — the LINESTRING overzoom (the gap the point kernel
    documents): coordinates double, each segment fans out to the ≤4
    children whose buffered box its bbox overlaps, is re-clipped with the
    EXACT Liang-Barsky expressions of the first-level clip
    (stages/clip.liang_barsky — so the SQL oracle mirrors both levels
    token-for-token), and surviving segments re-chain into multi-part
    polylines per (child, site) encoded through the same scalar builder
    path as pipelines/clip_paths._encode_tile_group — child tiles are
    format-identical to first-level clipped tiles, so levels compose.

    Part boundaries survive the decode via the re-index idx2 = k + p
    (k = segment ordinal within the feature, p = part ordinal): the +1
    gap per part breaks chain_parts' consecutive test exactly where the
    parent had a part break, even if endpoints coincidentally meet.

    Like the point kernel this is ONE stateless scan, zero shuffles, and
    the source corpus is never re-read — features per tile are bounded
    (site cardinality), so the per-feature decode loop is not a hot path.
    """

    def __init__(self, layer_name: str = "clipped_paths", extent: int = 4096,
                 buffer: int = 64) -> None:
        self.layer_name = layer_name
        self.extent = extent
        self.buffer = buffer
        self.__name__ = "OverzoomPaths"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY
        feats = decode_tiles_batch_v(batch, with_props=True,
                                     with_geometry=True)
        errs = feats.column("error")
        if pa.compute.any(pa.compute.is_valid(errs)).as_py():
            bad = feats.filter(pa.compute.is_valid(errs))
            raise ValueError(
                f"overzoom: undecodable input tile: {bad.column('error')[0]}")
        n = len(feats)
        if n == 0:
            return _EMPTY
        gt = feats.column("geom_type").to_numpy()
        if (gt != 2).any():
            raise ValueError("path overzoom: only linestring layers are "
                             "supported")
        geom = feats.column("geom_cmds")
        if isinstance(geom, pa.ChunkedArray):
            geom = geom.combine_chunks()
        pkeys = feats.column("prop_keys").to_pylist()
        pvals = feats.column("prop_vals_raw").to_pylist()
        fz = feats.column("z").to_numpy().astype(np.int64)
        fx = feats.column("x").to_numpy().astype(np.int64)
        fy = feats.column("y").to_numpy().astype(np.int64)

        segs_x0, segs_y0, segs_x1, segs_y1 = [], [], [], []
        segs_idx2, segs_site, segs_fi = [], [], []
        for i in range(n):
            try:
                si = pkeys[i].index("site")
            except ValueError:
                raise ValueError("path overzoom: feature lacks a 'site' "
                                 "property") from None
            _, site = decode_value(pvals[i][si], VT_UINT)
            cmds = np.asarray(geom[i].as_py(), dtype=np.uint32)
            parts = codec.decode_linestring(cmds)
            k = 0
            for p, part in enumerate(parts):
                pts = part.astype(np.int64)
                if ((pts[1:, 0] == pts[:-1, 0])
                        & (pts[1:, 1] == pts[:-1, 1])).any():
                    raise ValueError("path overzoom: zero-length segment")
                m = pts.shape[0] - 1
                segs_x0.append(pts[:-1, 0])
                segs_y0.append(pts[:-1, 1])
                segs_x1.append(pts[1:, 0])
                segs_y1.append(pts[1:, 1])
                segs_idx2.append(np.arange(k, k + m, dtype=np.int64) + p)
                segs_site.append(np.full(m, int(site), np.int64))
                segs_fi.append(np.full(m, i, np.int64))
                k += m
        if not segs_x0:
            return _EMPTY
        x0 = 2 * np.concatenate(segs_x0)
        y0 = 2 * np.concatenate(segs_y0)
        x1 = 2 * np.concatenate(segs_x1)
        y1 = 2 * np.concatenate(segs_y1)
        idx2 = np.concatenate(segs_idx2)
        site = np.concatenate(segs_site)
        fi = np.concatenate(segs_fi)

        ext, buf = self.extent, self.buffer
        # fan out to the ≤2×2 children whose buffered box the segment
        # bbox overlaps (superset is fine: Liang-Barsky rejection decides
        # membership, so the oracle's all-4-children cross join agrees)
        txmin = np.clip((np.minimum(x0, x1) - buf) // ext, 0, 1)
        txmax = np.clip((np.maximum(x0, x1) + buf) // ext, 0, 1)
        tymin = np.clip((np.minimum(y0, y1) - buf) // ext, 0, 1)
        tymax = np.clip((np.maximum(y0, y1) + buf) // ext, 0, 1)
        nx = txmax - txmin + 1
        ny = tymax - tymin + 1
        reps = (nx * ny).astype(np.int64)
        idx = np.repeat(np.arange(x0.shape[0], dtype=np.int64), reps)
        local = np.arange(int(reps.sum()), dtype=np.int64) - \
            np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        dx = txmin[idx] + local % nx[idx]
        dy = tymin[idx] + local // nx[idx]

        keep, cx0, cy0, cx1, cy1 = liang_barsky(
            x0[idx] - dx * ext, y0[idx] - dy * ext,
            x1[idx] - dx * ext, y1[idx] - dy * ext,
            -float(buf), float(ext + buf))
        fk = fi[idx][keep]
        df = pd.DataFrame({
            "z": (fz[fk] + 1).astype(np.int32),
            "x": (2 * fx[fk] + dx[keep]).astype(np.int32),
            "y": (2 * fy[fk] + dy[keep]).astype(np.int32),
            "site": site[idx][keep],
            "seg_idx": idx2[idx][keep],
            "cx0": cx0[keep], "cy0": cy0[keep],
            "cx1": cx1[keep], "cy1": cy1[keep],
        })
        out = _encode_tile_group(df, ext)
        return pa.table({
            "z": pa.array(out["z"].to_numpy(), pa.int32()),
            "x": pa.array(out["x"].to_numpy(), pa.int32()),
            "y": pa.array(out["y"].to_numpy(), pa.int32()),
            "mvt": pa.array(list(out["mvt"]), pa.binary()),
            "n_features": pa.array(out["n_features"].to_numpy(), pa.int64()),
        })


def overzoom_paths(tiles_ds, levels: int = 1,
                   layer_name: str = "clipped_paths", extent: int = 4096,
                   buffer: int = 64):
    """Clipped-path tiles(z) → tiles(z+levels); children are format-
    identical to first-level clipped tiles so the scan composes."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    out = tiles_ds
    for _ in range(levels):
        out = out.map_batches(OverzoomPaths(layer_name, extent, buffer),
                              batch_format="pyarrow")
    return out


class DownzoomPathsToSegments:
    """map_batches kernel: child CLIPPED-PATH tiles (z,x,y,mvt) →
    PARENT-space segment rows (z,x,y,site,seg_idx,cx0,cy0,cx1,cy1) —
    the `_encode_tile_group` vocabulary, so path downzoom is this scan
    plus the STANDARD tile-row shuffle (mirroring DownzoomToFeatures).

    Semantics: coordinates halve with the sibling offset folded in
    (FLOOR division — buffer coords are negative, and DuckDB's `//`
    truncates, so the SQL twin divides by 2.0 and floors); segments
    whose endpoints collapse to the same halved point vanish, their
    neighbors re-chaining through the gap (halving preserves part
    continuity); parts shrinking below 2 points drop. A parent part
    never merges ACROSS child tiles — the children's buffered copies of
    a boundary-crossing path overlap, and stitching them would need
    overlap dedup; pieces stay separate parts in deterministic
    (child-raster-order, part) order via the packed seg_idx
    (child << 40 | part << 20 | run), whose within-run consecutiveness
    is exactly chain_parts' merge rule. Halved coords stay inside the
    parent's buffered box ([-32, extent/2 + buffer/2] offsets), so no
    re-clip is needed.
    """

    def __init__(self, layer_name: str = "clipped_paths",
                 extent: int = 4096) -> None:
        if extent % 2:
            raise ValueError("downzoom requires an even extent")
        self.layer_name = layer_name
        self.extent = extent
        self.__name__ = "DownzoomPathsToSegments"

    _EMPTY_SEGS = pa.table({
        "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
        "y": pa.array([], pa.int32()), "site": pa.array([], pa.int64()),
        "seg_idx": pa.array([], pa.int64()),
        "cx0": pa.array([], pa.int64()), "cy0": pa.array([], pa.int64()),
        "cx1": pa.array([], pa.int64()), "cy1": pa.array([], pa.int64()),
    })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return self._EMPTY_SEGS
        feats = decode_tiles_batch_v(batch, with_props=True,
                                     with_geometry=True)
        errs = feats.column("error")
        if pa.compute.any(pa.compute.is_valid(errs)).as_py():
            bad = feats.filter(pa.compute.is_valid(errs))
            raise ValueError(
                f"downzoom: undecodable input tile: {bad.column('error')[0]}")
        n = len(feats)
        if n == 0:
            return self._EMPTY_SEGS
        gt = feats.column("geom_type").to_numpy()
        if (gt != 2).any():
            raise ValueError("path downzoom: only linestring layers are "
                             "supported")
        if (feats.column("z").to_numpy() <= 0).any():
            raise ValueError("downzoom: tiles at z=0 have no parent")
        geom = feats.column("geom_cmds")
        if isinstance(geom, pa.ChunkedArray):
            geom = geom.combine_chunks()
        pkeys = feats.column("prop_keys").to_pylist()
        pvals = feats.column("prop_vals_raw").to_pylist()
        fz = feats.column("z").to_numpy().astype(np.int64)
        fx = feats.column("x").to_numpy().astype(np.int64)
        fy = feats.column("y").to_numpy().astype(np.int64)

        ext = self.extent
        cols = {k: [] for k in ("z", "x", "y", "site", "seg_idx",
                                "cx0", "cy0", "cx1", "cy1")}
        for i in range(n):
            try:
                si = pkeys[i].index("site")
            except ValueError:
                raise ValueError("path downzoom: feature lacks a 'site' "
                                 "property") from None
            _, site = decode_value(pvals[i][si], VT_UINT)
            parts = codec.decode_linestring(
                np.asarray(geom[i].as_py(), dtype=np.uint32))
            if len(parts) >= 1 << 20:
                raise ValueError("path downzoom: too many parts")
            child = int((fy[i] & 1) * 2 + (fx[i] & 1))
            offx = int(fx[i] & 1) * ext
            offy = int(fy[i] & 1) * ext
            for p, part in enumerate(parts):
                pts = part.astype(np.int64)
                hx = (offx + pts[:, 0]) >> 1   # floor halving (also <0)
                hy = (offy + pts[:, 1]) >> 1
                keep = np.empty(hx.shape[0], bool)
                keep[0] = True
                keep[1:] = (hx[1:] != hx[:-1]) | (hy[1:] != hy[:-1])
                hx, hy = hx[keep], hy[keep]
                m = hx.shape[0] - 1
                if m < 1:
                    continue   # part collapsed below 2 points
                if m >= 1 << 20:
                    raise ValueError("path downzoom: part too long")
                cols["z"].append(np.full(m, fz[i] - 1, np.int64))
                cols["x"].append(np.full(m, fx[i] >> 1, np.int64))
                cols["y"].append(np.full(m, fy[i] >> 1, np.int64))
                cols["site"].append(np.full(m, int(site), np.int64))
                cols["seg_idx"].append(
                    (child << 40) | (p << 20)
                    | np.arange(m, dtype=np.int64))
                cols["cx0"].append(hx[:-1])
                cols["cy0"].append(hy[:-1])
                cols["cx1"].append(hx[1:])
                cols["cy1"].append(hy[1:])
        if not cols["z"]:
            return self._EMPTY_SEGS
        return pa.table({
            "z": pa.array(np.concatenate(cols["z"]).astype(np.int32)),
            "x": pa.array(np.concatenate(cols["x"]).astype(np.int32)),
            "y": pa.array(np.concatenate(cols["y"]).astype(np.int32)),
            "site": pa.array(np.concatenate(cols["site"])),
            "seg_idx": pa.array(np.concatenate(cols["seg_idx"])),
            "cx0": pa.array(np.concatenate(cols["cx0"])),
            "cy0": pa.array(np.concatenate(cols["cy0"])),
            "cx1": pa.array(np.concatenate(cols["cx1"])),
            "cy1": pa.array(np.concatenate(cols["cy1"])),
        })


def downzoom_paths(tiles_ds, levels: int = 1,
                   layer_name: str = "clipped_paths", extent: int = 4096,
                   n_buckets: int = 64, stitch: bool = False):
    """Clipped-path tiles(z) → tiles(z−levels): per level ONE decode
    scan + ONE bucketed tile-row shuffle re-encoding through the SAME
    builder path as clipped_path_tiles — children are format-identical,
    so levels compose (and overzoom_paths can re-derive them).

    ``stitch=True`` merges parts whose endpoints meet EXACTLY at child
    seams after halving (clip_paths._stitch_parts) — pieces that merely
    OVERLAP through the clip buffer stay separate (overlap dedup is out
    of scope); seam-free tiles are byte-identical either way."""
    import functools

    from ..stages.encode import add_tile_bucket

    if levels < 1:
        raise ValueError("levels must be >= 1")
    out = tiles_ds
    for _ in range(levels):
        segs = out.map_batches(DownzoomPathsToSegments(layer_name, extent),
                               batch_format="pyarrow")
        segs = segs.map_batches(add_tile_bucket, batch_format="pyarrow",
                                fn_kwargs={"n_buckets": n_buckets})

        def enc(df, _ext=extent, _st=stitch):
            return _encode_tile_group(df.drop(columns=["bucket"]), _ext,
                                      stitch=_st)

        out = segs.groupby("bucket").map_groups(enc,
                                                batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow")
    return out


def path_tile_summary_batch(batch: pa.Table) -> pa.Table:
    """Per-(tile, site) decode summary for LINESTRING tiles: n_parts and
    n_points read back through the real decoder — the oracle surface for
    path overzoom (the doubled+re-clipped integers are SQL-predictable)."""
    feats = decode_tiles_batch_v(batch, with_props=True, with_geometry=True)
    gt = feats.column("geom_type").to_numpy()
    if (gt != 2).any():
        raise ValueError("path_tile_summary: non-linestring feature")
    geom = feats.column("geom_cmds")
    if isinstance(geom, pa.ChunkedArray):
        geom = geom.combine_chunks()
    pkeys = feats.column("prop_keys").to_pylist()
    pvals = feats.column("prop_vals_raw").to_pylist()
    n = len(feats)
    sites = np.empty(n, np.int64)
    n_parts = np.empty(n, np.int64)
    n_points = np.empty(n, np.int64)
    for i in range(n):
        _, sites[i] = decode_value(pvals[i][pkeys[i].index("site")], VT_UINT)
        parts = codec.decode_linestring(
            np.asarray(geom[i].as_py(), dtype=np.uint32))
        n_parts[i] = len(parts)
        n_points[i] = sum(p.shape[0] for p in parts)
    return pa.table({
        "z": feats.column("z"), "x": feats.column("x"),
        "y": feats.column("y"),
        "site": pa.array(sites), "n_parts": pa.array(n_parts),
        "n_points": pa.array(n_points),
    })


def overzoom_tiles(tiles_ds, levels: int = 1, layer_name: str = "pages",
                   extent: int = 4096):
    """tiles(z) → tiles(z+levels), one stateless scan per level.

    Tile count grows ≤4× per level while features are conserved, so the
    pyramid extension never touches the source corpus — the 100-TB shape.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    out = tiles_ds
    for _ in range(levels):
        out = out.map_batches(OverzoomPoints(layer_name, extent),
                              batch_format="pyarrow")
    return out


_EMPTY_CELLS = pa.table({
    "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
    "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
    "n_cells": pa.array([], pa.int64()),
})


def _pair_rings(rings, op: str):
    """Group a decoded ring sequence into polygons: each RING_OUTER
    starts a polygon, following RING_INNERs are its holes (spec 4.3.4.4;
    reference geometry.hpp:120-169 classifies by shoelace sign and
    treats a first-ring-not-outer as invalid). Returns
    ``[(outer_pts, [inner_pts, ...]), ...]`` with closing duplicates
    dropped; zero-area rings raise loudly."""
    polys: list[tuple[np.ndarray, list]] = []
    for pts, _s, rt in rings:
        if rt == codec.RING_INVALID:
            raise ValueError(f"polygon {op}: zero-area ring")
        ring = pts[:-1].astype(np.int64)  # drop closing dup
        if rt == codec.RING_OUTER:
            polys.append((ring, []))
        else:
            if not polys:
                raise ValueError(
                    f"polygon {op}: first ring is not an outer ring")
            polys[-1][1].append(ring)
    return polys


def _round_dedup_area(pts: np.ndarray):
    """Round float ring points to the integer grid, collapse consecutive
    duplicates (incl. the wraparound), and return (pts, 2×shoelace-area)
    — ``(None, 0)`` when fewer than 3 distinct points survive."""
    return _dedup_area_int(np.floor(pts + 0.5).astype(np.int64))


def _dedup_area_int(pts: np.ndarray):
    """Integer-grid half of ``_round_dedup_area`` (shared with the
    downzoom halving path, which floors via ``>> 1`` instead of
    rounding)."""
    if pts.shape[0] < 3:
        return None, 0
    keep = np.ones(pts.shape[0], bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    pts = pts[keep]
    if pts.shape[0] >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    if pts.shape[0] < 3:
        return None, 0
    b = np.roll(pts, -1, axis=0)
    return pts, int((pts[:, 0] * b[:, 1] - b[:, 0] * pts[:, 1]).sum())


def _clip_poly_to_box(outer: np.ndarray, inners: list, ext: int):
    """Clip one (outer, holes) polygon — already in child-local integer
    space — against [0, ext]² with Sutherland-Hodgman per ring, round,
    and drop degenerates: a hole clipping to <3 distinct points or a
    non-negative area drops alone (the hole left this child); an outer
    clipping degenerate, or a net area ≤ 0 (hole covers the whole
    clipped outer), drops the polygon. Returns the surviving ring list
    (outer first) or None. SH preserves orientation, so the shoelace
    sign re-classifies each clipped ring."""
    cl = clip_ring(outer.astype(np.float64), 0.0, float(ext))
    opts, oa2 = _round_dedup_area(cl)
    if opts is None or oa2 <= 0:
        return None
    rings = [opts]
    net = oa2
    for inner in inners:
        cli = clip_ring(inner.astype(np.float64), 0.0, float(ext))
        ipts, ia2 = _round_dedup_area(cli)
        if ipts is None or ia2 >= 0:
            continue   # hole degenerated in this child — sliver-drop
        rings.append(ipts)
        net += ia2
    if net <= 0:
        return None    # holes cancel the outer (hole covers the child)
    return rings


class OverzoomPolygons:
    """map_batches kernel: parent POLYGON tile rows (z,x,y,mvt) → z+1
    children — the third geometry type (points: OverzoomPoints, lines:
    OverzoomPaths). Each outer ring doubles and re-clips against every
    overlapped child box with Sutherland-Hodgman (stages/clip.clip_ring,
    exact on axis-aligned boundaries), rounds floor(v+0.5), drops
    degenerate (<3 distinct points or zero-area) results, and re-encodes
    through the scalar PolygonFeatureBuilder in parent feature order.

    Multi-ring features pair per spec 4.3.4.4 (outer + following
    inners, reference geometry.hpp:120-169): holes re-clip with the
    same kernel, re-classify by shoelace sign, and sliver-drop
    independently; a polygon whose holes cancel its clipped outer
    (net area ≤ 0 — the hole covers the child) drops whole. One
    stateless scan, zero shuffles, corpus never re-read.
    """

    def __init__(self, layer_name: str = "hotcells",
                 extent: int = 4096) -> None:
        if extent % 2:
            raise ValueError("overzoom requires an even extent")
        self.layer_name = layer_name
        self.extent = extent
        self.__name__ = "OverzoomPolygons"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_CELLS
        feats = decode_tiles_batch_v(batch, with_props=True,
                                     with_geometry=True)
        errs = feats.column("error")
        if pa.compute.any(pa.compute.is_valid(errs)).as_py():
            bad = feats.filter(pa.compute.is_valid(errs))
            raise ValueError(
                f"overzoom: undecodable input tile: {bad.column('error')[0]}")
        n = len(feats)
        if n == 0:
            return _EMPTY_CELLS
        gt = feats.column("geom_type").to_numpy()
        if (gt != 3).any():
            raise ValueError("polygon overzoom: only polygon layers are "
                             "supported")
        geom = feats.column("geom_cmds")
        if isinstance(geom, pa.ChunkedArray):
            geom = geom.combine_chunks()
        pkeys = feats.column("prop_keys").to_pylist()
        pvals = feats.column("prop_vals_raw").to_pylist()
        fz = feats.column("z").to_numpy().astype(np.int64)
        fx = feats.column("x").to_numpy().astype(np.int64)
        fy = feats.column("y").to_numpy().astype(np.int64)
        fid = feats.column("feature_id").to_numpy().astype(np.int64)

        ext = self.extent
        children: dict[tuple, list] = {}
        for i in range(n):
            polys = _pair_rings(codec.decode_polygon(
                np.asarray(geom[i].as_py(), dtype=np.uint32)), "overzoom")
            # per-polygon bbox fan-out (holes are inside their outer)
            per_child: dict[tuple, list] = {}
            for outer, inners in polys:
                dbl_o = 2 * outer
                dbl_i = [2 * r for r in inners]
                lo_dx = max(0, int(dbl_o[:, 0].min()) // ext)
                hi_dx = min(1, max(0, (int(dbl_o[:, 0].max()) - 1) // ext))
                lo_dy = max(0, int(dbl_o[:, 1].min()) // ext)
                hi_dy = min(1, max(0, (int(dbl_o[:, 1].max()) - 1) // ext))
                for dx in range(lo_dx, hi_dx + 1):
                    for dy in range(lo_dy, hi_dy + 1):
                        off = np.array([dx * ext, dy * ext])
                        rings = _clip_poly_to_box(
                            dbl_o - off, [r - off for r in dbl_i], ext)
                        if rings is None:
                            continue
                        per_child.setdefault((dx, dy), []).extend(rings)
            for (dx, dy), rings in per_child.items():
                key = (int(fz[i]) + 1, int(2 * fx[i] + dx),
                       int(2 * fy[i] + dy))
                children.setdefault(key, []).append(
                    (int(fid[i]), rings, pkeys[i], pvals[i]))
        if not children:
            return _EMPTY_CELLS
        out = {"z": [], "x": [], "y": [], "mvt": [], "n_cells": []}
        for key in sorted(children):
            tb = TileBuilder()
            lb = tb.add_layer(self.layer_name, 2, ext)
            for f, rings, keys, vals in children[key]:
                fb = PolygonFeatureBuilder(lb)
                fb.set_id(f)
                for pts in rings:
                    fb.add_ring(pts.shape[0] + 1)
                    for px_, py_ in pts:
                        fb.set_point(int(px_), int(py_))
                    fb.close_ring()
                for k, v in zip(keys, vals):
                    fb.add_property(k, raw=v)
                fb.commit()
            out["z"].append(key[0])
            out["x"].append(key[1])
            out["y"].append(key[2])
            out["mvt"].append(tb.serialize())
            out["n_cells"].append(len(children[key]))
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "mvt": pa.array(out["mvt"], pa.binary()),
            "n_cells": pa.array(out["n_cells"], pa.int64()),
        })


_EMPTY_POLY_FEATS = pa.table({
    "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
    "y": pa.array([], pa.int32()), "okey": pa.array([], pa.int64()),
    "fid": pa.array([], pa.int64()), "ring": pa.array([], pa.binary()),
    "pkey": pa.array([], pa.string()), "pval": pa.array([], pa.binary()),
})


class DownzoomPolygonsToFeatures:
    """map_batches kernel: child POLYGON tiles → PARENT-space feature
    rows — the polygon pyramid-BUILD step (completing downzoom across
    all three geometry types): rings floor-halve with the sibling
    offset folded in, consecutive duplicate points (and the wraparound)
    collapse, rings shrinking below 3 distinct points or to zero area
    drop as slivers. Multi-ring features pair per spec 4.3.4.4 — holes
    halve with the same kernel and sliver-drop independently; a polygon
    whose halved holes cancel its halved outer drops whole.
    Features from the 4 children keep their identity
    (no cross-child union — that needs polygon clipping algebra) and
    order deterministically by (child raster order, in-child position)
    via ``okey``. Ring bytes travel packed (int64 xy pairs) through ONE
    tile-row shuffle into a scalar re-encode."""

    def __init__(self, extent: int = 4096) -> None:
        if extent % 2:
            raise ValueError("downzoom requires an even extent")
        self.extent = extent
        self.__name__ = "DownzoomPolygonsToFeatures"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_POLY_FEATS
        feats = decode_tiles_batch_v(batch, with_props=True,
                                     with_geometry=True)
        errs = feats.column("error")
        if pa.compute.any(pa.compute.is_valid(errs)).as_py():
            bad = feats.filter(pa.compute.is_valid(errs))
            raise ValueError(
                f"downzoom: undecodable input tile: {bad.column('error')[0]}")
        n = len(feats)
        if n == 0:
            return _EMPTY_POLY_FEATS
        gt = feats.column("geom_type").to_numpy()
        if (gt != 3).any():
            raise ValueError("polygon downzoom: only polygon layers are "
                             "supported")
        if (feats.column("z").to_numpy() <= 0).any():
            raise ValueError("downzoom: tiles at z=0 have no parent")
        geom = feats.column("geom_cmds")
        if isinstance(geom, pa.ChunkedArray):
            geom = geom.combine_chunks()
        pkeys = feats.column("prop_keys").to_pylist()
        pvals = feats.column("prop_vals_raw").to_pylist()
        fz = feats.column("z").to_numpy().astype(np.int64)
        fx = feats.column("x").to_numpy().astype(np.int64)
        fy = feats.column("y").to_numpy().astype(np.int64)
        fid = feats.column("feature_id").to_numpy().astype(np.int64)

        ext = self.extent
        cols = {k: [] for k in _EMPTY_POLY_FEATS.column_names}
        pos_in_child: dict[tuple, int] = {}
        for i in range(n):
            polys = _pair_rings(codec.decode_polygon(
                np.asarray(geom[i].as_py(), dtype=np.uint32)), "downzoom")
            if len(pkeys[i]) != 1:
                raise ValueError("polygon downzoom: expected one property")
            off = np.array([int(fx[i] & 1) * ext, int(fy[i] & 1) * ext])
            out_rings: list[np.ndarray] = []
            for outer, inners in polys:
                ho, oa2 = _dedup_area_int((outer + off) >> 1)
                if ho is None or oa2 <= 0:
                    continue   # outer collapsed to a sliver
                rs = [ho]
                net = oa2
                for inner in inners:
                    hi_, ia2 = _dedup_area_int((inner + off) >> 1)
                    if hi_ is None or ia2 >= 0:
                        continue   # hole collapsed — sliver-drop alone
                    rs.append(hi_)
                    net += ia2
                if net <= 0:
                    continue   # holes cancel the halved outer
                out_rings.extend(rs)
            if not out_rings:
                continue
            tk = (int(fz[i]), int(fx[i]), int(fy[i]))
            j = pos_in_child.get(tk, 0)
            pos_in_child[tk] = j + 1
            child = int((fy[i] & 1) * 2 + (fx[i] & 1))
            # pack [n_rings, len0, pts0…, len1, pts1…] as int64 — the
            # shuffle payload stays a single binary column
            parts = [np.array([len(out_rings)], np.int64)]
            for r_ in out_rings:
                parts.append(np.array([r_.shape[0]], np.int64))
                parts.append(r_.ravel())
            cols["z"].append(int(fz[i]) - 1)
            cols["x"].append(int(fx[i]) >> 1)
            cols["y"].append(int(fy[i]) >> 1)
            cols["okey"].append((child << 40) | j)
            cols["fid"].append(int(fid[i]))
            cols["ring"].append(np.concatenate(parts).tobytes())
            cols["pkey"].append(pkeys[i][0])
            cols["pval"].append(pvals[i][0])
        if not cols["z"]:
            return _EMPTY_POLY_FEATS
        return pa.table({
            "z": pa.array(cols["z"], pa.int32()),
            "x": pa.array(cols["x"], pa.int32()),
            "y": pa.array(cols["y"], pa.int32()),
            "okey": pa.array(cols["okey"], pa.int64()),
            "fid": pa.array(cols["fid"], pa.int64()),
            "ring": pa.array(cols["ring"], pa.binary()),
            "pkey": pa.array(cols["pkey"], pa.string()),
            "pval": pa.array(cols["pval"], pa.binary()),
        })


def downzoom_polygons(tiles_ds, levels: int = 1,
                      layer_name: str = "hotcells", extent: int = 4096,
                      n_buckets: int = 64):
    """Polygon tiles(z) → tiles(z−levels): one decode scan + one
    tile-row shuffle per level, scalar re-encode in (child raster,
    in-child) order. Output schema matches raster_to_vector
    (z, x, y, mvt, n_cells), so levels compose with overzoom_polygons."""
    import pandas as pd

    from ..stages.encode import add_tile_bucket

    if levels < 1:
        raise ValueError("levels must be >= 1")

    def encode_group(df: "pd.DataFrame") -> "pd.DataFrame":
        out = {"z": [], "x": [], "y": [], "mvt": [], "n_cells": []}
        for (z, x, y), g in df.groupby(["z", "x", "y"], sort=True):
            g = g.sort_values("okey", kind="stable")
            tb = TileBuilder()
            lb = tb.add_layer(layer_name, 2, extent)
            for r in g.itertuples():
                a = np.frombuffer(r.ring, np.int64)
                fb = PolygonFeatureBuilder(lb)
                fb.set_id(int(r.fid))
                p = 1
                for _ in range(int(a[0])):
                    n_ = int(a[p])
                    pts = a[p + 1:p + 1 + 2 * n_].reshape(-1, 2)
                    p += 1 + 2 * n_
                    fb.add_ring(n_ + 1)
                    for px_, py_ in pts:
                        fb.set_point(int(px_), int(py_))
                    fb.close_ring()
                fb.add_property(r.pkey, raw=r.pval)
                fb.commit()
            out["z"].append(z)
            out["x"].append(x)
            out["y"].append(y)
            out["mvt"].append(tb.serialize())
            out["n_cells"].append(len(g))
        return pd.DataFrame({
            "z": pd.Series(out["z"], dtype="int32"),
            "x": pd.Series(out["x"], dtype="int32"),
            "y": pd.Series(out["y"], dtype="int32"),
            "mvt": pd.Series(out["mvt"], dtype=object),
            "n_cells": pd.Series(out["n_cells"], dtype="int64")})

    out = tiles_ds
    for _ in range(levels):
        featrows = out.map_batches(DownzoomPolygonsToFeatures(extent),
                                   batch_format="pyarrow")
        featrows = featrows.map_batches(add_tile_bucket,
                                        batch_format="pyarrow",
                                        fn_kwargs={"n_buckets": n_buckets})

        def enc(df):
            return encode_group(df.drop(columns=["bucket"]))

        out = featrows.groupby("bucket").map_groups(
            enc, batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow")
    return out


def overzoom_polygons(tiles_ds, levels: int = 1,
                      layer_name: str = "hotcells", extent: int = 4096):
    """Polygon tiles(z) → tiles(z+levels), one stateless scan per level."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    out = tiles_ds
    for _ in range(levels):
        out = out.map_batches(OverzoomPolygons(layer_name, extent),
                              batch_format="pyarrow")
    return out


def polygon_tile_summary_batch(batch: pa.Table) -> pa.Table:
    """Per-tile decode summary for POLYGON tiles: feature count, id and
    property sums, first-ring-point sums, ring-count sums, and NET
    2×area sums (signed over every ring, so holes subtract) read back
    through the real decoder — the oracle surface for polygon overzoom
    (the first ring must classify as outer; rings pair per 4.3.4.4)."""
    feats = decode_tiles_batch_v(batch, with_props=True, with_geometry=True)
    gt = feats.column("geom_type").to_numpy()
    if (gt != 3).any():
        raise ValueError("polygon_tile_summary: non-polygon feature")
    geom = feats.column("geom_cmds")
    if isinstance(geom, pa.ChunkedArray):
        geom = geom.combine_chunks()
    pkeys = feats.column("prop_keys").to_pylist()
    pvals = feats.column("prop_vals_raw").to_pylist()
    n = len(feats)
    fid = feats.column("feature_id").to_numpy().astype(np.int64)
    x0 = np.empty(n, np.int64)
    y0 = np.empty(n, np.int64)
    area2 = np.empty(n, np.int64)
    nrings = np.empty(n, np.int64)
    npts = np.empty(n, np.int64)
    for i in range(n):
        rings = codec.decode_polygon(
            np.asarray(geom[i].as_py(), dtype=np.uint32))
        if rings[0][2] != codec.RING_OUTER:
            raise ValueError("polygon_tile_summary: first ring not outer")
        x0[i], y0[i] = int(rings[0][0][0, 0]), int(rings[0][0][0, 1])
        area2[i] = sum(s for _r, s, _rt in rings)
        nrings[i] = len(rings)
        ki = pkeys[i].index("n_points")
        _, npts[i] = decode_value(pvals[i][ki])
    fz = feats.column("z").to_numpy().astype(np.int64)
    fx = feats.column("x").to_numpy().astype(np.int64)
    fy = feats.column("y").to_numpy().astype(np.int64)
    key = (fz << np.int64(58)) | (fx << np.int64(29)) | fy
    uk, inv = np.unique(key, return_inverse=True)
    agg = {name: np.zeros(uk.shape[0], np.int64)
           for name in ("cnt", "sfid", "sx0", "sy0", "sa2", "snp", "srng")}
    np.add.at(agg["cnt"], inv, 1)
    np.add.at(agg["sfid"], inv, fid)
    np.add.at(agg["sx0"], inv, x0)
    np.add.at(agg["sy0"], inv, y0)
    np.add.at(agg["sa2"], inv, area2)
    np.add.at(agg["snp"], inv, npts)
    np.add.at(agg["srng"], inv, nrings)
    bz = batch.column("z").to_numpy().astype(np.int64)
    bx = batch.column("x").to_numpy().astype(np.int64)
    by = batch.column("y").to_numpy().astype(np.int64)
    bkey = (bz << np.int64(58)) | (bx << np.int64(29)) | by
    pos = np.searchsorted(uk, bkey)
    if (pos >= uk.shape[0]).any() or (uk[pos] != bkey).any():
        raise ValueError("polygon_tile_summary: decoded tile key mismatch")
    return pa.table({
        "z": batch.column("z"), "x": batch.column("x"),
        "y": batch.column("y"),
        "n_features": pa.array(agg["cnt"][pos]),
        "sum_fid": pa.array(agg["sfid"][pos]),
        "sum_x0": pa.array(agg["sx0"][pos]),
        "sum_y0": pa.array(agg["sy0"][pos]),
        "sum_area2": pa.array(agg["sa2"][pos]),
        "sum_points": pa.array(agg["snp"][pos]),
        "sum_rings": pa.array(agg["srng"][pos]),
    })


_EMPTY_FEATURES = pa.table({
    "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
    "y": pa.array([], pa.int32()), "doc_id": pa.array([], pa.int64()),
    "px": pa.array([], pa.int32()), "py": pa.array([], pa.int32()),
    "url": pa.array([], pa.string()), "lang": pa.array([], pa.string()),
})


class DownzoomToFeatures:
    """map_batches kernel: child POINT tile rows (z,x,y,mvt) → PARENT-
    space feature rows (z,x,y,doc_id,px,py,url,lang) — exactly the tile
    assembler's input schema, so downzoom is this stateless scan plus the
    STANDARD bucketed tile shuffle (pipelines/tiling.py): parent tiles
    come out byte-identical to assembling the halved features directly.

    The transform is the exact integer inverse of overzoom's doubling:
    px' = ((x mod 2)·extent + px) // 2, x' = x // 2 — so
    downzoom(overzoom(tiles)) round-trips to the ORIGINAL tile bytes
    (asserted in tests), while downzoom of a base zoom is the lossy
    pyramid-BUILD step (tippecanoe's ascending build) that never re-reads
    the source corpus.
    """

    def __init__(self, extent: int = 4096) -> None:
        if extent % 2:
            raise ValueError("downzoom requires an even extent")
        self.extent = extent
        self.__name__ = "DownzoomToFeatures"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_FEATURES
        dec = _point_tile_features(batch)
        if dec is None:
            return _EMPTY_FEATURES
        z, x, y, fid, px, py, url, lang = dec
        if (z <= 0).any():
            raise ValueError("downzoom: tiles at z=0 have no parent")
        ext = self.extent
        ppx = ((x & 1) * ext + px) // 2
        ppy = ((y & 1) * ext + py) // 2
        return pa.table({
            "z": pa.array((z - 1).astype(np.int32)),
            "x": pa.array((x >> 1).astype(np.int32)),
            "y": pa.array((y >> 1).astype(np.int32)),
            "doc_id": pa.array(fid.astype(np.int64)),
            "px": pa.array(ppx.astype(np.int32)),
            "py": pa.array(ppy.astype(np.int32)),
            "url": url, "lang": lang,
        })


class TilesToFeatures:
    """map_batches kernel: POINT tile rows (z,x,y,mvt) → SAME-space
    feature rows (z,x,y,doc_id,px,py,url,lang) — the assembler's input
    schema with no coordinate transform. The read half of incremental
    tile maintenance (pyramid.update_pyramid): stored tiles decode back
    to features, union with a new shard's features, and re-assemble
    byte-identically to a from-scratch build of the same tile (the
    assembler's fid-ascending order makes the merge order-free)."""

    def __init__(self, extent: int = 4096) -> None:
        self.extent = extent
        self.__name__ = "TilesToFeatures"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_FEATURES
        dec = _point_tile_features(batch)
        if dec is None:
            return _EMPTY_FEATURES
        z, x, y, fid, px, py, url, lang = dec
        return pa.table({
            "z": pa.array(z.astype(np.int32)),
            "x": pa.array(x.astype(np.int32)),
            "y": pa.array(y.astype(np.int32)),
            "doc_id": pa.array(fid.astype(np.int64)),
            "px": pa.array(px.astype(np.int32)),
            "py": pa.array(py.astype(np.int32)),
            "url": url, "lang": lang,
        })


def downzoom_points(tiles_ds, levels: int = 1, extent: int = 4096):
    """tiles(z) → tiles(z−levels): per level ONE stateless decode scan +
    ONE bucketed tile shuffle over TILE rows (≤ the tile count, shrinking
    4× per level — never the source corpus). Output is byte-identical to
    the flagship assembler on the same features by construction."""
    from ..stages.encode import PointTileAssembler, add_tile_bucket

    if levels < 1:
        raise ValueError("levels must be >= 1")
    out = tiles_ds
    for _ in range(levels):
        feats = out.map_batches(DownzoomToFeatures(extent),
                                batch_format="pyarrow")
        feats = feats.map_batches(add_tile_bucket, batch_format="pyarrow")
        out = feats.groupby("bucket").map_groups(
            PointTileAssembler(extent=extent), batch_format="pyarrow")
    return out


def point_tile_summary_batch(batch: pa.Table) -> pa.Table:
    """Per-tile decode summary for POINT tiles: (z, x, y) → feature count
    and coordinate sums, read back through the real decoder — the oracle
    surface for overzoom (child coordinates are SQL-predictable integers).

    Expects a ``check_code`` column (validate_tiles upstream) and carries
    it through; tiles are whole rows, so per-batch aggregation is global.
    """
    feats = decode_tiles_batch_v(batch, with_props=False, with_geometry=True)
    feat_of, px, py, bad = multipoint_coords(feats.column("geom_cmds"))
    if bad.any() or feat_of.shape[0] != len(feats):
        raise ValueError("point_tile_summary: non-single-point geometry")
    fz = feats.column("z").to_numpy().astype(np.int64)
    fx = feats.column("x").to_numpy().astype(np.int64)
    fy = feats.column("y").to_numpy().astype(np.int64)
    key = (fz << np.int64(58)) | (fx << np.int64(29)) | fy
    uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    spx = np.zeros(uk.shape[0], np.int64)
    spy = np.zeros(uk.shape[0], np.int64)
    np.add.at(spx, inv, px.astype(np.int64))
    np.add.at(spy, inv, py.astype(np.int64))
    bz = batch.column("z").to_numpy().astype(np.int64)
    bx = batch.column("x").to_numpy().astype(np.int64)
    by = batch.column("y").to_numpy().astype(np.int64)
    bkey = (bz << np.int64(58)) | (bx << np.int64(29)) | by
    pos = np.searchsorted(uk, bkey)
    if (pos >= uk.shape[0]).any() or (uk[pos] != bkey).any():
        raise ValueError("point_tile_summary: decoded tile key mismatch")
    return pa.table({
        "z": batch.column("z"), "x": batch.column("x"),
        "y": batch.column("y"),
        "n_features": pa.array(cnt[pos].astype(np.int64)),
        "sum_px": pa.array(spx[pos]), "sum_py": pa.array(spy[pos]),
        "check_code": batch.column("check_code"),
    })
