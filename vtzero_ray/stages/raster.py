
"""Raster ↔ vector conversion stages (north-rule operator set).

- ``rasterize_tiles``: decoded point features → per-tile density grid
  (G×G counts over the tile extent). Vectorized 2-D bincount per tile;
  exploded (z,x,y,cell_row,cell_col,n_points) rows are SQL-checkable.
- ``raster_to_vector``: grid cells with count >= threshold → one square
  polygon feature per cell, encoded back into a valid MVT polygon layer
  via the standard builders (closing the raster→vector→MVT loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..mvt import codec
from ..mvt.builder import PolygonFeatureBuilder, TileBuilder
from ..mvt.values import VT_UINT, encode_value
from ..mvt.decode_fast import multipoint_coords
from ..pipelines.decode import decode_tiles_batch_v


def rasterize_tiles(tiles_ds, grid: int = 16, extent: int = 4096):
    """tiles (mvt) → (z,x,y,cell_row,cell_col,n_points) density rows.

    Fully vectorized: tiles decode through the batch decoder
    (mvt/decode_fast.py), point coordinates come from the segmented
    multipoint kernel, and binning is ONE np.bincount over a combined
    (tile, cell) key — no per-tile or per-feature Python loop. Features
    whose command stream isn't plain single-MoveTo fall back to the
    scalar codec.decode_point (same validation semantics).
    """
    cell = extent // grid

    def per_batch(batch: pa.Table) -> pa.Table:
        feats = decode_tiles_batch_v(batch, with_props=False,
                                     with_geometry=True)
        feats = feats.filter(
            pa.compute.equal(feats.column("geom_type"),
                             int(codec.GEOM_POINT)))
        empty = pa.table({
            "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()),
            "cell_row": pa.array([], pa.int32()),
            "cell_col": pa.array([], pa.int32()),
            "n_points": pa.array([], pa.int64())})
        if len(feats) == 0:
            return empty
        feat_of, px, py, bad = multipoint_coords(feats.column("geom_cmds"))
        if bad.any():  # malformed layout → scalar decode, same semantics
            geom = feats.column("geom_cmds")
            extra_f, extra_x, extra_y = [], [], []
            for i in np.flatnonzero(bad):
                pts = codec.decode_point(
                    np.asarray(geom[int(i)].as_py(), dtype=np.uint32))
                extra_f += [i] * pts.shape[0]
                extra_x += pts[:, 0].tolist()
                extra_y += pts[:, 1].tolist()
            feat_of = np.concatenate([feat_of, np.array(extra_f, np.int64)])
            px = np.concatenate([px, np.array(extra_x, np.int32)])
            py = np.concatenate([py, np.array(extra_y, np.int32)])
        if feat_of.shape[0] == 0:
            return empty
        # combined (tile, cell) key → one bincount for the whole batch
        zs = feats.column("z").to_numpy()
        xs = feats.column("x").to_numpy()
        ys = feats.column("y").to_numpy()
        tile_key = np.stack([zs, xs, ys], axis=1)
        uniq, tile_of_feat = np.unique(tile_key, axis=0, return_inverse=True)
        r = np.clip(py.astype(np.int64) // cell, 0, grid - 1)
        c = np.clip(px.astype(np.int64) // cell, 0, grid - 1)
        key = (tile_of_feat[feat_of] * grid + r) * grid + c
        counts = np.bincount(key, minlength=uniq.shape[0] * grid * grid)
        nz = np.flatnonzero(counts)
        t_idx = nz // (grid * grid)
        return pa.table({
            "z": pa.array(uniq[t_idx, 0].astype(np.int32)),
            "x": pa.array(uniq[t_idx, 1].astype(np.int32)),
            "y": pa.array(uniq[t_idx, 2].astype(np.int32)),
            "cell_row": pa.array((nz // grid % grid).astype(np.int32)),
            "cell_col": pa.array((nz % grid).astype(np.int32)),
            "n_points": pa.array(counts[nz].astype(np.int64)),
        })

    return tiles_ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def raster_to_vector(raster_ds, threshold: int = 2, grid: int = 16,
                     extent: int = 4096, layer_name: str = "hotcells",
                     n_buckets: int = 64, hole_inset: int = 0):
    """Density rows → MVT polygon tiles: one CCW square ring per cell with
    n_points >= threshold; properties: n_points (uint). Returns a tiles
    Dataset (z,x,y,mvt,n_cells) that passes vtzero-check.

    ``hole_inset > 0`` adds an INNER ring per cell (the inset square,
    reversed traversal → negative shoelace, spec 4.3.4.4 ring pairing /
    reference geometry.hpp:120-169 classification) — the holed-polygon
    corpus for the pyramid family.

    Polygon geometry is VECTORIZED per tile: all square-ring command
    words (MoveTo + LineTo(3) + ClosePath, cursor math inlined) come from
    one (F, 11) u32 matrix — only zigzag(x0)/zigzag(y0) vary per feature —
    (a constant 11-word inner-ring block appends when holed: the hole's
    MoveTo delta from the outer ring's end cursor is the same for every
    cell) then framed through add_feature_encoded (interning through the
    layer, byte-identical to the scalar PolygonFeatureBuilder path,
    asserted in test_raster). Tiles shuffle on a fixed-count bucket key,
    not the raw high-cardinality (z,x,y) key."""
    from ..mvt.pbf import zigzag_encode32
    from .encode import add_tile_bucket

    cell = extent // grid
    if hole_inset and not 0 < 2 * hole_inset < cell:
        raise ValueError("hole_inset must satisfy 0 < 2*inset < cell")
    zz_cell = zigzag_encode32(cell)
    zz_ncell = zigzag_encode32(-cell)
    iside = cell - 2 * hole_inset  # inner square side
    hole_block = np.array([
        9, zigzag_encode32(hole_inset), zigzag_encode32(hole_inset - cell),
        26, 0, zigzag_encode32(iside), zigzag_encode32(iside), 0,
        0, zigzag_encode32(-iside), 15], np.uint32)

    def per_bucket(t: pa.Table) -> pa.Table:
        # Arrow-native group processor (VERDICT r3 #8): threshold filter,
        # one lexsort over (z, x, y, cell_row, cell_col) — ascending key
        # order matches the old pandas groupby(sort=True) + stable
        # per-tile sort — then contiguous per-tile slices.
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t.column("n_points"),
                                      pa.scalar(threshold)))
        empty = pa.table({
            "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
            "n_cells": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        zs = t.column("z").to_numpy().astype(np.int64)
        xs = t.column("x").to_numpy().astype(np.int64)
        ys = t.column("y").to_numpy().astype(np.int64)
        rr_all = t.column("cell_row").to_numpy().astype(np.int64)
        cc_all = t.column("cell_col").to_numpy().astype(np.int64)
        np_all = t.column("n_points").to_numpy().astype(np.int64)
        order = np.lexsort((cc_all, rr_all, ys, xs, zs))
        zs, xs, ys = zs[order], xs[order], ys[order]
        rr_all, cc_all, np_all = rr_all[order], cc_all[order], np_all[order]
        key_change = np.r_[True, (zs[1:] != zs[:-1]) | (xs[1:] != xs[:-1])
                           | (ys[1:] != ys[:-1])]
        starts = np.flatnonzero(key_change)
        bounds = np.r_[starts, zs.size]
        out_z, out_x, out_y, out_mvt, out_n = [], [], [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            rr, cc, npts = rr_all[s:e], cc_all[s:e], np_all[s:e]
            F = rr.shape[0]
            cmds = np.empty((F, 11), np.uint32)
            cmds[:, 0] = 9                                   # MoveTo(1)
            cmds[:, 1] = ((cc * cell) << 1).astype(np.uint32)  # zz(x0), x0>=0
            cmds[:, 2] = ((rr * cell) << 1).astype(np.uint32)  # zz(y0), y0>=0
            cmds[:, 3] = 26                                  # LineTo(3)
            cmds[:, 4] = zz_cell
            cmds[:, 5] = 0
            cmds[:, 6] = 0
            cmds[:, 7] = zz_cell
            cmds[:, 8] = zz_ncell
            cmds[:, 9] = 0
            cmds[:, 10] = 15                                 # ClosePath(1)
            if hole_inset:
                cmds = np.concatenate(
                    [cmds, np.broadcast_to(hole_block, (F, 11))], axis=1)
            tb = TileBuilder()
            lb = tb.add_layer(layer_name, 2, extent)
            for i in range(F):
                lb.add_feature_encoded(
                    codec.GEOM_POLYGON, cmds[i],
                    feature_id=int(rr[i]) * grid + int(cc[i]),
                    props=[("n_points",
                            encode_value(int(npts[i]), VT_UINT))])
            out_z.append(zs[s])
            out_x.append(xs[s])
            out_y.append(ys[s])
            out_mvt.append(tb.serialize())
            out_n.append(F)
        return pa.table({
            "z": pa.array(np.array(out_z, np.int32)),
            "x": pa.array(np.array(out_x, np.int32)),
            "y": pa.array(np.array(out_y, np.int32)),
            "mvt": pa.array(out_mvt, pa.binary()),
            "n_cells": pa.array(np.array(out_n, np.int64))})

    bucketed = raster_ds.map_batches(add_tile_bucket, batch_format="pyarrow",
                                     fn_kwargs={"n_buckets": n_buckets})
    return bucketed.groupby("bucket").map_groups(
        lambda t: per_bucket(t.drop_columns(["bucket"])),
        batch_format="pyarrow")


def hotcell_counts_batch(batch: pa.Table, grid: int = 16) -> pa.Table:
    """POLYGON hotcell tiles → (z,x,y,cell_row,cell_col,n_points) raster
    rows — the exact inverse of raster_to_vector at threshold=1: the
    feature id encodes r·grid + c and the n_points property carries the
    count, so no geometry decode is needed (holes and all). The read
    half of incremental polygon-pyramid maintenance."""
    from ..mvt.values import decode_value

    feats = decode_tiles_batch_v(batch, with_props=True,
                                 with_geometry=False)
    empty = pa.table({
        "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
        "y": pa.array([], pa.int32()),
        "cell_row": pa.array([], pa.int32()),
        "cell_col": pa.array([], pa.int32()),
        "n_points": pa.array([], pa.int64())})
    n = len(feats)
    if n == 0:
        return empty
    fid = feats.column("feature_id").to_numpy().astype(np.int64)
    pkeys = feats.column("prop_keys").to_pylist()
    pvals = feats.column("prop_vals_raw").to_pylist()
    npts = np.empty(n, np.int64)
    for i in range(n):
        _, npts[i] = decode_value(pvals[i][pkeys[i].index("n_points")])
    return pa.table({
        "z": feats.column("z"), "x": feats.column("x"),
        "y": feats.column("y"),
        "cell_row": pa.array((fid // grid).astype(np.int32)),
        "cell_col": pa.array((fid % grid).astype(np.int32)),
        "n_points": pa.array(npts),
    })


def raster_to_vector_scalar(raster_ds, threshold: int = 2, grid: int = 16,
                            extent: int = 4096, layer_name: str = "hotcells",
                            hole_inset: int = 0):
    """Scalar reference path (full PolygonFeatureBuilder state machine) —
    kept for the byte-identity test against the vectorized kernel."""
    cell = extent // grid
    if hole_inset and not 0 < 2 * hole_inset < cell:
        raise ValueError("hole_inset must satisfy 0 < 2*inset < cell")

    def per_group(df):
        import pandas as pd

        z, x, y = int(df["z"].iloc[0]), int(df["x"].iloc[0]), int(df["y"].iloc[0])
        df = df[df["n_points"] >= threshold]
        if df.empty:
            return pd.DataFrame({
                "z": pd.Series([], dtype="int32"), "x": pd.Series([], dtype="int32"),
                "y": pd.Series([], dtype="int32"), "mvt": pd.Series([], dtype=object),
                "n_cells": pd.Series([], dtype="int64"),
            })
        df = df.sort_values(["cell_row", "cell_col"], kind="stable")
        tb = TileBuilder()
        lb = tb.add_layer(layer_name, 2, extent)

        for r in df.itertuples():
            x0, y0 = int(r.cell_col) * cell, int(r.cell_row) * cell
            x1, y1 = x0 + cell, y0 + cell
            fb = PolygonFeatureBuilder(lb)
            fb.set_id(int(r.cell_row) * grid + int(r.cell_col))
            # positive shoelace on screen-y-down axes = outer ring
            # (geometry.hpp:166-169): go +x first, then +y
            fb.add_ring(5)
            fb.set_point(x0, y0)
            fb.set_point(x1, y0)
            fb.set_point(x1, y1)
            fb.set_point(x0, y1)
            fb.close_ring()
            if hole_inset:
                # inner ring: inset square, reversed (+y first, then +x)
                # traversal → negative shoelace on screen-y-down axes
                ix0, iy0 = x0 + hole_inset, y0 + hole_inset
                ix1, iy1 = x1 - hole_inset, y1 - hole_inset
                fb.add_ring(5)
                fb.set_point(ix0, iy0)
                fb.set_point(ix0, iy1)
                fb.set_point(ix1, iy1)
                fb.set_point(ix1, iy0)
                fb.close_ring()
            fb.add_property("n_points", int(r.n_points), type_hint=VT_UINT)
            fb.commit()
        return pd.DataFrame({"z": [z], "x": [x], "y": [y],
                             "mvt": [tb.serialize()], "n_cells": [len(df)]})

    # scalar TWIN, but the shuffle shape matches production: bucketed tile
    # key (bounded group count), per-tile work in a local pandas groupby
    def per_bucket(df):
        import pandas as pd

        parts = [per_group(g) for _, g in
                 df.drop(columns=["bucket"]).groupby(["z", "x", "y"], sort=True)]
        parts = [p for p in parts if len(p)]
        if not parts:
            return pd.DataFrame({
                "z": pd.Series([], dtype="int32"),
                "x": pd.Series([], dtype="int32"),
                "y": pd.Series([], dtype="int32"),
                "mvt": pd.Series([], dtype=object),
                "n_cells": pd.Series([], dtype="int64")})
        return pd.concat(parts, ignore_index=True)

    from .encode import add_tile_bucket

    bucketed = raster_ds.map_batches(add_tile_bucket, batch_format="pyarrow")
    out = bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow")
