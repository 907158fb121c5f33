
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
from ..mvt.decoder import VectorTile
from ..mvt.values import VT_UINT


def rasterize_tiles(tiles_ds, grid: int = 16, extent: int = 4096):
    """tiles (mvt) → (z,x,y,cell_row,cell_col,n_points) density rows."""
    cell = extent // grid

    def per_batch(batch: pa.Table) -> pa.Table:
        out = {"z": [], "x": [], "y": [], "cell_row": [], "cell_col": [], "n_points": []}
        for z, x, y, mvt in zip(batch.column("z").to_pylist(),
                                batch.column("x").to_pylist(),
                                batch.column("y").to_pylist(),
                                batch.column("mvt")):
            counts = np.zeros((grid, grid), dtype=np.int64)
            for layer in VectorTile(mvt.as_py()).layers():
                for f in layer.features():
                    if f.geom_type != codec.GEOM_POINT:
                        continue
                    pts = f.decode_geometry()
                    r = np.clip(pts[:, 1] // cell, 0, grid - 1)
                    c = np.clip(pts[:, 0] // cell, 0, grid - 1)
                    np.add.at(counts, (r, c), 1)
            rr, cc = np.nonzero(counts)
            out["z"] += [z] * rr.shape[0]
            out["x"] += [x] * rr.shape[0]
            out["y"] += [y] * rr.shape[0]
            out["cell_row"] += rr.tolist()
            out["cell_col"] += cc.tolist()
            out["n_points"] += counts[rr, cc].tolist()
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "cell_row": pa.array(out["cell_row"], pa.int32()),
            "cell_col": pa.array(out["cell_col"], pa.int32()),
            "n_points": pa.array(out["n_points"], pa.int64()),
        })

    return tiles_ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def raster_to_vector(raster_ds, threshold: int = 2, grid: int = 16,
                     extent: int = 4096, layer_name: str = "hotcells"):
    """Density rows → MVT polygon tiles: one CCW square ring per cell with
    n_points >= threshold; properties: n_points (uint). Returns a tiles
    Dataset (z,x,y,mvt,n_cells) that passes vtzero-check."""
    cell = extent // grid

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
            fb.add_property("n_points", int(r.n_points), type_hint=VT_UINT)
            fb.commit()
        return pd.DataFrame({"z": [z], "x": [x], "y": [y],
                             "mvt": [tb.serialize()], "n_cells": [len(df)]})

    out = raster_ds.groupby(["z", "x", "y"]).map_groups(per_group, batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow")
