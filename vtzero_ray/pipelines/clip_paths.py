"""Cross-tile site paths clipped per tile — the full north-rule chain
geoparse → tile assign → CLIP → encode, for geometry that SPANS tiles.

``pipelines/paths.py`` builds per-tile paths from the points that landed
in each tile; a path crossing tile boundaries is silently split at the
boundary points. This module does it properly: each site's polyline is
built once in WORLD pixel coordinates at the target zoom, every tile the
(buffered) segment bbox touches receives the segment, and each tile
clips to its local box [-buffer, extent+buffer]² with vectorized
Liang-Barsky (stages/clip.py) before multi-part linestring encoding
(vtzero cursor semantics across parts, builder.hpp:843-856).

Scale shape:
- segments are formed per site via a bucketed groupby (site cardinality
  is bounded; each site's page list is bounded — documented partitioning
  assumption, same as pipelines/paths.py);
- tile fan-out replicates a segment only to tiles its buffered bbox
  overlaps (O(length/extent) tiles), then clip+encode shuffles once on
  the tile key — no driver materialization anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..mvt import codec
from ..mvt.builder import TileBuilder
from ..mvt.values import VT_UINT, encode_value
from ..stages.clip import chain_parts, liang_barsky
from ..stages.geoparse import AssignTiles, geoparse
from ..sources.pages import read_pages


def _world_points(sf_dir: str, zoom: int, extent: int):
    """→ Dataset of (site, doc_id, wx, wy) world pixel coords at zoom."""
    ds = read_pages(sf_dir, include_html=False)
    ds = geoparse(ds)
    ds = ds.select_columns(["doc_id", "lat", "lon"])
    ds = ds.map_batches(AssignTiles((zoom,), extent), batch_format="pyarrow")

    def world(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy().astype(np.int64)
        y = batch.column("y").to_numpy().astype(np.int64)
        px = batch.column("px").to_numpy().astype(np.int64)
        py = batch.column("py").to_numpy().astype(np.int64)
        doc_id = batch.column("doc_id").to_numpy()
        return pa.table({
            "site": pa.array(doc_id % 50),
            "doc_id": batch.column("doc_id"),
            "wx": pa.array(x * extent + px),
            "wy": pa.array(y * extent + py),
        })

    return ds.map_batches(world, batch_format="pyarrow")


def _site_segments(df: pd.DataFrame) -> pd.DataFrame:
    """One site bucket → consecutive-point segments (dup points dropped,
    seg_idx over the deduped sequence) — mirrors the oracle's window SQL."""
    out = []
    for site, g in df.groupby("site", sort=False):
        g = g.sort_values("doc_id", kind="stable")
        wx = g["wx"].to_numpy()
        wy = g["wy"].to_numpy()
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (wx[1:] != wx[:-1]) | (wy[1:] != wy[:-1])
        wx, wy = wx[keep], wy[keep]
        if wx.shape[0] < 2:
            continue
        m = wx.shape[0] - 1
        out.append(pd.DataFrame({
            "site": np.full(m, site, np.int64),
            "seg_idx": np.arange(m, dtype=np.int64),
            "wx0": wx[:-1], "wy0": wy[:-1],
            "wx1": wx[1:], "wy1": wy[1:],
        }))
    if not out:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                             ("site", "seg_idx", "wx0", "wy0", "wx1", "wy1")})
    return pd.concat(out, ignore_index=True)


def world_segments(sf_dir: str, zoom: int = 2, extent: int = 4096,
                   n_buckets: int = 16):
    pts = _world_points(sf_dir, zoom, extent)

    def bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column("site").to_numpy() % n_buckets).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    pts = pts.map_batches(bucket, batch_format="pyarrow")
    segs = pts.groupby("bucket").map_groups(
        lambda df: _site_segments(df.drop(columns=["bucket"])),
        batch_format="pandas")
    return segs.map_batches(lambda t: t, batch_format="pyarrow")


class ClipToTiles:
    """map_batches fn: world segments → per-tile clipped segments.

    Fan-out: a segment goes to every tile whose buffered box its bbox
    overlaps (superset is fine — Liang-Barsky rejects non-overlaps, so
    the output is candidate-set independent; the oracle cross-joins ALL
    tiles at the test zoom for the same reason). Vectorized throughout.
    """

    def __init__(self, zoom: int, extent: int = 4096,
                 buffer: int = 64) -> None:
        self.zoom = zoom
        self.extent = extent
        self.buffer = buffer

    def __call__(self, batch: pa.Table) -> pa.Table:
        extent, buffer = self.extent, self.buffer
        n_tiles = 1 << self.zoom
        wx0 = batch.column("wx0").to_numpy().astype(np.int64)
        wy0 = batch.column("wy0").to_numpy().astype(np.int64)
        wx1 = batch.column("wx1").to_numpy().astype(np.int64)
        wy1 = batch.column("wy1").to_numpy().astype(np.int64)
        site = batch.column("site").to_numpy().astype(np.int64)
        seg_idx = batch.column("seg_idx").to_numpy().astype(np.int64)

        txmin = np.clip((np.minimum(wx0, wx1) - buffer) // extent, 0, n_tiles - 1)
        txmax = np.clip((np.maximum(wx0, wx1) + buffer) // extent, 0, n_tiles - 1)
        tymin = np.clip((np.minimum(wy0, wy1) - buffer) // extent, 0, n_tiles - 1)
        tymax = np.clip((np.maximum(wy0, wy1) + buffer) // extent, 0, n_tiles - 1)
        nx = (txmax - txmin + 1)
        ny = (tymax - tymin + 1)
        reps = (nx * ny).astype(np.int64)

        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        # per-replica (tx, ty) offsets within each segment's tile window
        local = np.arange(int(reps.sum()), dtype=np.int64) - \
            np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        tx = txmin[idx] + local % nx[idx]
        ty = tymin[idx] + local // nx[idx]

        lx0 = wx0[idx] - tx * extent
        ly0 = wy0[idx] - ty * extent
        lx1 = wx1[idx] - tx * extent
        ly1 = wy1[idx] - ty * extent
        keep, cx0, cy0, cx1, cy1 = liang_barsky(
            lx0, ly0, lx1, ly1, -float(buffer), float(extent + buffer))
        return pa.table({
            "z": pa.array(np.full(int(keep.sum()), self.zoom, np.int32)),
            "x": pa.array(tx[keep].astype(np.int32)),
            "y": pa.array(ty[keep].astype(np.int32)),
            "site": pa.array(site[idx][keep]),
            "seg_idx": pa.array(seg_idx[idx][keep]),
            "cx0": pa.array(cx0[keep]), "cy0": pa.array(cy0[keep]),
            "cx1": pa.array(cx1[keep]), "cy1": pa.array(cy1[keep]),
        })


def clipped_segments(sf_dir: str, zoom: int = 2, extent: int = 4096,
                     buffer: int = 64):
    """★ query: every (tile, site, segment) with clipped integer coords."""
    segs = world_segments(sf_dir, zoom, extent)
    return segs.map_batches(ClipToTiles(zoom, extent, buffer),
                            batch_format="pyarrow")


def _path_stats(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for (z, x, y, site), g in df.groupby(["z", "x", "y", "site"], sort=False):
        g = g.sort_values("seg_idx", kind="stable")
        si = g["seg_idx"].to_numpy()
        new_part = np.ones(len(g), dtype=bool)
        new_part[1:] = ((si[1:] != si[:-1] + 1)
                        | (g["cx0"].to_numpy()[1:] != g["cx1"].to_numpy()[:-1])
                        | (g["cy0"].to_numpy()[1:] != g["cy1"].to_numpy()[:-1]))
        n_parts = int(new_part.sum())
        rows.append((z, x, y, site, n_parts, len(g) + n_parts))
    if not rows:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                             ("z", "x", "y", "site", "n_parts", "n_points")})
    out = pd.DataFrame(rows, columns=["z", "x", "y", "site",
                                      "n_parts", "n_points"])
    return out.astype({"z": "int32", "x": "int32", "y": "int32",
                       "site": "int64", "n_parts": "int64",
                       "n_points": "int64"})


def clipped_path_stats(sf_dir: str, zoom: int = 2, extent: int = 4096,
                       buffer: int = 64, n_buckets: int = 64):
    """★ query: per (tile, site) multi-part polyline shape after clipping
    (n_parts, n_points) — the logical output the tile encoder consumes."""
    from ..stages.encode import add_tile_bucket

    segs = clipped_segments(sf_dir, zoom, extent, buffer)
    segs = segs.map_batches(add_tile_bucket, batch_format="pyarrow",
                            fn_kwargs={"n_buckets": n_buckets})
    out = segs.groupby("bucket").map_groups(
        lambda df: _path_stats(df.drop(columns=["bucket"])),
        batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow")


def _stitch_parts(parts: list) -> list:
    """Cross-child part stitching (downzoom seam repair): in part
    order, append each part to the EARLIEST previously-emitted part
    whose last point exactly equals its first point (dropping the
    duplicated junction point); chains extend transitively. Seam-free
    inputs (no endpoint meets) pass through unchanged — the
    byte-identity anchor against the unstitched twin."""
    out: list = []
    for p in parts:
        for j, q in enumerate(out):
            if q[-1, 0] == p[0, 0] and q[-1, 1] == p[0, 1]:
                out[j] = np.concatenate([q, p[1:]], axis=0)
                break
        else:
            out.append(p)
    return out


def _encode_tile_group(df: pd.DataFrame, extent: int,
                       stitch: bool = False) -> pd.DataFrame:
    """One bucket of tiles → MVT bytes: one multi-part linestring feature
    per site (feature_id = site, props site/n_parts), scalar builder per
    tile (features per tile are few; the vectorized line kernel covers
    the single-part hot path in stages/encode_lines). ``stitch`` merges
    parts whose endpoints meet exactly (the downzoom child-seam case —
    see _stitch_parts); the clip pipeline never sets it."""
    rows = []
    for (z, x, y), tile_g in df.groupby(["z", "x", "y"], sort=True):
        tb = TileBuilder()
        lb = tb.add_layer("clipped_paths", 2, extent)
        n = 0
        for site, g in tile_g.groupby("site", sort=True):
            g = g.sort_values("seg_idx", kind="stable")
            offs, px, py = chain_parts(
                g["seg_idx"].to_numpy(), g["cx0"].to_numpy(),
                g["cy0"].to_numpy(), g["cx1"].to_numpy(),
                g["cy1"].to_numpy())
            parts = [np.stack([px[offs[i]:offs[i + 1]],
                               py[offs[i]:offs[i + 1]]], axis=1)
                     for i in range(offs.shape[0] - 1)]
            if stitch:
                parts = _stitch_parts(parts)
            cmds = codec.encode_linestring(parts)
            lb.add_feature_encoded(
                codec.GEOM_LINESTRING, cmds, feature_id=int(site),
                props=[("site", encode_value(int(site), VT_UINT)),
                       ("n_parts", encode_value(len(parts), VT_UINT))])
            n += 1
        rows.append((z, x, y, tb.serialize(), n))
    if not rows:
        return pd.DataFrame({
            "z": pd.Series([], dtype="int32"), "x": pd.Series([], dtype="int32"),
            "y": pd.Series([], dtype="int32"), "mvt": pd.Series([], dtype=object),
            "n_features": pd.Series([], dtype="int64")})
    out = pd.DataFrame(rows, columns=["z", "x", "y", "mvt", "n_features"])
    return out.astype({"z": "int32", "x": "int32", "y": "int32",
                       "n_features": "int64"})


def clipped_path_tiles(sf_dir: str, zoom: int = 2, extent: int = 4096,
                       buffer: int = 64, n_buckets: int = 64):
    """Tiles Dataset (z,x,y,mvt,n_features) of clipped multi-part paths."""
    from ..stages.encode import add_tile_bucket

    segs = clipped_segments(sf_dir, zoom, extent, buffer)
    segs = segs.map_batches(add_tile_bucket, batch_format="pyarrow",
                            fn_kwargs={"n_buckets": n_buckets})
    tiles = segs.groupby("bucket").map_groups(
        lambda df: _encode_tile_group(df.drop(columns=["bucket"]), extent),
        batch_format="pandas")
    return tiles.map_batches(lambda t: t, batch_format="pyarrow")
