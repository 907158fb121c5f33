"""Tile-pyramid rollup: per-tile page counts at a ladder of zoom levels.

Tile servers need aggregates at EVERY zoom (the overview pyramid), not
just the finest one; the naive plan is one groupby per level — L
all-to-all shuffles over the full corpus. This op does it with per-batch
partial counts for ALL levels at once (each batch emits at most
L x unique-finest-tiles rows — tile-space bounded, corpus rows never
shuffle) followed by ONE bucketed shuffle that sums the partials.
Ancestor tiles at zoom l are integer shifts of the finest tile
(x >> (base-l), y >> (base-l)) — the quadtree parent walk of
cells.cell_parent applied to slippy (z, x, y) keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vtzero_ray.runtime import tune_allocator

_EMPTY = pa.table({"z": pa.array([], pa.int32()),
                   "x": pa.array([], pa.int32()),
                   "y": pa.array([], pa.int32()),
                   "n_pages": pa.array([], pa.int64())})

_KNUTH = 2654435761


def tile_pyramid(ds, base_zoom: int = 10, levels=(10, 8, 6, 4),
                 n_buckets: int = 64):
    """features Dataset (x, y at ``base_zoom``) → Dataset
    (z, x, y, n_pages) with one row per non-empty tile per level."""
    levels = tuple(sorted(set(levels), reverse=True))
    if not levels or levels[0] > base_zoom or levels[-1] < 0:
        raise ValueError(f"levels {levels} must lie in [0, {base_zoom}]")

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        if len(t) == 0:
            return _EMPTY
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        zs, xs, ys, ns = [], [], [], []
        for lvl in levels:
            s = base_zoom - lvl
            key = ((x >> s) << 32) | (y >> s)
            u, c = np.unique(key, return_counts=True)
            zs.append(np.full(len(u), lvl, np.int32))
            xs.append((u >> 32).astype(np.int32))
            ys.append((u & 0xFFFFFFFF).astype(np.int32))
            ns.append(c.astype(np.int64))
        return pa.table({"z": pa.array(np.concatenate(zs)),
                         "x": pa.array(np.concatenate(xs)),
                         "y": pa.array(np.concatenate(ys)),
                         "n_pages": pa.array(np.concatenate(ns))})

    def add_bucket(t: pa.Table) -> pa.Table:
        z = t.column("z").to_numpy().astype(np.int64)
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        b = ((((z << 44) ^ (x << 22) ^ y) * _KNUTH) % (1 << 32)) % n_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    def merge(df):
        out = (df.groupby(["z", "x", "y"], sort=False)["n_pages"].sum()
               .reset_index())
        return out[["z", "x", "y", "n_pages"]]

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(merge, batch_format="pandas"))


def build_pyramid(tiles_ds, out_dir: str, base_zoom: int, min_zoom: int,
                  extent: int = 4096) -> list:
    """Materialize a full MVT tile PYRAMID store: write the base-zoom
    tiles, then derive each coarser level from the PREVIOUS level's tiles
    (pipelines/overzoom.downzoom_points — the exact integer halving) and
    write it into the SAME z-partitioned store.

    The write_tiles sink partitions by z, publishes atomically per
    partition, and skips z-partitions already marked complete — so a
    pyramid build is resumable PER LEVEL for free, and each level's
    derivation reads tile rows (shrinking 4× per level), never the source
    corpus. Each level is materialized once because it feeds two
    consumers (the sink and the next level's downzoom) — the lineage
    re-execution rule; level size is tile-bounded.

    Returns the list of write_tiles manifests, finest level first.
    """
    from ..sources.mvt_io import write_tiles
    from .overzoom import downzoom_points

    if min_zoom > base_zoom or min_zoom < 0:
        raise ValueError(f"min_zoom {min_zoom} must lie in [0, {base_zoom}]")
    cur = tiles_ds.materialize()
    manifests = [write_tiles(cur, out_dir)]
    for _z in range(base_zoom, min_zoom, -1):
        cur = downzoom_points(cur, levels=1, extent=extent).materialize()
        manifests.append(write_tiles(cur, out_dir))
    return manifests


def get_tile(store_dir: str, z: int, x: int, y: int,
             extent: int = 4096) -> bytes | None:
    """Serve ONE tile from a build_pyramid store, overzooming on demand:
    if (z,x,y) is deeper than the stored base, the deepest stored
    ancestor is decoded and overzoomed down the quadtree path — the
    tileserver "virtual deep zoom" read. Returns the MVT bytes or None
    for an empty tile. Driver-side point lookup: reads ONLY the ancestor
    level's parquet files (z-partition pruning), never a full level.
    """
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .overzoom import OverzoomPoints

    stored = sorted(
        int(d.split("=")[1]) for d in os.listdir(store_dir)
        if d.startswith("z=") and not d.startswith(".tmp"))
    if not stored:
        raise ValueError(f"no completed levels in {store_dir}")
    candidates = [s for s in stored if s <= z]
    if not candidates:
        raise ValueError(f"z={z} is above the coarsest stored level "
                         f"{min(stored)} (downzoom is a build step, "
                         f"not a read step)")
    src = max(candidates)
    ax, ay = x >> (z - src), y >> (z - src)
    rows = None
    for f in glob.glob(os.path.join(store_dir, f"z={src}", "*.parquet")):
        t = pq.read_table(f, columns=["z", "x", "y", "mvt"])
        m = t.filter(pc.and_(pc.equal(t.column("x"), ax),
                             pc.equal(t.column("y"), ay)))
        if len(m):
            rows = m
            break
    if rows is None:
        return None
    cur = rows
    for _lvl in range(z - src):
        cur = OverzoomPoints(extent=extent)(cur)
        # keep only the child on the quadtree path to (z, x, y)
        cz = cur.column("z").to_numpy()
        assert (cz == cz[0]).all()
        shift = z - int(cz[0])
        keep = ((cur.column("x").to_numpy() == (x >> shift))
                & (cur.column("y").to_numpy() == (y >> shift)))
        cur = cur.filter(pa.array(keep))
        if len(cur) == 0:
            return None
    return cur.column("mvt")[0].as_py()
