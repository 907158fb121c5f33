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


def _downzoom_fn(kind: str):
    from .overzoom import (downzoom_paths, downzoom_points,
                           downzoom_polygons)

    try:
        return {"points": downzoom_points,
                "paths": downzoom_paths,
                "polygons": downzoom_polygons}[kind]
    except KeyError:
        raise ValueError(f"unknown pyramid kind {kind!r} "
                         "(points | paths | polygons)") from None


def _overzoom_kernel(kind: str, extent: int):
    from .overzoom import OverzoomPaths, OverzoomPoints, OverzoomPolygons

    try:
        return {"points": lambda: OverzoomPoints(extent=extent),
                "paths": lambda: OverzoomPaths(extent=extent),
                "polygons": lambda: OverzoomPolygons(extent=extent)}[kind]()
    except KeyError:
        raise ValueError(f"unknown pyramid kind {kind!r} "
                         "(points | paths | polygons)") from None


def build_pyramid(tiles_ds, out_dir: str, base_zoom: int, min_zoom: int,
                  extent: int = 4096, kind: str = "points",
                  hilbert: bool = False) -> list:
    """Materialize a full MVT tile PYRAMID store: write the base-zoom
    tiles, then derive each coarser level from the PREVIOUS level's tiles
    (pipelines/overzoom downzoom — the exact integer halving for the
    requested geometry ``kind``: points | paths | polygons, the latter
    including holed multi-ring features) and write it into the SAME
    z-partitioned store.

    The write_tiles sink partitions by z, publishes atomically per
    partition, and skips z-partitions already marked complete — so a
    pyramid build is resumable PER LEVEL for free, and each level's
    derivation reads tile rows (shrinking 4× per level), never the source
    corpus. Each level is materialized once because it feeds two
    consumers (the sink and the next level's downzoom) — the lineage
    re-execution rule; level size is tile-bounded.

    ``hilbert=True`` sorts each level by its Hilbert key before the
    write (sort_tiles_hilbert — the paid-once layout investment): the
    store's files get DISJOINT footer hkey ranges, so incremental
    updates/removals file-prune their affected-tile reads
    (read_tiles_current keys=) instead of scanning the level. Returns
    the list of write_tiles manifests, finest level first.
    """
    from ..sources.mvt_io import sort_tiles_hilbert, write_tiles

    dz = _downzoom_fn(kind)
    if min_zoom > base_zoom or min_zoom < 0:
        raise ValueError(f"min_zoom {min_zoom} must lie in [0, {base_zoom}]")

    def norm(t: pa.Table) -> pa.Table:
        # polygon pipelines count features as n_cells — the sink's
        # stats column is n_features
        if "n_cells" in t.column_names:
            return t.rename_columns(
                ["n_features" if c == "n_cells" else c
                 for c in t.column_names])
        return t

    def layout(ds):
        return sort_tiles_hilbert(ds) if hilbert else ds

    cur = tiles_ds.map_batches(norm, batch_format="pyarrow",
                               batch_size=None).materialize()
    manifests = [write_tiles(layout(cur), out_dir)]
    for _z in range(base_zoom, min_zoom, -1):
        nxt = dz(cur.select_columns(
            [c for c in cur.schema().names if c != "hkey"]),
            levels=1, extent=extent) \
            .map_batches(norm, batch_format="pyarrow",
                         batch_size=None).materialize()
        cur = nxt
        manifests.append(write_tiles(layout(cur), out_dir))
    return manifests


def _delta_dirs(store_dir: str) -> list:
    """Completed delta generations, oldest first (delta-0, delta-1, …).
    Incomplete ``.building`` dirs are invisible by construction."""
    import os
    import re

    out = []
    for d in os.listdir(store_dir):
        m = re.fullmatch(r"delta-(\d+)", d)
        if m:
            out.append((int(m.group(1)), os.path.join(store_dir, d)))
    return [p for _i, p in sorted(out)]


def _hkeys_of(keys: np.ndarray, zoom: int) -> np.ndarray:
    """Sorted Hilbert store keys ((z<<52) | d) of (x<<32|y) tile keys."""
    from ..functions.geo import hilbert_d

    x = (keys >> 32).astype(np.int64)
    y = (keys & 0xFFFFFFFF).astype(np.int64)
    return np.sort((np.int64(zoom) << np.int64(52))
                   | hilbert_d(x, y, int(zoom)))


def _pruned_level_paths(root: str, zoom: int, keys) -> list:
    """One generation's z={zoom} files, FILE-PRUNED to those whose
    Hilbert key range (parquet footer stats, mvt_io.file_hkey_range)
    can contain one of the requested tile keys. Generations written
    without the Hilbert layout (no hkey column / no stats — e.g. delta
    dirs) keep every file: pruning is always a safe superset, and the
    caller's exact key filter stays in place."""
    import glob
    import os

    from ..sources.mvt_io import file_hkey_range

    paths = sorted(glob.glob(os.path.join(root, f"z={zoom}", "*.parquet")))
    if keys is None or not paths:
        return paths
    hks = _hkeys_of(np.asarray(keys, np.int64), zoom)
    kept = []
    for f in paths:
        rng = file_hkey_range(f)
        if rng is None:
            kept.append(f)     # not Hilbert-laid-out — cannot prune
            continue
        lo, hi = rng
        i = np.searchsorted(hks, lo)
        if i < hks.shape[0] and hks[i] <= hi:
            kept.append(f)
    return kept


def read_tiles_current(store_dir: str, zoom: int | None = None,
                       n_buckets: int = 64, keys=None):
    """Read the CURRENT view of an updatable pyramid store: the base
    tiles plus every completed delta generation, each (z, x, y) resolved
    to its newest generation's row (LSM last-wins). With no deltas this
    is a plain pruned read — no shuffle; with deltas, ONE tile-bounded
    bucketed shuffle picks winners.

    ``keys`` (sorted (x<<32|y) composites, requires ``zoom``) turns on
    FILE-LEVEL pruning for Hilbert-laid-out generations
    (build_pyramid(hilbert=True) / sort_tiles_hilbert): only files
    whose footer hkey range can contain a requested tile are listed —
    the 100-TB shape for incremental updates, where the base level is
    corpus-scale and the affected set is shard-bounded. Pruning is a
    superset; callers still apply their exact key filter."""
    import glob
    import os

    import ray.data as rd

    if keys is not None and zoom is None:
        raise ValueError("keys pruning requires an explicit zoom")

    def level_paths(root):
        if zoom is None:
            return sorted(glob.glob(os.path.join(root, "z=*", "*.parquet")))
        return _pruned_level_paths(root, zoom, keys)

    gens = [store_dir] + _delta_dirs(store_dir)
    cols = ["z", "x", "y", "mvt", "n_features"]
    parts = []
    for gi, root in enumerate(gens):
        paths = level_paths(root)
        if not paths:
            continue
        ds = rd.read_parquet(paths, columns=cols)
        if len(gens) > 1:
            def tag(t: pa.Table, _g=gi) -> pa.Table:
                return t.append_column(
                    "gen", pa.array(np.full(len(t), _g, np.int64)))
            ds = ds.map_batches(tag, batch_format="pyarrow",
                                batch_size=None)
        parts.append(ds)
    if not parts:
        raise ValueError(f"no completed levels in {store_dir}")
    if len(parts) == 1 and len(gens) == 1:
        return parts[0]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)

    def add_bucket(t: pa.Table) -> pa.Table:
        z = t.column("z").to_numpy().astype(np.int64)
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        b = ((((z << 44) ^ (x << 22) ^ y) * _KNUTH) % (1 << 32)) % n_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    def newest(df):
        df = df.sort_values(["z", "x", "y", "gen"], kind="stable")
        df = df.drop_duplicates(["z", "x", "y"], keep="last")
        # a winning TOMBSTONE (remove_from_pyramid: empty mvt) means
        # the tile no longer exists in the current view
        df = df[df["mvt"].map(lambda b: len(b) > 0)]
        return df[["z", "x", "y", "mvt", "n_features"]]

    return (u.map_batches(add_bucket, batch_format="pyarrow",
                          batch_size=None)
            .groupby("bucket").map_groups(newest, batch_format="pandas"))


def update_pyramid(store_dir: str, new_feats_ds, base_zoom: int,
                   min_zoom: int, extent: int = 4096) -> str:
    """INCREMENTAL pyramid maintenance — the continuous-crawl shape for
    tiles (the dedup_index extend loop applied to the tile store): a new
    shard of base-zoom feature rows touches only its own tiles, never
    the rest of the pyramid.

    Per level, the affected key set starts at the shard's distinct base
    tiles (shard-bounded, held on the driver like the hot-set filter)
    and SHRINKS 4× per parent step. Affected base tiles decode back to
    features (TilesToFeatures), union with the shard, and re-assemble
    through the STANDARD bucketed tile shuffle — byte-identical to a
    from-scratch build of those tiles (the assembler sorts by doc_id, so
    old∪new merge order cannot matter; asserted in tests). Each parent
    level re-derives from the CURRENT child tiles: updated children plus
    the stored, untouched siblings of affected parents.

    The whole update builds in a private temp dir and publishes as ONE
    atomic rename to ``delta-N/`` (readers never see a torn update; a
    crashed build leaves only an invisible ``.building`` dir; two racing
    updaters — the loser's rename fails and it retries as delta-N+1).
    Reads resolve last-wins via read_tiles_current / get_tile; fold
    generations down with compact_pyramid when the delta chain grows.

    Additive semantics: shards ADD features; tile deletion is out of
    scope (a tombstone generation would slot into the same last-wins
    read, documented here rather than half-built).

    At 100 TB: the affected-sibling reads below read a LEVEL and filter;
    with a Hilbert-ordered store (sort_tiles_hilbert +
    file_hilbert_ranges) they prune to the files whose key ranges
    intersect the affected set. Returns the published delta dir."""
    import os
    import shutil

    import ray

    from ..sources.mvt_io import write_tiles
    from ..stages.encode import PointTileAssembler, add_tile_bucket
    from .overzoom import TilesToFeatures, downzoom_points

    if min_zoom > base_zoom or min_zoom < 0:
        raise ValueError(f"min_zoom {min_zoom} must lie in [0, {base_zoom}]")

    # 1. shard's distinct base tiles (shard-bounded driver set)
    def key_part(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        u = np.unique((x << 32) | y)
        return pa.table({"k": pa.array(u)})

    kparts = new_feats_ds.select_columns(["x", "y"]).map_batches(
        key_part, batch_format="pyarrow", batch_size=None).to_pandas()
    aff = np.unique(kparts["k"].to_numpy(np.int64))
    if aff.size == 0:
        raise ValueError("update_pyramid: empty shard")

    def key_filter(keys_sorted):
        kref = ray.put(keys_sorted)

        def f(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            x = t.column("x").to_numpy().astype(np.int64)
            y = t.column("y").to_numpy().astype(np.int64)
            k = (x << 32) | y
            pos = np.searchsorted(ks, k)
            hit = (pos < ks.shape[0]) & (ks[np.minimum(
                pos, ks.shape[0] - 1)] == k)
            return t.filter(pa.array(hit))
        return f

    # 2. affected base tiles: stored current view → features ∪ shard
    # (file-pruned for Hilbert-laid-out generations — keys is a superset
    # guard; the exact key filter below still applies)
    old = read_tiles_current(store_dir, zoom=base_zoom, keys=aff) \
        .map_batches(key_filter(aff), batch_format="pyarrow",
                     batch_size=None) \
        .map_batches(TilesToFeatures(extent), batch_format="pyarrow")
    feats = old.union(new_feats_ds.select_columns(
        ["z", "x", "y", "doc_id", "px", "py", "url", "lang"]))
    cur = feats.map_batches(add_tile_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            PointTileAssembler(extent=extent), batch_format="pyarrow") \
        .materialize()

    n_delta = len(_delta_dirs(store_dir))
    tmp = os.path.join(store_dir, f".delta-{n_delta}.building.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        write_tiles(cur, tmp)
        cur_keys = aff
        for z in range(base_zoom, min_zoom, -1):
            parents = np.unique(((cur_keys >> 32) >> 1 << 32)
                                | ((cur_keys & 0xFFFFFFFF) >> 1))
            # children of affected parents at level z
            child_keys = np.unique(np.concatenate([
                ((parents >> 32) * 2 + dx) << 32
                | ((parents & 0xFFFFFFFF) * 2 + dy)
                for dx in (0, 1) for dy in (0, 1)]))
            sib_keys = np.setdiff1d(child_keys, cur_keys)
            lvl = cur
            if sib_keys.size:
                sibs = read_tiles_current(
                    store_dir, zoom=z, keys=sib_keys).map_batches(
                    key_filter(sib_keys), batch_format="pyarrow",
                    batch_size=None)
                lvl = cur.union(sibs)
            cur = downzoom_points(lvl, levels=1,
                                  extent=extent).materialize()
            write_tiles(cur, tmp)
            cur_keys = parents
        final = os.path.join(store_dir, f"delta-{n_delta}")
        os.rename(tmp, final)
        return final
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def update_polygon_pyramid(store_dir: str, raster_shard_ds, base_zoom: int,
                           min_zoom: int, grid: int = 16,
                           extent: int = 4096,
                           hole_inset: int = 0) -> str:
    """Incremental maintenance for a POLYGON (hotcells) pyramid store
    built at ``threshold=1``: a raster shard of
    (z, x, y, cell_row, cell_col, n_points) rows adds counts to its own
    tiles only. Stored tiles decode back to counts LOSSLESSLY
    (raster_to_vector at threshold 1 keeps every occupied cell;
    stages/raster.hotcell_counts_batch inverts it from the feature ids
    and n_points properties alone), the shard's counts sum in, affected
    tiles re-encode through raster_to_vector — byte-identical to a
    from-scratch build over the combined raster — and parent levels
    re-derive with downzoom_polygons exactly as update_pyramid does for
    points. One atomic delta-N publish; reads via read_tiles_current.

    Thresholds above 1 are rejected: a thresholded store has DROPPED
    sub-threshold counts, so stored tiles cannot reproduce the base
    raster and increments would under-count."""
    import os
    import shutil

    import ray

    from ..sources.mvt_io import write_tiles
    from ..stages.encode import add_tile_bucket
    from ..stages.raster import hotcell_counts_batch, raster_to_vector
    from .overzoom import downzoom_polygons

    if min_zoom > base_zoom or min_zoom < 0:
        raise ValueError(f"min_zoom {min_zoom} must lie in [0, {base_zoom}]")

    def key_part(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        return pa.table({"k": pa.array(np.unique((x << 32) | y))})

    kparts = raster_shard_ds.select_columns(["x", "y"]).map_batches(
        key_part, batch_format="pyarrow", batch_size=None).to_pandas()
    aff = np.unique(kparts["k"].to_numpy(np.int64))
    if aff.size == 0:
        raise ValueError("update_polygon_pyramid: empty shard")
    kref = ray.put(aff)

    def key_filter(t: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        k = (x << 32) | y
        pos = np.searchsorted(ks, k)
        hit = (pos < ks.shape[0]) & (ks[np.minimum(
            pos, ks.shape[0] - 1)] == k)
        return t.filter(pa.array(hit))

    def norm(t: pa.Table) -> pa.Table:
        if "n_cells" in t.column_names:
            return t.rename_columns(
                ["n_features" if c == "n_cells" else c
                 for c in t.column_names])
        return t

    old_counts = read_tiles_current(store_dir, zoom=base_zoom,
                                    keys=aff) \
        .map_batches(key_filter, batch_format="pyarrow",
                     batch_size=None) \
        .map_batches(hotcell_counts_batch, batch_format="pyarrow",
                     fn_kwargs={"grid": grid})
    combined = old_counts.union(raster_shard_ds.select_columns(
        ["z", "x", "y", "cell_row", "cell_col", "n_points"]))

    def sum_cells(df):
        out = (df.drop(columns=["bucket"])
               .groupby(["z", "x", "y", "cell_row", "cell_col"],
                        sort=False)["n_points"].sum().reset_index())
        for c in ("z", "x", "y", "cell_row", "cell_col"):
            out[c] = out[c].astype("int32")
        out["n_points"] = out["n_points"].astype("int64")
        return out

    summed = combined.map_batches(add_tile_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(sum_cells, batch_format="pandas")
    cur = raster_to_vector(summed, threshold=1, grid=grid, extent=extent,
                           hole_inset=hole_inset) \
        .map_batches(norm, batch_format="pyarrow",
                     batch_size=None).materialize()

    n_delta = len(_delta_dirs(store_dir))
    tmp = os.path.join(store_dir, f".delta-{n_delta}.building.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        write_tiles(cur, tmp)
        cur_keys = aff
        for z in range(base_zoom, min_zoom, -1):
            parents = np.unique(((cur_keys >> 32) >> 1 << 32)
                                | ((cur_keys & 0xFFFFFFFF) >> 1))
            child_keys = np.unique(np.concatenate([
                ((parents >> 32) * 2 + dx) << 32
                | ((parents & 0xFFFFFFFF) * 2 + dy)
                for dx in (0, 1) for dy in (0, 1)]))
            sib_keys = np.setdiff1d(child_keys, cur_keys)
            lvl = cur
            if sib_keys.size:
                sref = ray.put(np.sort(sib_keys))

                def sib_filter(t: pa.Table, _r=sref) -> pa.Table:
                    ks = ray.get(_r)
                    x = t.column("x").to_numpy().astype(np.int64)
                    y = t.column("y").to_numpy().astype(np.int64)
                    k = (x << 32) | y
                    pos = np.searchsorted(ks, k)
                    hit = (pos < ks.shape[0]) & (ks[np.minimum(
                        pos, ks.shape[0] - 1)] == k)
                    return t.filter(pa.array(hit))

                sibs = read_tiles_current(
                    store_dir, zoom=z, keys=sib_keys).map_batches(
                    sib_filter, batch_format="pyarrow", batch_size=None)
                lvl = cur.union(sibs)
            cur = downzoom_polygons(lvl, levels=1, extent=extent) \
                .map_batches(norm, batch_format="pyarrow",
                             batch_size=None).materialize()
            write_tiles(cur, tmp)
            cur_keys = parents
        final = os.path.join(store_dir, f"delta-{n_delta}")
        os.rename(tmp, final)
        return final
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def remove_from_pyramid(store_dir: str, removals_ds, base_zoom: int,
                        min_zoom: int, extent: int = 4096) -> str:
    """DELETION for the updatable pyramid — the tombstone half of
    update_pyramid (takedown / right-to-be-forgotten shape): a shard of
    ``(x, y, doc_id)`` rows at base zoom names features to remove. Each
    affected tile re-encodes from its CURRENT features minus the listed
    doc_ids; a tile losing every feature publishes a TOMBSTONE row
    (empty mvt, n_features = 0) so the last-wins read drops it; parent
    levels re-derive exactly as in update_pyramid (updated children +
    stored untouched siblings — a parent emptied of every child also
    tombstones). One atomic delta-N publish; affected keys are
    shard-bounded and shrink 4× per level, and the per-level working
    set is affected-tile-bounded, so it rides the driver like the
    hot-set filter. Removing a doc_id absent from its tile is a no-op
    (the tile re-encodes to identical bytes)."""
    import os
    import shutil

    import ray
    import ray.data as rds

    from ..sources.mvt_io import write_tiles
    from ..stages.encode import PointTileAssembler, add_tile_bucket
    from .overzoom import TilesToFeatures, downzoom_points

    if min_zoom > base_zoom or min_zoom < 0:
        raise ValueError(f"min_zoom {min_zoom} must lie in [0, {base_zoom}]")

    rem = removals_ds.select_columns(["x", "y", "doc_id"]).to_pandas()
    if not len(rem):
        raise ValueError("remove_from_pyramid: empty removal shard")
    rx = rem["x"].to_numpy().astype(np.int64)
    ry = rem["y"].to_numpy().astype(np.int64)
    rdoc = rem["doc_id"].to_numpy().astype(np.int64)
    aff = np.unique((rx << 32) | ry)
    # (tilekey, doc_id) composite for the vectorized drop filter —
    # doc_ids fit 32 bits in this corpus? NO assumption: use a sorted
    # 2-column pair table probed with searchsorted on a fused view
    pairs = np.unique(np.stack([(rx << 32) | ry, rdoc], axis=1), axis=0)
    pref = ray.put((np.sort(aff), pairs))

    def filter_and_drop(t: pa.Table) -> pa.Table:
        keys_sorted, prs = ray.get(pref)
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        k = (x << 32) | y
        pos = np.searchsorted(keys_sorted, k)
        hit = (pos < keys_sorted.shape[0]) & (keys_sorted[np.minimum(
            pos, keys_sorted.shape[0] - 1)] == k)
        t = t.filter(pa.array(hit))
        if len(t) == 0:
            return t
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        d = t.column("doc_id").to_numpy().astype(np.int64)
        row = np.stack([(x << 32) | y, d], axis=1)
        # membership of (tile, doc) rows in the sorted pair table
        idx = np.searchsorted(prs[:, 0], row[:, 0], side="left")
        drop = np.zeros(len(t), bool)
        # second-key walk stays vectorizable because pairs-per-tile is
        # tiny; np.searchsorted over a fused float is unsafe for 64-bit
        # doc ids, so probe each (lo..hi) run with equality
        hi = np.searchsorted(prs[:, 0], row[:, 0], side="right")
        multi = hi > idx
        for i in np.flatnonzero(multi):
            drop[i] = bool((prs[idx[i]:hi[i], 1] == row[i, 1]).any())
        return t.filter(pa.array(~drop))

    def tile_filter(t: pa.Table) -> pa.Table:
        keys_sorted, _prs = ray.get(pref)
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        k = (x << 32) | y
        pos = np.searchsorted(keys_sorted, k)
        hit = (pos < keys_sorted.shape[0]) & (keys_sorted[np.minimum(
            pos, keys_sorted.shape[0] - 1)] == k)
        return t.filter(pa.array(hit))

    feats = read_tiles_current(store_dir, zoom=base_zoom,
                               keys=np.sort(aff)) \
        .map_batches(tile_filter, batch_format="pyarrow",
                     batch_size=None) \
        .map_batches(TilesToFeatures(extent), batch_format="pyarrow") \
        .map_batches(filter_and_drop, batch_format="pyarrow",
                     batch_size=None)
    cur = feats.map_batches(add_tile_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            PointTileAssembler(extent=extent), batch_format="pyarrow") \
        .materialize()

    _COLS = ["z", "x", "y", "mvt", "n_features"]

    def collect(ds) -> pa.Table:
        """Affected-set-bounded level → one driver table (the affected
        keys already live on the driver; this is the same magnitude)."""
        bs = [b.select(_COLS)
              for b in ds.iter_batches(batch_format="pyarrow")]
        if not bs:
            return pa.table({
                "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
                "y": pa.array([], pa.int32()),
                "mvt": pa.array([], pa.binary()),
                "n_features": pa.array([], pa.int64())})
        return pa.concat_tables(bs)

    def tombstones(live: pa.Table, keys: np.ndarray, z: int) -> pa.Table:
        lx = live.column("x").to_numpy().astype(np.int64)
        ly = live.column("y").to_numpy().astype(np.int64)
        gone = np.setdiff1d(keys, (lx << 32) | ly)
        return pa.table({
            "z": pa.array(np.full(gone.shape[0], z, np.int32)),
            "x": pa.array((gone >> 32).astype(np.int32)),
            "y": pa.array((gone & 0xFFFFFFFF).astype(np.int32)),
            "mvt": pa.array([b""] * gone.shape[0], pa.binary()),
            "n_features": pa.array(np.zeros(gone.shape[0], np.int64)),
        })

    n_delta = len(_delta_dirs(store_dir))
    tmp = os.path.join(store_dir, f".delta-{n_delta}.building.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        cur_keys = aff
        z = base_zoom
        live = collect(cur)
        while True:
            write_tiles(rds.from_arrow(pa.concat_tables(
                [live, tombstones(live, cur_keys, z)])), tmp)
            if z == min_zoom:
                break
            parents = np.unique(((cur_keys >> 32) >> 1 << 32)
                                | ((cur_keys & 0xFFFFFFFF) >> 1))
            child_keys = np.unique(np.concatenate([
                ((parents >> 32) * 2 + dx) << 32
                | ((parents & 0xFFFFFFFF) * 2 + dy)
                for dx in (0, 1) for dy in (0, 1)]))
            sib_keys = np.setdiff1d(child_keys, cur_keys)
            lvl = rds.from_arrow(live)
            if sib_keys.size:
                sref = ray.put(np.sort(sib_keys))

                def sib_filter(t: pa.Table) -> pa.Table:
                    ks = ray.get(sref)
                    x = t.column("x").to_numpy().astype(np.int64)
                    y = t.column("y").to_numpy().astype(np.int64)
                    k = (x << 32) | y
                    pos = np.searchsorted(ks, k)
                    hit = (pos < ks.shape[0]) & (ks[np.minimum(
                        pos, ks.shape[0] - 1)] == k)
                    return t.filter(pa.array(hit))

                sibs = read_tiles_current(
                    store_dir, zoom=z, keys=sib_keys).map_batches(
                    sib_filter, batch_format="pyarrow", batch_size=None)
                lvl = lvl.union(sibs)
            live = collect(downzoom_points(lvl, levels=1, extent=extent))
            cur_keys = parents
            z -= 1
        final = os.path.join(store_dir, f"delta-{n_delta}")
        os.rename(tmp, final)
        return final
    finally:
        shutil.rmtree(tmp, ignore_errors=True)



def compact_pyramid(store_dir: str, out_dir: str) -> dict:
    """Fold the base + delta chain into a fresh single-generation store
    (read_tiles_current → write_tiles). The new store serves identical
    tiles with plain pruned reads; swap it in for ``store_dir`` when the
    delta chain gets long."""
    from ..sources.mvt_io import write_tiles

    return write_tiles(read_tiles_current(store_dir), out_dir)


def get_tile(store_dir: str, z: int, x: int, y: int,
             extent: int = 4096, kind: str | None = None) -> bytes | None:
    """Serve ONE tile from a build_pyramid store, overzooming on demand:
    if (z,x,y) is deeper than the stored base, the deepest stored
    ancestor is decoded and overzoomed down the quadtree path — the
    tileserver "virtual deep zoom" read, for ALL three geometry kinds
    (``kind`` = points | paths | polygons; None sniffs the ancestor
    tile's geometry type through the real decoder). Returns the MVT
    bytes or None for an empty tile. Driver-side point lookup: reads
    ONLY the ancestor level's parquet files (z-partition pruning),
    never a full level.
    """
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .decode import decode_tiles_batch_v

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
    # newest delta generation wins (update_pyramid last-wins read)
    for root in [*reversed(_delta_dirs(store_dir)), store_dir]:
        for f in glob.glob(os.path.join(root, f"z={src}", "*.parquet")):
            t = pq.read_table(f, columns=["z", "x", "y", "mvt"])
            m = t.filter(pc.and_(pc.equal(t.column("x"), ax),
                                 pc.equal(t.column("y"), ay)))
            if len(m):
                rows = m
                break
        if rows is not None:
            break
    if rows is None:
        return None
    if len(rows.column("mvt")[0].as_py()) == 0:
        return None   # tombstone: the newest generation deleted it
    if kind is None:
        gt = decode_tiles_batch_v(
            rows.select(["z", "x", "y", "mvt"]),
            with_props=False, with_geometry=False) \
            .column("geom_type").to_numpy()
        if gt.shape[0] == 0:
            return None
        kind = {1: "points", 2: "paths", 3: "polygons"}.get(int(gt[0]))
        if kind is None:
            raise ValueError(f"get_tile: unknown geometry type {gt[0]}")
    kernel = _overzoom_kernel(kind, extent)
    cur = rows
    for _lvl in range(z - src):
        cur = kernel(cur)
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
