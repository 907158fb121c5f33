"""Flagship pipeline: Common-Crawl-style pages → geoparse → cell/tile
assignment → (z,x,y) groupby shuffle → vectorized MVT encode → validate.

Ray-Data-first shape (SURVEY.md §3.1 "Ray shape"):

    read_parquet (pruned columns)
      → map_batches(pages synthesis)          [stateless, vectorized]
      → map_batches(GeoParse)                 [actor pool, regex compiled once]
      → project away text/html BEFORE the shuffle (wide-row rule, §7.4)
      → map_batches(AssignTiles)              [stateless fan-out per zoom]
      → groupby(z,x,y).map_groups(PointTileAssembler)   [the one shuffle]
      → map_batches(validate)                 [vtzero-check gate]

The shuffle key is the tile id; everything vectorizable happens before the
shuffle; only interning/assembly (which needs whole-tile scope) happens in
the grouped stage — mirroring how vtzero splits geometry encoding (pure,
per-feature) from table interning (per-layer state).
"""

from __future__ import annotations

import pyarrow as pa

from ..mvt.check import check_tile
from ..mvt.decode_fast import check_codes_fast
from ..sources.pages import read_pages
from ..stages.encode import PointTileAssembler, add_tile_bucket
from ..stages.geoparse import AssignTiles, geoparse

DEFAULT_ZOOMS = (2, 6, 12)


def features_dataset(sf_dir: str, zooms=DEFAULT_ZOOMS, extent: int = 4096,
                     expand: int = 1):
    """pages → geoparsed, tile-assigned feature rows (pre-shuffle)."""
    ds = read_pages(sf_dir, include_html=False, expand=expand)
    ds = geoparse(ds)
    # project to the narrow feature schema before the fan-out + shuffle
    ds = ds.select_columns(["url", "lang", "doc_id", "lat", "lon"])
    ds = ds.map_batches(AssignTiles(zooms, extent), batch_format="pyarrow")
    return ds


def tiles_pipeline(sf_dir: str, zooms=DEFAULT_ZOOMS, extent: int = 4096,
                   validate: bool = True, expand: int = 1,
                   hot_threshold: int | None = None, n_salt: int = 16):
    """Full pipeline → Dataset[z, x, y, mvt, n_features(, check_code)].

    ``hot_threshold``: tiles with more features than this are encoded via
    the SALTED shard path (stages/shard_encode.py) — (z,x,y,salt) groups
    encoded in parallel with plan-derived global interning indexes, merged
    by byte concatenation. Bounds per-task group size and removes the
    hot-tile straggler (SURVEY.md §4 skew row). None = single-path encode.
    """
    ds = features_dataset(sf_dir, zooms, extent, expand=expand)
    ds = ds.select_columns(["z", "x", "y", "doc_id", "px", "py", "url", "lang"])
    if hot_threshold is not None:
        from .tiling_sharded import sharded_tiles

        tiles = sharded_tiles(ds, hot_threshold=hot_threshold, n_salt=n_salt,
                              extent=extent)
    else:
        # bucketed tile shuffle: fixed group count, many tiles per group
        ds = ds.map_batches(add_tile_bucket, batch_format="pyarrow")
        tiles = ds.groupby("bucket").map_groups(
            PointTileAssembler(extent=extent), batch_format="pyarrow"
        )
    if validate:
        tiles = tiles.map_batches(validate_tiles, batch_format="pyarrow")
    return tiles


def validate_tiles(batch: pa.Table) -> pa.Table:
    """vtzero-check gate as a stateless map_batches stage (SURVEY.md §2.7):
    appends the graded check code per tile; pipelines can filter on it.

    Vectorized (mvt/decode_fast.check_codes_fast) for the dominant
    single-point-layer shape; tiles the fast path can't prove clean are
    graded by the scalar check_tile (exact diagnostics). NOTE: the
    decode_fast import is module-level — UDF bodies run in Ray workers
    where function-local package imports fail under ship-by-value."""
    codes = check_codes_fast(batch)
    pend = (codes < 0).nonzero()[0]
    if pend.size:
        mvts = batch.column("mvt")
        for i in pend:
            codes[i] = check_tile(mvts[int(i)].as_py())[0]
    return batch.append_column("check_code", pa.array(codes, pa.int8()))
