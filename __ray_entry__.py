"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship tiling pipeline on sf0.001. ``queries()``
exposes one callable per implemented operator/pipeline (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL where expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().

Column-name contract: every computed column is named identically in the Ray
result and the SQL (AS ...), since the driver hash-compares by sorted
column name.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

SF1 = "/root/testdata/sf0.001"

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# Deterministic geo derivation shared between Python and SQL — single
# source of truth lives in vtzero_ray.sources.pages.
from vtzero_ray.sources.pages import SQL_LAT_US, SQL_LON_US, SQL_URL


from vtzero_ray.runtime import register_udfs_by_value

register_udfs_by_value()


def entry() -> Any:
    """Flagship pipeline: pages → geoparse → tile assignment → MVT encode
    → vtzero-check validation, at sf0.001."""
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    return tiles_pipeline(SF1)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_pages_text_identity(sf_dir: str):
    """Per-row invariant (input_hint): byte-identical text per url after the
    geoparse stage (which must only append columns)."""
    from vtzero_ray.sources.pages import read_pages
    from vtzero_ray.stages.geoparse import geoparse

    ds = geoparse(read_pages(sf_dir, include_html=False))
    return ds.select_columns(["url", "text"])


def _q_geoparse(sf_dir: str):
    """Regex geoparse of lon/lat from page text (M-stage parser)."""
    from vtzero_ray.sources.pages import read_pages
    from vtzero_ray.stages.geoparse import geoparse

    ds = geoparse(read_pages(sf_dir, include_html=False))
    return ds.select_columns(["url", "lat", "lon"])


def _q_tile_assignment_z6(sf_dir: str):
    """Per-tile page counts at z=6 (the groupby(z,x,y) shuffle, A2)."""
    from vtzero_ray.pipelines.tiling import features_dataset

    ds = features_dataset(sf_dir, zooms=(6,))
    agg = ds.groupby(["z", "x", "y"]).count()
    return agg.rename_columns({"count()": "n_pages"}) if "count()" in agg.schema().names else agg


def _q_tile_assignment_z12(sf_dir: str):
    from vtzero_ray.pipelines.tiling import features_dataset

    ds = features_dataset(sf_dir, zooms=(12,))
    agg = ds.groupby(["z", "x", "y"]).count()
    return agg.rename_columns({"count()": "n_pages"}) if "count()" in agg.schema().names else agg


def _q_cell_page_counts(sf_dir: str):
    """Quadtree cell assignment (J3): level-12 Morton cell ids rolled up to
    their level-6 parents via cell_parent — the locality/repartition key for
    the spatial join stages (SURVEY §2.4; cells.py:69,81)."""
    import numpy as np
    import pyarrow as pa

    from vtzero_ray.sources.pages import read_pages
    from vtzero_ray.stages.cells import cell_id, cell_parent
    from vtzero_ray.stages.geoparse import geoparse

    def assign(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy()
        lat = t.column("lat").to_numpy()
        c12 = cell_id(lon, lat, level=12)
        c6 = cell_parent(c12, level=12, parent_level=6)
        return pa.table({"cell_l6": pa.array(c6.astype(np.int64))})

    ds = geoparse(read_pages(sf_dir, include_html=False)).map_batches(
        assign, batch_format="pyarrow"
    )
    agg = ds.groupby("cell_l6").count()
    return agg.rename_columns({"count()": "n_pages"}) if "count()" in agg.schema().names else agg


def _q_tile_pixel_coords(sf_dir: str):
    """Tile-local integer pixel coords at z=6 (extent 4096) — the
    geometry-input projection (M14 cursor inputs)."""
    from vtzero_ray.pipelines.tiling import features_dataset

    ds = features_dataset(sf_dir, zooms=(6,))
    return ds.select_columns(["url", "x", "y", "px", "py"])


def _q_lang_page_counts(sf_dir: str):
    """Simple grouped aggregate over the pages table (A1-style stats)."""
    from vtzero_ray.sources.pages import read_pages

    ds = read_pages(sf_dir, include_html=False)
    agg = ds.groupby("lang").count()
    return agg.rename_columns({"count()": "n_pages"}) if "count()" in agg.schema().names else agg


def _q_tiles_encoded(sf_dir: str):
    """Full encode: tile keys + feature counts + validation grade (rows-only
    check; MVT bytes are not SQL-expressible)."""
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    t = tiles_pipeline(sf_dir, zooms=(6,))
    return t.select_columns(["z", "x", "y", "n_features", "check_code"])


def _q_overzoom_z7(sf_dir: str):
    """Overzoom: z6 tiles → z7 children WITHOUT touching the source corpus
    (pure per-parent-tile transform, zero shuffles), then decode back —
    counts and coordinate sums follow the closed-form integer transform
    cpx = 2·px; dx = cpx // 4096; px' = cpx − 4096·dx; x' = 2x + dx."""
    from vtzero_ray.pipelines.overzoom import (overzoom_tiles,
                                               point_tile_summary_batch)
    from vtzero_ray.pipelines.tiling import tiles_pipeline, validate_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    children = overzoom_tiles(tiles, levels=1)
    children = children.map_batches(validate_tiles, batch_format="pyarrow")
    return children.map_batches(point_tile_summary_batch,
                                batch_format="pyarrow")


def _q_overzoom_paths_z3(sf_dir: str):
    """Linestring overzoom: z2 clipped-path tiles → z3 children (double,
    fan out to the ≤4 children, re-clip with the same Liang-Barsky
    expressions, re-chain parts), then decode back — per-(tile, site)
    part/point counts against a two-level clip SQL mirror."""
    from vtzero_ray.pipelines.clip_paths import clipped_path_tiles
    from vtzero_ray.pipelines.overzoom import (overzoom_paths,
                                               path_tile_summary_batch)

    tiles = clipped_path_tiles(sf_dir, zoom=2)
    kids = overzoom_paths(tiles, levels=1)
    return kids.map_batches(path_tile_summary_batch, batch_format="pyarrow")


def _q_downzoom_cells_z5(sf_dir: str):
    """Polygon downzoom: z6 hotcell polygon tiles → z5 parents (rings
    floor-halve, slivers drop, children's features merge per parent in
    raster order), then decode back — completes downzoom across all
    three geometry types."""
    from vtzero_ray.pipelines.overzoom import (downzoom_polygons,
                                               polygon_tile_summary_batch)
    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    vec = raster_to_vector(rasterize_tiles(tiles, grid=16), threshold=1,
                           grid=16)
    parents = downzoom_polygons(vec, levels=1)
    return parents.map_batches(polygon_tile_summary_batch,
                               batch_format="pyarrow")


def _q_downzoom_z5(sf_dir: str):
    """Pyramid BUILD step: z6 tiles → z5 parents from the encoded tiles
    alone (decode scan + ONE tile-row shuffle, 4× fewer keys per level —
    the corpus is never re-read), then decode back; the halving
    px' = ((x mod 2)·4096 + px) // 2 is the exact integer inverse of
    overzoom's doubling."""
    from vtzero_ray.pipelines.overzoom import (downzoom_points,
                                               point_tile_summary_batch)
    from vtzero_ray.pipelines.tiling import tiles_pipeline, validate_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    parents = downzoom_points(tiles, levels=1)
    parents = parents.map_batches(validate_tiles, batch_format="pyarrow")
    return parents.map_batches(point_tile_summary_batch,
                               batch_format="pyarrow")


def _q_pyramid_store_z4(sf_dir: str):
    """Full pyramid BUILD + resumable store round trip: z6 base tiles →
    write_tiles → downzoom z5 → write → downzoom z4 → write (same
    z-partitioned store, per-level atomic publish + manifest shards),
    then read EVERY level back through the sink's read path and decode —
    each level checked against the iterated closed-form halving."""
    import tempfile

    from vtzero_ray.pipelines.overzoom import point_tile_summary_batch
    from vtzero_ray.pipelines.pyramid import build_pyramid
    from vtzero_ray.pipelines.tiling import tiles_pipeline, validate_tiles
    from vtzero_ray.sources.mvt_io import read_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    out_dir = tempfile.mkdtemp(prefix="pyramid_store_")
    build_pyramid(tiles, out_dir, base_zoom=6, min_zoom=4)
    back = read_tiles(out_dir).select_columns(["z", "x", "y", "mvt"])
    back = back.map_batches(validate_tiles, batch_format="pyarrow")
    return back.map_batches(point_tile_summary_batch, batch_format="pyarrow")


def _q_pyramid_update_z4(sf_dir: str):
    """INCREMENTAL pyramid maintenance: the store builds from the
    doc_id%5!=0 split, then the %5==0 shard arrives as an update —
    update_pyramid re-derives ONLY the shard's affected tiles per level
    (4×-shrinking key sets) and publishes one atomic delta generation.
    The current view must equal a from-scratch build of the full corpus
    (byte-identity is test-pinned), so the oracle is the
    pyramid_store_z4 SQL verbatim over the WHOLE documents table."""
    import tempfile

    import pyarrow as pa

    from vtzero_ray.pipelines.overzoom import point_tile_summary_batch
    from vtzero_ray.pipelines.pyramid import (build_pyramid,
                                              read_tiles_current,
                                              update_pyramid)
    from vtzero_ray.pipelines.tiling import features_dataset, validate_tiles
    from vtzero_ray.stages.encode import PointTileAssembler, add_tile_bucket

    def split(rem_ok):
        ds = features_dataset(sf_dir, zooms=(6,)) \
            .select_columns(["z", "x", "y", "doc_id", "px", "py",
                             "url", "lang"])

        def f(t):
            ids = t.column("doc_id").to_numpy()
            return t.filter(pa.array(rem_ok(ids)))

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    base = split(lambda i: i % 5 != 0) \
        .map_batches(add_tile_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(PointTileAssembler(),
                                      batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="pyramid_upd_")
    build_pyramid(base, out_dir, base_zoom=6, min_zoom=4)
    update_pyramid(out_dir, split(lambda i: i % 5 == 0),
                   base_zoom=6, min_zoom=4)
    back = read_tiles_current(out_dir).select_columns(["z", "x", "y", "mvt"])
    back = back.map_batches(validate_tiles, batch_format="pyarrow")
    return back.map_batches(point_tile_summary_batch, batch_format="pyarrow")


def _q_pyramid_update_poly(sf_dir: str):
    """Incremental POLYGON pyramid maintenance with holes: the store
    builds from the doc_id%2==0 raster (threshold 1, inset-64 holes,
    levels 6→4), then the %2==1 raster shard adds counts via
    update_polygon_pyramid — stored tiles invert losslessly to counts,
    affected tiles re-encode, parents re-derive. The current view must
    equal a build over the combined raster, so the oracle is the
    closed-form three-level holed-cell halving over ALL documents."""
    import tempfile

    import numpy as np
    import pyarrow as pa

    from vtzero_ray.pipelines.overzoom import polygon_tile_summary_batch
    from vtzero_ray.pipelines.pyramid import (build_pyramid,
                                              read_tiles_current,
                                              update_polygon_pyramid)
    from vtzero_ray.pipelines.tiling import features_dataset
    from vtzero_ray.stages.encode import PointTileAssembler, add_tile_bucket
    from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

    def tiles_of(rem):
        ds = features_dataset(sf_dir, zooms=(6,)) \
            .select_columns(["z", "x", "y", "doc_id", "px", "py",
                             "url", "lang"])

        def f(t):
            ids = t.column("doc_id").to_numpy()
            return t.filter(pa.array(np.ascontiguousarray(
                ids % 2 == rem)))

        return ds.map_batches(f, batch_format="pyarrow",
                              batch_size=None) \
            .map_batches(add_tile_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(PointTileAssembler(),
                                          batch_format="pyarrow")

    out_dir = tempfile.mkdtemp(prefix="pyramid_poly_upd_")
    vec = raster_to_vector(rasterize_tiles(tiles_of(0), grid=16),
                           threshold=1, grid=16, hole_inset=64)
    build_pyramid(vec, out_dir, base_zoom=6, min_zoom=4, kind="polygons")
    shard = rasterize_tiles(tiles_of(1), grid=16)
    update_polygon_pyramid(out_dir, shard, base_zoom=6, min_zoom=4,
                           grid=16, hole_inset=64)
    back = read_tiles_current(out_dir).select_columns(["z", "x", "y", "mvt"])
    return back.map_batches(polygon_tile_summary_batch,
                            batch_format="pyarrow")


def _q_tile_stats_z6(sf_dir: str):
    """Full encode→decode round trip: vtzero-stats (A1) over freshly encoded
    tiles; geometry byte sums and value-table sizes are SQL-predictable."""
    from vtzero_ray.pipelines.decode import tile_stats
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    return tile_stats(tiles)


def _q_decoded_features_z6(sf_dir: str):
    """Encode then DECODE back: exploded feature rows must match the source
    pages exactly (M1/M4/M5 read path)."""
    from vtzero_ray.pipelines.decode import decode_tiles
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    import pyarrow as pa
    import pyarrow.compute as pc

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    feats = decode_tiles(tiles, with_props=False, with_geometry=False)
    feats = feats.select_columns(["z", "x", "y", "layer", "feature_id", "geom_type", "n_props"])

    # feature_id decodes as uint64 (MVT spec field type); the oracle emits
    # BIGINT — cast so a dtype-sensitive driver hash sees identical kinds
    def to_i64(t: pa.Table) -> pa.Table:
        return t.set_column(t.column_names.index("feature_id"), "feature_id",
                            pc.cast(t.column("feature_id"), pa.int64()))

    return feats.map_batches(to_i64, batch_format="pyarrow", batch_size=None)


def _q_filter_lang_en_z6(sf_dir: str):
    """vtzero-streets-shaped filter/re-encode (T7+T12): keep lang=en
    features, per-tile counts. Runs the VECTORIZED fast path (batch
    decode → Arrow predicate → segmented re-encode, byte-identical to
    the scalar copy path per test_decode_filter.TestFilterFast)."""
    from vtzero_ray.pipelines.filter import filter_features_fast
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    kept = filter_features_fast(tiles, "pages", "lang", "en")
    return kept.select_columns(["z", "x", "y", "n_features"])


def _q_length_quantiles(sf_dir: str):
    """Exact per-lang length quantiles from merged per-batch histograms
    (mergeable-sketch shape; exact because the domain is discrete)."""
    import ray.data as rd

    from vtzero_ray.functions.sketch import length_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])
    return length_quantiles(ds)


def _q_ngram_topk(sf_dir: str):
    """Top-10 word bigrams per language — per-batch combiner (text never
    shuffles), hash groupby sum, per-block prune, tiny per-lang merge."""
    import ray.data as rd

    from vtzero_ray.functions.textstats import ngram_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])
    return ngram_topk(ds, k=10)


def _q_clipped_segments_z2(sf_dir: str):
    """North-rule clip step: site polylines in WORLD coords at z2, every
    candidate tile clips to its buffered box [-64, 4160]² via vectorized
    Liang-Barsky (stages/clip.py) — per-segment clipped integer coords.
    The oracle reproduces the float clip math token-for-token in SQL."""
    from vtzero_ray.pipelines.clip_paths import clipped_segments

    return clipped_segments(sf_dir, zoom=2)


def _q_clipped_paths_z2(sf_dir: str):
    """Clipped multi-part polylines per (tile, site): part count + point
    count after chaining surviving segments (a part breaks at clipped-away
    segments / shortened endpoints) — the logical geometry the multi-part
    linestring encoder consumes (clipped_path_tiles, tested round-trip)."""
    from vtzero_ray.pipelines.clip_paths import clipped_path_stats

    return clipped_path_stats(sf_dir, zoom=2)


def _q_site_paths_z2(sf_dir: str):
    """Linestring encode end-to-end: per-site path features per z2 tile;
    per-tile feature counts are SQL-checkable (consecutive-dup-point drops
    replicated with window functions)."""
    from vtzero_ray.pipelines.paths import site_paths_tiles

    t = site_paths_tiles(sf_dir, zoom=2)
    return t.select_columns(["z", "x", "y", "n_features"])


def _q_media_features(sf_dir: str):
    """REAL media decode: deterministic BMP corpus → per-image pixel
    channel sums through the pure-NumPy 24-bit BMP codec
    (stages/multimodal.py decode_bmp) — the oracle recomputes the pixel
    formula with generate_series, so every byte of the decode is checked."""
    import ray.data as rd

    from vtzero_ray.stages.multimodal import BMPStats, synth_media_bmp

    ds = rd.from_arrow(synth_media_bmp(128)).repartition(8)
    return ds.map_batches(BMPStats(), batch_format="pyarrow",
                          batch_size=64)


def _q_media_features_png(sf_dir: str):
    """REAL PNG decode: deterministic PNG corpus (filter type cycles
    media_id % 5, so every defilter branch — None/Sub/Up/Average/Paeth —
    runs) → per-image pixel channel sums through the pure-NumPy+zlib PNG
    codec (stages/png.py). The oracle recomputes the pixel formula with
    generate_series, so every decoded byte is checked."""
    import ray.data as rd

    from vtzero_ray.stages.multimodal import ImageStats, synth_media_png

    ds = rd.from_arrow(synth_media_png(128)).repartition(8)
    return ds.map_batches(ImageStats(), batch_format="pyarrow",
                          batch_size=64)


def _q_media_features_jpeg(sf_dir: str):
    """REAL baseline-JPEG decode — exact through a LOSSY codec:
    grayscale corpus, quality 100, one constant value per 8x8 block, so
    the Huffman entropy decode, dequantize and IDCT reproduce the pixel
    formula with zero error (stages/jpeg.py; see synth_media_jpeg for
    the math). Restart interval cycles media_id % 3, so DRI/RSTn
    segmentation and byte destuffing are driver-checked too. The oracle
    recomputes the block formula with generate_series."""
    import ray.data as rd

    from vtzero_ray.stages.multimodal import ImageStats, synth_media_jpeg

    ds = rd.from_arrow(synth_media_jpeg(128)).repartition(8)
    return ds.map_batches(ImageStats(), batch_format="pyarrow",
                          batch_size=64)


def _q_media_features_gif(sf_dir: str):
    """REAL GIF decode — the LZW dictionary-coding family: palette size
    cycles 32..256 (varying LZW min code size + color-table field), odd
    ids are interlaced, so variable-width code reading, width bumps,
    palette lookup and the 4-pass deinterlace are all driver-checked.
    The oracle recomputes index formula + palette formula with
    generate_series."""
    import ray.data as rd

    from vtzero_ray.stages.multimodal import ImageStats, synth_media_gif

    ds = rd.from_arrow(synth_media_gif(128)).repartition(8)
    return ds.map_batches(ImageStats(), batch_format="pyarrow",
                          batch_size=64)


def _q_audio_features(sf_dir: str):
    """REAL audio decode: deterministic WAV/PCM16 corpus → per-clip
    integer channel sums through the pure-NumPy RIFF codec
    (stages/wav.py) — the oracle recomputes the sample formula with
    generate_series, so every decoded sample is checked."""
    import ray.data as rd

    from vtzero_ray.stages.wav import AudioStats, synth_media_wav

    ds = rd.from_arrow(synth_media_wav(128)).repartition(8)
    return ds.map_batches(AudioStats(), batch_format="pyarrow",
                          batch_size=64)


def _q_combined_layers_z2(sf_dir: str):
    """Two-layer tiles at z2 (pages points + site-path lines) → per
    (tile, layer) feature counts after decoding the merged tiles.

    Uses the FUSED single-pass assembler (one read, one tile shuffle, both
    layers per task — pipelines/paths.py) — byte-identical to the
    merge_tiles(points, paths) multi-pass twin, asserted in
    tests/test_decode_filter.py::TestFusedMultilayer. merge_tiles itself
    (add_existing_layer concat over ds.union + regroup) stays driver-
    exercised by the 3-way multilayer_tiles_z6."""
    from vtzero_ray.pipelines.decode import decode_tiles
    from vtzero_ray.pipelines.paths import pages_paths_tiles_fused

    merged = pages_paths_tiles_fused(sf_dir, zoom=2)
    feats = decode_tiles(merged, with_props=False, with_geometry=False)
    agg = feats.groupby(["z", "x", "y", "layer"]).count()

    def rename(t):
        import pyarrow as pa

        if isinstance(t, pa.Table) and "count()" in t.column_names:
            return t.rename_columns(
                [c if c != "count()" else "n_features" for c in t.column_names])
        return t

    return agg.map_batches(rename, batch_format="pyarrow")


def _q_multilayer_z6(sf_dir: str):
    """THREE-layer tiles at z6 — pages (vectorized point kernel) +
    site_paths (vectorized linestring kernel) + hotcells (polygon builder)
    merged per (z,x,y) via add_existing_layer concatenation (T1 layer
    ordering), decoded back to per-layer feature counts."""
    from vtzero_ray.pipelines.decode import decode_tiles
    from vtzero_ray.pipelines.filter import merge_tiles
    from vtzero_ray.pipelines.paths import site_paths_tiles
    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

    # encode the pages tiles ONCE and branch: the hotcells layer derives
    # from the same tiles, and Ray re-executes lineage per consumer, so a
    # diamond DAG needs the (output-sized, ~100x smaller than input) tile
    # corpus pinned in the object store — the distributed-write-then-read
    # pattern without the round trip
    pages = tiles_pipeline(sf_dir, zooms=(6,), validate=False).materialize()
    paths = site_paths_tiles(sf_dir, zoom=6)
    hot = raster_to_vector(rasterize_tiles(pages, grid=16), threshold=2, grid=16)
    # z6 tile-space is bounded (<= 4096 tiles) → output-sized single-task
    # merge instead of the groupby barrier (8.8 s orchestration for 0.12 s
    # of merge work, measured at sf0.01)
    merged = merge_tiles(pages, paths,
                         hot.select_columns(["z", "x", "y", "mvt"]),
                         single_task=True)
    feats = decode_tiles(merged, with_props=False, with_geometry=False)

    # per-layer counts the same way: per-batch combiner + ONE output-sized
    # merge task, no Aggregate barrier for a (tiles x layers)-row output
    def pcount(df):
        out = (df.groupby(["z", "x", "y", "layer"], sort=True)
               .size().rename("n_features").reset_index())
        for c in ("z", "x", "y", "n_features"):
            out[c] = out[c].astype("int64")
        return out

    def psum(df):
        out = (df.groupby(["z", "x", "y", "layer"], sort=True)["n_features"]
               .sum().reset_index())
        for c in ("z", "x", "y", "n_features"):
            out[c] = out[c].astype("int64")
        return out

    parts = feats.map_batches(pcount, batch_format="pandas",
                              batch_size=None)
    return parts.repartition(1).map_batches(psum, batch_format="pandas",
                                            batch_size=None)


def _q_rasterize_z6(sf_dir: str):
    """Vector → raster: per-tile 16x16 density grid over encoded tiles
    (decode + 2-D binning; cells are SQL-predictable from the derivation)."""
    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.stages.raster import rasterize_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    return rasterize_tiles(tiles, grid=16)


def _q_raster_to_vector_z6(sf_dir: str):
    """Raster → vector: hot cells (>=2 points) back to MVT polygon tiles;
    per-tile polygon counts are SQL-checkable."""
    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    vec = raster_to_vector(rasterize_tiles(tiles, grid=16), threshold=2, grid=16)
    return vec.select_columns(["z", "x", "y", "n_cells"])


def _q_overzoom_cells_z7(sf_dir: str):
    """Polygon overzoom: z6 hotcell polygon tiles → z7 children (double,
    Sutherland-Hodgman re-clip per child, re-encode), then decode back.
    Cell squares are 256 px at grid 16, so doubled 512-px squares always
    land wholly in one child (512 divides 4096) — the SQL twin assigns
    each cell to its child with integer arithmetic; the kernel itself
    handles straddling rings (tested on hand geometry)."""
    from vtzero_ray.pipelines.overzoom import (overzoom_polygons,
                                               polygon_tile_summary_batch)
    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    # threshold=1: every occupied cell polygonizes (threshold=2 leaves ~1
    # hot tile at z6 — too sparse to exercise the overzoom geometry)
    vec = raster_to_vector(rasterize_tiles(tiles, grid=16), threshold=1,
                           grid=16)
    kids = overzoom_polygons(vec, levels=1)
    return kids.map_batches(polygon_tile_summary_batch,
                            batch_format="pyarrow")


def _q_overzoom_holed_z7(sf_dir: str):
    """HOLED-polygon overzoom: z6 hotcell polygons carrying an inner
    ring (inset-64 hole, spec 4.3.4.4 ring pairing) → z7 children. The
    doubled 512-px outer and its doubled 256-px hole land wholly in one
    child (512 | 4096), so the SQL twin is closed-form: net area2 =
    2·512² − 2·256², two rings per feature. The kernel itself clips
    straddling holes (tested on hand geometry)."""
    from vtzero_ray.pipelines.overzoom import (overzoom_polygons,
                                               polygon_tile_summary_batch)
    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    vec = raster_to_vector(rasterize_tiles(tiles, grid=16), threshold=1,
                           grid=16, hole_inset=64)
    kids = overzoom_polygons(vec, levels=1)
    return kids.map_batches(polygon_tile_summary_batch,
                            batch_format="pyarrow")


def _q_downzoom_holed_z5(sf_dir: str):
    """HOLED-polygon downzoom: the inset-64 holed hotcells floor-halve
    into z5 parents — outer 128-px squares keep exact 64-px holes (all
    corner coordinates stay even through the halving), net area2 =
    2·128² − 2·64² per feature, two rings each."""
    from vtzero_ray.pipelines.overzoom import (downzoom_polygons,
                                               polygon_tile_summary_batch)
    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    vec = raster_to_vector(rasterize_tiles(tiles, grid=16), threshold=1,
                           grid=16, hole_inset=64)
    parents = downzoom_polygons(vec, levels=1)
    return parents.map_batches(polygon_tile_summary_batch,
                               batch_format="pyarrow")


def _q_set_join_exact(sf_dir: str):
    """EXACT set-similarity self-join (All-Pairs prefix filter,
    Bayardo et al. 2007): every pair with k-shingle Jaccard >= 1/2,
    guaranteed — the no-false-negatives complement of the MinHash-LSH
    family, sharing its verify codepath."""
    import ray.data as rd

    from vtzero_ray.functions.setjoin import set_join_exact

    def mk():
        return rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    return set_join_exact(mk, threshold=0.5, k=5)


def _q_host_ppr(sf_dir: str):
    """Personalized PageRank (Haveliwala 2002): teleport mass
    concentrated on the v % 17 == 0 host cohort; the dense bounded-
    universe path with a seed base vector — the per-edge term and all
    float expressions are pagerank's own."""
    from vtzero_ray.functions.graph import host_ppr

    return host_ppr(_docs(sf_dir))


def _q_crosstab_lang_source(sf_dir: str):
    """Contingency pivot (lang × source counts): dictionary-coded 2-D
    bincount partials, category-bounded triples only, ONE output-sized
    merge — zero shuffles."""
    import ray.data as rd

    from vtzero_ray.pipelines.relational import crosstab_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    return crosstab_counts(ds, "lang", "source")


def _q_downzoom_paths_z1(sf_dir: str):
    """Linestring downzoom: z2 clipped-path tiles → z1 parents (floor-
    halved coords, collapsed zero-length segments re-chain through the
    gap, pieces from different children stay separate parts), decoded
    back to per-(tile, site) part/point counts."""
    from vtzero_ray.pipelines.clip_paths import clipped_path_tiles
    from vtzero_ray.pipelines.overzoom import (downzoom_paths,
                                               path_tile_summary_batch)

    tiles = clipped_path_tiles(sf_dir, zoom=2)
    parents = downzoom_paths(tiles, levels=1)
    return parents.map_batches(path_tile_summary_batch,
                               batch_format="pyarrow")


def _q_pca_moments(sf_dir: str):
    """PCA's distributed statistic: the quantized second-moment matrix +
    sums + count in ONE scan of per-block int64 blob partials (moment-
    bounded traffic) — exact vs a pairwise self-join; the eigensolve and
    projection are pytest-gated on top of this surface."""
    import ray.data as rd

    from vtzero_ray.functions.pca import embedding_moments

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return embedding_moments(ds)


def _q_strip_boilerplate(sf_dir: str):
    """Per-host boilerplate stripping (the WARC→WET template-removal
    step): lines on >= 3 of a host's pages are site furniture, removed
    from every page of that host; cross-host identical lines stay
    independent. Synth multihost corpus with planted headers/footers."""
    import ray.data as rd

    from vtzero_ray.functions.webclean import (strip_boilerplate,
                                               synth_hosted_docs)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return strip_boilerplate(synth_hosted_docs(ds), min_df=3)


def _q_events_funnel(sf_dir: str):
    """Ordered funnel (view → click → purchase, strict first-occurrence-
    after semantics): pruned read, ONE user-bucket shuffle, vectorized
    per-bucket step resolution, output-sized merge."""
    from vtzero_ray.pipelines.relational import events_funnel

    return events_funnel(sf_dir)


_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")
_DOC_RULES = (("not_null", "lang"),
              ("range", "n_chars", 100, 400),
              ("in_set", "lang", ("en", "de", "fr")),
              ("matches", "source", "^src[0-9]+$"))


def _q_profile_documents(sf_dir: str):
    """Deequ/TFDV-style table profile: per-column count/nulls/EXACT
    distinct/min/max from ONE scan + ONE bucketed shuffle (per-batch
    value dedup bounds shuffle traffic by batch dictionaries)."""
    import ray.data as rd

    from vtzero_ray.functions.profile import profile_table

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=list(_PROFILE_COLS))
    return profile_table(ds, _PROFILE_COLS)


def _q_validate_documents(sf_dir: str):
    """Declarative data-contract checks (completeness / range / value
    set / pattern): all rules evaluate vectorized in ONE scan; the merge
    is a single output-sized task."""
    import ray.data as rd

    from vtzero_ray.functions.profile import check_constraints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source", "n_chars"])
    return check_constraints(ds, _DOC_RULES)


# -- text analysis -----------------------------------------------------------

def _docs(sf_dir: str):
    import ray.data as rd

    # split the single-file read so downstream stages parallelize
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(32)


def _q_token_stats(sf_dir: str):
    from vtzero_ray.functions.textstats import TokenStats

    ds = _docs(sf_dir).map_batches(TokenStats, batch_format="pyarrow", concurrency=(1, 4))
    return ds.select_columns(["doc_id", "n_tokens", "n_bpe_tokens", "n_chars"])


def _q_quality_score(sf_dir: str):
    from vtzero_ray.functions.textstats import QualityScore

    ds = _docs(sf_dir).map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 4))
    return ds.select_columns(
        ["doc_id", "stop_ratio", "mean_token_len", "alpha_ratio", "quality_score"]
    )


def _q_langid(sf_dir: str):
    from vtzero_ray.functions.textstats import LangId

    ds = _docs(sf_dir).map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    return ds.select_columns(
        ["doc_id", "hits_de", "hits_en", "hits_es", "hits_fr", "hits_zh", "lang_pred"]
    )


def _q_fingerprint(sf_dir: str):
    from vtzero_ray.functions.textstats import Fingerprint

    ds = _docs(sf_dir).map_batches(Fingerprint, batch_format="pyarrow", concurrency=(1, 4))
    return ds.select_columns(["doc_id", "md5"])


def _q_doc_perplexity(sf_dir: str):
    """CCNet-style LM quality filter: train the corpus' own unigram LM
    (bucketed count shuffle, vocab-sized collect) then score every doc's
    add-1-smoothed NLL — integer-quantized terms, so the per-doc sum is
    bit-deterministic under any block order."""
    from vtzero_ray.functions.lm import doc_perplexity

    return doc_perplexity(_docs(sf_dir))


def _q_repetition_stats(sf_dir: str):
    """Gopher-style repetition filter signals: per-doc top-bigram char
    mass + duplicated-5-gram mass — one map_batches, no shuffle, all
    integer outputs."""
    from vtzero_ray.functions.textstats import repetition_stats

    return repetition_stats(_docs(sf_dir), dup_n=5)


# -- dedup -------------------------------------------------------------------

def _q_shuffle_epoch(sf_dir: str):
    """Deterministic training-epoch shuffle: dense global rank of the
    md5 shuffle key — the pack_sequences two-level scan ordered by hash
    instead of id (the hash IS the balanced range partitioner; no
    global sort barrier)."""
    from vtzero_ray.functions.pack import shuffle_epoch

    return shuffle_epoch(_docs(sf_dir), seed=42)


# mixture weights exercising every branch: drop-all, heavy down-sample,
# fractional up-sample, integer up-sample; unlisted sources ride the
# 1.0 default (exactly one copy)
_MIX_WEIGHTS = {"src0": 0.0, "src1": 0.25, "src2": 1.75, "src3": 3.0}


def _q_chunk_docs(sf_dir: str):
    """RAG-prep chunking: overlapping token windows per doc (size 32,
    overlap 8) — one vectorized scan, single Arrow take+join."""
    from vtzero_ray.functions.pack import chunk_docs

    return chunk_docs(_docs(sf_dir), size=32, overlap=8)


def _q_corpus_filter_ppl(sf_dir: str):
    """CCNet's filtering step: keep docs at or below the corpus median
    average-NLL bucket (composition: LM scorer + mergeable-histogram
    quantile + filter)."""
    from vtzero_ray.functions.lm import filter_by_perplexity

    return filter_by_perplexity(_docs(sf_dir), p=0.5)


def _q_tfidf_topk(sf_dir: str):
    """Per-doc keyword extraction: top-3 TF-IDF terms (quantize-then-rank
    parity — integer scores, string tie-break)."""
    from vtzero_ray.functions.lm import tfidf_topk

    return tfidf_topk(_docs(sf_dir), k=3)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs sharing any word 4-gram with the
    deterministic eval split (doc_id % 50 == 0) are flagged — broadcast
    benchmark gram set, one corpus scan, no shuffle. (Real pipelines use
    8-13-grams; the synthetic small-vocab corpus needs n=4 for the row
    to carry a non-trivial hit distribution.)"""
    from vtzero_ray.functions.decontam import decontaminate_mod

    return decontaminate_mod(_docs(sf_dir), sf_dir, n=4, mod=50)


def _q_mix_weighted(sf_dir: str):
    """Training-mixture composition: deterministic per-source weighted
    up/down-sampling (Pile-style epoch weights) — one map_batches, the
    doc's own md5 key decides its fractional copy."""
    import ray.data as rd

    from vtzero_ray.functions.pack import mix_weighted

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return mix_weighted(ds, _MIX_WEIGHTS, seed=7)


def _q_redact_pii(sf_dir: str):
    """PII scrub (emails → <EMAIL>, then phones → <PHONE>) over a
    deterministic PII-bearing corpus synthesized from documents (the
    read_pages / media-corpus synthesis precedent — the raw synth corpus
    contains no digits at all, so the contact suffixes are what give the
    regexes real work). Vectorized RE2 kernels; both engines run the
    same pattern strings through RE2."""
    from vtzero_ray.functions.textstats import redact_pii, synth_contacts

    return redact_pii(synth_contacts(_docs(sf_dir)))


def _q_clean_lines_c4(sf_dir: str):
    """C4's line-level cleaning (Raffel et al. 2020 §2.2: terminal
    punctuation, >= 5 words, boilerplate blocklist, >= 2 kept lines, no
    '{') over a deterministic multiline corpus synthesized from
    documents (the raw synth text has no newlines — the synth_contacts
    precedent). One vectorized scan, line order preserved, clean_text
    byte-identical to the SQL twin's list_filter + array_to_string."""
    from vtzero_ray.functions.webclean import clean_lines, synth_multiline

    return clean_lines(synth_multiline(_docs(sf_dir)))


def _q_dedup_lines_c4(sf_dir: str):
    """C4's global span dedup at line granularity over the synthesized
    multiline corpus: every line keeps only its globally-first
    (doc_id, idx) occurrence; docs reassemble in order. Two bounded
    shuffles (line-bucket winner pick, doc-bucket re-join)."""
    from vtzero_ray.functions.webclean import dedup_lines, synth_multiline

    return dedup_lines(synth_multiline(_docs(sf_dir)))


def _q_c4_pipeline(sf_dir: str):
    """The composed C4 cleaning pipeline (line heuristics THEN global
    duplicate-line removal) over the synthesized multiline corpus — one
    streaming pass into two bounded shuffles; exact twin = the two
    stage twins composed as CTEs."""
    from vtzero_ray.functions.webclean import c4_pipeline, synth_multiline

    return c4_pipeline(synth_multiline(_docs(sf_dir)))


def _q_url_dedup(sf_dir: str):
    """URL canonicalization dedup (the RefinedWeb/CCNet URL pass):
    lowercase scheme+host, strip query/fragment/trailing slash, keep the
    min-doc_id document per canonical URL. Synthesized URL variants
    (3 per page: plain / tracking params / fragment, odd ids uppercase
    the host). dedup_exact shape — per-batch combiner, ONE bucketed
    shuffle of (url, min_id, cnt) triples."""
    from vtzero_ray.functions.webclean import (canonical_url_dedup,
                                               synth_url_variants)

    return canonical_url_dedup(synth_url_variants(_docs(sf_dir)))


def _q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup against a persisted md5 fingerprint
    index — the continuous-crawl scale path (the persisted BM25/IVF
    index precedent): old shard (doc_id % 3 == 0) fingerprints build a
    bucket-partitioned index ONCE (cached under /tmp, content-
    fingerprinted key, atomic publish, meta-last); the new shard
    anti-joins it reading ONLY the buckets its own docs hash into.
    Corpus synthesized onto a bounded template space (real docs have no
    exact duplicates) so all three outcomes occur: dropped-as-indexed,
    kept with a within-shard dup, kept unique."""
    import os

    import pyarrow as pa

    import pyarrow.parquet as pq

    from vtzero_ray.functions.dedup_index import (build_md5_index,
                                                  dedup_against_index,
                                                  synth_dup_corpus,
                                                  synth_mod_for)

    src = f"{sf_dir}/documents.parquet"
    # modulus scales with the corpus (synth_mod_for docstring: a fixed
    # 313 saturates to ZERO kept rows once templates reach 3 members)
    mod = synth_mod_for(pq.ParquetFile(src).metadata.num_rows)

    def _split(keep_old: bool):
        # fresh lineage per consumer (never fan one Dataset out twice)
        def f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 3 == 0) if keep_old else (ids % 3 != 0)
            return t.filter(pa.array(mask))

        return synth_dup_corpus(_docs(sf_dir), mod=mod).map_batches(
            f, batch_format="pyarrow", batch_size=None)

    st = os.stat(src)
    index_dir = (f"/tmp/vtzero_ray_md5idx/"
                 f"{os.path.basename(os.path.normpath(sf_dir))}"
                 f"_{st.st_size}_{st.st_mtime_ns}_b64_m{mod}_v2")
    if not os.path.isfile(f"{index_dir}/meta.parquet"):
        build_md5_index(_split(True), index_dir)
    return dedup_against_index(_split(False), index_dir)


def _q_minhash_incremental(sf_dir: str):
    """Incremental NEAR-dup candidates against a persisted MinHash
    band-bucket index (the dedup_incremental pattern applied to LSH):
    old shard (doc_id % 3 == 0) band rows persist once; the new shard
    probes only the buckets its own band hashes hit, emitting every
    candidate pair with >= 1 new member at its first equal band."""
    import os

    import pyarrow as pa

    from vtzero_ray.functions.dedup_index import (
        build_band_index, near_dup_candidates_vs_index)

    def _split(keep_old: bool):
        def f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 3 == 0) if keep_old else (ids % 3 != 0)
            return t.filter(pa.array(mask))

        return _docs(sf_dir).map_batches(f, batch_format="pyarrow",
                                         batch_size=None)

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    index_dir = (f"/tmp/vtzero_ray_bandidx/"
                 f"{os.path.basename(os.path.normpath(sf_dir))}"
                 f"_{st.st_size}_{st.st_mtime_ns}_b64_v1")
    if not os.path.isfile(f"{index_dir}/meta.parquet"):
        build_band_index(_split(True), index_dir)
    return near_dup_candidates_vs_index(_split(False), index_dir)


def _q_split_sentences(sf_dir: str):
    """Rule-based sentence segmentation over the multiline corpus —
    RE2 has no lookbehind in either engine, so the boundary split is a
    backref replace to a \\x01 sentinel + split, identical in Arrow
    and DuckDB."""
    from vtzero_ray.functions.textstats import split_sentences
    from vtzero_ray.functions.webclean import synth_multiline

    return split_sentences(synth_multiline(_docs(sf_dir)))


def _q_strip_html(sf_dir: str):
    """WARC→WET text extraction: script/style blocks out with content,
    tags stripped, entities decoded (&amp; last), whitespace collapsed
    — one RE2 scan, byte-identical in DuckDB's RE2. The synth HTML
    cycles script blocks (id%4) and entity escapes (id%6)."""
    from vtzero_ray.functions.webclean import strip_html, synth_html

    return strip_html(synth_html(_docs(sf_dir)))


def _q_gopher_rules(sf_dir: str):
    """Gopher's document-quality rule set (Rae et al. 2021 Table A1) —
    all-integer rule arithmetic so every threshold compare is exact;
    the synth corpus cycles bullet/ellipsis/symbol branches and the
    stop list is the engine's en marker set (the synth vocabulary
    contains those; Gopher's own English list is the library default).
    repetition_stats carries the repetition half of Gopher."""
    from vtzero_ray.functions.textstats import (LANG_MARKERS, gopher_rules,
                                                synth_gopher_docs)

    ds = synth_gopher_docs(_docs(sf_dir))
    return gopher_rules(ds, stops=LANG_MARKERS["en"])


def _src_cache_dir(sf_dir: str, kind: str) -> str:
    """Content-fingerprinted /tmp cache dir for converted source
    formats (the _ivf_index_dir contract; publish must be atomic)."""
    import os

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    return (f"/tmp/vtzero_ray_src/{kind}_"
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_size}_{st.st_mtime_ns}_v2")


def _q_jsonl_identity(sf_dir: str):
    """S1 source breadth: documents → JSONL shards (Ray native writer,
    one file per block) → schema-enforced distributed read-back; the
    oracle is the raw table, so the whole round trip must be lossless."""
    import os
    import shutil

    import ray.data as rd

    from vtzero_ray.sources.text_io import read_jsonl, write_jsonl

    d = _src_cache_dir(sf_dir, "jsonl")
    if not os.path.isdir(d):
        tmp = f"{d}.tmp.{os.getpid()}"
        write_jsonl(rd.read_parquet(f"{sf_dir}/documents.parquet")
                    .repartition(8), tmp)
        try:
            os.rename(tmp, d)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return read_jsonl(d)


def _q_warc_pages(sf_dir: str):
    """WARC source (the crawl interchange format): documents → sharded
    WARC response records → one-task-per-file distributed parse →
    (doc_id, url, text); the oracle re-derives url/text from the raw
    table, so record framing, Content-Length payload extraction and
    header parsing are all value-checked."""
    import os

    from vtzero_ray.sources.warc import read_warc, synth_warc

    d = _src_cache_dir(sf_dir, "warc")
    if not os.path.isdir(d):
        synth_warc(sf_dir, d)
    return read_warc(d)


def _q_pagerank(sf_dir: str):
    """Link-graph PageRank (the Common-Crawl quality signal): 3 exact
    power iterations over a synthesized skewed link graph — ranks never
    broadcast; each iteration is one src-bucket join shuffle + one
    dst-bucket sum shuffle with integer-quantized per-edge terms."""
    import ray.data as rd

    import pyarrow.parquet as pq
    from vtzero_ray.functions.graph import pagerank_mod

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).repartition(8)
    return pagerank_mod(ds, n)


def _q_host_pagerank(sf_dir: str):
    """Host-level PageRank over edges that travel the REAL extraction
    path (synth HTML → split-decomposition href scan → host parse →
    distinct host edges + out-degrees in one bucketed shuffle) — the
    Common-Crawl host-rank composition; fixed 1000-host universe so
    linkless hosts stay as rank sinks."""
    from vtzero_ray.functions.graph import host_pagerank

    return host_pagerank(_docs(sf_dir))


def _q_host_walks(sf_dir: str):
    """Deterministic hash-walk corpus (the DeepWalk/node2vec input):
    one walk per host over the really-extracted host graph; each step
    picks the min-(md5, dst) out-neighbor — a keyed pseudo-random
    choice both engines compute bit-identically; per step ONE
    src-bucket join shuffle, frontier-bounded."""
    from vtzero_ray.functions.graph import host_walks

    return host_walks(_docs(sf_dir))


def _q_hilbert_tiles(sf_dir: str):
    """Hilbert-curve tile ordering: per-tile page counts at z=6 with
    each tile's Hilbert key — the storage-layout locality key (adjacent
    keys are 4-adjacent tiles, which Morton interleaving does not
    guarantee); one scan-stage key computation over the tile-bounded
    aggregate."""
    from vtzero_ray.functions.geo import hilbert_tiles

    return hilbert_tiles(sf_dir, zoom=6)


def _q_nearest_segment(sf_dir: str):
    """Nearest-segment join (map matching): snap every page to the
    closest OTHER site's world-coordinate path segment — the segment
    table is the broadcast small side (ray.put once), ONE corpus scan,
    chunked vectorized point x segment distances with the exact-int /
    single-float-expression d2 contract."""
    from vtzero_ray.functions.geo import nearest_segment

    return nearest_segment(sf_dir, zoom=6)



def _q_nearest_segment_cells(sf_dir: str):
    """Cell-bucketed CO-PARTITIONED nearest-segment join — the scale
    path for unbounded reference networks: both sides shuffle on a
    coarse world-grid key (segments bbox-replicated with a 1-ring
    halo), per-cell exact resolution with the shared d2 kernel, and a
    fused broadcast fallback net for pages the certainty guard
    (best_d2 < (rings*cell)^2) cannot prove. Byte-identical to the
    broadcast variant, so it shares its oracle."""
    from vtzero_ray.functions.geo import nearest_segment_cells

    return nearest_segment_cells(sf_dir, zoom=6)


def _q_cocitation(sf_dir: str):
    """Co-citation related-hosts: target pairs co-linked by a common
    source over the really-extracted host graph — per-src pair explode
    (out-degree bounded, loud star guard) → pair-bucket count shuffle."""
    from vtzero_ray.functions.graph import host_cocitation

    return host_cocitation(_docs(sf_dir))



def _q_backoff_trigram(sf_dir: str):
    """Stupid-backoff trigram LM (Brants et al. 2007): held-out split
    scored against the rest of the corpus via a CASCADE of three
    tagged-union bucket joins — trigram misses fall to the bigram
    level, then to add-1 unigrams; no model table ever broadcasts
    (trigram tables are vocab³-bounded) and per-term scores are
    int64-quantized at the level that resolves them."""
    import ray.data as rd

    from vtzero_ray.functions.lm import backoff_trigram_perplexity

    return backoff_trigram_perplexity(
        lambda: rd.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"]))



def _q_host_communities(sf_dir: str):
    """Deterministic label-propagation communities over the really-
    extracted host graph: per iteration ONE src-bucket tagged-union
    join ships labels to neighbors + ONE dst-bucket vote shuffle picks
    (count DESC, label ASC) winners; symmetrized once via a canonical
    (lo, hi) dedup shuffle so reversed duplicates never vote twice."""
    from vtzero_ray.functions.graph import host_communities

    return host_communities(_docs(sf_dir))



def _q_image_dhash_pairs(sf_dir: str):
    """Perceptual near-duplicate image pairs: REAL PNG decode →
    integer dHash (four 16-bit bands) → ONE banded bucket shuffle;
    thr <= bands-1 makes the banded join return exactly the all-pairs
    hamming set (pigeonhole). The corpus plants every-4th-image
    brightness variants, so real near-dups (not byte-dups) pair up."""
    import ray.data as rd

    from vtzero_ray.functions.imagehash import (dhash_pairs,
                                                synth_media_dhash)

    return dhash_pairs(rd.from_arrow(synth_media_dhash(128))
                       .repartition(8), thr=3)



def _q_ccnet_tiers(sf_dir: str):
    """CCNet head/middle/tail corpus split (Wenzek et al. 2020): per
    LANGUAGE perplexity tertiles — doc_perplexity with lang riding
    along, grid-bounded per-(lang, bucket) histogram partials, driver
    quantile_disc cutoffs, one broadcast labeling scan."""
    import ray.data as rd

    from vtzero_ray.functions.lm import ccnet_tiers

    return ccnet_tiers(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "lang"]))



def _q_weighted_sample(sf_dir: str):
    """Efraimidis-Spirakis weighted sampling without replacement:
    deterministic dyadic md5 uniforms, key = ln(u)/w int64-quantized,
    per-batch top-k prune under the FULL (key, id) order -> ONE
    output-sized merge task. Weights = document length (n_chars)."""
    import ray.data as rd

    from vtzero_ray.functions.pack import weighted_sample

    return weighted_sample(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "n_chars"]), k=50)



def _q_kcore(sf_dir: str):
    """Bulk-synchronous k-core peel (k=4, 3 unrolled rounds — both
    engines execute the same rounds so results are exact by
    construction; converged at this scale, asserted in tests): per
    round one degree-count shuffle + one bucketed anti-join dropping
    edges that touch dying nodes, over the quadratic synth graph."""
    import pyarrow.parquet as pq

    from vtzero_ray.functions.graph import kcore_mod

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return kcore_mod(_docs(sf_dir), n, k=4, rounds=3)



def _q_snapshot_diff(sf_dir: str):
    """Continuous-crawl snapshot delta: per-batch (key, md5, side)
    partials — content never shuffles — meet in ONE bucketed
    tagged-union shuffle; statuses unchanged/changed/added/removed
    over the deterministic two-version synth corpus."""
    import ray.data as rd

    from vtzero_ray.functions.crawl import (snapshot_diff,
                                            synth_snapshot_sides)

    old, new = synth_snapshot_sides(
        lambda: rd.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"]))
    return snapshot_diff(old, new)



def _q_audiofp_pairs(sf_dir: str):
    """Near-duplicate audio pairs: REAL WAV decode → integer energy
    fingerprint (65 3-sample windows, 64 difference bits as four
    16-bit bands) → the SAME banded hamming join the image dHash
    uses. The corpus plants periodic-distortion variants (a uniform
    offset would cancel in difference coding)."""
    import ray.data as rd

    from vtzero_ray.functions.imagehash import (audiofp_pairs,
                                                synth_media_audiofp)

    return audiofp_pairs(rd.from_arrow(synth_media_audiofp(128))
                         .repartition(8), thr=3)


def _q_bigram_perplexity(sf_dir: str):
    """Bigram-LM perplexity, the model-as-TABLE scoring shape: a bigram
    model is vocabulary²-bounded (no broadcast at 100 TB) — LM rows and
    doc-term rows bucket by the same crc32(t1) key, ONE tagged-union
    join shuffle computes int64-quantized terms, ONE doc-bucket shuffle
    integer-sums them; sentinel channel keeps zero-bigram docs."""
    import ray.data as rd

    from vtzero_ray.functions.lm import bigram_perplexity

    return bigram_perplexity(
        lambda: rd.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"]))


def _q_pagerank_weighted(sf_dir: str):
    """Weighted PageRank: rank mass splits w/wsum per edge (synth
    integer weights 1+(src+dst)%3; a real weight column — e.g. anchor
    multiplicity — plugs in unchanged); same iteration machinery, the
    w=1 case is an IEEE no-op so the unweighted oracle stays bit-equal."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from vtzero_ray.functions.graph import pagerank_weighted_mod

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).repartition(8)
    return pagerank_weighted_mod(ds, n)


def _q_hits(sf_dir: str):
    """HITS hubs & authorities (Kleinberg 1999) over the extracted host
    graph: per half-step one tagged-union join shuffle + one bucket-sum
    shuffle + a node-sized T aggregate; normalization is the single
    IEEE floor(S*1e9/max(T,1)+0.5) expression in both engines."""
    from vtzero_ray.functions.graph import host_hits

    return host_hits(_docs(sf_dir))


def _ivfpq_index_dir(sf_dir: str) -> str:
    """Build-once cached IVF-PQ index dir — the _ivf_index_dir
    contract: content-fingerprinted key, completeness gated on
    centroids.parquet (written last, atomic rename publish)."""
    import os

    import ray.data as rd

    from vtzero_ray.functions.ivfpq import build_ivfpq_index

    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    index_dir = (f"/tmp/vtzero_ray_ivfpq/"
                 f"{os.path.basename(os.path.normpath(sf_dir))}"
                 f"_{st.st_size}_{st.st_mtime_ns}_c16_m4_k16_v1")
    if not os.path.isfile(f"{index_dir}/centroids.parquet"):
        ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
        build_ivfpq_index(ds, index_dir, sf_dir)
    return index_dir


def _q_topk_ivfpq(sf_dir: str):
    """IVF-PQ, the composed FAISS architecture: the persisted index
    stores ONLY (vec_id, centroid_id, M codes) — the embedding column
    never leaves the build pass; queries read probed partitions only
    (file-level skip) and score by int64 ADC LUT sums."""
    from vtzero_ray.functions.ivfpq import topk_ivfpq

    return topk_ivfpq(_ivfpq_index_dir(sf_dir), sf_dir,
                      k=5, n_queries=10, nprobe=4)


def _q_topk_ivfpq_refined(sf_dir: str):
    """ADC-then-refine (the FAISS refine step): the PQ index proposes
    each query's top-20 by compressed distance; one vec_id-pruned
    embedding read re-ranks the pool by the exact integer cosine —
    exact-search quality on the candidate pool at PQ scan cost."""
    from vtzero_ray.functions.ivfpq import topk_ivfpq_refined

    return topk_ivfpq_refined(_ivfpq_index_dir(sf_dir), sf_dir,
                              k=5, n_queries=10, nprobe=4, rerank=20)


def _q_triangles(sf_dir: str):
    """Per-edge triangle support (the k-truss ingredient) over the
    quadratic synth link graph: canonical-dedup shuffle → node-bucket
    wedge explode (loud degree star guard) → pair-bucket tagged-union
    closing join; zero-support edges keep rows; Σ n_tri = 3·triangles."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from vtzero_ray.functions.graph import triangles_mod

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).repartition(8)
    return triangles_mod(ds, n)


def _q_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction (top-20 non-adjacent pairs) over the
    quadratic synth graph: symmetrize → node-bucket wedge explode with
    int64-quantized floor(1e9/ln(deg)) center terms → pair-bucket
    tagged-union anti-join vs the edge set with per-bucket top-k prune
    under the merge's full order → one output-sized merge task."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from vtzero_ray.functions.graph import adamic_adar_mod

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).repartition(8)
    return adamic_adar_mod(ds, n)



def _q_prep_training_data(sf_dir: str):
    """The full training-data prep recipe as one streaming composition:
    C4 line cleaning → exact dedup (keep-first, md5-bucket shuffle) →
    benchmark decontamination (broadcast gram set) → sequence packing
    (distributed prefix sum). Twin = each stage's proven oracle spliced
    as CTEs."""
    from vtzero_ray.pipelines.corpus import prep_training_data

    return prep_training_data(sf_dir)


def _q_semdedup(sf_dir: str):
    """SemDeDup: nearest-centroid clustering (the IVF assignment) then
    per-cluster greedy semantic dedup — one assignment scan, one
    cluster shuffle, pair cost bounded by cluster size ~ N/C. Driver
    threshold 0.35 (the embedding_near_dups precedent: synth embeddings
    are near-orthogonal at production thresholds)."""
    import ray.data as rd

    from vtzero_ray.functions.ann import semdedup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet").repartition(8)
    return semdedup(ds, sf_dir, n_centroids=16, threshold=0.35)


def _q_dup_ngram_spans(sf_dir: str):
    """Corpus-global duplicated n-gram spans (the hash analogue of
    Lee et al.'s exact substring dedup): one explode scan, one
    gram-bucket shuffle deciding global counts locally, one doc-bucket
    merged-interval coverage pass. Synth multiline corpus (the shared
    boilerplate line makes real cross-doc dup spans)."""
    from vtzero_ray.functions.webclean import dup_span_stats, synth_multiline

    return dup_span_stats(synth_multiline(_docs(sf_dir)), w=5)


def _q_dedup_spans(sf_dir: str):
    """The actual Lee-et-al substring-dedup CUT (dup_ngram_spans
    reports the signals): duplicated w-token windows keep only their
    globally-first occurrence; later spans are removed and docs
    reassembled. Two independent corpus readers (windows / tokens —
    the lineage invariant), three bounded shuffles."""
    from vtzero_ray.functions.webclean import dedup_spans, synth_multiline

    return dedup_spans(synth_multiline(_docs(sf_dir)),
                       synth_multiline(_docs(sf_dir)), w=5)


def _q_nb_classify(sf_dir: str):
    """fastText-style corpus classifier (CCNet / GPT-3 quality-model
    step) as multinomial Naive Bayes: train on the doc_id%3==0 seed
    split (ONE pass, ONE bucketed count shuffle, vocab-bounded model
    broadcast), predict every doc with integer-quantized per-term
    log-likelihoods (the doc_perplexity float-parity contract) so the
    argmax and score are bit-deterministic."""
    import ray.data as rd

    import pyarrow.compute as pc
    from vtzero_ray.functions.classify import nb_classify

    def seed_only(t):
        ids = t.column("doc_id")
        return t.filter(pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, 3), 3)), 0))

    seed = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"]).repartition(8) \
        .map_batches(seed_only, batch_format="pyarrow", batch_size=None)
    return nb_classify(_docs(sf_dir), seed)


def _q_pack_sequences(sf_dir: str):
    """Training-data sequence packing — the distributed prefix-sum
    pattern: per-range integer partials (order-independent int64 adds) →
    tiny driver exclusive scan → ONE bounded groupby(range) shuffle with
    in-range local scans. Every doc gets its global token offset and the
    2048-token context window it starts in. Pure-int outputs, window-
    cumsum SQL oracle. range_width=64 so sf0.01 exercises multiple
    ranges; at 10^12 docs pick 2^20 (driver frame stays ~10^6 rows)."""
    from vtzero_ray.functions.pack import pack_sequences

    return pack_sequences(_docs(sf_dir), seq_len=2048, range_width=64)


def _q_dedup_exact(sf_dir: str):
    from vtzero_ray.functions.dedup import dedup_exact

    return dedup_exact(_docs(sf_dir))


def _q_jaccard_verified_dups(sf_dir: str):
    """Full near-dup pipeline: MinHash+LSH candidates → DISTRIBUTED exact
    n-gram Jaccard verification (keep J >= 0.5): pairs exploded to member
    rows, hash-joined against documents, verified per bucketed pair group —
    the corpus never materializes on the driver."""
    from vtzero_ray.functions.dedup import jaccard_verify, minhash_lsh_candidates

    cands = minhash_lsh_candidates(_docs(sf_dir))
    verified = jaccard_verify(_docs(sf_dir), cands, threshold=0.5)
    # exact INTEGER outputs (the float jaccard is derivable but rounds
    # differently at half-boundaries across engines)
    return verified.select_columns(["doc_a", "doc_b", "n_inter", "n_union"])


def _q_minhash_lsh(sf_dir: str):
    from vtzero_ray.functions.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_docs(sf_dir))


def _q_dup_clusters(sf_dir: str):
    """Dedup cluster assignment: MinHash-LSH candidate pairs → connected
    components (tree-reduced union-find forests), cluster_id = the
    component's min doc_id (the canonical survivor)."""
    from vtzero_ray.functions.dedup import dup_clusters, minhash_lsh_candidates

    return dup_clusters(minhash_lsh_candidates(_docs(sf_dir)))


def _q_near_dedup(sf_dir: str):
    """Composed fuzzy-dedup REMOVAL (the GPT-3/RefinedWeb recipe):
    MinHash+LSH candidates → distributed exact-Jaccard verify (J >= 1/2)
    → connected components → each cluster keeps only its min doc_id;
    removal is ONE bucketed tagged-union anti-join (the drop-set is
    pair-bounded, never broadcast or driver-materialized)."""
    from vtzero_ray.functions.dedup import near_dedup_corpus

    return near_dedup_corpus(lambda: _docs(sf_dir), threshold=0.5)


def _q_near_dedup_longest(sf_dir: str):
    """Quality-aware fuzzy-dedup removal: the near_dedup composition
    with the RefinedWeb keep rule — each cluster's survivor is its
    LONGEST member (ties → min doc_id); lengths attach via a doc-bucket
    integer tagged union, winners resolve per cluster bucket."""
    from vtzero_ray.functions.dedup import near_dedup_corpus

    return near_dedup_corpus(lambda: _docs(sf_dir), threshold=0.5,
                             keep="longest")


def _q_dsir_weights(sf_dir: str):
    """DSIR data selection (Xie et al. 2023): hashed-bigram importance
    log-weights vs the doc_id % 20 == 0 target split. Fit = one scan of
    n_dims-bounded integer partials + one output-sized merge; score =
    one scan against the broadcast quantized log-ratio table. Pure-int
    outputs on the 1e-9 grid (the doc_perplexity contract)."""
    from vtzero_ray.functions.dsir import dsir_weights

    return dsir_weights(lambda: _docs(sf_dir), n_dims=256, target_mod=20)


def _q_dsir_select(sf_dir: str):
    """DSIR selection: keep the top-25% of the corpus by bucketized
    importance weight (quantile_disc cutoff over milli-log-weight
    buckets — the filter_by_perplexity composition, inequality
    flipped). Truncating // mirrored across engines."""
    from vtzero_ray.functions.dsir import dsir_select

    return dsir_select(lambda: _docs(sf_dir), p=0.25, n_dims=256,
                       target_mod=20)


def _q_path_lengths(sf_dir: str):
    """Per-site polyline length in micro-pixels at z6: one bounded
    site-bucket shuffle (segments), per-batch int64 length partials,
    ONE output-sized merge. floor(sqrt*1e6+0.5) over exact-int args is
    the same IEEE value in NumPy and DuckDB."""
    from vtzero_ray.functions.geo import path_lengths

    return path_lengths(sf_dir, zoom=6)


def _q_geohash(sf_dir: str):
    """8-char geohash per page through the REAL parse chain (read_pages
    → geoparse → exact microdegree recovery → pure-integer interleave).
    One scan, nothing shuffles."""
    from vtzero_ray.functions.geo import geohash_cells

    return geohash_cells(sf_dir)


def _geo_index_dir(sf_dir: str) -> str:
    """Build-once cached spatial index dir for ``sf_dir`` under /tmp —
    the _ivf_index_dir contract: content-fingerprinted cache key,
    completeness gated on meta.parquet (written last inside the temp
    dir; build_geo_index publishes atomically via os.rename)."""
    import os

    from vtzero_ray.functions.geo import build_geo_index

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    index_dir = (f"/tmp/vtzero_ray_geoidx/"
                 f"{os.path.basename(os.path.normpath(sf_dir))}"
                 f"_{st.st_size}_{st.st_mtime_ns}_b15_v1")
    if not os.path.isfile(f"{index_dir}/meta.parquet"):
        build_geo_index(sf_dir, index_dir)
    return index_dir


# closed bbox around the synth hot-NYC cell (±1000 µdeg box at
# 40.7128°N 74.006°W) plus margin — ~30% of pages — and reaching into
# adjacent 15° bands so the probe proves multi-partition reads
_BBOX_US = (39_000_000, 46_000_000, -76_000_000, -73_000_000)


def _q_bbox_query(sf_dir: str):
    """Spatial range query over the PERSISTED band-partitioned index:
    only partitions intersecting the box are passed to read_parquet
    (file-level skip — the topk_ivf_indexed contract), then one exact
    integer filter. Build-once cached per corpus fingerprint."""
    from vtzero_ray.functions.geo import bbox_query_indexed

    la0, la1, lo0, lo1 = _BBOX_US
    return bbox_query_indexed(_geo_index_dir(sf_dir), la0, la1, lo0, lo1)


def _q_grid_clusters(sf_dir: str):
    """Grid-DBSCAN spatial clustering: pages bucket into a 500-µdeg
    grid, 4-adjacent occupied cells cluster via the tree-reduced
    union-find — point-pair-free (a dense hot spot costs O(cells),
    never O(points²)). cluster_id = component min cell key."""
    from vtzero_ray.functions.geo import grid_clusters

    return grid_clusters(sf_dir, cell_us=500)


def _q_simhash(sf_dir: str):
    from vtzero_ray.functions.dedup import simhash_signatures

    return simhash_signatures(_docs(sf_dir))


def _q_simhash_near_dups(sf_dir: str):
    """Banded SimHash hamming-join: 16-bit band keys → bucketed groupby →
    exact popcount verify (<= 8 bits). Same shuffle shape as MinHash-LSH."""
    from vtzero_ray.functions.dedup import simhash_near_dups

    return simhash_near_dups(_docs(sf_dir))


def _q_distinct_langs(sf_dir: str):
    """Set op: distinct values of one column (ds.unique → shuffle)."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return pd.DataFrame({"lang": sorted(ds.unique("lang"))})


def _q_doc_sample(sf_dir: str):
    """Deterministic hash sample (true 10%: doc_id % 10 == 0): reproducible
    sampling via key arithmetic instead of RNG — the resumable-sampling
    pattern."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir)

    def pick(t):
        d = t.column("doc_id")
        rem = pc.subtract(d, pc.multiply(pc.divide(d, 10), 10))
        return t.filter(pc.equal(rem, 0))

    return ds.map_batches(pick, batch_format="pyarrow").select_columns(["doc_id"])


def _q_approx_distinct(sf_dir: str):
    """Mergeable-sketch pattern: per-batch HLL partials → tiny merge.
    md5 hash + integer-pinned register facts make the whole sketch (and
    its estimate) exactly reproducible by the DuckDB oracle
    (functions/sketch_sql.hll_facts_sql)."""
    from vtzero_ray.functions.sketch import approx_distinct

    return approx_distinct(_docs(sf_dir), "text", hash="md5")


# fixed deterministic probe list for the count-min sketch query: the
# synth corpus's head tokens plus one absent token (whose estimate is the
# pure collision mass — also exactly reproduced by the SQL twin)
_CMS_PROBES = ("join", "hash", "row", "batch", "scan", "the", "a",
               "window", "zzz_absent_token")


def _q_cms_token_est(sf_dir: str):
    """Count-min sketch point-frequency estimates: per-batch partial
    sketches over the batch vocabulary (corpus text never shuffles; only
    depth x 2^w_bits int64 counter blobs leave each task) → driver merge
    (elementwise integer addition — order-independent, bit-deterministic
    under any block scheduling) → min-over-rows probe estimates. Hash =
    DuckDB md5_number_lower bit-slices, so every counter the estimate
    reads is exactly reproduced by functions/sketch_sql.cms_est_sql."""
    from vtzero_ray.functions.sketch import cms_token_est

    return cms_token_est(_docs(sf_dir), _CMS_PROBES)


def _q_embedding_near_dups(sf_dir: str):
    import ray.data as rd

    from vtzero_ray.functions.dedup import embedding_near_dups

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_near_dups(ds, threshold=0.35)


def _q_embedding_near_dups_lsh(sf_dir: str):
    """Sub-quadratic near-dup scale path: hyperplane-LSH buckets + exact
    cosine verify in ONE bucket groupby (no block-pair fan-out). Coarse
    buckets (n_bits=4) because the driver threshold 0.35 is loose; at
    production thresholds (>= 0.9) the defaults (16, 8) apply."""
    import ray.data as rd

    from vtzero_ray.functions.dedup import embedding_near_dups_lsh

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_near_dups_lsh(ds, threshold=0.35, n_bits=4, n_tables=8)


# -- similarity search -------------------------------------------------------

# fixed deterministic BM25 query terms: mid-df tokens from the synth
# corpus vocabulary (df ~380-400 of 500 docs at sf0.01 -> positive idf)
_BM25_TERMS = ("vector", "window", "merge", "spark")


def _q_bm25_topk(sf_dir: str):
    """Lexical top-k search (BM25) — the keyword complement of the
    embedding ANN family. Two passes: integer term-stats combiner
    (O(terms) reduced frame, broadcast back as plain floats) then one
    vectorized scoring scan with per-batch top-k prune and a single
    output-sized merge task. Scores round(.,9)-pinned to the SQL twin
    (same literals, parse order, libm ln in both engines)."""
    from vtzero_ray.functions.search import bm25_topk

    return bm25_topk(_docs(sf_dir), _BM25_TERMS, k=20)


def _q_pmi_topk(sf_dir: str):
    """Collocation extraction: top bigrams by integer-quantized PMI —
    one bucketed bigram-count shuffle, broadcast vocab-bounded unigram
    table, per-bucket top-k prune, single output-sized merge."""
    from vtzero_ray.functions.textstats import pmi_topk

    return pmi_topk(_docs(sf_dir), k=20, min_count=3)


def _q_hash_embed(sf_dir: str):
    """Feature-hashing embeddings (Weinberger et al. 2009): sparse COO
    (doc_id, dim, w) from raw text — ONE scan, no shuffle; md5 cost is
    batch-vocabulary bounded."""
    from vtzero_ray.functions.embed import hash_embed

    return hash_embed(_docs(sf_dir), n_dims=64)


def _q_latest_snapshot(sf_dir: str):
    """CDX latest-capture selection: keep the newest snapshot per URL
    over a deterministic multi-capture corpus (per-batch winner pick →
    ONE bucketed shuffle of winners; captures never shuffle)."""
    from vtzero_ray.functions.crawl import latest_snapshot, synth_snapshots_batch

    snaps = _docs(sf_dir).map_batches(
        synth_snapshots_batch, batch_format="pyarrow", batch_size=None)
    return latest_snapshot(snaps)


def _q_domain_cap(sf_dir: str):
    """RefinedWeb per-domain document cap: at most 5 docs per host,
    smallest doc_ids win. Host set is synthesized dense (doc_id % 37)
    so the cap bites at driver scale (pages' %1000 hosts are unique at
    sf0.01's 500 docs)."""
    import numpy as np
    import pyarrow as pa

    from vtzero_ray.functions.crawl import domain_cap

    def synth_urls(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        url = np.char.add(
            np.char.add(np.char.add("https://host", (d % 37).astype(str)),
                        ".example/p/"), d.astype(str))
        return pa.table({"url": pa.array(url, pa.string()),
                         "doc_id": batch.column("doc_id")})

    pages = _docs(sf_dir).map_batches(
        synth_urls, batch_format="pyarrow", batch_size=None)
    return domain_cap(pages, max_per_domain=5)


def _q_tile_pyramid(sf_dir: str):
    """Overview-pyramid rollup: per-tile page counts at zooms 10/8/6/4
    from ONE corpus pass (per-batch partials for every level) + ONE
    bucketed shuffle — not one groupby per level."""
    from vtzero_ray.pipelines.pyramid import tile_pyramid
    from vtzero_ray.pipelines.tiling import features_dataset

    return tile_pyramid(features_dataset(sf_dir, zooms=(10,)),
                        base_zoom=10, levels=(10, 8, 6, 4))


def _q_pq_codes(sf_dir: str):
    """Product-quantization encode: every vector → 4 subspace codes via
    exact-int argmin against unit-grid first-N codebooks — the 100-TB
    compression step (M bytes/vector instead of 4D)."""
    import ray.data as rd

    from vtzero_ray.functions.pq import pq_codes

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return pq_codes(ds, sf_dir)


def _q_topk_pq(sf_dir: str):
    """PQ ADC search: per-query int64 LUT over the codebooks, one corpus
    scan with per-batch top-k pruning, single merge task."""
    import ray.data as rd

    from vtzero_ray.functions.pq import topk_pq

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return topk_pq(ds, sf_dir, k=5, n_queries=10)


def _q_extract_links(sf_dir: str):
    """Outlink extraction (the crawl-graph builder): anchor-bearing HTML
    synthesized deterministically → (doc_id, link_idx, dst) edges via
    vectorized Arrow list kernels (no per-row regex loop)."""
    from vtzero_ray.functions.crawl import extract_links, synth_linked_html

    return extract_links(synth_linked_html(_docs(sf_dir)))


def _q_anchor_topk(sf_dir: str):
    """Anchor-text aggregation (the ORCAS anchor-corpus shape): HTML →
    (dst, anchor) edges via the two-group split decomposition, then
    per-target-host top-3 anchors — partial counts → ONE crc32(host)
    bucket shuffle → local top-k."""
    from vtzero_ray.functions.crawl import (anchor_topk, extract_anchors,
                                            synth_linked_html)

    return anchor_topk(extract_anchors(synth_linked_html(_docs(sf_dir))),
                       k=3)


def _q_robots_filter(sf_dir: str):
    """robots.txt disallow filtering: the deterministic rule set is the
    broadcast small side; pages keep iff no (host, path-prefix) rule
    matches — one vectorized pass per rule, no shuffle."""
    import numpy as np
    import pyarrow as pa

    from vtzero_ray.functions.crawl import robots_filter, synth_robots_rules

    def synth_urls(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        url = np.char.add(
            np.char.add(np.char.add("https://host", (d % 37).astype(str)),
                        ".example/p/"), d.astype(str))
        return pa.table({"url": pa.array(url, pa.string()),
                         "doc_id": batch.column("doc_id")})

    pages = _docs(sf_dir).map_batches(
        synth_urls, batch_format="pyarrow", batch_size=None)
    return robots_filter(pages, synth_robots_rules())


def _q_simplify_paths(sf_dir: str):
    """Douglas-Peucker simplification of the z2 site polylines (world
    pixel coords, tol = 256 px): ONE site-bucket shuffle, exact-int DP
    per path. The oracle re-runs the recursion as a recursive CTE
    (functions/simplify.dp_oracle_sql) — kept set = span endpoints."""
    from vtzero_ray.functions.simplify import simplify_paths
    from vtzero_ray.pipelines.clip_paths import _world_points

    return simplify_paths(_world_points(sf_dir, zoom=2, extent=4096),
                          tol2=256 * 256)


def _q_hybrid_search(sf_dir: str):
    """Hybrid retrieval: BM25 lexical top-pool fused with exact-cosine
    vector top-pool by Reciprocal Rank Fusion — integer-quantized
    fusion terms, output-sized driver merge; both legs run their
    normal distributed shapes."""
    import ray.data as rd

    from vtzero_ray.functions.search import hybrid_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet").repartition(4)
    return hybrid_topk(_docs(sf_dir), emb, sf_dir, _BM25_TERMS, k=10)


def _q_cluster_docs(sf_dir: str):
    """Document clustering: nearest-centroid assignment over the
    embedding column (the IVF assignment, broadcast centroids) → tiny
    per-cluster aggregate merged in ONE output-sized task."""
    import ray.data as rd

    from vtzero_ray.functions.ann import cluster_sizes

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return cluster_sizes(ds, sf_dir, n_centroids=16)


def _q_ann_bruteforce(sf_dir: str):
    import ray.data as rd

    from vtzero_ray.functions.ann import topk_bruteforce

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return topk_bruteforce(ds, sf_dir, k=5, n_queries=10)


def _q_ann_lsh(sf_dir: str):
    import ray.data as rd

    from vtzero_ray.functions.ann import topk_lsh

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return topk_lsh(ds, sf_dir, k=5, n_queries=10)


def _q_ann_lsh_mp(sf_dir: str):
    """Multi-probe LSH (Lv et al. 2007): each query also probes the
    Hamming-1 buckets of its two lowest-|margin| hyperplane bits —
    recall rises at FIXED table count; the twin is the probed-bucket
    union (same margins via integer dots, same XOR flips)."""
    import ray.data as rd

    from vtzero_ray.functions.ann import topk_lsh

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return topk_lsh(ds, sf_dir, k=5, n_queries=10, n_probes=3)


def _q_ann_ivf(sf_dir: str):
    """Inline IVF twin (queries_extra since round 4): centroid-bucketed +
    partition-pruned probe search WITHOUT the persisted index — re-assigns
    centroids over the corpus per run, so it is the verification twin of
    ann_topk_ivf_indexed, not the scale path (VERDICT r3: no driver query
    should perform a full corpus pass per ANN run)."""
    import ray.data as rd

    from vtzero_ray.functions.ann import topk_ivf

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return topk_ivf(ds, sf_dir, k=5, n_queries=10, n_centroids=16, nprobe=4)


def _ivf_index_dir(sf_dir: str) -> str:
    """Build-once cached IVF index dir for ``sf_dir`` under /tmp.

    Cache key = source basename + row count + source parquet content
    fingerprint (file size, mtime ns) + params + format version, so
    regenerated-but-equal-row-count data, older code, or other params
    never silently reuse an index. Completeness is gated on
    ``centroids.parquet`` — build_ivf_index publishes the whole dir
    atomically via os.rename and writes centroids last, so presence
    implies a complete index (never a partial crashed build)."""
    import os

    import ray.data as rd

    from vtzero_ray.functions.ann import build_ivf_index

    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    index_dir = (f"/tmp/vtzero_ray_ivf/"
                 f"{os.path.basename(os.path.normpath(sf_dir))}"
                 f"_{st.st_size}_{st.st_mtime_ns}_c16_v3")
    if not os.path.isfile(f"{index_dir}/centroids.parquet"):
        ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
        build_ivf_index(ds, index_dir, sf_dir, n_centroids=16)
    return index_dir


def _text_index_dir(sf_dir: str) -> str:
    """Build-once cached BM25 inverted-index dir for ``sf_dir`` under
    /tmp — the _ivf_index_dir contract: content-fingerprinted cache key,
    completeness gated on meta.parquet (written last inside the temp
    dir; build_text_index publishes atomically via os.rename)."""
    import os

    from vtzero_ray.functions.search import build_text_index

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    index_dir = (f"/tmp/vtzero_ray_textidx/"
                 f"{os.path.basename(os.path.normpath(sf_dir))}"
                 f"_{st.st_size}_{st.st_mtime_ns}_b64_v1")
    if not os.path.isfile(f"{index_dir}/meta.parquet"):
        build_text_index(_docs(sf_dir), index_dir, n_buckets=64)
    return index_dir


def _q_bm25_topk_indexed(sf_dir: str):
    """BM25 over the PERSISTED inverted index (queries_extra twin of
    bm25_topk — byte-equal by construction, so it shares the same SQL
    oracle): postings written partitioned by crc32(term) % 64 ONCE, then
    every query run reads only its terms' bucket partitions."""
    from vtzero_ray.functions.search import bm25_topk_indexed

    return bm25_topk_indexed(_text_index_dir(sf_dir), _BM25_TERMS, k=20)


def _q_ann_ivf_indexed(sf_dir: str):
    """IVF ANN over the PERSISTED index (the only IVF shape on the driver
    path — no query run performs a full corpus pass): the corpus is written
    partitioned by centroid_id ONCE (cached per sf_dir under /tmp) and every
    query run reads only the probed partitions."""
    from vtzero_ray.functions.ann import topk_ivf_indexed

    return topk_ivf_indexed(_ivf_index_dir(sf_dir), sf_dir,
                            k=5, n_queries=10, nprobe=4)


def _q_ann_ivf_extended(sf_dir: str):
    """INCREMENTAL index growth: the IVF index builds over the even
    vec_ids and the odd shard arrives as an append-only extend-N
    generation (stored-centroid assignment, atomic publish). The
    extended index must answer queries exactly as one built over the
    full corpus — so the oracle is the ann_topk_ivf SQL verbatim."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vtzero_ray.functions.ann import (build_ivf_index,
                                          extend_ivf_index,
                                          topk_ivf_indexed)

    def split(rem):
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

        def f(t):
            ids = t.column("vec_id").to_numpy()
            return t.filter(pa.array(np.ascontiguousarray(
                ids % 2 == rem)))

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    idx = tempfile.mkdtemp(prefix="ivf_ext_") + "/index"
    build_ivf_index(split(0), idx, sf_dir, n_centroids=16)
    extend_ivf_index(idx, split(1))
    return topk_ivf_indexed(idx, sf_dir, k=5, n_queries=10, nprobe=4)


def _q_pyramid_remove_z4(sf_dir: str):
    """Tombstone DELETION over the pyramid store: the store builds from
    the full corpus, then every doc_id % 7 == 0 feature is removed via
    remove_from_pyramid (affected tiles re-encode, emptied tiles
    tombstone, parents re-derive, one atomic delta). The current view
    must equal a pyramid built WITHOUT those docs — the oracle is the
    pyramid_store_z4 SQL with the corpus filtered."""
    import tempfile

    from vtzero_ray.pipelines.overzoom import point_tile_summary_batch
    from vtzero_ray.pipelines.pyramid import (build_pyramid,
                                              read_tiles_current,
                                              remove_from_pyramid)
    from vtzero_ray.pipelines.tiling import (features_dataset,
                                             tiles_pipeline, validate_tiles)

    tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
    out_dir = tempfile.mkdtemp(prefix="pyramid_rm_")
    build_pyramid(tiles, out_dir, base_zoom=6, min_zoom=4)

    feats = features_dataset(sf_dir, zooms=(6,)) \
        .select_columns(["x", "y", "doc_id"])

    def rm_filter(t):
        import numpy as np
        import pyarrow as pa

        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(np.ascontiguousarray(ids % 7 == 0)))

    removals = feats.map_batches(rm_filter, batch_format="pyarrow",
                                 batch_size=None)
    remove_from_pyramid(out_dir, removals, base_zoom=6, min_zoom=4)
    back = read_tiles_current(out_dir).select_columns(["z", "x", "y", "mvt"])
    back = back.map_batches(validate_tiles, batch_format="pyarrow")
    return back.map_batches(point_tile_summary_batch, batch_format="pyarrow")


# -- spatial joins -----------------------------------------------------------

def _geo_pages(sf_dir: str):
    from vtzero_ray.sources.pages import read_pages
    from vtzero_ray.stages.geoparse import geoparse

    return geoparse(read_pages(sf_dir, include_html=False)).select_columns(
        ["url", "lat", "lon"]
    )


def _q_pip_join(sf_dir: str):
    from vtzero_ray.stages.joins import PIPJoin

    ds = _geo_pages(sf_dir).map_batches(PIPJoin, batch_format="pyarrow",
                                        concurrency=(1, 4))
    return ds.select_columns(["url", "admin_id"])


def _q_knn_join(sf_dir: str):
    from vtzero_ray.stages.joins import KNNJoin

    ds = _geo_pages(sf_dir).map_batches(KNNJoin, batch_format="pyarrow",
                                        concurrency=(1, 4))
    return ds.select_columns(["url", "poi_id", "poi_d2"])


def _q_knn_cell(sf_dir: str):
    """Cell-keyed CO-PARTITIONED kNN (SURVEY §2.4 spatial repartition):
    both sides shuffle on the coarse-cell key (POIs duplicated to boundary
    cells), per-cell cohort vectorized resolve, exact broadcast fallback
    for the sparse tail — results identical to knn_join (same oracle)."""
    from vtzero_ray.stages.joins import cell_knn_join

    ds = cell_knn_join(_geo_pages(sf_dir))
    return ds.select_columns(["url", "poi_id", "poi_d2"])


def _q_knn_top3(sf_dir: str):
    """k=3 nearest POIs per page (rank column), exact distances."""
    import numpy as np
    import pyarrow as pa

    from vtzero_ray.stages.joins import poi_table

    pois = poi_table()
    pid = pois["poi_id"].to_numpy()
    px = pois["px_us"].to_numpy().astype(np.int64)
    py = pois["py_us"].to_numpy().astype(np.int64)

    def top3(batch: pa.Table) -> pa.Table:
        lat_us = np.round(batch.column("lat").to_numpy() * 1e6).astype(np.int64)
        lon_us = np.round(batch.column("lon").to_numpy() * 1e6).astype(np.int64)
        dx = lon_us[:, None] - px[None, :]
        dy = lat_us[:, None] - py[None, :]
        d2 = dx * dx + dy * dy
        # rank by (d2, poi_id): lexsort per row
        order = np.lexsort((np.broadcast_to(pid, d2.shape), d2), axis=1)[:, :3]
        rows = np.repeat(np.arange(d2.shape[0]), 3)
        cols = order.ravel()
        urls = batch.column("url").take(pa.array(rows))
        return pa.table({
            "url": urls,
            "poi_id": pa.array(pid[cols], pa.int64()),
            "poi_d2": pa.array(d2[rows, cols], pa.int64()),
            "rank": pa.array(np.tile(np.arange(1, 4, dtype=np.int64), d2.shape[0])),
        })

    return _geo_pages(sf_dir).map_batches(top3, batch_format="pyarrow")


def _q_admin_page_counts(sf_dir: str):
    """All-matches PIP join aggregated per admin polygon (pages can match
    several overlapping admins)."""
    import numpy as np
    import pyarrow as pa

    from vtzero_ray.stages.joins import _points_in_convex, admin_polygons

    polys = admin_polygons()

    def counts(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        y2 = (np.round(lat * 1e6) * 2).astype(np.int64)
        x2 = (np.round(lon * 1e6) * 2).astype(np.int64)
        ids, ns = [], []
        for i in range(len(polys)):
            hit = int(_points_in_convex(polys["ring2"].iloc[i], x2, y2).sum())
            if hit:
                ids.append(int(polys["admin_id"].iloc[i]))
                ns.append(hit)
        return pa.table({"admin_id": pa.array(ids, pa.int64()),
                         "n_pages": pa.array(ns, pa.int64())})

    partials = _geo_pages(sf_dir).map_batches(counts, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = partials.groupby("admin_id").aggregate(Sum("n_pages"))
    return agg.rename_columns({"sum(n_pages)": "n_pages"})


# -- relational / streaming-shaped -------------------------------------------

def _q_pricing_summary(sf_dir: str):
    from vtzero_ray.pipelines.relational import pricing_summary

    return pricing_summary(sf_dir)


def _q_orders_by_segment(sf_dir: str):
    from vtzero_ray.pipelines.relational import orders_by_segment

    return orders_by_segment(sf_dir)


def _q_revenue_by_priority(sf_dir: str):
    from vtzero_ray.pipelines.relational import revenue_by_priority

    return revenue_by_priority(sf_dir)


def _q_top_orders(sf_dir: str):
    from vtzero_ray.pipelines.relational import top_orders

    return top_orders(sf_dir)


def _q_top_unshipped(sf_dir: str):
    """TPC-H Q3 composition: broadcast customer semi-join → orders prune →
    shuffle join lineitem → integer-cent revenue groupby → global top-k."""
    from vtzero_ray.pipelines.relational import top_unshipped_orders

    return top_unshipped_orders(sf_dir)


def _q_corpus_clean(sf_dir: str):
    """Flagship corpus-cleaning composition: quality gate + lang-ID
    consistency + exact dedup in one streaming pipeline."""
    from vtzero_ray.pipelines.corpus import clean_corpus

    return clean_corpus(sf_dir)


def _q_sample_stratified(sf_dir: str):
    """Exact N-per-lang sample by md5-hash rank (partial per-batch top-N →
    tiny groupby merge — the corpus never shuffles)."""
    from vtzero_ray.pipelines.corpus import stratified_sample

    return stratified_sample(sf_dir)


def _q_events_window(sf_dir: str):
    from vtzero_ray.pipelines.relational import events_tumbling_window

    return events_tumbling_window(sf_dir)


def _q_events_asof(sf_dir: str):
    from vtzero_ray.pipelines.relational import events_asof_last_order

    return events_asof_last_order(sf_dir)


def _q_events_hopping(sf_dir: str):
    from vtzero_ray.pipelines.relational import events_hopping_window

    return events_hopping_window(sf_dir)


def _q_events_sessions(sf_dir: str):
    from vtzero_ray.pipelines.relational import events_sessionize

    return events_sessionize(sf_dir)


def _q_range_join(sf_dir: str):
    from vtzero_ray.pipelines.relational import orders_shipped_in_range

    return orders_shipped_in_range(sf_dir)


# Redundant twins kept OUT of the driver's queries() (the driver checks at
# most 50 entries in dict order — round 2 silently dropped the last two):
# each is the simple/alternate twin of a kept query, still exercised by
# queries_extra() via scripts/check_oracle.py and by pytest.
#   tile_assignment_z6   -> twin of tile_assignment_z12 (same op, other zoom)
#   knn_join             -> broadcast twin of knn_cell_join / knn_top3
#   simhash_signatures   -> ingredient of simhash_near_dups
#   doc_sample_10pct     -> simpler cousin of sample_stratified
#   distinct_langs       -> trivial DISTINCT, same op evidenced by
#                           lang_page_counts' groupby keys
#   ann_topk_ivf         -> inline IVF (per-run centroid assignment);
#                           verification twin of ann_topk_ivf_indexed
#   top_orders           -> plain sort/top-k; strictly subsumed by
#                           top_unshipped_orders' final sort+limit stage
#   media_features       -> BMP twin of the sniffed ImageStats stage;
#                           media_features_png / media_features_jpeg in
#                           the main 50 drive the same stage through the
#                           harder codecs (PNG defilter matrix, lossy
#                           JPEG entropy decode)
#   clipped_segments_z2  -> per-segment ingredient of clipped_paths_z2
#                           (same Liang-Barsky clip stage; the kept query
#                           additionally chains parts)
#   embedding_near_dups  -> O(B^2) all-pairs exact twin; verification
#                           baseline of embedding_near_dups_lsh (the
#                           shipping sub-quadratic scale path, kept in
#                           the main 50)
#   bm25_topk            -> corpus-scan verification twin of
#                           bm25_topk_indexed (byte-equal, same oracle);
#                           the persisted-index path holds the driver
#                           slot per the r3 verdict rule — no driver
#                           query performs a full corpus pass per run
#                           (the ann_topk_ivf precedent)
#   knn_top3             -> broadcast k=3 cousin of knn_join (also in
#                           extras); the co-partitioned scale path
#                           knn_cell_join keeps the driver slot
_EXTRA_QUERIES = ("tile_assignment_z6", "knn_join", "simhash_signatures",
                  "doc_sample_10pct", "distinct_langs",
                  "events_hopping_window", "ann_topk_ivf",
                  "trigram_backoff",
                  "label_prop_hosts",
                  "image_dhash_pairs",
                  "ccnet_tiers",
                  "weighted_sample",
                  "kcore_docs",
                  "snapshot_diff",
                  "audio_fp_pairs",
                  "audio_features", "top_orders", "media_features",
                  # GIF/LZW real-codec probe (PNG + JPEG hold the
                  # driver media slots)
                  "media_features_gif",
                  "clipped_segments_z2", "embedding_near_dups",
                  "bm25_topk", "knn_top3", "redact_pii", "shuffle_epoch",
                  # identity read probe — geoparse exercises the same
                  # pruned-read path; slot freed for repetition_stats
                  "pages_text_identity",
                  # cell counts twin — tile_assignment_z12 covers the
                  # cell-assignment path; slot freed for doc_perplexity
                  "cell_page_counts",
                  # exact-cosine baseline — LSH + persisted IVF keep the
                  # driver ANN slots; slot freed for cluster_docs
                  "ann_topk_bruteforce",
                  # multi-probe LSH twin (ann_topk_lsh holds the driver slot)
                  "ann_topk_lsh_mp",
                  # tumbling window — sessions (harder) + hopping (extra)
                  # keep the family; slot freed for mix_weighted
                  "events_window",
                  # fused-assembler twin of multilayer_tiles_z6 (byte-
                  # identity asserted in tests); slot freed for decontaminate
                  "combined_layers_z2",
                  # per-doc keyword extraction rides in extras (the text
                  # family already holds many driver slots)
                  "tfidf_topk",
                  # composed perplexity gate (doc_perplexity is the
                  # driver row; the composition rides in extras)
                  "corpus_filter_ppl",
                  # RAG chunking (pack_sequences holds the driver slot
                  # for the sequence-prep family)
                  "chunk_docs",
                  # web cleaning (C4 line filter + URL canonicalization
                  # dedup) rides in extras — the corpus_clean/dedup
                  # families hold the driver slots
                  "clean_lines_c4", "url_dedup", "dedup_lines_c4",
                  # incremental near-dup vs the persisted band index
                  # (minhash_lsh_candidates holds the driver slot;
                  # dedup_incremental is PROMOTED to the main 50)
                  "minhash_incremental",
                  # Naive-Bayes corpus classifier (CCNet/GPT-3 quality-
                  # model shape); langid holds the driver language slot
                  "nb_lang_classify",
                  # corpus-global dup n-gram spans (substring-dedup
                  # signals); dedup_lines_c4 holds the span-dedup family
                  "dup_ngram_spans",
                  # the span-removal transform itself (stats row above)
                  "dedup_spans_c4",
                  # cluster-then-dedup (SemDeDup); the embedding near-
                  # dup family holds the driver slots
                  "semdedup",
                  # composed clean→dedup→decontaminate→pack recipe
                  # (c4_pipeline + pack_sequences hold the driver slots
                  # for the ingredient families)
                  "prep_training_data",
                  # link-graph rank (iterative joins; dup_clusters holds
                  # the graph-op driver slot) + the composed host-rank
                  # over really-extracted edges
                  "pagerank", "host_pagerank", "host_walks",
                  "cocitation_hosts",
                  # bigram LM (model-as-table join; doc_perplexity
                  # holds the driver quality-scoring slot)
                  "bigram_perplexity",
                  # weighted link rank (pagerank holds the slot)
                  "pagerank_weighted", "hits_hosts", "triangle_support",
                  # Adamic-Adar link prediction (wedge machinery twin)
                  "adamic_adar",
                  # source-format breadth (S1): JSONL round-trip, WARC
                  # crawl-archive parse (pages_text_identity covers the
                  # parquet read path)
                  "jsonl_identity", "warc_pages",
                  # Gopher quality-rule set (quality_score holds the
                  # driver slot for the rule-filter family)
                  "gopher_rules",
                  # WARC→WET extraction (clean_lines_c4 holds the text-
                  # cleaning family's other extras slot)
                  "strip_html_wet",
                  # sentence segmentation (the chunk_docs family)
                  "split_sentences",
                  # RRF fusion of the bm25 + ANN families
                  "hybrid_search_rrf",
                  # PMI collocations (the ngram_topk family)
                  "pmi_collocations",
                  # embedding GENERATION (hashing trick) — the vector
                  # families consume embeddings; this produces them
                  "hash_embed",
                  # crawl management: CDX latest-capture + RefinedWeb
                  # per-domain caps (url_dedup holds the URL family slot)
                  "latest_snapshot", "domain_cap",
                  # overview pyramid (tile_assignment_z12 holds the
                  # tile-count driver slot)
                  "tile_pyramid",
                  # Douglas-Peucker simplification (recursive-CTE oracle;
                  # clipped_paths_z2 holds the path-family driver slot)
                  "simplify_paths_z2",
                  # crawl-graph edges + anchor-text aggregation +
                  # robots politeness filter
                  "extract_links", "anchor_topk", "robots_filter",
                  # plain per-lang count — langid (driver) exercises
                  # the language column, cell_page_counts (extra) the
                  # count shape; slot freed for dedup_incremental
                  "lang_page_counts",
                  # shuffle hash join — orders_by_segment (broadcast)
                  # + top_unshipped_orders (shuffle join + semi-join +
                  # top-k) keep the family; slot freed for c4_pipeline
                  "revenue_by_priority",
                  # product quantization (IVF-PQ's compression half) —
                  # the LSH/IVF rows hold the driver ANN slots
                  "pq_codes", "topk_pq",
                  # composed IVF-PQ (persisted code-only index)
                  "topk_ivfpq",
                  # dup_clusters: near_dedup (main 50) composes
                  # candidates → verify → THIS → anti-join, so the
                  # connected-components stage stays driver-exercised
                  # through the composition; the standalone probe
                  # parks here
                  "dup_clusters",
                  # DSIR importance weights (hashed-bigram log-ratio
                  # data selection); doc_perplexity holds the driver
                  # quality-scoring slot
                  "dsir_weights",
                  # DSIR top-fraction selection (weights + quantile cut)
                  "dsir_select",
                  # geo measurement/indexing: mercator path lengths,
                  # geohash cells (clipped_paths/tile_assignment hold
                  # the driver geo slots)
                  "path_lengths_z6", "geohash_cells",
                  # grid-DBSCAN connected-cell clustering
                  "grid_clusters", "hilbert_tiles_z6",
                  # nearest-segment map-matching join
                  "nearest_segment_z6",
                  "nearest_segment_cells_z6",
                  # persisted spatial index range query
                  "bbox_query_indexed",
                  # linestring overzoom (re-clip to the child's buffered
                  # box; clipped_paths_z2 holds the driver path slot)
                  "overzoom_paths_z3",
                  # pyramid-build inverse (tiles z -> z-1 without the
                  # corpus; exact integer inverse of overzoom)
                  "downzoom_z5",
                  # polygon overzoom (Sutherland-Hodgman re-clip; the
                  # third geometry type of the overzoom family)
                  "overzoom_cells_z7",
                  # composed pyramid build + resumable store round trip
                  "pyramid_store_z4",
                  # Deequ/TFDV contract validation (profile_documents is
                  # PROMOTED to the main 50 as the family's driver row)
                  "validate_documents",
                  # ordered funnel (the sessions/windows family)
                  "events_funnel",
                  # WET template removal (the dedup_lines family)
                  "strip_boilerplate",
                  # PCA second moments (the vector-pipeline reducer)
                  "pca_moments",
                  # linestring downzoom (completes the pyramid family:
                  # points both ways, paths both ways, polygons up)
                  "downzoom_paths_z1",
                  # contingency pivot (zero-shuffle wide aggregate)
                  "crosstab_lang_source",
                  # personalized PageRank (seed-set teleport)
                  "ppr_hosts",
                  # demotions balancing the 50-row budget: PNG media row
                  # (JPEG keeps the media slot; BMP/GIF/audio already in
                  # extras), standalone jaccard verify (near_dedup composes
                  # candidates→verify→CC→anti-join so the stage stays
                  # driver-exercised — the dup_clusters precedent), CMS
                  # estimate (ngram_topk is its exact twin)
                  "media_features_png", "jaccard_verified_dups",
                  "cms_token_est",
                  # polygon downzoom (downzoom_z5 holds the driver
                  # pyramid-build slot; this completes the geometry set)
                  "downzoom_cells_z5",
                  # holed-polygon downzoom twin (overzoom_holed_z7 is
                  # PROMOTED to the main 50 as the ring-pairing driver
                  # row; the halving direction parks here)
                  "downzoom_holed_z5",
                  # incremental pyramid update (pyramid_store_z4 holds
                  # the driver store slot; the delta path parks here)
                  "pyramid_update_z4",
                  # quality-aware dedup keep rule (near_dedup holds the
                  # driver fuzzy-dedup slot)
                  "near_dedup_longest",
                  # incremental layer twins: append-only index growth and
                  # tombstone deletion, both equal to full rebuilds
                  "ann_topk_ivf_extended", "pyramid_remove_z4",
                  # ADC-then-exact-rerank refinement (topk_ivfpq holds
                  # the compressed-search slot)
                  "topk_ivfpq_refined",
                  # holed-polygon incremental pyramid update (the points
                  # delta path holds the pyramid_update_z4 slot)
                  "pyramid_update_poly",
                  # demoted for the overzoom_holed_z7 slot: the raster
                  # derivation stays driver-exercised through
                  # raster_to_vector_z6 and every polygon pyramid row
                  "rasterize_z6")


def queries() -> dict[str, Callable[[str], Any]]:
    return {k: v for k, v in _all_queries().items()
            if k not in _EXTRA_QUERIES}


def queries_extra() -> dict[str, Callable[[str], Any]]:
    """Twin probes excluded from the driver's 50-entry budget."""
    return {k: v for k, v in _all_queries().items() if k in _EXTRA_QUERIES}


def _all_queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship tiling surface (SURVEY §2.1-2.3, §3.1)
        "pages_text_identity": _q_pages_text_identity,
        "geoparse": _q_geoparse,
        "tile_assignment_z6": _q_tile_assignment_z6,
        "tile_assignment_z12": _q_tile_assignment_z12,
        "cell_page_counts": _q_cell_page_counts,
        "tile_pixel_coords": _q_tile_pixel_coords,
        "lang_page_counts": _q_lang_page_counts,
        "tiles_encoded": _q_tiles_encoded,
        # decode / stats / filter parity (SURVEY §3.2, §3.3)
        "overzoom_z7": _q_overzoom_z7,
        "overzoom_paths_z3": _q_overzoom_paths_z3,
        "overzoom_cells_z7": _q_overzoom_cells_z7,
        "overzoom_holed_z7": _q_overzoom_holed_z7,
        "downzoom_holed_z5": _q_downzoom_holed_z5,
        "downzoom_z5": _q_downzoom_z5,
        "downzoom_cells_z5": _q_downzoom_cells_z5,
        "pyramid_store_z4": _q_pyramid_store_z4,
        "pyramid_update_z4": _q_pyramid_update_z4,
        "pyramid_remove_z4": _q_pyramid_remove_z4,
        "pyramid_update_poly": _q_pyramid_update_poly,
        "profile_documents": _q_profile_documents,
        "validate_documents": _q_validate_documents,
        "events_funnel": _q_events_funnel,
        "strip_boilerplate": _q_strip_boilerplate,
        "pca_moments": _q_pca_moments,
        "downzoom_paths_z1": _q_downzoom_paths_z1,
        "crosstab_lang_source": _q_crosstab_lang_source,
        "ppr_hosts": _q_host_ppr,
        "set_join_exact": _q_set_join_exact,
        "tile_stats_z6": _q_tile_stats_z6,
        "decoded_features_z6": _q_decoded_features_z6,
        "filter_lang_en_z6": _q_filter_lang_en_z6,
        "rasterize_z6": _q_rasterize_z6,
        "raster_to_vector_z6": _q_raster_to_vector_z6,
        "site_paths_z2": _q_site_paths_z2,
        "clipped_segments_z2": _q_clipped_segments_z2,
        "clipped_paths_z2": _q_clipped_paths_z2,
        "combined_layers_z2": _q_combined_layers_z2,
        "multilayer_tiles_z6": _q_multilayer_z6,
        "media_features": _q_media_features,
        "media_features_png": _q_media_features_png,
        "media_features_jpeg": _q_media_features_jpeg,
        "media_features_gif": _q_media_features_gif,
        "audio_features": _q_audio_features,
        # spatial joins (SURVEY §2.4)
        "pip_join": _q_pip_join,
        "knn_join": _q_knn_join,
        "knn_cell_join": _q_knn_cell,
        "knn_top3": _q_knn_top3,
        "admin_page_counts": _q_admin_page_counts,
        # text analysis
        "token_stats": _q_token_stats,
        "quality_score": _q_quality_score,
        "langid": _q_langid,
        "fingerprint_md5": _q_fingerprint,
        "ngram_topk": _q_ngram_topk,
        "repetition_stats": _q_repetition_stats,
        "doc_perplexity": _q_doc_perplexity,
        "length_quantiles": _q_length_quantiles,
        "pack_sequences": _q_pack_sequences,
        "shuffle_epoch": _q_shuffle_epoch,
        "mix_weighted": _q_mix_weighted,
        "decontaminate": _q_decontaminate,
        "tfidf_topk": _q_tfidf_topk,
        "corpus_filter_ppl": _q_corpus_filter_ppl,
        "chunk_docs": _q_chunk_docs,
        "redact_pii": _q_redact_pii,
        "clean_lines_c4": _q_clean_lines_c4,
        "c4_pipeline": _q_c4_pipeline,
        "url_dedup": _q_url_dedup,
        "dedup_lines_c4": _q_dedup_lines_c4,
        "dedup_incremental": _q_dedup_incremental,
        "minhash_incremental": _q_minhash_incremental,
        "nb_lang_classify": _q_nb_classify,
        "dup_ngram_spans": _q_dup_ngram_spans,
        "dedup_spans_c4": _q_dedup_spans,
        "semdedup": _q_semdedup,
        "prep_training_data": _q_prep_training_data,
        "pagerank": _q_pagerank,
        "host_pagerank": _q_host_pagerank,
        "host_walks": _q_host_walks,
        "cocitation_hosts": _q_cocitation,
        "label_prop_hosts": _q_host_communities,
        "image_dhash_pairs": _q_image_dhash_pairs,
        "ccnet_tiers": _q_ccnet_tiers,
        "weighted_sample": _q_weighted_sample,
        "kcore_docs": _q_kcore,
        "snapshot_diff": _q_snapshot_diff,
        "audio_fp_pairs": _q_audiofp_pairs,
        "bigram_perplexity": _q_bigram_perplexity,
        "trigram_backoff": _q_backoff_trigram,
        "pagerank_weighted": _q_pagerank_weighted,
        "hits_hosts": _q_hits,
        "topk_ivfpq": _q_topk_ivfpq,
        "topk_ivfpq_refined": _q_topk_ivfpq_refined,
        "triangle_support": _q_triangles,
        "adamic_adar": _q_adamic_adar,
        "hilbert_tiles_z6": _q_hilbert_tiles,
        "nearest_segment_z6": _q_nearest_segment,
        "nearest_segment_cells_z6": _q_nearest_segment_cells,
        "jsonl_identity": _q_jsonl_identity,
        "warc_pages": _q_warc_pages,
        "gopher_rules": _q_gopher_rules,
        "strip_html_wet": _q_strip_html,
        "split_sentences": _q_split_sentences,
        "hybrid_search_rrf": _q_hybrid_search,
        "pmi_collocations": _q_pmi_topk,
        "hash_embed": _q_hash_embed,
        "simplify_paths_z2": _q_simplify_paths,
        "extract_links": _q_extract_links,
        "anchor_topk": _q_anchor_topk,
        "robots_filter": _q_robots_filter,
        "latest_snapshot": _q_latest_snapshot,
        "domain_cap": _q_domain_cap,
        "tile_pyramid": _q_tile_pyramid,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "jaccard_verified_dups": _q_jaccard_verified_dups,
        "minhash_lsh_candidates": _q_minhash_lsh,
        "simhash_signatures": _q_simhash,
        "simhash_near_dups": _q_simhash_near_dups,
        "approx_distinct_texts": _q_approx_distinct,
        "cms_token_est": _q_cms_token_est,
        "distinct_langs": _q_distinct_langs,
        "dup_clusters": _q_dup_clusters,
        "near_dedup": _q_near_dedup,
        "near_dedup_longest": _q_near_dedup_longest,
        "dsir_weights": _q_dsir_weights,
        "dsir_select": _q_dsir_select,
        "path_lengths_z6": _q_path_lengths,
        "geohash_cells": _q_geohash,
        "grid_clusters": _q_grid_clusters,
        "bbox_query_indexed": _q_bbox_query,
        "doc_sample_10pct": _q_doc_sample,
        "corpus_clean": _q_corpus_clean,
        "sample_stratified": _q_sample_stratified,
        "embedding_near_dups": _q_embedding_near_dups,
        "embedding_near_dups_lsh": _q_embedding_near_dups_lsh,
        # similarity search (lexical + embedding)
        "bm25_topk": _q_bm25_topk,
        "bm25_topk_indexed": _q_bm25_topk_indexed,
        "cluster_docs": _q_cluster_docs,
        "ann_topk_bruteforce": _q_ann_bruteforce,
        "ann_topk_lsh": _q_ann_lsh,
        "ann_topk_lsh_mp": _q_ann_lsh_mp,
        "ann_topk_ivf": _q_ann_ivf,
        "ann_topk_ivf_indexed": _q_ann_ivf_indexed,
        "ann_topk_ivf_extended": _q_ann_ivf_extended,
        "pq_codes": _q_pq_codes,
        "topk_pq": _q_topk_pq,
        # relational / streaming-shaped (SURVEY §2.5 analogues)
        "pricing_summary": _q_pricing_summary,
        "orders_by_segment": _q_orders_by_segment,
        "revenue_by_priority": _q_revenue_by_priority,
        "top_orders": _q_top_orders,
        "top_unshipped_orders": _q_top_unshipped,
        "events_window": _q_events_window,
        "events_sessions": _q_events_sessions,
        "events_asof_last_order": _q_events_asof,
        # range (band) join: orders x lineitem on a shipdate interval
        "range_join_shipped_7d": _q_range_join,
        # hopping window rides in queries_extra (50-entry driver budget)
        "events_hopping_window": _q_events_hopping,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB over the same parquet views)
# ---------------------------------------------------------------------------

# text reconstruction: documents.text || ' geo:' || lat || ',' || lon with
# microdegrees formatted as fixed 6-decimal strings (lossless)
def _sql_fmt(us_expr: str) -> str:
    return (
        f"(CASE WHEN {us_expr} < 0 THEN '-' ELSE '' END || "
        f"(abs({us_expr}) // 1000000) || '.' || "
        f"lpad(CAST(abs({us_expr}) % 1000000 AS VARCHAR), 6, '0'))"
    )


_SQL_TEXT = (
    f"(text || ' geo:' || {_sql_fmt(SQL_LAT_US)} || ',' || {_sql_fmt(SQL_LON_US)})"
)
_SQL_LAT = f"({SQL_LAT_US} / 1000000.0)"
_SQL_LON = f"({SQL_LON_US} / 1000000.0)"


def _sql_tile(z: int) -> dict[str, str]:
    n = 1 << z
    fx = f"(({_SQL_LON} + 180.0) / 360.0 * {n})"
    fy = f"((1.0 - ln(tan(radians({_SQL_LAT}) / 2.0 + pi() / 4.0)) / pi()) / 2.0 * {n})"
    return {
        "fx": fx,
        "fy": fy,
        "x": f"CAST(floor({fx}) AS INTEGER)",
        "y": f"CAST(floor({fy}) AS INTEGER)",
    }


def _sql_site_path_ctes(z: int, extent: int = 4096) -> str:
    """CTE bodies (no leading WITH) deriving the deduped site paths —
    ``pts`` (world pixel coords), ``d`` (consecutive-dup flag), ``e``
    (site, doc_id, wx, wy, pt_idx) — shared by the clip oracles and the
    Douglas-Peucker recursive oracle; mirrors
    pipelines/clip_paths._world_points + _site_segments' dedup."""
    t = _sql_tile(z)
    return (
        f"pts AS (SELECT (doc_id % 50) AS site, doc_id, "
        f"CAST({t['x']} AS BIGINT) * {extent} + "
        f"CAST(floor(({t['fx']} - floor({t['fx']})) * {extent}) AS BIGINT) AS wx, "
        f"CAST({t['y']} AS BIGINT) * {extent} + "
        f"CAST(floor(({t['fy']} - floor({t['fy']})) * {extent}) AS BIGINT) AS wy "
        f"FROM documents), "
        f"d AS (SELECT *, CASE WHEN lag(wx) OVER w = wx AND lag(wy) OVER w = wy "
        f"THEN 0 ELSE 1 END AS keep FROM pts "
        f"WINDOW w AS (PARTITION BY site ORDER BY doc_id)), "
        f"e AS (SELECT site, doc_id, wx, wy, "
        f"row_number() OVER (PARTITION BY site ORDER BY doc_id) - 1 AS pt_idx "
        f"FROM d WHERE keep = 1)"
    )


def _sql_clip_ctes(z: int, extent: int = 4096, buffer: int = 64) -> str:
    """Shared CTE chain for the clipped-path oracles: world-coordinate
    site segments cross-joined with ALL tiles at zoom z, clipped with the
    EXACT float expressions of stages/clip.liang_barsky (sentinels, op
    order, floor(v+0.5) rounding) so integer outputs are bit-identical.
    The all-tiles candidate set is a superset of the Ray side's bbox
    fan-out — harmless, since Liang-Barsky rejection decides membership
    in both engines. Ends with CTE ``v`` (surviving clipped segments)."""
    n = 1 << z
    lo = f"{-buffer}.0"
    hi = f"{extent + buffer}.0"
    return (
        f"WITH {_sql_site_path_ctes(z, extent)}, "
        f"segs AS (SELECT site, pt_idx AS seg_idx, wx AS wx0, wy AS wy0, "
        f"lead(wx) OVER w2 AS wx1, lead(wy) OVER w2 AS wy1 "
        f"FROM e WINDOW w2 AS (PARTITION BY site ORDER BY pt_idx) "
        f"QUALIFY lead(wx) OVER w2 IS NOT NULL), "
        f"tiles AS (SELECT tx.range AS x, ty.range AS y "
        f"FROM range(0, {n}) tx, range(0, {n}) ty), "
        f"geom AS (SELECT site, seg_idx, tiles.x, tiles.y, "
        f"CAST(wx0 - tiles.x * {extent} AS DOUBLE) AS x0f, "
        f"CAST(wy0 - tiles.y * {extent} AS DOUBLE) AS y0f, "
        f"CAST(wx1 - wx0 AS DOUBLE) AS dxf, "
        f"CAST(wy1 - wy0 AS DOUBLE) AS dyf FROM segs, tiles), "
        f"tpar AS (SELECT *, "
        f"CASE WHEN dxf > 0 THEN ({lo} - x0f) / dxf "
        f"WHEN dxf < 0 THEN ({hi} - x0f) / dxf ELSE -1e300 END AS te_x, "
        f"CASE WHEN dxf > 0 THEN ({hi} - x0f) / dxf "
        f"WHEN dxf < 0 THEN ({lo} - x0f) / dxf ELSE 1e300 END AS tx_x, "
        f"CASE WHEN dyf > 0 THEN ({lo} - y0f) / dyf "
        f"WHEN dyf < 0 THEN ({hi} - y0f) / dyf ELSE -1e300 END AS te_y, "
        f"CASE WHEN dyf > 0 THEN ({hi} - y0f) / dyf "
        f"WHEN dyf < 0 THEN ({lo} - y0f) / dyf ELSE 1e300 END AS tx_y, "
        f"(dxf = 0 AND (x0f < {lo} OR x0f > {hi})) AS rej_x, "
        f"(dyf = 0 AND (y0f < {lo} OR y0f > {hi})) AS rej_y FROM geom), "
        f"u AS (SELECT *, GREATEST(0.0, te_x, te_y) AS t0, "
        f"LEAST(1.0, tx_x, tx_y) AS t1 FROM tpar), "
        f"v0 AS (SELECT site, seg_idx, x, y, "
        f"CAST(floor(x0f + t0 * dxf + 0.5) AS BIGINT) AS cx0, "
        f"CAST(floor(y0f + t0 * dyf + 0.5) AS BIGINT) AS cy0, "
        f"CAST(floor(x0f + t1 * dxf + 0.5) AS BIGINT) AS cx1, "
        f"CAST(floor(y0f + t1 * dyf + 0.5) AS BIGINT) AS cy1 "
        f"FROM u WHERE NOT rej_x AND NOT rej_y AND t0 < t1), "
        f"v AS (SELECT * FROM v0 WHERE cx0 != cx1 OR cy0 != cy1)"
    )


def _sql_morton(xe: str, ye: str, level: int) -> str:
    """DuckDB bit-interleave of two level-bit ints — mirrors
    vtzero_ray.stages.cells._interleave_bits exactly."""
    terms = []
    for i in range(level):
        terms.append(f"(((CAST({xe} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({ye} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


_SQL_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"
_SQL_NTOK = f"(CASE WHEN trim(text) = '' THEN 0 ELSE length({_SQL_TOKENS}) END)"
_SQL_STOPS = ("len(list_filter(" + _SQL_TOKENS +
              ", x -> x IN ('the', 'and', 'of', 'to', 'a')))")
_SQL_ALPHA = "length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))"

_LANG_MARKER_SQL = {
    "de": "('der', 'die', 'das', 'und', 'ist')",
    "en": "('the', 'and', 'of', 'to', 'a')",
    "fr": "('le', 'la', 'les', 'et', 'est')",
    "es": "('el', 'los', 'las', 'y', 'es')",
    "zh": "('的', '是', '了', '在', '我')",
}


def _sql_lang_hits(lang: str) -> str:
    return (
        "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        f"x -> x IN {_LANG_MARKER_SQL[lang]}))"
    )


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in _all_oracle_sql().items()
            if k not in _EXTRA_QUERIES}


def oracle_sql_extra() -> dict[str, str]:
    return {k: v for k, v in _all_oracle_sql().items() if k in _EXTRA_QUERIES}


def _all_oracle_sql() -> dict[str, str]:
    from vtzero_ray.functions.ann import cluster_sizes_sql
    from vtzero_ray.functions.profile import \
        check_constraints_sql as constraints_oracle_sql
    from vtzero_ray.functions.profile import profile_sql as profile_oracle_sql
    from vtzero_ray.pipelines.relational import \
        events_funnel_sql as funnel_oracle_sql
    from vtzero_ray.functions.webclean import \
        strip_boilerplate_sql as strip_boilerplate_oracle_sql
    from vtzero_ray.functions.pca import \
        embedding_moments_sql as pca_moments_oracle_sql
    from vtzero_ray.pipelines.relational import \
        crosstab_sql as crosstab_oracle_sql
    from vtzero_ray.functions.setjoin import \
        set_join_exact_sql as setjoin_oracle_sql
    from vtzero_ray.functions.pq import pq_codes_sql as pq_codes_oracle_sql
    from vtzero_ray.functions.pq import topk_pq_sql as topk_pq_oracle_sql
    from vtzero_ray.functions.ann import topk_ivf_sql as ann_ivf_sql
    from vtzero_ray.functions.ann import topk_lsh_sql as ann_lsh_sql
    from vtzero_ray.functions.dedup import \
        embedding_near_dups_lsh_sql as near_dups_lsh_sql
    from vtzero_ray.functions.pack import \
        pack_sequences_sql as pack_oracle_sql
    from vtzero_ray.functions.pack import \
        shuffle_epoch_sql as shuffle_oracle_sql
    from vtzero_ray.functions.pack import chunk_docs_sql, mix_weighted_sql
    from vtzero_ray.functions.decontam import decontaminate_sql
    from vtzero_ray.functions.textstats import \
        redact_pii_sql as redact_oracle_sql
    from vtzero_ray.functions.dedup_index import (dedup_incremental_sql,
                                                  minhash_incremental_sql)
    from vtzero_ray.functions.classify import \
        nb_classify_sql as nb_classify_oracle_sql
    from vtzero_ray.functions.webclean import \
        dup_span_stats_sql as dup_span_oracle_sql
    from vtzero_ray.functions.webclean import \
        dedup_spans_sql as dedup_spans_oracle_sql
    from vtzero_ray.functions.ann import \
        semdedup_sql as semdedup_oracle_sql
    from vtzero_ray.pipelines.corpus import \
        prep_training_data_sql as prep_training_oracle_sql
    from vtzero_ray.functions.graph import \
        pagerank_sql as pagerank_oracle_sql
    from vtzero_ray.functions.graph import \
        host_pagerank_sql as host_pagerank_oracle_sql
    from vtzero_ray.functions.graph import \
        ppr_sql_over as ppr_oracle_sql_over
    from vtzero_ray.functions.graph import \
        _host_edges_sql as host_edges_oracle_sql
    from vtzero_ray.functions.graph import \
        host_walks_sql as host_walks_oracle_sql
    from vtzero_ray.functions.graph import \
        host_cocitation_sql as host_cocitation_oracle_sql
    from vtzero_ray.functions.graph import \
        host_communities_sql as host_communities_oracle_sql
    from vtzero_ray.functions.imagehash import \
        dhash_pairs_sql as dhash_pairs_oracle_sql
    from vtzero_ray.functions.imagehash import \
        audiofp_pairs_sql as audiofp_pairs_oracle_sql
    from vtzero_ray.functions.lm import \
        bigram_perplexity_sql as bigram_oracle_sql
    from vtzero_ray.functions.lm import \
        backoff_trigram_sql as backoff_oracle_sql
    from vtzero_ray.functions.lm import \
        ccnet_tiers_sql as ccnet_oracle_sql
    from vtzero_ray.functions.pack import \
        weighted_sample_sql as weighted_sample_oracle_sql
    from vtzero_ray.functions.graph import \
        kcore_sql as kcore_oracle_sql
    from vtzero_ray.functions.crawl import \
        snapshot_diff_sql as snapshot_diff_oracle_sql
    from vtzero_ray.functions.graph import \
        pagerank_weighted_sql as pagerank_weighted_oracle_sql
    from vtzero_ray.functions.graph import \
        host_hits_sql as host_hits_oracle_sql
    from vtzero_ray.functions.ivfpq import (
        topk_ivfpq_refined_sql as ivfpq_refined_oracle_sql,
        topk_ivfpq_sql as ivfpq_oracle_sql)
    from vtzero_ray.functions.graph import \
        adamic_adar_sql as aa_oracle_sql
    from vtzero_ray.functions.graph import \
        triangles_sql as triangles_oracle_sql
    from vtzero_ray.functions.geo import \
        hilbert_sql as hilbert_oracle_sql
    from vtzero_ray.functions.geo import \
        nearest_segment_sql as nearest_segment_oracle_sql
    from vtzero_ray.functions.textstats import \
        gopher_rules_sql as gopher_oracle_sql
    from vtzero_ray.functions.webclean import \
        strip_html_sql as strip_html_oracle_sql
    from vtzero_ray.functions.textstats import \
        split_sentences_sql as split_sentences_oracle_sql
    from vtzero_ray.functions.webclean import \
        synth_multiline_sql_expr as _synth_multiline_expr
    from vtzero_ray.functions.search import \
        hybrid_sql as hybrid_oracle_sql
    from vtzero_ray.functions.textstats import \
        pmi_topk_sql as pmi_oracle_sql
    from vtzero_ray.functions.textstats import LANG_MARKERS as _LM
    _EN_MARKERS = _LM["en"]
    from vtzero_ray.functions.webclean import \
        canonical_url_dedup_sql as url_dedup_oracle_sql
    from vtzero_ray.functions.webclean import \
        clean_lines_sql as clean_lines_oracle_sql
    from vtzero_ray.functions.webclean import \
        c4_pipeline_sql as c4_pipeline_oracle_sql
    from vtzero_ray.functions.webclean import \
        dedup_lines_sql as dedup_lines_oracle_sql
    from vtzero_ray.functions.textstats import repetition_sql
    from vtzero_ray.functions.lm import (doc_perplexity_sql,
                                         filter_by_perplexity_sql,
                                         tfidf_topk_sql)
    from vtzero_ray.functions.search import bm25_sql as bm25_oracle_sql
    from vtzero_ray.functions.dedup_sql import (dup_clusters_sql,
                                                jaccard_verified_sql,
                                                minhash_candidates_sql,
                                                near_dedup_longest_sql,
                                                near_dedup_sql,
                                                simhash_near_dups_sql,
                                                simhash_sql)
    from vtzero_ray.functions.sketch_sql import cms_est_sql, hll_facts_sql
    from vtzero_ray.functions.embed import hash_embed_sql
    from vtzero_ray.functions.dsir import dsir_select_sql, dsir_weights_sql
    from vtzero_ray.functions.geo import (bbox_query_sql, geohash_sql,
                                          grid_clusters_sql,
                                          path_lengths_sql)
    from vtzero_ray.functions.simplify import dp_oracle_sql
    from vtzero_ray.functions.crawl import (anchor_topk_sql,
                                            domain_cap_sql,
                                            extract_links_sql,
                                            latest_snapshot_sql,
                                            linked_html_sql_expr,
                                            robots_filter_sql,
                                            snapshots_sql_cte,
                                            synth_robots_rules)
    from vtzero_ray.stages.joins import SQL_ADMIN, SQL_POI

    t2 = _sql_tile(2)
    t6 = _sql_tile(6)
    t12 = _sql_tile(12)
    hits = {l: _sql_lang_hits(l) for l in ("de", "en", "es", "fr", "zh")}
    lang_pred = (
        f"(CASE WHEN {hits['de']} >= greatest({hits['en']}, {hits['es']}, {hits['fr']}, {hits['zh']}) THEN 'de' "
        f"WHEN {hits['en']} >= greatest({hits['es']}, {hits['fr']}, {hits['zh']}) THEN 'en' "
        f"WHEN {hits['es']} >= greatest({hits['fr']}, {hits['zh']}) THEN 'es' "
        f"WHEN {hits['fr']} >= {hits['zh']} THEN 'fr' ELSE 'zh' END)"
    )
    q_ratio = f"round({_SQL_STOPS} / greatest({_SQL_NTOK}, 1)::DOUBLE, 9)"
    q_mtok = (
        f"round((length(text) - greatest({_SQL_NTOK} - 1, 0)) / greatest({_SQL_NTOK}, 1)::DOUBLE, 9)"
    )
    q_alpha = f"round({_SQL_ALPHA} / greatest(length(text), 1)::DOUBLE, 9)"
    q_score = (
        f"round(0.4 * (CASE WHEN {q_ratio} >= 0.01 AND {q_ratio} <= 0.6 THEN 1.0 ELSE 0.0 END) "
        f"+ 0.3 * (CASE WHEN {q_mtok} >= 3.0 AND {q_mtok} <= 10.0 THEN 1.0 ELSE 0.0 END) "
        f"+ 0.3 * (CASE WHEN {q_alpha} >= 0.7 THEN 1.0 ELSE 0.0 END), 9)"
    )
    pages_cte = (
        f"(SELECT {SQL_URL} AS url, {SQL_LAT_US} AS lat_us, {SQL_LON_US} AS lon_us FROM documents)"
    )
    out = {
        "pages_text_identity": f"SELECT {SQL_URL} AS url, {_SQL_TEXT} AS text FROM documents",
        "geoparse": f"SELECT {SQL_URL} AS url, {_SQL_LAT} AS lat, {_SQL_LON} AS lon FROM documents",
        "tile_assignment_z6": (
            f"SELECT 6 AS z, {t6['x']} AS x, {t6['y']} AS y, COUNT(*) AS n_pages "
            f"FROM documents GROUP BY 1, 2, 3"
        ),
        # hilbert_tiles_z6: same tile aggregate, rotation walk unrolled
        "hilbert_tiles_z6": hilbert_oracle_sql(
            f"SELECT {t6['x']} AS x, {t6['y']} AS y, "
            "COUNT(*) AS n_pages FROM documents GROUP BY 1, 2", 6),
        # nearest_segment_z6: same site-path CTEs, same d2 CASE, QUALIFY
        "nearest_segment_z6": nearest_segment_oracle_sql(
            _sql_site_path_ctes(6)),
        # nearest_segment_cells_z6: byte-identical scale path, same twin
        "nearest_segment_cells_z6": nearest_segment_oracle_sql(
            _sql_site_path_ctes(6)),
        "tile_assignment_z12": (
            f"SELECT 12 AS z, {t12['x']} AS x, {t12['y']} AS y, COUNT(*) AS n_pages "
            f"FROM documents GROUP BY 1, 2, 3"
        ),
        # level-12 quadtree cell = morton(x12, y12); level-6 parent = tag 6
        # + morton >> 12 (2 bits per level) — mirrors cells.cell_parent
        "cell_page_counts": (
            f"SELECT ((CAST(6 AS BIGINT) << 58) | "
            f"({_sql_morton(t12['x'], t12['y'], 12)} >> 12)) AS cell_l6, "
            f"COUNT(*) AS n_pages FROM documents GROUP BY 1"
        ),
        "tile_pixel_coords": (
            f"SELECT {SQL_URL} AS url, {t6['x']} AS x, {t6['y']} AS y, "
            f"CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) AS px, "
            f"CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) AS py "
            f"FROM documents"
        ),
        "lang_page_counts": "SELECT lang, COUNT(*) AS n_pages FROM documents GROUP BY 1",
        # tiles_encoded: the BYTES aren't SQL-expressible, but the per-tile
        # feature counts are and every tile must validate clean (check 0)
        "tiles_encoded": (
            f"SELECT 6 AS z, {t6['x']} AS x, {t6['y']} AS y, "
            f"COUNT(*) AS n_features, CAST(0 AS TINYINT) AS check_code "
            f"FROM documents GROUP BY 1, 2, 3"
        ),
        # overzoom: child pixel = 2·(z6 pixel) split on the extent boundary;
        # scale AFTER the z6 floor (lossy overzoom, NOT a direct z7 encode)
        "overzoom_z7": (
            f"WITH q AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
            f"CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) AS px6, "
            f"CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) AS py6 "
            f"FROM documents) "
            f"SELECT 7 AS z, 2 * x6 + (2 * px6 // 4096) AS x, "
            f"2 * y6 + (2 * py6 // 4096) AS y, COUNT(*) AS n_features, "
            f"CAST(SUM(2 * px6 - (2 * px6 // 4096) * 4096) AS BIGINT) AS sum_px, "
            f"CAST(SUM(2 * py6 - (2 * py6 // 4096) * 4096) AS BIGINT) AS sum_py, "
            f"CAST(0 AS TINYINT) AS check_code "
            f"FROM q GROUP BY 1, 2, 3"
        ),
        # path overzoom: re-index decoded segments as idx2 = k + p (one
        # gap per part boundary), double, fan out to all 4 children
        # (superset — the clip rejects non-members), re-clip with the
        # SAME liang-barsky expressions, re-chain parts per child
        "overzoom_paths_z3": (
            _sql_clip_ctes(2)
            + ", np1 AS (SELECT *, CASE WHEN lag(seg_idx) OVER pw IS NULL "
            "OR lag(seg_idx) OVER pw != seg_idx - 1 "
            "OR lag(cx1) OVER pw != cx0 OR lag(cy1) OVER pw != cy0 "
            "THEN 1 ELSE 0 END AS new_part FROM v "
            "WINDOW pw AS (PARTITION BY x, y, site ORDER BY seg_idx)), "
            "ren AS (SELECT x, y, site, cx0, cy0, cx1, cy1, "
            "(row_number() OVER pw) - 1 + (SUM(new_part) OVER pw) - 1 AS idx2 "
            "FROM np1 WINDOW pw AS (PARTITION BY x, y, site ORDER BY seg_idx)), "
            "kids AS (SELECT site, idx2, 2 * x + cdx.range AS x3, "
            "2 * y + cdy.range AS y3, "
            "CAST(2 * cx0 - cdx.range * 4096 AS DOUBLE) AS x0f, "
            "CAST(2 * cy0 - cdy.range * 4096 AS DOUBLE) AS y0f, "
            "CAST(2 * cx1 - 2 * cx0 AS DOUBLE) AS dxf, "
            "CAST(2 * cy1 - 2 * cy0 AS DOUBLE) AS dyf "
            "FROM ren, range(0, 2) cdx, range(0, 2) cdy), "
            "tp2 AS (SELECT *, "
            "CASE WHEN dxf > 0 THEN (-64.0 - x0f) / dxf "
            "WHEN dxf < 0 THEN (4160.0 - x0f) / dxf ELSE -1e300 END AS te_x, "
            "CASE WHEN dxf > 0 THEN (4160.0 - x0f) / dxf "
            "WHEN dxf < 0 THEN (-64.0 - x0f) / dxf ELSE 1e300 END AS tx_x, "
            "CASE WHEN dyf > 0 THEN (-64.0 - y0f) / dyf "
            "WHEN dyf < 0 THEN (4160.0 - y0f) / dyf ELSE -1e300 END AS te_y, "
            "CASE WHEN dyf > 0 THEN (4160.0 - y0f) / dyf "
            "WHEN dyf < 0 THEN (-64.0 - y0f) / dyf ELSE 1e300 END AS tx_y, "
            "(dxf = 0 AND (x0f < -64.0 OR x0f > 4160.0)) AS rej_x, "
            "(dyf = 0 AND (y0f < -64.0 OR y0f > 4160.0)) AS rej_y FROM kids), "
            "u2 AS (SELECT *, GREATEST(0.0, te_x, te_y) AS t0, "
            "LEAST(1.0, tx_x, tx_y) AS t1 FROM tp2), "
            "w0 AS (SELECT site, idx2, x3, y3, "
            "CAST(floor(x0f + t0 * dxf + 0.5) AS BIGINT) AS cx0, "
            "CAST(floor(y0f + t0 * dyf + 0.5) AS BIGINT) AS cy0, "
            "CAST(floor(x0f + t1 * dxf + 0.5) AS BIGINT) AS cx1, "
            "CAST(floor(y0f + t1 * dyf + 0.5) AS BIGINT) AS cy1 "
            "FROM u2 WHERE NOT rej_x AND NOT rej_y AND t0 < t1), "
            "w AS (SELECT * FROM w0 WHERE cx0 != cx1 OR cy0 != cy1), "
            "np2 AS (SELECT *, CASE WHEN lag(idx2) OVER pw2 IS NULL "
            "OR lag(idx2) OVER pw2 != idx2 - 1 "
            "OR lag(cx1) OVER pw2 != cx0 OR lag(cy1) OVER pw2 != cy0 "
            "THEN 1 ELSE 0 END AS new_part FROM w "
            "WINDOW pw2 AS (PARTITION BY x3, y3, site ORDER BY idx2)) "
            "SELECT 3 AS z, CAST(x3 AS INTEGER) AS x, "
            "CAST(y3 AS INTEGER) AS y, site, "
            "CAST(SUM(new_part) AS BIGINT) AS n_parts, "
            "CAST(COUNT(*) + SUM(new_part) AS BIGINT) AS n_points "
            "FROM np2 GROUP BY 1, 2, 3, 4"
        ),
        # polygon overzoom: 256-px cell squares double to 512 px, so each
        # lands wholly in ONE child (512 | 4096) — closed-form assignment;
        # first ring point survives a no-op Sutherland-Hodgman pass
        "overzoom_cells_z7": (
            f"WITH cells AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
            f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS r, "
            f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS c, "
            f"COUNT(*) AS n FROM documents GROUP BY 1, 2, 3, 4) "
            f"SELECT 7 AS z, 2 * x6 + (c // 8) AS x, 2 * y6 + (r // 8) AS y, "
            f"COUNT(*) AS n_features, "
            f"CAST(SUM(r * 16 + c) AS BIGINT) AS sum_fid, "
            f"CAST(SUM(512 * (c % 8)) AS BIGINT) AS sum_x0, "
            f"CAST(SUM(512 * (r % 8)) AS BIGINT) AS sum_y0, "
            f"CAST(COUNT(*) * 524288 AS BIGINT) AS sum_area2, "
            f"CAST(SUM(n) AS BIGINT) AS sum_points, "
            f"CAST(COUNT(*) AS BIGINT) AS sum_rings "
            f"FROM cells WHERE n >= 1 GROUP BY 1, 2, 3"
        ),
        # holed overzoom: the doubled 512-px outer AND its doubled
        # 256-px inset hole land wholly in one child — net area2 =
        # 2·512² − 2·256² = 393216, two rings per feature
        "overzoom_holed_z7": (
            f"WITH cells AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
            f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS r, "
            f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS c, "
            f"COUNT(*) AS n FROM documents GROUP BY 1, 2, 3, 4) "
            f"SELECT 7 AS z, 2 * x6 + (c // 8) AS x, 2 * y6 + (r // 8) AS y, "
            f"COUNT(*) AS n_features, "
            f"CAST(SUM(r * 16 + c) AS BIGINT) AS sum_fid, "
            f"CAST(SUM(512 * (c % 8)) AS BIGINT) AS sum_x0, "
            f"CAST(SUM(512 * (r % 8)) AS BIGINT) AS sum_y0, "
            f"CAST(COUNT(*) * 393216 AS BIGINT) AS sum_area2, "
            f"CAST(SUM(n) AS BIGINT) AS sum_points, "
            f"CAST(COUNT(*) * 2 AS BIGINT) AS sum_rings "
            f"FROM cells WHERE n >= 1 GROUP BY 1, 2, 3"
        ),
        # holed downzoom: outer halves to 128 px, hole to 64 px (all
        # corner coords stay even) — net area2 = 2·128² − 2·64² = 24576
        "downzoom_holed_z5": (
            f"WITH cells AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
            f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS r, "
            f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS c, "
            f"COUNT(*) AS n FROM documents GROUP BY 1, 2, 3, 4) "
            f"SELECT 5 AS z, x6 // 2 AS x, y6 // 2 AS y, "
            f"COUNT(*) AS n_features, "
            f"CAST(SUM(r * 16 + c) AS BIGINT) AS sum_fid, "
            f"CAST(SUM(2048 * (x6 % 2) + 128 * c) AS BIGINT) AS sum_x0, "
            f"CAST(SUM(2048 * (y6 % 2) + 128 * r) AS BIGINT) AS sum_y0, "
            f"CAST(COUNT(*) * 24576 AS BIGINT) AS sum_area2, "
            f"CAST(SUM(n) AS BIGINT) AS sum_points, "
            f"CAST(COUNT(*) * 2 AS BIGINT) AS sum_rings "
            f"FROM cells GROUP BY 1, 2, 3"
        ),
        # ordered funnel: same prefilter, same (ts, event_id) sequence
        # order, same strict first-occurrence-after chain
        "events_funnel": funnel_oracle_sql(),
        # per-host boilerplate: df = DISTINCT docs per (host, line)
        "strip_boilerplate": strip_boilerplate_oracle_sql(),
        # PCA moments: pairwise self-join over the quantized grid
        "pca_moments": pca_moments_oracle_sql(),
        # contingency pivot: conditional sums over the pinned domain
        "crosstab_lang_source": crosstab_oracle_sql(
            "documents", "lang", "source",
            [f"src{i}" for i in range(20)]),
        # Deequ/TFDV profiling + contract checks (exact twins from the
        # same rule literals)
        "profile_documents": profile_oracle_sql("documents", _PROFILE_COLS),
        "validate_documents": constraints_oracle_sql("documents",
                                                     _DOC_RULES),
        # pyramid store: three levels, each the iterated halving of the
        # finer one (px_l-1 = ((x_l mod 2)·4096 + px_l) // 2)
        "pyramid_store_z4": (
            f"WITH q6 AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
            f"CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) AS px6, "
            f"CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) AS py6 "
            f"FROM documents), "
            f"q5 AS (SELECT x6 // 2 AS x5, y6 // 2 AS y5, "
            f"((x6 % 2) * 4096 + px6) // 2 AS px5, "
            f"((y6 % 2) * 4096 + py6) // 2 AS py5, * FROM q6), "
            f"q4 AS (SELECT x5 // 2 AS x4, y5 // 2 AS y4, "
            f"((x5 % 2) * 4096 + px5) // 2 AS px4, "
            f"((y5 % 2) * 4096 + py5) // 2 AS py4, * FROM q5) "
            f"SELECT 6 AS z, x6 AS x, y6 AS y, COUNT(*) AS n_features, "
            f"CAST(SUM(px6) AS BIGINT) AS sum_px, "
            f"CAST(SUM(py6) AS BIGINT) AS sum_py, "
            f"CAST(0 AS TINYINT) AS check_code FROM q4 GROUP BY 2, 3 "
            f"UNION ALL "
            f"SELECT 5 AS z, x5 AS x, y5 AS y, COUNT(*) AS n_features, "
            f"CAST(SUM(px5) AS BIGINT) AS sum_px, "
            f"CAST(SUM(py5) AS BIGINT) AS sum_py, "
            f"CAST(0 AS TINYINT) AS check_code FROM q4 GROUP BY 2, 3 "
            f"UNION ALL "
            f"SELECT 4 AS z, x4 AS x, y4 AS y, COUNT(*) AS n_features, "
            f"CAST(SUM(px4) AS BIGINT) AS sum_px, "
            f"CAST(SUM(py4) AS BIGINT) AS sum_py, "
            f"CAST(0 AS TINYINT) AS check_code FROM q4 GROUP BY 2, 3"
        ),
        # path downzoom: halve AFTER the z2 clip (floor over doubles —
        # DuckDB // truncates and buffer coords are negative), drop
        # collapsed segments, count (child, part) pieces per parent
        "downzoom_paths_z1": (
            _sql_clip_ctes(2)
            + ", np1 AS (SELECT *, CASE WHEN lag(seg_idx) OVER pw IS NULL "
            "OR lag(seg_idx) OVER pw != seg_idx - 1 "
            "OR lag(cx1) OVER pw != cx0 OR lag(cy1) OVER pw != cy0 "
            "THEN 1 ELSE 0 END AS new_part FROM v "
            "WINDOW pw AS (PARTITION BY x, y, site ORDER BY seg_idx)), "
            "ren AS (SELECT x, y, site, cx0, cy0, cx1, cy1, "
            "(SUM(new_part) OVER pw) - 1 AS p FROM np1 "
            "WINDOW pw AS (PARTITION BY x, y, site ORDER BY seg_idx)), "
            "hv AS (SELECT x // 2 AS px, y // 2 AS py, site, "
            "(y % 2) * 2 + (x % 2) AS child, p, "
            "CAST(floor(((x % 2) * 4096 + cx0) / 2.0) AS BIGINT) AS hx0, "
            "CAST(floor(((y % 2) * 4096 + cy0) / 2.0) AS BIGINT) AS hy0, "
            "CAST(floor(((x % 2) * 4096 + cx1) / 2.0) AS BIGINT) AS hx1, "
            "CAST(floor(((y % 2) * 4096 + cy1) / 2.0) AS BIGINT) AS hy1 "
            "FROM ren), "
            "sv AS (SELECT * FROM hv "
            "WHERE NOT (hx0 = hx1 AND hy0 = hy1)), "
            "pp AS (SELECT px, py, site, child, p, COUNT(*) AS m "
            "FROM sv GROUP BY 1, 2, 3, 4, 5) "
            "SELECT 1 AS z, CAST(px AS INTEGER) AS x, "
            "CAST(py AS INTEGER) AS y, site, "
            "CAST(COUNT(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(m) + COUNT(*) AS BIGINT) AS n_points "
            "FROM pp GROUP BY 1, 2, 3, 4"
        ),
        # polygon downzoom: 256-px cells halve to 128-px squares in the
        # parent (never degenerate), sibling offset folds into x0
        "downzoom_cells_z5": (
            f"WITH cells AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
            f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS r, "
            f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS c, "
            f"COUNT(*) AS n FROM documents GROUP BY 1, 2, 3, 4) "
            f"SELECT 5 AS z, x6 // 2 AS x, y6 // 2 AS y, "
            f"COUNT(*) AS n_features, "
            f"CAST(SUM(r * 16 + c) AS BIGINT) AS sum_fid, "
            f"CAST(SUM(2048 * (x6 % 2) + 128 * c) AS BIGINT) AS sum_x0, "
            f"CAST(SUM(2048 * (y6 % 2) + 128 * r) AS BIGINT) AS sum_y0, "
            f"CAST(COUNT(*) * 32768 AS BIGINT) AS sum_area2, "
            f"CAST(SUM(n) AS BIGINT) AS sum_points, "
            f"CAST(COUNT(*) AS BIGINT) AS sum_rings "
            f"FROM cells GROUP BY 1, 2, 3"
        ),
        # downzoom: parent pixel = halved child pixel with the sibling
        # offset folded in — the exact integer inverse of overzoom
        "downzoom_z5": (
            f"WITH q AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
            f"CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) AS px6, "
            f"CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) AS py6 "
            f"FROM documents) "
            f"SELECT 5 AS z, x6 // 2 AS x, y6 // 2 AS y, "
            f"COUNT(*) AS n_features, "
            f"CAST(SUM(((x6 % 2) * 4096 + px6) // 2) AS BIGINT) AS sum_px, "
            f"CAST(SUM(((y6 % 2) * 4096 + py6) // 2) AS BIGINT) AS sum_py, "
            f"CAST(0 AS TINYINT) AS check_code "
            f"FROM q GROUP BY 1, 2, 3"
        ),
        # -- decode / stats / filter parity -----------------------------------
        "tile_stats_z6": (
            # geometry bytes per feature: 0x09 + varint(zigzag(px)) + varint(zigzag(py));
            # zigzag(p) = 2p for p >= 0 → 1 byte iff p < 64 (extent 4096 → max 2 bytes)
            f"SELECT 6 AS z, {t6['x']} AS x, {t6['y']} AS y, 'pages' AS layer, "
            f"COUNT(*) AS n_features, "
            # CAST the SUM: bare DuckDB SUM is HUGEINT -> float64 in pandas,
            # which hash-mismatches the Ray side's int64 in the driver compare.
            f"CAST(SUM(1 + (CASE WHEN CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) < 64 THEN 1 ELSE 2 END)"
            f"  + (CASE WHEN CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) < 64 THEN 1 ELSE 2 END)) AS BIGINT) AS geom_bytes, "
            f"2 AS n_keys, COUNT(*) + COUNT(DISTINCT lang) AS n_values "
            f"FROM documents GROUP BY 2, 3"
        ),
        "decoded_features_z6": (
            f"SELECT 6 AS z, {t6['x']} AS x, {t6['y']} AS y, 'pages' AS layer, "
            f"doc_id AS feature_id, 1 AS geom_type, 2 AS n_props FROM documents"
        ),
        "filter_lang_en_z6": (
            f"SELECT 6 AS z, {t6['x']} AS x, {t6['y']} AS y, COUNT(*) AS n_features "
            f"FROM documents WHERE lang = 'en' GROUP BY 1, 2, 3"
        ),
        "rasterize_z6": (
            f"SELECT 6 AS z, {t6['x']} AS x, {t6['y']} AS y, "
            f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS cell_row, "
            f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS cell_col, "
            f"COUNT(*) AS n_points FROM documents GROUP BY 1, 2, 3, 4, 5"
        ),
        "raster_to_vector_z6": (
            f"WITH cells AS (SELECT {t6['x']} AS x, {t6['y']} AS y, "
            f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS r, "
            f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS c, "
            f"COUNT(*) AS n FROM documents GROUP BY 1, 2, 3, 4) "
            f"SELECT 6 AS z, x, y, COUNT(*) AS n_cells FROM cells WHERE n >= 2 GROUP BY 1, 2, 3"
        ),
        "site_paths_z2": (
            f"WITH pts AS (SELECT (doc_id % 50) AS site, doc_id, "
            f"{t2['x']} AS x, {t2['y']} AS y, "
            f"CAST(floor(({t2['fx']} - floor({t2['fx']})) * 4096) AS INTEGER) AS px, "
            f"CAST(floor(({t2['fy']} - floor({t2['fy']})) * 4096) AS INTEGER) AS py "
            f"FROM documents), "
            f"d AS (SELECT *, CASE WHEN lag(px) OVER w = px AND lag(py) OVER w = py "
            f"THEN 0 ELSE 1 END AS keep FROM pts "
            f"WINDOW w AS (PARTITION BY site, x, y ORDER BY doc_id)), "
            f"c AS (SELECT site, x, y, SUM(keep) AS npts FROM d GROUP BY 1, 2, 3) "
            f"SELECT 2 AS z, x, y, COUNT(*) AS n_features FROM c WHERE npts >= 2 "
            f"GROUP BY 1, 2, 3"
        ),
        "clipped_segments_z2": (
            _sql_clip_ctes(2)
            + " SELECT 2 AS z, CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y, "
            "site, seg_idx, cx0, cy0, cx1, cy1 FROM v"
        ),
        "clipped_paths_z2": (
            _sql_clip_ctes(2)
            + ", parts AS (SELECT *, CASE WHEN lag(seg_idx) OVER pw IS NULL "
            "OR lag(seg_idx) OVER pw != seg_idx - 1 "
            "OR lag(cx1) OVER pw != cx0 OR lag(cy1) OVER pw != cy0 "
            "THEN 1 ELSE 0 END AS new_part FROM v "
            "WINDOW pw AS (PARTITION BY x, y, site ORDER BY seg_idx)) "
            "SELECT 2 AS z, CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y, "
            "site, CAST(SUM(new_part) AS BIGINT) AS n_parts, "
            "CAST(COUNT(*) + SUM(new_part) AS BIGINT) AS n_points "
            "FROM parts GROUP BY 1, 2, 3, 4"
        ),
        "combined_layers_z2": (
            f"WITH pages AS (SELECT 2 AS z, {t2['x']} AS x, {t2['y']} AS y, "
            f"'pages' AS layer, COUNT(*) AS n_features FROM documents GROUP BY 1, 2, 3), "
            f"pts AS (SELECT (doc_id % 50) AS site, doc_id, "
            f"{t2['x']} AS x, {t2['y']} AS y, "
            f"CAST(floor(({t2['fx']} - floor({t2['fx']})) * 4096) AS INTEGER) AS px, "
            f"CAST(floor(({t2['fy']} - floor({t2['fy']})) * 4096) AS INTEGER) AS py "
            f"FROM documents), "
            f"d AS (SELECT *, CASE WHEN lag(px) OVER w = px AND lag(py) OVER w = py "
            f"THEN 0 ELSE 1 END AS keep FROM pts "
            f"WINDOW w AS (PARTITION BY site, x, y ORDER BY doc_id)), "
            f"c AS (SELECT site, x, y, SUM(keep) AS npts FROM d GROUP BY 1, 2, 3), "
            f"paths AS (SELECT 2 AS z, x, y, 'site_paths' AS layer, COUNT(*) AS n_features "
            f"FROM c WHERE npts >= 2 GROUP BY 1, 2, 3) "
            f"SELECT * FROM pages UNION ALL SELECT * FROM paths"
        ),
        "multilayer_tiles_z6": (
            f"WITH pages AS (SELECT 6 AS z, {t6['x']} AS x, {t6['y']} AS y, "
            f"'pages' AS layer, COUNT(*) AS n_features FROM documents GROUP BY 1, 2, 3), "
            f"pts AS (SELECT (doc_id % 50) AS site, doc_id, "
            f"{t6['x']} AS x, {t6['y']} AS y, "
            f"CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) AS px, "
            f"CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) AS py "
            f"FROM documents), "
            f"d AS (SELECT *, CASE WHEN lag(px) OVER w = px AND lag(py) OVER w = py "
            f"THEN 0 ELSE 1 END AS keep FROM pts "
            f"WINDOW w AS (PARTITION BY site, x, y ORDER BY doc_id)), "
            f"c AS (SELECT site, x, y, SUM(keep) AS npts FROM d GROUP BY 1, 2, 3), "
            f"paths AS (SELECT 6 AS z, x, y, 'site_paths' AS layer, COUNT(*) AS n_features "
            f"FROM c WHERE npts >= 2 GROUP BY 1, 2, 3), "
            f"cells AS (SELECT x, y, "
            f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS r, "
            f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS c2, "
            f"COUNT(*) AS n FROM pts GROUP BY 1, 2, 3, 4), "
            f"hot AS (SELECT 6 AS z, x, y, 'hotcells' AS layer, COUNT(*) AS n_features "
            f"FROM cells WHERE n >= 2 GROUP BY 1, 2, 3) "
            f"SELECT * FROM pages UNION ALL SELECT * FROM paths "
            f"UNION ALL SELECT * FROM hot"
        ),
        # media_features: the synthetic corpus metadata is pure integer
        # arithmetic over media_id — SQL-reproducible even though the
        # payload decode itself is stubbed
        # media_features: the BMP pixel formula (id*7 + x*13 + y*31 + c*97)
        # % 256 re-derived per pixel — verifies the REAL numpy BMP decode
        "media_features": (
            "WITH m AS (SELECT range AS id, 8 + (range * 37) % 25 AS w, "
            "8 + (range * 53) % 25 AS h FROM range(128)), "
            "px AS (SELECT m.id, m.w, m.h, x.range AS x, y.range AS y "
            "FROM m, range(32) x, range(32) y "
            "WHERE x.range < m.w AND y.range < m.h) "
            "SELECT id AS media_id, CAST(w AS INTEGER) AS width, "
            "CAST(h AS INTEGER) AS height, "
            "CAST(SUM((id * 7 + x * 13 + y * 31) % 256) AS BIGINT) AS sum_r, "
            "CAST(SUM((id * 7 + x * 13 + y * 31 + 97) % 256) AS BIGINT) AS sum_g, "
            "CAST(SUM((id * 7 + x * 13 + y * 31 + 194) % 256) AS BIGINT) AS sum_b "
            "FROM px GROUP BY 1, 2, 3"
        ),
        # media_features_png: same pixel formula, PNG dims; the Ray side
        # decodes REAL PNGs (filter type media_id % 5 — every defilter
        # branch) through the pure-NumPy+zlib codec
        "media_features_png": (
            "WITH m AS (SELECT range AS id, 8 + (range * 41) % 25 AS w, "
            "8 + (range * 29) % 25 AS h FROM range(128)), "
            "px AS (SELECT m.id, m.w, m.h, x.range AS x, y.range AS y "
            "FROM m, range(32) x, range(32) y "
            "WHERE x.range < m.w AND y.range < m.h) "
            "SELECT id AS media_id, CAST(w AS INTEGER) AS width, "
            "CAST(h AS INTEGER) AS height, "
            "CAST(SUM((id * 7 + x * 13 + y * 31) % 256) AS BIGINT) AS sum_r, "
            "CAST(SUM((id * 7 + x * 13 + y * 31 + 97) % 256) AS BIGINT) AS sum_g, "
            "CAST(SUM((id * 7 + x * 13 + y * 31 + 194) % 256) AS BIGINT) AS sum_b "
            "FROM px GROUP BY 1, 2, 3"
        ),
        # media_features_jpeg: grayscale flat-block corpus — value
        # constant per 8x8 block, quality 100, so the LOSSY codec is
        # exact and the block formula re-derives every decoded pixel;
        # gray expands to 3 identical channels (sum_r = sum_g = sum_b)
        "media_features_jpeg": (
            "WITH m AS (SELECT range AS id, 8 + (range * 43) % 25 AS w, "
            "8 + (range * 23) % 25 AS h FROM range(128)), "
            "px AS (SELECT m.id, m.w, m.h, x.range AS x, y.range AS y "
            "FROM m, range(32) x, range(32) y "
            "WHERE x.range < m.w AND y.range < m.h) "
            "SELECT id AS media_id, CAST(w AS INTEGER) AS width, "
            "CAST(h AS INTEGER) AS height, "
            "CAST(SUM((id * 7 + (x // 8) * 13 + (y // 8) * 31) % 256) AS BIGINT) AS sum_r, "
            "CAST(SUM((id * 7 + (x // 8) * 13 + (y // 8) * 31) % 256) AS BIGINT) AS sum_g, "
            "CAST(SUM((id * 7 + (x // 8) * 13 + (y // 8) * 31) % 256) AS BIGINT) AS sum_b "
            "FROM px GROUP BY 1, 2, 3"
        ),
        # media_features_gif: palette size 2^((id%4)+5); pixel index
        # (id*11 + x*3 + y*5) % ps; palette channel formulas j*7/13/29
        # % 256 — re-derives every LZW-decoded, deinterlaced pixel
        "media_features_gif": (
            "WITH m AS (SELECT range AS id, 8 + (range * 47) % 25 AS w, "
            "8 + (range * 19) % 25 AS h, "
            "CAST(power(2, (range % 4) + 5) AS BIGINT) AS ps "
            "FROM range(128)), "
            "px AS (SELECT m.id, m.w, m.h, "
            "(m.id * 11 + x.range * 3 + y.range * 5) % m.ps AS j "
            "FROM m, range(32) x, range(32) y "
            "WHERE x.range < m.w AND y.range < m.h) "
            "SELECT id AS media_id, CAST(w AS INTEGER) AS width, "
            "CAST(h AS INTEGER) AS height, "
            "CAST(SUM((j * 7) % 256) AS BIGINT) AS sum_r, "
            "CAST(SUM((j * 13) % 256) AS BIGINT) AS sum_g, "
            "CAST(SUM((j * 29) % 256) AS BIGINT) AS sum_b "
            "FROM px GROUP BY 1, 2, 3"
        ),
        # audio_features: the WAV sample formula ((id*7 + i*13 + c*97) %
        # 65536) - 32768 re-derived per sample — verifies the REAL
        # pure-NumPy RIFF/PCM16 decode (stages/wav.py)
        "audio_features": (
            "WITH m AS (SELECT range AS id, "
            "256 + (range * 31) % 512 AS n, "
            "8000 + (range % 3) * 4000 AS rate, "
            "1 + range % 2 AS ch FROM range(128)), "
            "s AS (SELECT m.id, m.n, m.rate, m.ch, i.range AS i "
            "FROM m, range(768) i WHERE i.range < m.n) "
            "SELECT id AS media_id, CAST(rate AS INTEGER) AS sample_rate, "
            "CAST(ch AS INTEGER) AS channels, CAST(n AS INTEGER) AS n_samples, "
            "CAST(SUM((id * 7 + i * 13) % 65536 - 32768) AS BIGINT) AS sum_c0, "
            "CAST(SUM(CASE WHEN ch > 1 THEN (id * 7 + i * 13 + 97) % 65536 - 32768 "
            "ELSE 0 END) AS BIGINT) AS sum_c1 "
            "FROM s GROUP BY 1, 2, 3, 4"
        ),
        # -- spatial joins ---------------------------------------------------
        "pip_join": (
            f"SELECT u.url AS url, COALESCE(MIN(a.admin_id), -1) AS admin_id "
            f"FROM {pages_cte} u LEFT JOIN {SQL_ADMIN} a "
            f"ON (abs(u.lat_us - a.cy_us) * 2 + abs(u.lon_us - a.cx_us) * 2) < (2 * a.r_us + 1) "
            f"GROUP BY 1"
        ),
        "knn_join": (
            f"SELECT u.url AS url, p.poi_id AS poi_id, "
            f"((u.lon_us - p.px_us) * (u.lon_us - p.px_us) + (u.lat_us - p.py_us) * (u.lat_us - p.py_us)) AS poi_d2 "
            f"FROM {pages_cte} u CROSS JOIN {SQL_POI} p "
            f"QUALIFY row_number() OVER (PARTITION BY u.url ORDER BY poi_d2, p.poi_id) = 1"
        ),
        # knn_cell_join: co-partitioned implementation, same answer as the
        # broadcast join → same oracle
        "knn_cell_join": (
            f"SELECT u.url AS url, p.poi_id AS poi_id, "
            f"((u.lon_us - p.px_us) * (u.lon_us - p.px_us) + (u.lat_us - p.py_us) * (u.lat_us - p.py_us)) AS poi_d2 "
            f"FROM {pages_cte} u CROSS JOIN {SQL_POI} p "
            f"QUALIFY row_number() OVER (PARTITION BY u.url ORDER BY poi_d2, p.poi_id) = 1"
        ),
        "knn_top3": (
            f"SELECT u.url AS url, p.poi_id AS poi_id, "
            f"((u.lon_us - p.px_us) * (u.lon_us - p.px_us) + (u.lat_us - p.py_us) * (u.lat_us - p.py_us)) AS poi_d2, "
            f"row_number() OVER (PARTITION BY u.url ORDER BY "
            f"((u.lon_us - p.px_us) * (u.lon_us - p.px_us) + (u.lat_us - p.py_us) * (u.lat_us - p.py_us)), p.poi_id) AS rank "
            f"FROM {pages_cte} u CROSS JOIN {SQL_POI} p QUALIFY rank <= 3"
        ),
        "admin_page_counts": (
            f"SELECT a.admin_id AS admin_id, COUNT(*) AS n_pages "
            f"FROM {pages_cte} u JOIN {SQL_ADMIN} a "
            f"ON (abs(u.lat_us - a.cy_us) * 2 + abs(u.lon_us - a.cx_us) * 2) < (2 * a.r_us + 1) "
            f"GROUP BY 1"
        ),
        # -- text analysis ----------------------------------------------------
        "token_stats": (
            f"SELECT doc_id, {_SQL_NTOK} AS n_tokens, "
            "length(regexp_extract_all(text, '[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]')) AS n_bpe_tokens, "
            "length(text) AS n_chars FROM documents"
        ),
        "quality_score": (
            f"SELECT doc_id, {q_ratio} AS stop_ratio, {q_mtok} AS mean_token_len, "
            f"{q_alpha} AS alpha_ratio, {q_score} AS quality_score FROM documents"
        ),
        "langid": (
            f"SELECT doc_id, {hits['de']} AS hits_de, {hits['en']} AS hits_en, "
            f"{hits['es']} AS hits_es, {hits['fr']} AS hits_fr, {hits['zh']} AS hits_zh, "
            f"{lang_pred} AS lang_pred FROM documents"
        ),
        "fingerprint_md5": "SELECT doc_id, md5(text) AS md5 FROM documents",
        "length_quantiles": (
            "WITH q AS (SELECT lang, quantile_disc(length(text), "
            "[0.1, 0.5, 0.9, 0.99]) AS qs FROM documents GROUP BY lang) "
            "SELECT lang, unnest([0.1, 0.5, 0.9, 0.99]) AS p, "
            "CAST(unnest(qs) AS BIGINT) AS len_q FROM q"
        ),
        "ngram_topk": (
            "WITH toks AS (SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS ws "
            "FROM documents WHERE trim(text) != ''), "
            "pairs AS (SELECT lang, unnest([ws[i] || ' ' || ws[i + 1] "
            "for i in generate_series(1, len(ws) - 1)]) AS ngram "
            "FROM toks WHERE len(ws) >= 2), "
            "counts AS (SELECT lang, ngram, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM pairs GROUP BY 1, 2) "
            "SELECT lang, ngram, n, CAST(row_number() OVER "
            "(PARTITION BY lang ORDER BY n DESC, ngram) AS BIGINT) AS rnk "
            "FROM counts QUALIFY rnk <= 10"
        ),
        # repetition_stats: same trim+split tokenizer as ngram_topk, all
        # integer outputs (functions/textstats.repetition_sql)
        "repetition_stats": repetition_sql(dup_n=5),
        # doc_perplexity: int64-quantized logprob terms -> order-free sums
        "doc_perplexity": doc_perplexity_sql(),
        # mix_weighted: same md5 key + driver-resolved integer thresholds
        "mix_weighted": mix_weighted_sql(_MIX_WEIGHTS, seed=7),
        # decontaminate: same tokenizer + distinct-8-gram membership
        "decontaminate": decontaminate_sql(n=4, mod=50),
        # tfidf_topk: int64-quantized scores, (score DESC, term ASC) rank
        "tfidf_topk": tfidf_topk_sql(k=3),
        # corpus_filter_ppl: same bucket ints, quantile_disc cutoff
        "corpus_filter_ppl": filter_by_perplexity_sql(p=0.5),
        # chunk_docs: same integer window arithmetic, list-slice join
        "chunk_docs": chunk_docs_sql(size=32, overlap=8),
        # pack_sequences: window cumsum in doc_id order, same tokenizer
        # as token_stats, pure-int outputs (functions/pack.py)
        "pack_sequences": pack_oracle_sql(seq_len=2048),
        # redact_pii: same RE2 patterns + replacement order in DuckDB
        "redact_pii": redact_oracle_sql(),
        "clean_lines_c4": clean_lines_oracle_sql(),
        "c4_pipeline": c4_pipeline_oracle_sql(),
        "url_dedup": url_dedup_oracle_sql(),
        "dedup_lines_c4": dedup_lines_oracle_sql(),
        "dedup_incremental": dedup_incremental_sql(),
        "minhash_incremental": minhash_incremental_sql(),
        # nb_lang_classify: same tokenizer/smoothing/quantization, same
        # (score DESC, class ASC) argmax — bit-equal scores
        "nb_lang_classify": nb_classify_oracle_sql(train_mod=3),
        # dup_ngram_spans: lead()-built grams, global count >= 2,
        # COUNT(DISTINCT pos) == merged-interval coverage
        "dup_ngram_spans": dup_span_oracle_sql(w=5),
        # dedup_spans_c4: first-occurrence rule + coverage + rebuild
        "dedup_spans_c4": dedup_spans_oracle_sql(w=5),
        # semdedup: shared assignment CTE + round-6 cosine pairs
        "semdedup": semdedup_oracle_sql(n_centroids=16, threshold=0.35),
        # prep_training_data: the four stage oracles spliced as CTEs
        "prep_training_data": prep_training_oracle_sql(),
        # pagerank: unrolled-iteration CTEs, same quantized terms
        "pagerank": pagerank_oracle_sql(),
        # host_pagerank: same unrolled recursion over edges the twin
        # ALSO extracts from the synth HTML (href regex + host parse)
        "host_pagerank": host_pagerank_oracle_sql(linked_html_sql_expr()),
        # set_join_exact: brute-force twin (any J>=t pair shares a gram)
        "set_join_exact": setjoin_oracle_sql(),
        # ppr_hosts: same edges/term, seed-concentrated r0/base CASE
        "ppr_hosts": ppr_oracle_sql_over(
            host_edges_oracle_sql(linked_html_sql_expr()),
            "SELECT range AS v FROM range(1000)", "v % 17 = 0"),
        # host_walks: unrolled steps, min-(md5_number_lower, dst) hop
        "host_walks": host_walks_oracle_sql(linked_html_sql_expr()),
        # cocitation_hosts: same edges, self-join on src
        "cocitation_hosts": host_cocitation_oracle_sql(
            linked_html_sql_expr()),
        # label_prop_hosts: symmetrized edges, unrolled vote rounds
        "label_prop_hosts": host_communities_oracle_sql(
            linked_html_sql_expr()),
        # image_dhash_pairs: signatures re-derived from the closed-form
        # pixels, all-pairs xor+bit_count (pigeonhole == banded join)
        "image_dhash_pairs": dhash_pairs_oracle_sql(3, 128),
        # audio_fp_pairs: fingerprints re-derived from the closed-form
        # samples, all-pairs xor+bit_count (pigeonhole == banded join)
        "audio_fp_pairs": audiofp_pairs_oracle_sql(3, 128),
        # bigram_perplexity: same tokenizer/ctx/V, int64-quantized terms
        "bigram_perplexity": bigram_oracle_sql(),
        # trigram_backoff: same split/tokenizer, the SAME three-branch
        # CASE text, LEFT joins reproduce the cascade's fall-throughs
        "trigram_backoff": backoff_oracle_sql(),
        # ccnet_tiers: scored CTE + per-lang quantile_disc, same labels
        "ccnet_tiers": ccnet_oracle_sql(),
        # weighted_sample: same dyadic-uniform ln(u)/w key, QUALIFY top-k
        "weighted_sample": weighted_sample_oracle_sql(k=50),
        # kcore_docs: same synth edges, unrolled simultaneous peel
        "kcore_docs": kcore_oracle_sql(k=4, rounds=3),
        # snapshot_diff: FULL OUTER JOIN + md5 compare, same statuses
        "snapshot_diff": snapshot_diff_oracle_sql(),
        # pagerank_weighted: same unrolled CTEs, w/wsum mass split
        "pagerank_weighted": pagerank_weighted_oracle_sql(),
        # hits_hosts: half-steps unrolled, same normalization expr
        "hits_hosts": host_hits_oracle_sql(linked_html_sql_expr()),
        # topk_ivfpq: assignment CTEs (plain grid) + PQ CTEs (unit grid)
        "topk_ivfpq": ivfpq_oracle_sql(),
        # refine: the PQ pool CTEs + the exact-cosine re-rank
        "topk_ivfpq_refined": ivfpq_refined_oracle_sql(),
        # triangle_support: adjacency self-join wedges + closing count
        "triangle_support": triangles_oracle_sql(),
        # adamic_adar: wedge self-join with quantized 1/ln(deg) terms,
        # NOT-EXISTS edge filter, same top-k total order
        "adamic_adar": aa_oracle_sql(),
        # jsonl_identity: the round trip must reproduce the raw table
        "jsonl_identity": ("SELECT doc_id, text, lang, source, n_chars "
                           "FROM documents"),
        # warc_pages: record framing + payload extraction value-checked
        # against the synthesis formulas
        "warc_pages": ("SELECT doc_id, 'https://site' || (doc_id % 97) "
                       "|| '.example/p/' || doc_id AS url, text "
                       "FROM documents"),
        # gopher_rules: same RE2 patterns, integer rule arithmetic
        "gopher_rules": gopher_oracle_sql(stops=_EN_MARKERS),
        # strip_html_wet: same RE2 patterns in the same order
        "strip_html_wet": strip_html_oracle_sql(),
        # split_sentences: sentinel-replace boundary split (no RE2
        # lookbehind), row_number over kept sentences
        "split_sentences": split_sentences_oracle_sql(
            table=f"(SELECT doc_id, {_synth_multiline_expr()} AS text "
                  "FROM documents)"),
        # hybrid_search_rrf: both leg oracles + floor(1e9/(kr+rank))
        "hybrid_search_rrf": hybrid_oracle_sql(_BM25_TERMS, k=10),
        # pmi_collocations: integer-argument ln quantization
        "pmi_collocations": pmi_oracle_sql(k=20, min_count=3),
        # hash_embed: same tokenizer + md5_number_lower dim/sign, int sums
        "hash_embed": hash_embed_sql(n_dims=64),
        # simplify_paths_z2: DuckDB re-runs the DP recursion itself
        "simplify_paths_z2": dp_oracle_sql(
            _sql_site_path_ctes(2, 4096), tol2=256 * 256),
        # extract_links: regexp_extract_all + unnest over the same synth
        "extract_links": extract_links_sql(linked_html_sql_expr()),
        # anchor_topk: lockstep two-group unnest, same host RE2 + top-k
        "anchor_topk": anchor_topk_sql(linked_html_sql_expr(), k=3),
        # robots_filter: NOT EXISTS anti-join on the same rule rows
        "robots_filter": robots_filter_sql(
            "(SELECT 'https://host' || (doc_id % 37) || '.example/p/' "
            "|| doc_id AS url, doc_id FROM documents)",
            synth_robots_rules()),
        # latest_snapshot: max (warc_ts, text) per url over the synth
        # multi-capture corpus (derivation mirrored in snapshots_sql_cte)
        "latest_snapshot": latest_snapshot_sql(
            snapshots_sql_cte(SQL_URL)),
        # domain_cap: same RE2 host extraction + row_number cap over the
        # dense synth host set (doc_id % 37)
        "domain_cap": domain_cap_sql(
            "(SELECT 'https://host' || (doc_id % 37) || '.example/p/' "
            "|| doc_id AS url, doc_id FROM documents)", 5),
        # tile_pyramid: ancestor tiles are integer shifts of the z10 tile
        "tile_pyramid": (
            f"WITH p AS (SELECT {_sql_tile(10)['x']} AS x10, "
            f"{_sql_tile(10)['y']} AS y10 FROM documents) "
            + " UNION ALL ".join(
                f"SELECT CAST({l} AS INTEGER) AS z, "
                f"CAST(x10 >> {10 - l} AS INTEGER) AS x, "
                f"CAST(y10 >> {10 - l} AS INTEGER) AS y, "
                "COUNT(*) AS n_pages FROM p GROUP BY 1, 2, 3"
                for l in (10, 8, 6, 4))),
        # shuffle_epoch: row_number over the same md5_number_lower key
        "shuffle_epoch": shuffle_oracle_sql(seed=42),
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        # dup_clusters: recursive-CTE connected components over the SAME
        # minhash candidate pairs; cluster = min doc_id in component
        "dup_clusters": dup_clusters_sql(),
        # near_dedup: verified pairs (J >= 1/2) → recursive closure →
        # survivors (unpaired docs + each cluster's min doc_id)
        "near_dedup": near_dedup_sql(),
        # quality-aware keep rule: winner = (length DESC, id ASC)
        "near_dedup_longest": near_dedup_longest_sql(),
        # dsir_weights: hashed-bigram importance log-weights, quantized
        # per-feature log-ratio (integer-derived ln args) × integer tf
        "dsir_weights": dsir_weights_sql(n_dims=256, target_mod=20),
        # dsir_select: weights CTE + truncating-// bucket + quantile cut
        "dsir_select": dsir_select_sql(p=0.25, n_dims=256, target_mod=20),
        # path_lengths_z6: shared site-path CTEs + the SAME
        # floor(sqrt*1e6+0.5) expression + integer sums
        "path_lengths_z6": path_lengths_sql(_sql_site_path_ctes(6, 4096)),
        # geohash_cells: pure-integer microdegree cells + unrolled
        # 40-bit interleave + base-32 substr digits
        "geohash_cells": geohash_sql(SQL_LAT_US, SQL_LON_US),
        # grid_clusters: integer grid + 4-adjacency self-join +
        # recursive-closure components + COALESCE singletons
        "grid_clusters": grid_clusters_sql(SQL_LAT_US, SQL_LON_US,
                                           cell_us=500),
        # bbox_query_indexed: closed integer bbox (the index under
        # test; the semantics are a WHERE clause)
        "bbox_query_indexed": bbox_query_sql(
            SQL_LAT_US, SQL_LON_US, *_BBOX_US),
        "doc_sample_10pct": "SELECT doc_id FROM documents WHERE doc_id % 10 = 0",
        # -- dedup -------------------------------------------------------------
        "dedup_exact": (
            "SELECT md5(text) AS md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups "
            "FROM documents GROUP BY 1"
        ),
        # corpus cleaning: quality gate + lang-ID consistency + exact dedup
        # (composes the q_score / lang_pred expressions verified above)
        "corpus_clean": (
            f"WITH kept AS (SELECT doc_id, text FROM documents "
            f"WHERE {q_score} >= 0.7 AND {lang_pred} = lang) "
            f"SELECT md5(text) AS md5, MIN(doc_id) AS keep_id, "
            f"COUNT(*) AS n_dups FROM kept GROUP BY 1"
        ),
        "sample_stratified": (
            "SELECT lang, doc_id, rank FROM ("
            "SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
            "ORDER BY md5_number_lower('samp:' || doc_id::VARCHAR), doc_id) "
            "AS rank FROM documents) WHERE rank <= 20"
        ),
        # minhash / simhash / jaccard: every hash primitive is md5-derived
        # (md5_number_lower) with wrap-mod-2^64 arithmetic replicated in
        # HUGEINT — the full signature pipelines run verbatim in DuckDB
        # (vtzero_ray/functions/dedup_sql.py)
        "minhash_lsh_candidates": minhash_candidates_sql(),
        "simhash_signatures": simhash_sql(),
        "simhash_near_dups": simhash_near_dups_sql(),
        "jaccard_verified_dups": jaccard_verified_sql(),
        "approx_distinct_texts": hll_facts_sql(),
        "cms_token_est": cms_est_sql(_CMS_PROBES),
        "embedding_near_dups": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35"
        ),
        # embedding_near_dups_lsh: same md5-hyperplane buckets as the Ray
        # path (functions/dedup.py embedding_near_dups_lsh_sql), exact
        # cosine verify on candidates only
        "embedding_near_dups_lsh": near_dups_lsh_sql(threshold=0.35,
                                                     n_bits=4, n_tables=8),
        # -- similarity search --------------------------------------------------
        # bm25_topk: same whitespace tokenizer, integer tf/df/dl stats,
        # and the SAME float expression text (literal constants, parse
        # order, libm ln) as functions/search.bm25_topk; round(.,9) pins
        # both engines before ranking
        "bm25_topk": bm25_oracle_sql(_BM25_TERMS, k=20),
        # bm25_topk_indexed is byte-equal to bm25_topk by construction
        # (in-group term-order float sums reproduce the scan path's adds
        # exactly; asserted in test_search.py) → same oracle
        "bm25_topk_indexed": bm25_oracle_sql(_BM25_TERMS, k=20),
        "ann_topk_bruteforce": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 10) "
            "SELECT q.vec_id AS query_id, e.vec_id AS vec_id, "
            "round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) DESC, e.vec_id) AS rank "
            "FROM q CROSS JOIN embeddings e QUALIFY rank <= 5"
        ),
        # ann_topk_lsh: integer-quantized embeddings + md5-derived ±1
        # hyperplanes → buckets, dots and ranking are exact ints in BOTH
        # engines (functions/ann.py topk_lsh_sql)
        "cluster_docs": cluster_sizes_sql(n_centroids=16),
        "ann_topk_lsh": ann_lsh_sql(),
        # multi-probe twin: probed-bucket union at n_probes=3
        "ann_topk_lsh_mp": ann_lsh_sql(n_probes=3),
        # ann_topk_ivf: same quantization; centroid assignment, probe
        # routing and re-rank are all exact-int dots + one float divide
        "ann_topk_ivf": ann_ivf_sql(),
        # ann_topk_ivf_indexed: byte-equal to ann_topk_ivf by construction
        # (same centroids/probes/re-rank, just read from the persisted
        # partitioned index) — same oracle
        "ann_topk_ivf_indexed": ann_ivf_sql(),
        # product quantization: unit-grid subvectors, first-N codebooks,
        # int64 L2^2 argmin encode + ADC search (functions/pq.py)
        "pq_codes": pq_codes_oracle_sql(),
        "topk_pq": topk_pq_oracle_sql(),
        # -- relational / streaming-shaped --------------------------------------
        # exact integer-cent sums: float summation order differs between
        # engines and exceeds any rounding tolerance at sf >= 0.1
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_c2, "
            "COUNT(*) AS count_order FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1, 2"
        ),
        "orders_by_segment": (
            "SELECT c.c_mktsegment, COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price_cents "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1"
        ),
        "revenue_by_priority": (
            "SELECT o.o_orderpriority, COUNT(*) AS n_items, "
            "CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c2 "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY 1"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "top_unshipped_orders": (
            "SELECT l.l_orderkey, o.o_orderdate, "
            "CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c2 "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE c.c_mktsegment = 'BUILDING' "
            "AND o.o_orderdate < TIMESTAMP '1998-06-01' "
            "AND l.l_shipdate > TIMESTAMP '1998-06-01' "
            "GROUP BY 1, 2 ORDER BY revenue_c2 DESC, l_orderkey LIMIT 10"
        ),
        "events_window": (
            "SELECT event_type, date_trunc('hour', ts) AS window_start, "
            "COUNT(*) AS n_events, round(SUM(value), 6) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        # hopping window: every event lands in window_s/hop_s = 4
        # overlapping windows (integer-floor window starts in µs)
        "events_hopping_window": (
            "SELECT event_type, make_timestamp("
            "((epoch_us(ts) // 1000000 // 900) * 900 - 900 * i.range) * 1000000"
            ") AS window_start, COUNT(*) AS n_events, "
            "round(SUM(value), 6) AS sum_value "
            "FROM events, range(4) i GROUP BY 1, 2"
        ),
        # range join: both interval ends inclusive; quantities summed in
        # integer cents so the totals are order-independent
        "range_join_shipped_7d": (
            "SELECT o.o_orderkey, "
            "CAST(COUNT(s.ship_s) AS BIGINT) AS n_shipped, "
            "CAST(COALESCE(SUM(s.qty_c), 0) AS BIGINT) AS qty_cents "
            "FROM orders o LEFT JOIN ("
            "SELECT CAST(epoch(l_shipdate) AS BIGINT) AS ship_s, "
            "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c FROM lineitem) s "
            "ON s.ship_s BETWEEN CAST(epoch(o.o_orderdate) AS BIGINT) "
            "AND CAST(epoch(o.o_orderdate) AS BIGINT) + 604800 "
            "GROUP BY o.o_orderkey"
        ),
        "events_asof_last_order": (
            "SELECT e.event_id, e.user_id, COALESCE((SELECT o.o_orderkey FROM orders o "
            "WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts "
            "ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1), -1) AS o_orderkey "
            "FROM events e"
        ),
        "events_sessions": (
            "WITH e AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND "
            "THEN 1 ELSE 0 END AS new_s FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM e) "
            "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
            "COUNT(*) AS n_events, round(SUM(value), 6) AS sum_value "
            "FROM s GROUP BY user_id, sid"
        ),
    }
    # incremental update serves EXACTLY the full-corpus pyramid (the
    # byte-identity is test-pinned), so the delta row shares the store
    # oracle verbatim
    out["pyramid_update_z4"] = out["pyramid_store_z4"]
    # holed-polygon pyramid update == build over the combined raster:
    # three-level closed-form halving of inset-64 cells (base side 256 /
    # hole 128 → 128/64 → 64/32; x0 folds the sibling offset per level;
    # every ring stays ≥ 3 distinct points so nothing sliver-drops)
    out["pyramid_update_poly"] = (
        f"WITH cells AS (SELECT {t6['x']} AS x6, {t6['y']} AS y6, "
        f"(CAST(floor(({t6['fy']} - floor({t6['fy']})) * 4096) AS INTEGER) // 256) AS r, "
        f"(CAST(floor(({t6['fx']} - floor({t6['fx']})) * 4096) AS INTEGER) // 256) AS c, "
        f"COUNT(*) AS n FROM documents GROUP BY 1, 2, 3, 4) "
        f"SELECT 6 AS z, x6 AS x, y6 AS y, COUNT(*) AS n_features, "
        f"CAST(SUM(r * 16 + c) AS BIGINT) AS sum_fid, "
        f"CAST(SUM(256 * c) AS BIGINT) AS sum_x0, "
        f"CAST(SUM(256 * r) AS BIGINT) AS sum_y0, "
        f"CAST(COUNT(*) * 98304 AS BIGINT) AS sum_area2, "
        f"CAST(SUM(n) AS BIGINT) AS sum_points, "
        f"CAST(COUNT(*) * 2 AS BIGINT) AS sum_rings "
        f"FROM cells GROUP BY 2, 3 "
        f"UNION ALL "
        f"SELECT 5 AS z, x6 // 2 AS x, y6 // 2 AS y, COUNT(*) AS n_features, "
        f"CAST(SUM(r * 16 + c) AS BIGINT) AS sum_fid, "
        f"CAST(SUM(2048 * (x6 % 2) + 128 * c) AS BIGINT) AS sum_x0, "
        f"CAST(SUM(2048 * (y6 % 2) + 128 * r) AS BIGINT) AS sum_y0, "
        f"CAST(COUNT(*) * 24576 AS BIGINT) AS sum_area2, "
        f"CAST(SUM(n) AS BIGINT) AS sum_points, "
        f"CAST(COUNT(*) * 2 AS BIGINT) AS sum_rings "
        f"FROM cells GROUP BY 2, 3 "
        f"UNION ALL "
        f"SELECT 4 AS z, x6 // 4 AS x, y6 // 4 AS y, COUNT(*) AS n_features, "
        f"CAST(SUM(r * 16 + c) AS BIGINT) AS sum_fid, "
        f"CAST(SUM(2048 * ((x6 // 2) % 2) + 1024 * (x6 % 2) + 64 * c) AS BIGINT) AS sum_x0, "
        f"CAST(SUM(2048 * ((y6 // 2) % 2) + 1024 * (y6 % 2) + 64 * r) AS BIGINT) AS sum_y0, "
        f"CAST(COUNT(*) * 6144 AS BIGINT) AS sum_area2, "
        f"CAST(SUM(n) AS BIGINT) AS sum_points, "
        f"CAST(COUNT(*) * 2 AS BIGINT) AS sum_rings "
        f"FROM cells GROUP BY 2, 3"
    )
    # tombstone deletion == build over the filtered corpus: the store
    # oracle with its single corpus reference filtered
    assert out["pyramid_store_z4"].count("FROM documents") == 1
    out["pyramid_remove_z4"] = out["pyramid_store_z4"].replace(
        "FROM documents", "FROM documents WHERE doc_id % 7 != 0")
    # append-only extension == full-corpus index: the ivf oracle verbatim
    out["ann_topk_ivf_extended"] = out["ann_topk_ivf_indexed"]
    return out
