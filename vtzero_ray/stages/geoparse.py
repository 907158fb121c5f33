"""Geoparse stage: extract lon/lat mentions from page text.

Stateless-per-batch but run as an actor pool so the regex is compiled once
per actor (``__init__``), not per batch — the canonical stateful-stage shape
(ray_guide: callable class → actor pool). Extraction itself is vectorized
via ``pyarrow.compute.extract_regex`` over the zero-copy Arrow batch.

The per-row invariant (BASELINE.json input_hint) — byte-identical ``text``
per ``url`` — holds because this stage only APPENDS columns; text passes
through untouched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .cells import lonlat_to_tile_px

GEO_PATTERN = r"geo:(?P<lat>-?\d+\.\d+),(?P<lon>-?\d+\.\d+)"


class GeoParse:
    """map_batches callable: adds lat/lon (float64) + has_geo columns."""

    def __init__(self, pattern: str = GEO_PATTERN) -> None:
        self.pattern = pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch.column("text"), self.pattern)
        lat = pc.cast(pc.struct_field(ext, "lat"), pa.float64())
        lon = pc.cast(pc.struct_field(ext, "lon"), pa.float64())
        has_geo = pc.is_valid(ext)
        return batch.append_column("lat", lat).append_column("lon", lon).append_column(
            "has_geo", has_geo
        )


def geoparse(ds, concurrency=None, batch_size=None):
    """Apply the geoparse stage and drop non-geo rows.

    Runs as STATELESS TASKS by default (concurrency=None): the regex is an
    Arrow kernel (no per-actor state worth amortizing) and tasks scale
    elastically with the CPU count — a fixed-size actor pool was measured
    to cap this stage at pool-size parallelism and sink 8→32 CPU scaling.
    batch_size=None (batch == block): a positive batch_size would bundle
    small upstream blocks into one task and serialize the stage.
    """
    if concurrency is None:
        ds = ds.map_batches(GeoParse(), batch_format="pyarrow", batch_size=batch_size)
    else:
        ds = ds.map_batches(
            GeoParse,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("has_geo"), True)).drop_columns(["has_geo"]),
        batch_format="pyarrow",
    )


class AssignTiles:
    """Stateless map_batches fn: lon/lat → (z,x,y,px,py) rows per target zoom.

    One input page fans out to len(zooms) feature rows (explode). The wide
    ``html`` column must be projected away BEFORE this stage so the fan-out
    and subsequent shuffle never carry it (SURVEY.md §7.4 "Wide binary rows").
    """

    def __init__(self, zooms=(2, 6, 12), extent: int = 4096) -> None:
        self.zooms = tuple(zooms)
        self.extent = extent

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        pieces = []
        for z in self.zooms:
            tx, ty, px, py = lonlat_to_tile_px(lon, lat, z, self.extent)
            t = batch.drop_columns(["lon", "lat"]) if "lon" in batch.column_names else batch
            t = (
                t.append_column("z", pa.array(np.full(len(batch), z, np.int32)))
                .append_column("x", pa.array(tx))
                .append_column("y", pa.array(ty))
                .append_column("px", pa.array(px))
                .append_column("py", pa.array(py))
            )
            pieces.append(t)
        return pa.concat_tables(pieces)
