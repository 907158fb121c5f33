"""Spatial indexing: Web-Mercator tile math + quadtree cell ids.

Pure NumPy, vectorized — called inside ``map_batches`` kernels. There is no
CRS in the reference (tile-local integer coords only,
/root/reference/include/vtzero/geometry.hpp:31-48); the north rule adds the
geographic layer: pages are geoparsed to lon/lat, assigned hierarchical
cells (S2-level-12-style quadtree cells on Web Mercator; we use an honest
quadkey/Morton scheme rather than imitating H3 hex math) and (z,x,y) tile
keys at target zooms.

All formulas are the standard slippy-map equations; the same expressions are
used in the DuckDB oracle SQL so results compare exactly on the
deterministic synthetic inputs.
"""

from __future__ import annotations

import numpy as np

MERCATOR_LAT_LIMIT = 85.05112878
DEFAULT_EXTENT = 4096


def lonlat_to_tile(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees → integer tile (x, y) at zoom z."""
    n = float(1 << z)
    lat = np.clip(lat, -MERCATOR_LAT_LIMIT, MERCATOR_LAT_LIMIT)
    lat_rad = np.radians(lat)
    x = np.floor((lon + 180.0) / 360.0 * n)
    # y = (1 - ln(tan(lat/2 + pi/4)) / pi) / 2 * n  (DuckDB-expressible form)
    y = np.floor((1.0 - np.log(np.tan(lat_rad / 2.0 + np.pi / 4.0)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int32)
    y = np.clip(y, 0, n - 1).astype(np.int32)
    return x, y


def lonlat_to_tile_px(
    lon: np.ndarray, lat: np.ndarray, z: int, extent: int = DEFAULT_EXTENT
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """lon/lat → (tile_x, tile_y, px, py) with tile-local integer coords
    in [0, extent)."""
    n = float(1 << z)
    lat = np.clip(lat, -MERCATOR_LAT_LIMIT, MERCATOR_LAT_LIMIT)
    lat_rad = np.radians(lat)
    fx = (lon + 180.0) / 360.0 * n
    fy = (1.0 - np.log(np.tan(lat_rad / 2.0 + np.pi / 4.0)) / np.pi) / 2.0 * n
    tx = np.clip(np.floor(fx), 0, n - 1)
    ty = np.clip(np.floor(fy), 0, n - 1)
    px = np.floor((fx - tx) * extent)
    py = np.floor((fy - ty) * extent)
    px = np.clip(px, 0, extent - 1).astype(np.int32)
    py = np.clip(py, 0, extent - 1).astype(np.int32)
    return tx.astype(np.int32), ty.astype(np.int32), px, py


def _interleave_bits(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Morton-interleave two level-bit ints → uint64 cell id."""
    cx = x.astype(np.uint64)
    cy = y.astype(np.uint64)
    out = np.zeros_like(cx)
    for i in range(level):
        bit = np.uint64(1) << np.uint64(i)
        out |= ((cx >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        out |= ((cy >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
        _ = bit
    return out


def cell_id(lon: np.ndarray, lat: np.ndarray, level: int = 12) -> np.ndarray:
    """Quadtree cell id at ``level`` (S2-level-12-equivalent granularity).

    Encoded as (level << 58) | morton(x, y) so ids from different levels
    never collide. Used as the locality/repartition key for kNN and PIP
    stages (SURVEY.md §2.4, §7.3).
    """
    x, y = lonlat_to_tile(np.asarray(lon, dtype=np.float64),
                          np.asarray(lat, dtype=np.float64), level)
    return (np.uint64(level) << np.uint64(58)) | _interleave_bits(x, y, level)


def cell_parent(cells: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Parent cell id at a coarser level (drop 2 bits per level)."""
    morton = cells & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    shift = np.uint64(2 * (level - parent_level))
    return (np.uint64(parent_level) << np.uint64(58)) | (morton >> shift)


def quadkey(x: np.ndarray, y: np.ndarray, z: int) -> np.ndarray:
    """Bing-style quadkey strings for tile keys (useful for partitioned
    output layout)."""
    x = np.asarray(x)
    y = np.asarray(y)
    digits = np.zeros((z, x.shape[0]), dtype=np.uint8)
    for i in range(z):
        bit = z - 1 - i
        digits[i] = (((x >> bit) & 1) | (((y >> bit) & 1) << 1)).astype(np.uint8) + ord("0")
    return digits.T.tobytes().decode("ascii") if x.shape[0] == 1 else [
        bytes(col).decode("ascii") for col in digits.T
    ]
