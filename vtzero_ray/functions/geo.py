"""Geo measurement + indexing ops over the pages corpus: web-mercator
path lengths and geohash cell encoding.

Both are derived from the same deterministic geo markers the tiling
pipeline parses (sources/pages.py), so their DuckDB twins reuse the
repo's integer lat/lon fragments and the shared site-path CTEs.

Exactness contracts:
- ``path_lengths``: the per-segment length floor(sqrt(dx^2+dy^2)*1e6
  + 0.5) is ONE IEEE expression over exact integers — sqrt is
  correctly-rounded in IEEE-754, and dx^2+dy^2 <= 2*(2^21)^2 < 2^53 is
  exactly representable as a double — so NumPy and DuckDB land on the
  same int64 micro-pixel value, and per-site sums are order-free
  integer adds (the doc_perplexity contract). int64 headroom: a
  max-length zoom-6 segment is ~3.7e11 micro-pixels, so a site path
  holds ~2.5e7 worst-case segments before overflow — raise the quantum
  to 1e3 (or sum per sub-path) past that.
- ``geohash_cells``: cell indices are PURE integer arithmetic on
  microdegrees ((lat_us + 9e7) * 2^20 // 1.8e8 — never a float), the
  40-bit interleave and base-32 digits are bit ops, so both engines are
  trivially identical. Ray recovers exact microdegrees from the parsed
  float with floor(x*1e6 + 0.5): the decimal text has exactly six
  fractional digits, so the parsed double is within 2^-33 of the true
  value and round-half-up is exact.

The reference has no measurement ops (vtzero encodes what it is given);
these are brief-driven geospatial analytics over the same
world-coordinate derivation as pipelines/clip_paths.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vtzero_ray.runtime import tune_allocator

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 20  # per-axis cell index bits (40-bit hash, 8 base-32 chars)


# ---------------------------------------------------------------------------
# path lengths
# ---------------------------------------------------------------------------


def path_lengths(sf_dir: str, zoom: int = 6, extent: int = 4096):
    """→ Dataset (site, n_segments, length_q6): total polyline length of
    each site path in micro-pixels at ``zoom`` (q6 grid), over the
    consecutive-dup-dropped world-coordinate segments the clip pipeline
    builds (pipelines/clip_paths.world_segments).

    Scale shape: segments already form via ONE bounded site-bucket
    shuffle; length partials are per-batch int64 (site-bounded rows),
    merged in ONE output-sized repartition(1) task — no groupby barrier
    (CLAUDE.md output-sized-merge rule)."""
    from vtzero_ray.pipelines.clip_paths import world_segments

    segs = world_segments(sf_dir, zoom=zoom, extent=extent)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"site": pa.array([], pa.int64()),
                             "n_segments": pa.array([], pa.int64()),
                             "length_q6": pa.array([], pa.int64())})
        site = t.column("site").to_numpy().astype(np.int64)
        dx = (t.column("wx1").to_numpy() - t.column("wx0").to_numpy()) \
            .astype(np.int64)
        dy = (t.column("wy1").to_numpy() - t.column("wy0").to_numpy()) \
            .astype(np.int64)
        # ONE IEEE expression, mirrored token-for-token in the SQL twin
        ln = np.floor(np.sqrt((dx * dx + dy * dy).astype(np.float64))
                      * 1000000.0 + 0.5).astype(np.int64)
        us, inv = np.unique(site, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        # bincount's weights path goes through float64 — sum exactly on
        # int64 with np.add.at instead
        tot = np.zeros(us.shape[0], np.int64)
        np.add.at(tot, inv, ln)
        return pa.table({"site": pa.array(us),
                         "n_segments": pa.array(n),
                         "length_q6": pa.array(tot)})

    parts = segs.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"site": pa.array([], pa.int64()),
                             "n_segments": pa.array([], pa.int64()),
                             "length_q6": pa.array([], pa.int64())})
        site = t.column("site").to_numpy()
        us, inv = np.unique(site, return_inverse=True)
        n = np.zeros(us.shape[0], np.int64)
        tot = np.zeros(us.shape[0], np.int64)
        np.add.at(n, inv, t.column("n_segments").to_numpy())
        np.add.at(tot, inv, t.column("length_q6").to_numpy())
        return pa.table({"site": pa.array(us), "n_segments": pa.array(n),
                         "length_q6": pa.array(tot)})

    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


def path_lengths_sql(e_ctes: str) -> str:
    """DuckDB twin: the shared site-path CTEs (``e``) → lead() segments →
    the SAME floor(sqrt*1e6+0.5) expression → integer sums."""
    return (
        f"WITH {e_ctes}, "
        "segs AS (SELECT site, wx AS wx0, wy AS wy0, "
        "lead(wx) OVER w AS wx1, lead(wy) OVER w AS wy1 FROM e "
        "WINDOW w AS (PARTITION BY site ORDER BY pt_idx) "
        "QUALIFY lead(wx) OVER w IS NOT NULL) "
        "SELECT site, CAST(COUNT(*) AS BIGINT) AS n_segments, "
        "CAST(SUM(CAST(floor(sqrt(CAST((wx1-wx0)*(wx1-wx0)"
        "+(wy1-wy0)*(wy1-wy0) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS length_q6 FROM segs GROUP BY site"
    )


# ---------------------------------------------------------------------------
# geohash
# ---------------------------------------------------------------------------


def _geohash_from_us(lat_us: np.ndarray, lon_us: np.ndarray) -> np.ndarray:
    """(lat, lon) microdegrees → (n, 8) ascii geohash codes, vectorized."""
    clat = np.minimum((lat_us + 90_000_000) * (1 << _GH_BITS)
                      // 180_000_000, (1 << _GH_BITS) - 1)
    clon = np.minimum((lon_us + 180_000_000) * (1 << _GH_BITS)
                      // 360_000_000, (1 << _GH_BITS) - 1)
    h = np.zeros(lat_us.shape[0], np.int64)
    for i in range(_GH_BITS):  # geohash bit order: lon first, MSB first
        h |= ((clon >> (_GH_BITS - 1 - i)) & 1) << (39 - 2 * i)
        h |= ((clat >> (_GH_BITS - 1 - i)) & 1) << (38 - 2 * i)
    alpha = np.frombuffer(GEOHASH_ALPHABET.encode(), np.uint8)
    shifts = np.arange(35, -1, -5, dtype=np.int64)
    return alpha[(h[:, None] >> shifts[None, :]) & 31]  # (n, 8) uint8


def geohash_cells(sf_dir: str, n_chars: int = 8):
    """→ Dataset (doc_id, geohash): 8-char geohash of every page's geo
    marker, through the REAL parse chain (read_pages → geoparse →
    exact microdegree recovery → integer bit interleave). One scan,
    nothing shuffles."""
    from vtzero_ray.sources.pages import read_pages
    from vtzero_ray.stages.geoparse import geoparse

    if n_chars != 8:
        raise ValueError("n_chars=8 is the 40-bit build this op ships")
    ds = geoparse(read_pages(sf_dir, include_html=False))

    def encode(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy()
        lon = t.column("lon").to_numpy()
        lat_us = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        lon_us = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        codes = _geohash_from_us(lat_us, lon_us)  # (n, 8) ascii bytes
        n = codes.shape[0]
        # fixed-width rows → a StringArray straight from buffers, no
        # per-row Python
        offs = np.arange(0, 8 * (n + 1), 8, dtype=np.int32)
        gh = pa.StringArray.from_buffers(
            n, pa.py_buffer(offs.tobytes()),
            pa.py_buffer(np.ascontiguousarray(codes).tobytes()))
        return pa.table({"doc_id": t.column("doc_id"), "geohash": gh})

    return ds.select_columns(["doc_id", "lat", "lon"]).map_batches(
        encode, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# grid spatial clustering (grid-DBSCAN / connected occupied cells)
# ---------------------------------------------------------------------------

_GRID_M = np.int64(1 << 30)  # cell key = gx * 2^30 + gy (gx, gy < 2^30)


def grid_clusters(sf_dir: str, cell_us: int = 500, n_buckets: int = 64):
    """Density-connected spatial clusters of the page corpus → Dataset
    (gx, gy, n_points, cluster_id): bucket every page into a
    ``cell_us``-microdegree grid cell, then cluster cells that are
    4-adjacent (the grid-DBSCAN shape — point-pair-free, so a dense
    hot spot costs O(occupied cells), never O(points²)).

    cluster_id = the component's min cell key (the dup_clusters
    contract); isolated occupied cells are their own singleton cluster.

    Scale shape (100-TB): points reduce to per-batch (cell, count)
    partials — at most `occupied cells` rows leave any task — then ONE
    bucketed cell shuffle; adjacency (east/south searchsorted probes —
    each undirected edge generated exactly once), union-find and
    resolution run in ONE output-sized task over the density-reduced
    cell table. Grid indices are offset non-negative BEFORE division
    so floor and truncation agree across engines (the dsir_select
    ``//`` gotcha)."""
    from vtzero_ray.functions.dedup import _uf_forest
    from vtzero_ray.sources.pages import read_pages
    from vtzero_ray.stages.geoparse import geoparse

    ds = geoparse(read_pages(sf_dir, include_html=False))

    def cells_partial(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy()
        lon = t.column("lon").to_numpy()
        lat_us = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        lon_us = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        gy = (lat_us + 90_000_000) // cell_us
        gx = (lon_us + 180_000_000) // cell_us
        key = gx * _GRID_M + gy
        uk, cnt = np.unique(key, return_counts=True)
        b = _key_bucket(uk, n_buckets)
        return pa.table({"bucket": pa.array(b), "key": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = ds.select_columns(["lat", "lon"]).map_batches(
        cells_partial, batch_format="pyarrow", batch_size=None)

    def merge_cells(df) -> "pd.DataFrame":
        g = df.groupby("key", sort=False)["n"].sum().reset_index()
        return g

    cells = parts.groupby("bucket").map_groups(merge_cells,
                                               batch_format="pandas")

    # adjacency + components + resolve run in ONE task over the global
    # CELL table (the dup_clusters final-task contract: the cell table —
    # already density-reduced, never the point table — fits one worker;
    # past ~10^8 occupied cells, swap this stage for the bucketed-probe
    # + tree-reduced-forest composition). Collapsing the three
    # output-sized stages into one task removes three orchestration
    # barriers (the ngram_topk lesson: ~1 s each even on tiny data).
    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"gx": pa.array([], pa.int64()),
                             "gy": pa.array([], pa.int64()),
                             "n_points": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64())})
        k = t.column("key").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        ks = np.sort(k)
        ea, eb = [], []
        for delta in (int(_GRID_M), 1):  # east, south neighbors
            pos = np.searchsorted(ks, k + delta)
            hit = (pos < ks.shape[0]) & (ks[np.minimum(pos, ks.shape[0] - 1)]
                                         == k + delta)
            ea.append(k[hit])
            eb.append(k[hit] + delta)
        a = np.concatenate(ea)
        b = np.concatenate(eb)
        parent, find = _uf_forest(a, b)
        cl = np.array([find(x) if x in parent else x for x in k], np.int64)
        return pa.table({"gx": pa.array(k // _GRID_M),
                         "gy": pa.array(k % _GRID_M),
                         "n_points": pa.array(n),
                         "cluster_id": pa.array(cl)})

    return cells.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                            batch_size=None)


def _key_bucket(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    mult = np.uint64(0x9E3779B97F4A7C15)
    return ((keys.astype(np.uint64) * mult) >> np.uint64(40)) \
        .astype(np.int64) % n_buckets


# ---------------------------------------------------------------------------
# persisted spatial index (bbox range queries with file-level pruning)
# ---------------------------------------------------------------------------

_BAND_US = 15_000_000  # 15° partition bands → ≤ 12 × 24 = 288 partitions


def _band_key(lat_us: np.ndarray, lon_us: np.ndarray) -> np.ndarray:
    """Partition key: 15°-band row-major cell — PURE integer arithmetic
    on non-negative offsets (no float ever touches partitioning, so
    build and query can never disagree about a row's partition)."""
    by = (lat_us + 90_000_000) // _BAND_US
    bx = (lon_us + 180_000_000) // _BAND_US
    return by * 24 + bx


def build_geo_index(sf_dir: str, out_dir: str) -> str:
    """Persist the page corpus partitioned by 15° lat/lon band — the
    spatial member of the persisted-index family (build_ivf_index /
    build_text_index / build_md5_index): built ONCE, then every bbox
    range query reads ONLY the partitions its box intersects
    (file-level skip; see bbox_query_indexed). ONE corpus pass.

    Layout: ``{out_dir}/pts/bpart={key}/*.parquet`` (band key kept as a
    data column too) + ``{out_dir}/meta.parquet`` written LAST — its
    presence implies completeness (the build_ivf_index atomic-publish
    contract: temp dir + os.rename, concurrent builders race
    harmlessly)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from vtzero_ray.sources.pages import read_pages
    from vtzero_ray.stages.geoparse import geoparse

    ds = geoparse(read_pages(sf_dir, include_html=False))

    def tag(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy()
        lon = t.column("lon").to_numpy()
        lat_us = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        lon_us = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        key = _band_key(lat_us, lon_us)
        return pa.table({"doc_id": t.column("doc_id"),
                         "lat_us": pa.array(lat_us),
                         "lon_us": pa.array(lon_us),
                         "band": pa.array(key),
                         "bpart": pa.array(key)})

    pts = ds.select_columns(["doc_id", "lat", "lon"]).map_batches(
        tag, batch_format="pyarrow", batch_size=None)

    out_dir = os.path.normpath(out_dir)
    tmp_dir = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    try:
        pts.write_parquet(f"{tmp_dir}/pts", partition_cols=["bpart"])
        pq.write_table(pa.table({"band_us": pa.array([_BAND_US], pa.int64())}),
                       f"{tmp_dir}/meta.parquet")
        try:
            os.rename(tmp_dir, out_dir)  # atomic publish
        except OSError:
            if not os.path.isfile(f"{out_dir}/meta.parquet"):
                raise
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def bbox_query_indexed(index_dir: str, lat_min_us: int, lat_max_us: int,
                       lon_min_us: int, lon_max_us: int):
    """Range query over a PERSISTED spatial index → Dataset (doc_id,
    lat_us, lon_us) of pages inside the CLOSED bbox. Only partitions
    whose 15° band intersects the box are passed to read_parquet —
    unqueried bands never leave storage (the topk_ivf_indexed
    file-level-skip contract) — then one exact integer filter. The
    band range is computed with the same pure-integer arithmetic the
    build used, so pruning can never drop a matching row."""
    import glob

    import pyarrow.compute as pc
    import ray.data as rd

    by0 = (lat_min_us + 90_000_000) // _BAND_US
    by1 = (lat_max_us + 90_000_000) // _BAND_US
    bx0 = (lon_min_us + 180_000_000) // _BAND_US
    bx1 = (lon_max_us + 180_000_000) // _BAND_US
    keys = [by * 24 + bx for by in range(by0, by1 + 1)
            for bx in range(bx0, bx1 + 1)]
    paths = sorted(f for k in keys
                   for f in glob.glob(f"{index_dir}/pts/bpart={k}/*.parquet"))
    if not paths:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "lat_us": pa.array([], pa.int64()),
                                       "lon_us": pa.array([], pa.int64())}))
    pts = rd.read_parquet(paths, columns=["doc_id", "lat_us", "lon_us"])

    def inside(t: pa.Table) -> pa.Table:
        lat = t.column("lat_us")
        lon = t.column("lon_us")
        m = pc.and_(pc.and_(pc.greater_equal(lat, lat_min_us),
                            pc.less_equal(lat, lat_max_us)),
                    pc.and_(pc.greater_equal(lon, lon_min_us),
                            pc.less_equal(lon, lon_max_us)))
        return t.filter(m)

    return pts.map_batches(inside, batch_format="pyarrow", batch_size=None)


def bbox_query_sql(lat_us_expr: str, lon_us_expr: str,
                   lat_min_us: int, lat_max_us: int,
                   lon_min_us: int, lon_max_us: int,
                   table: str = "documents") -> str:
    """DuckDB twin: the same closed-interval integer bbox over the
    synth microdegree formulas (a full scan — the index is the thing
    under test, the semantics are a WHERE clause)."""
    return (
        f"SELECT doc_id, {lat_us_expr} AS lat_us, {lon_us_expr} AS lon_us "
        f"FROM {table} WHERE {lat_us_expr} BETWEEN {lat_min_us} AND "
        f"{lat_max_us} AND {lon_us_expr} BETWEEN {lon_min_us} AND {lon_max_us}"
    )


def grid_clusters_sql(lat_us_expr: str, lon_us_expr: str,
                      cell_us: int = 500,
                      table: str = "documents") -> str:
    """DuckDB twin: same non-negative integer grid, 4-adjacency
    self-join edges, recursive-closure components (the dup_clusters_sql
    rule: cluster = MIN over reachable labels), COALESCE singletons."""
    m = int(_GRID_M)
    return (
        "WITH RECURSIVE "
        f"pts AS (SELECT ({lon_us_expr} + 180000000) // {cell_us} AS gx, "
        f"({lat_us_expr} + 90000000) // {cell_us} AS gy FROM {table}), "
        f"cells AS (SELECT CAST(gx * {m} + gy AS BIGINT) AS k, gx, gy, "
        "CAST(COUNT(*) AS BIGINT) AS n_points FROM pts GROUP BY 1, 2, 3), "
        "dedges AS (SELECT a.k AS a, b.k AS b FROM cells a JOIN cells b "
        f"ON b.k = a.k + {m} OR b.k = a.k + 1), "
        "edges AS (SELECT a, b FROM dedges UNION ALL SELECT b, a FROM dedges), "
        "nodes AS (SELECT DISTINCT a AS n FROM edges), "
        "reach AS (SELECT n AS node, n AS label FROM nodes "
        "UNION SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node), "
        "clus AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY 1) "
        "SELECT c.gx, c.gy, c.n_points, "
        "CAST(COALESCE(cl.cluster_id, c.k) AS BIGINT) AS cluster_id "
        "FROM cells c LEFT JOIN clus cl ON cl.node = c.k"
    )


def geohash_sql(lat_us_expr: str, lon_us_expr: str,
                table: str = "documents") -> str:
    """DuckDB twin: same integer cell indices, same 40-bit interleave
    (unrolled bit-op sum), same base-32 digit extraction."""
    mx = (1 << _GH_BITS) - 1
    clat = f"LEAST(({lat_us_expr} + 90000000) * {1 << _GH_BITS} // 180000000, {mx})"
    clon = f"LEAST(({lon_us_expr} + 180000000) * {1 << _GH_BITS} // 360000000, {mx})"
    terms = []
    for i in range(_GH_BITS):
        terms.append(f"(((clon >> {_GH_BITS - 1 - i}) & 1) * {1 << (39 - 2 * i)})")
        terms.append(f"(((clat >> {_GH_BITS - 1 - i}) & 1) * {1 << (38 - 2 * i)})")
    hv = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', CAST((hv >> {35 - 5 * j}) & 31 AS INTEGER) + 1, 1)"
        for j in range(8))
    return (
        f"WITH c AS (SELECT doc_id, {clat} AS clat, {clon} AS clon FROM {table}), "
        f"h AS (SELECT doc_id, CAST({hv} AS BIGINT) AS hv FROM c) "
        f"SELECT doc_id, ({chars}) AS geohash FROM h"
    )


# ---------------------------------------------------------------------------
# Hilbert-curve tile ordering (storage-layout locality key)
# ---------------------------------------------------------------------------

def hilbert_d(x, y, z: int) -> np.ndarray:
    """Vectorized xy→d on the order-z Hilbert curve (the classic
    iterative rotation walk). Adjacent d values are 4-adjacent tiles,
    which Morton/geohash interleaving does NOT guarantee — ordering a
    tile sink by d colocates spatial neighbors in storage, the layout
    key for range-scan-friendly 100-TB tile sets.

    Pure int64 bit ops (flips are XOR with n-1, so bits already
    consumed stay irrelevant); both engines compute it identically."""
    if not 1 <= z <= 30:
        raise ValueError(f"z must be in [1, 30], got {z}")
    x = np.asarray(x).astype(np.int64).copy()
    y = np.asarray(y).astype(np.int64).copy()
    n = 1 << z
    if len(x) and (x.min() < 0 or x.max() >= n or
                   y.min() < 0 or y.max() >= n):
        raise ValueError(f"tile coords out of range for z={z}")
    mask = np.int64(n - 1)
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, x ^ mask, x)
        y2 = np.where(flip, y ^ mask, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def hilbert_tiles(sf_dir: str, zoom: int = 6):
    """→ Dataset (x, y, n_pages, hkey): per-tile page counts at ``zoom``
    with each tile's Hilbert key — the tile_assignment aggregate plus
    one scan-stage key computation (output is tile-bounded)."""
    from vtzero_ray.pipelines.tiling import features_dataset

    agg = features_dataset(sf_dir, zooms=(zoom,)) \
        .groupby(["z", "x", "y"]).count()
    if "count()" in agg.schema().names:
        agg = agg.rename_columns({"count()": "n_pages"})

    def add_key(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "n_pages": t.column("n_pages"),
                         "hkey": pa.array(hilbert_d(x, y, zoom))})

    return agg.map_batches(add_key, batch_format="pyarrow",
                           batch_size=None)


def hilbert_sql(tiles_cte: str, z: int) -> str:
    """DuckDB twin over a CTE body producing (x, y, n_pages): the
    rotation walk unrolled as one CTE per level — flips are
    xor(v, n-1), (3*rx)^ry and the flip+swap are CASE chains."""
    n = 1 << z
    parts = [f"WITH tiles AS ({tiles_cte}), ",
             "h0 AS (SELECT x, y, n_pages, CAST(x AS BIGINT) AS hx, "
             "CAST(y AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
             "FROM tiles), "]
    k = 0
    s = n >> 1
    while s > 0:
        k += 1
        rx = f"(hx & {s}) != 0"
        ry = f"(hy & {s}) != 0"
        parts.append(
            f"h{k} AS (SELECT x, y, n_pages, "
            f"CASE WHEN {ry} THEN hx "
            f"WHEN {rx} THEN xor(hy, {n - 1}) ELSE hy END AS hx, "
            f"CASE WHEN {ry} THEN hy "
            f"WHEN {rx} THEN xor(hx, {n - 1}) ELSE hx END AS hy, "
            f"hd + {s * s} * (CASE WHEN {rx} AND {ry} THEN 2 "
            f"WHEN {rx} THEN 3 WHEN {ry} THEN 1 ELSE 0 END) AS hd "
            f"FROM h{k - 1}), ")
        s >>= 1
    body = "".join(parts).rstrip().rstrip(",")
    return body + f" SELECT x, y, n_pages, hd AS hkey FROM h{k}"


# ---------------------------------------------------------------------------
# nearest-segment join (map matching: snap points to the closest polyline)
# ---------------------------------------------------------------------------

def _seg_d2_matrix(px, py, psite, sx0, sy0, sx1, sy1, ssite):
    """Exact point×segment squared-distance matrix — ONE CASE expression
    per pair over exact-int operands, dot cast to float64 BEFORE
    squaring (dot² would overflow int64); own-site pairs masked to inf.
    The op sequence is the nearest_segment expression VERBATIM (both
    the broadcast and the cell-bucketed paths call this, so they stay
    bit-identical to each other and to the SQL twin)."""
    dx = sx1 - sx0
    dy = sy1 - sy0
    len2 = dx * dx + dy * dy
    pax = px[:, None] - sx0[None, :]
    pay = py[:, None] - sy0[None, :]
    dot = pax * dx[None, :] + pay * dy[None, :]
    p2a = pax * pax + pay * pay
    pbx = px[:, None] - sx1[None, :]
    pby = py[:, None] - sy1[None, :]
    p2b = pbx * pbx + pby * pby
    interior = (p2a.astype(np.float64)
                - (dot.astype(np.float64) * dot.astype(np.float64))
                / len2.astype(np.float64)[None, :])
    d2 = np.where((len2[None, :] == 0) | (dot <= 0),
                  p2a.astype(np.float64),
                  np.where(dot >= len2[None, :],
                           p2b.astype(np.float64), interior))
    d2[psite[:, None] == ssite[None, :]] = np.inf
    return d2


def _broadcast_best(psite, px, py, s, chunk):
    """Chunked exact scan of the full (site, seg_idx)-sorted segment
    table ``s``: strict < keeps the first-tie winner, so the result
    order is min-(d2, site, seg_idx)."""
    n = len(px)
    best_d2 = np.full(n, np.inf)
    best_site = np.full(n, -1, np.int64)
    best_seg = np.full(n, -1, np.int64)
    for lo in range(0, len(s["site"]), chunk):
        hi = lo + chunk
        d2 = _seg_d2_matrix(px, py, psite,
                            s["wx0"][lo:hi], s["wy0"][lo:hi],
                            s["wx1"][lo:hi], s["wy1"][lo:hi],
                            s["site"][lo:hi])
        j = np.argmin(d2, axis=1)  # first min = smallest (site, seg)
        cand = d2[np.arange(n), j]
        upd = cand < best_d2
        best_d2[upd] = cand[upd]
        best_site[upd] = s["site"][lo:hi][j[upd]]
        best_seg[upd] = s["seg_idx"][lo:hi][j[upd]]
    return best_site, best_seg, best_d2


def nearest_segment(sf_dir: str, zoom: int = 6, extent: int = 4096,
                    chunk: int = 4096, max_segments: int = 2_000_000):
    """→ Dataset (doc_id, site, seg_idx, d_q3): for every page, the
    nearest world-coordinate path segment of any OTHER site (own-site
    segments pass through the page's own vertex at distance 0, so
    excluding them makes this the map-matching shape: snap a point to
    the closest foreign polyline). Ties break (d2, site, seg_idx) asc.

    Scale shape: map matching snaps a corpus to a REFERENCE network,
    and reference networks are broadcast-side by nature (the PIPJoin
    admin-polygon assumption — bounded, index-like, NOT corpus-sized).
    This synth derivation reuses the site paths as the stand-in
    network, and site paths DO grow with the corpus — so the broadcast
    is guarded by ``max_segments`` and raises LOUDLY past it (the
    star-guard contract); an unbounded network needs the cell-bucketed
    co-partitioned variant (the KNNGrid design) instead. ONE corpus
    scan; per batch the point×segment distance matrix is evaluated in
    segment CHUNKS (sorted by (site, seg_idx), strict < keeps the
    first-tie winner) so memory is chunk-bounded, compute vectorized.

    Float parity: d2 is ONE CASE expression per pair over exact-int
    operands (coords < 2^18 ⇒ every int term < 2^53; dot² would
    overflow int64, so dot is cast to float64 FIRST and the identical
    multiply/divide runs in both engines — the BM25 expression-text
    contract); endpoint branches stay pure int. d_q3 =
    floor(sqrt(d2)*1e3+0.5) on bit-identical doubles."""
    import ray

    from vtzero_ray.pipelines.clip_paths import (_world_points,
                                                 world_segments)

    seg_df = world_segments(sf_dir, zoom=zoom, extent=extent).to_pandas()
    if len(seg_df) > max_segments:
        raise ValueError(
            f"reference network has {len(seg_df)} segments > "
            f"max_segments={max_segments}: broadcast no longer holds — "
            "use a cell-bucketed co-partitioned variant (KNNGrid design)")
    seg_df = seg_df.sort_values(["site", "seg_idx"], kind="stable")
    seg = {c: np.ascontiguousarray(seg_df[c].to_numpy(np.int64))
           for c in ("site", "seg_idx", "wx0", "wy0", "wx1", "wy1")}
    seg_ref = ray.put(seg)

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        s = ray.get(seg_ref)  # plasma-cached per node; arrays zero-copy
        doc = t.column("doc_id").to_numpy().astype(np.int64)
        psite = t.column("site").to_numpy().astype(np.int64)
        px = t.column("wx").to_numpy().astype(np.int64)
        py = t.column("wy").to_numpy().astype(np.int64)
        best_site, best_seg, best_d2 = _broadcast_best(psite, px, py, s,
                                                       chunk)
        keep = np.isfinite(best_d2)
        dq = np.floor(np.sqrt(best_d2[keep]) * 1000.0 + 0.5) \
            .astype(np.int64)
        return pa.table({"doc_id": pa.array(doc[keep]),
                         "site": pa.array(best_site[keep]),
                         "seg_idx": pa.array(best_seg[keep]),
                         "d_q3": pa.array(dq)})

    pts = _world_points(sf_dir, zoom, extent)
    return pts.map_batches(fn, batch_format="pyarrow", batch_size=None)


def nearest_segment_sql(e_ctes: str) -> str:
    """DuckDB twin: same site-path ``e`` CTEs → lead() segments with
    per-site seg_idx → cross join against every page's world point
    (own site excluded) → the SAME d2 CASE expression → QUALIFY
    min-(d2, site, seg_idx)."""
    d2 = ("CASE WHEN len2 = 0 OR dot <= 0 THEN CAST(p2a AS DOUBLE) "
          "WHEN dot >= len2 THEN CAST(p2b AS DOUBLE) "
          "ELSE CAST(p2a AS DOUBLE) - (CAST(dot AS DOUBLE) * "
          "CAST(dot AS DOUBLE)) / CAST(len2 AS DOUBLE) END")
    return (
        f"WITH {e_ctes}, "
        "segs AS (SELECT site, "
        "row_number() OVER w - 1 AS seg_idx, "
        "wx AS wx0, wy AS wy0, lead(wx) OVER w AS wx1, "
        "lead(wy) OVER w AS wy1 FROM e "
        "WINDOW w AS (PARTITION BY site ORDER BY pt_idx) "
        "QUALIFY lead(wx) OVER w IS NOT NULL), "
        "p AS (SELECT doc_id, site AS psite, wx AS px, wy AS py "
        "FROM pts), "
        "terms AS (SELECT p.doc_id, s.site, s.seg_idx, "
        "(s.wx1 - s.wx0) * (s.wx1 - s.wx0) + "
        "(s.wy1 - s.wy0) * (s.wy1 - s.wy0) AS len2, "
        "(p.px - s.wx0) * (s.wx1 - s.wx0) + "
        "(p.py - s.wy0) * (s.wy1 - s.wy0) AS dot, "
        "(p.px - s.wx0) * (p.px - s.wx0) + "
        "(p.py - s.wy0) * (p.py - s.wy0) AS p2a, "
        "(p.px - s.wx1) * (p.px - s.wx1) + "
        "(p.py - s.wy1) * (p.py - s.wy1) AS p2b "
        "FROM p JOIN segs s ON s.site != p.psite), "
        f"cand AS (SELECT doc_id, site, seg_idx, {d2} AS d2 FROM terms) "
        "SELECT doc_id, site, seg_idx, "
        "CAST(floor(sqrt(d2) * 1000.0 + 0.5) AS BIGINT) AS d_q3 "
        "FROM cand QUALIFY row_number() OVER (PARTITION BY doc_id "
        "ORDER BY d2, site, seg_idx) = 1"
    )


def _explode_cells(cxmin, cxmax, cymin, cymax):
    """Vectorized rectangle→cell fan-out: row i expands to every
    (cellx, celly) in [cxmin[i]..cxmax[i]] × [cymin[i]..cymax[i]] →
    (row_idx, cellx, celly)."""
    nx = cxmax - cxmin + 1
    ny = cymax - cymin + 1
    k = nx * ny
    tot = int(k.sum())
    idx = np.repeat(np.arange(len(k), dtype=np.int64), k)
    start = np.concatenate([[0], np.cumsum(k)[:-1]])
    j = np.arange(tot, dtype=np.int64) - np.repeat(start, k)
    ny_r = np.repeat(ny, k)
    return idx, np.repeat(cxmin, k) + j // ny_r, \
        np.repeat(cymin, k) + j % ny_r


def _cell_bucket(cx: np.ndarray, cy: np.ndarray, n_buckets: int):
    return (((cx * 73856093) ^ (cy * 19349663)) % n_buckets) \
        .astype(np.int32)


def nearest_segment_cells(sf_dir: str, zoom: int = 6, extent: int = 4096,
                          cell: int = 8192, rings: int = 1,
                          n_buckets: int = 32, chunk: int = 4096,
                          max_segments: int = 2_000_000):
    """Cell-bucketed CO-PARTITIONED nearest-segment join — the scale
    path `nearest_segment`'s broadcast guard points at: when the
    reference network is corpus-sized, NEITHER side broadcasts. Both
    sides shuffle on the same coarse world-grid key: each segment is
    replicated into every cell its bbox dilated by ``rings`` touches
    (bounded fan-out: a segment spanning S cells emits
    (S_x+2r)(S_y+2r) rows), pages carry their own cell, and each
    shuffle group resolves its pages against only the locally-present
    candidate segments with the SAME exact d2 kernel as the broadcast
    path (`_seg_d2_matrix` — shared code, bit-identical results).

    Exactness: a segment absent from a page's cell has its dilated
    bbox ≥ rings+1 cells away, hence every point of it ≥ rings·cell
    world units away — so best_d2 < (rings·cell)² proves global
    optimality. Pages that can't be proven (sparse regions, or no
    local candidate) fall back to the exact chunked scan against the
    full table inside ONE fused pass-through stage (the cell_knn_join
    Finalize pattern — forking the stream would re-execute lineage);
    the partitioning assumption is that with rings·cell ≥ the network's
    max gap the tail is empty, and the fallback table is lazily
    fetched only by batches that actually contain uncertain rows.
    Output is byte-identical to `nearest_segment` (asserted in tests).
    """
    import ray
    import pandas as pd

    from vtzero_ray.pipelines.clip_paths import (_world_points,
                                                 world_segments)

    seg_df = world_segments(sf_dir, zoom=zoom, extent=extent).to_pandas()
    if len(seg_df) > max_segments:
        raise ValueError(
            f"reference network has {len(seg_df)} segments > "
            f"max_segments={max_segments}")
    seg_df = seg_df.sort_values(["site", "seg_idx"], kind="stable")
    seg_full = {c: np.ascontiguousarray(seg_df[c].to_numpy(np.int64))
                for c in ("site", "seg_idx", "wx0", "wy0", "wx1", "wy1")}
    # full table is the fallback NET only — fetched lazily per batch
    # that actually needs it, never on the happy path
    seg_ref = ray.put(seg_full)

    # --- segment side: bbox-dilated cell replication ---
    sx0 = seg_full["wx0"]
    sy0 = seg_full["wy0"]
    sx1 = seg_full["wx1"]
    sy1 = seg_full["wy1"]
    cxmin = np.minimum(sx0, sx1) // cell - rings
    cxmax = np.maximum(sx0, sx1) // cell + rings
    cymin = np.minimum(sy0, sy1) // cell - rings
    cymax = np.maximum(sy0, sy1) // cell + rings
    idx, rcx, rcy = _explode_cells(cxmin, cxmax, cymin, cymax)
    n = len(idx)
    import ray.data as rd

    seg_rep = rd.from_arrow(pa.table({
        "bucket": pa.array(_cell_bucket(rcx, rcy, n_buckets)),
        "kind": pa.array(np.ones(n, np.int8)),
        "cellx": pa.array(rcx), "celly": pa.array(rcy),
        "doc_id": pa.array(np.full(n, -1, np.int64)),
        "site": pa.array(seg_full["site"][idx]),
        "seg": pa.array(seg_full["seg_idx"][idx]),
        "x0": pa.array(sx0[idx]), "y0": pa.array(sy0[idx]),
        "x1": pa.array(sx1[idx]), "y1": pa.array(sy1[idx]),
    }))

    def prep_points(t: pa.Table) -> pa.Table:
        px = t.column("wx").to_numpy().astype(np.int64)
        py = t.column("wy").to_numpy().astype(np.int64)
        cx = px // cell
        cy = py // cell
        m = len(px)
        return pa.table({
            "bucket": pa.array(_cell_bucket(cx, cy, n_buckets)),
            "kind": pa.array(np.zeros(m, np.int8)),
            "cellx": pa.array(cx), "celly": pa.array(cy),
            "doc_id": pa.array(t.column("doc_id").to_numpy()
                               .astype(np.int64)),
            "site": pa.array(t.column("site").to_numpy()
                             .astype(np.int64)),
            "seg": pa.array(np.full(m, -1, np.int64)),
            "x0": pa.array(px), "y0": pa.array(py),
            "x1": pa.array(np.zeros(m, np.int64)),
            "y1": pa.array(np.zeros(m, np.int64)),
        })

    pts = _world_points(sf_dir, zoom, extent) \
        .map_batches(prep_points, batch_format="pyarrow", batch_size=None)

    guard2 = float(rings * cell) ** 2

    def resolve(df: "pd.DataFrame") -> "pd.DataFrame":
        tune_allocator()
        out = []
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "site": pd.Series([], dtype="int64"),
            "seg": pd.Series([], dtype="int64"),
            "d2": pd.Series([], dtype="float64"),
            "certain": pd.Series([], dtype=bool),
            "psite": pd.Series([], dtype="int64"),
            "px": pd.Series([], dtype="int64"),
            "py": pd.Series([], dtype="int64")})
        for _, g in df.groupby(["cellx", "celly"], sort=False):
            p = g[g["kind"] == 0]
            if p.empty:
                continue
            px = p["x0"].to_numpy(np.int64)
            py = p["y0"].to_numpy(np.int64)
            psite = p["site"].to_numpy(np.int64)
            doc = p["doc_id"].to_numpy(np.int64)
            s = g[g["kind"] == 1].sort_values(["site", "seg"],
                                              kind="stable")
            if s.empty:
                out.append(pd.DataFrame({
                    "doc_id": doc, "site": np.int64(-1),
                    "seg": np.int64(-1), "d2": np.inf, "certain": False,
                    "psite": psite, "px": px, "py": py}))
                continue
            sc = {"site": s["site"].to_numpy(np.int64),
                  "seg_idx": s["seg"].to_numpy(np.int64),
                  "wx0": s["x0"].to_numpy(np.int64),
                  "wy0": s["y0"].to_numpy(np.int64),
                  "wx1": s["x1"].to_numpy(np.int64),
                  "wy1": s["y1"].to_numpy(np.int64)}
            bs, bg, bd2 = _broadcast_best(psite, px, py, sc, chunk)
            out.append(pd.DataFrame({
                "doc_id": doc, "site": bs, "seg": bg, "d2": bd2,
                "certain": np.isfinite(bd2) & (bd2 < guard2),
                "psite": psite, "px": px, "py": py}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    resolved = pts.union(seg_rep).groupby("bucket") \
        .map_groups(resolve, batch_format="pandas")

    # fused fallback (the cell_knn_join Finalize pattern): certain rows
    # keep their local result; uncertain rows re-resolve against the
    # full table — fetched ONLY when such rows exist in the batch
    def finalize(t: pa.Table) -> pa.Table:
        tune_allocator()
        ok = t.column("certain").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy().astype(np.int64)
        site = t.column("site").to_numpy().astype(np.int64)
        seg = t.column("seg").to_numpy().astype(np.int64)
        d2 = t.column("d2").to_numpy().astype(np.float64)
        if not ok.all():
            s = ray.get(seg_ref)
            redo = ~ok
            bs, bg, bd2 = _broadcast_best(
                t.column("psite").to_numpy()[redo].astype(np.int64),
                t.column("px").to_numpy()[redo].astype(np.int64),
                t.column("py").to_numpy()[redo].astype(np.int64),
                s, chunk)
            site = site.copy(); seg = seg.copy(); d2 = d2.copy()
            site[redo] = bs
            seg[redo] = bg
            d2[redo] = bd2
        keep = np.isfinite(d2)
        dq = np.floor(np.sqrt(d2[keep]) * 1000.0 + 0.5).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc[keep]),
                         "site": pa.array(site[keep]),
                         "seg_idx": pa.array(seg[keep]),
                         "d_q3": pa.array(dq)})

    return resolved.map_batches(finalize, batch_format="pyarrow")
