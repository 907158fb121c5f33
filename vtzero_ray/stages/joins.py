"""Spatial joins: point-in-polygon vs admin boundaries, kNN nearest POI.

Ray-native designs (SURVEY.md §2.4):
- PIP: the polygon table is SMALL-SIDE BROADCAST — ``ray.put`` once, read
  in each actor's ``__init__``, bulk-tested per batch. The test is a
  generic convex-polygon cross-product sign test over int64 microdegree
  coordinates (exact integer arithmetic → oracle-comparable).
- kNN: the POI table is broadcast; exact argmin over int64 squared
  distances (ties → poi_id asc). ``KNNGrid`` adds the scale path: a
  coarse-cell grid index built once per actor with ring-expansion search —
  identical results, sub-linear candidate sets.

Join-side tables are synthesized deterministically (same integer
derivations exist in SQL in __ray_entry__.oracle_sql()): admin polygons
are L1-ball "diamonds" with ODD doubled-radius so boundary ties are
impossible; POI positions are Knuth-hashed microdegrees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.pages import HOT_LAT_US, HOT_LON_US, KNUTH

N_ADMINS = 64
N_POIS = 256

# SQL fragments mirrored in oracle_sql(): admin/POI synthesis from range()
SQL_ADMIN = f"""
(SELECT t.range::BIGINT AS admin_id,
        CASE WHEN t.range = 0 THEN {HOT_LAT_US}
             ELSE (((t.range * {KNUTH}) % 4294967296) * 48271) % 160000000 - 80000000 END AS cy_us,
        CASE WHEN t.range = 0 THEN {HOT_LON_US}
             ELSE (((t.range * {KNUTH}) % 4294967296) * 69621) % 360000000 - 180000000 END AS cx_us,
        CASE WHEN t.range = 0 THEN 100000
             ELSE 2000000 + ((t.range * {KNUTH}) % 4294967296) % 8000000 END AS r_us
 FROM range({N_ADMINS}) t)
"""

SQL_POI = f"""
(SELECT t.range::BIGINT AS poi_id,
        CASE WHEN t.range = 0 THEN {HOT_LAT_US}
             ELSE ((((t.range + 1000) * {KNUTH}) % 4294967296) * 48271) % 160000000 - 80000000 END AS py_us,
        CASE WHEN t.range = 0 THEN {HOT_LON_US}
             ELSE ((((t.range + 1000) * {KNUTH}) % 4294967296) * 69621) % 360000000 - 180000000 END AS px_us
 FROM range({N_POIS}) t)
"""


def admin_polygons(n: int = N_ADMINS) -> pd.DataFrame:
    """Deterministic convex admin polygons (diamonds), int64 microdegrees.

    Ring vertices are emitted as a generic polygon ring — the PIP test does
    NOT know they are diamonds.
    """
    aid = np.arange(n, dtype=np.int64)
    h = (aid * KNUTH) % 4294967296
    cy = np.where(aid == 0, HOT_LAT_US, (h * 48271) % 160000000 - 80000000)
    cx = np.where(aid == 0, HOT_LON_US, (h * 69621) % 360000000 - 180000000)
    r = np.where(aid == 0, 100000, 2000000 + h % 8000000)
    rings = []
    for i in range(n):
        # doubled coords; odd doubled-radius → no point ever on the boundary
        r2 = 2 * int(r[i]) + 1
        x2, y2 = 2 * int(cx[i]), 2 * int(cy[i])
        rings.append(np.array([
            [x2 + r2, y2], [x2, y2 + r2], [x2 - r2, y2], [x2, y2 - r2],
        ], dtype=np.int64))
    return pd.DataFrame({"admin_id": aid, "cx_us": cx, "cy_us": cy,
                         "r_us": r, "ring2": rings})


def poi_table(n: int = N_POIS) -> pd.DataFrame:
    pid = np.arange(n, dtype=np.int64)
    h = ((pid + 1000) * KNUTH) % 4294967296
    py = np.where(pid == 0, HOT_LAT_US, (h * 48271) % 160000000 - 80000000)
    px = np.where(pid == 0, HOT_LON_US, (h * 69621) % 360000000 - 180000000)
    return pd.DataFrame({"poi_id": pid, "px_us": px, "py_us": py})


def _points_in_convex(ring2: np.ndarray, x2: np.ndarray, y2: np.ndarray) -> np.ndarray:
    """Vectorized strict-inside test for a CCW convex ring (int64 exact).

    Cross product (b-a) x (p-a) > 0 for every edge. Same primitive as the
    reference's ring-area det (geometry.hpp:120-123), applied per edge.
    """
    inside = np.ones(x2.shape[0], dtype=bool)
    m = ring2.shape[0]
    for i in range(m):
        ax, ay = ring2[i]
        bx, by = ring2[(i + 1) % m]
        cross = (bx - ax) * (y2 - ay) - (by - ay) * (x2 - ax)
        inside &= cross > 0
    return inside


class PIPJoin:
    """Actor-pool map_batches stage: assigns admin_id (min matching id,
    -1 if none). Broadcast polygons fetched once per actor.

    Polygon probing is cell-bucketed (SURVEY §2.4's indexed-broadcast
    row): ``__init__`` builds a coarse ``grid_n × grid_n`` grid over the
    polygons' global bbox and buckets each polygon — in DESC admin_id
    order — into every cell its bbox intersects; ``__call__`` groups the
    batch's points by cell and tests ONLY that cell's candidates, so
    per-point cost is O(candidates-in-cell), not O(P). Exactness: a
    polygon whose bbox contains a point necessarily intersects the cell
    containing that point, so the candidate list is a superset of the
    bbox prefilter; DESC-id iteration inside the cell keeps the
    min-id-wins write order byte-identical to the full scan.
    """

    def __init__(self, polygons_ref=None, grid_n: int = 64) -> None:
        if polygons_ref is None:
            self.polys = admin_polygons()
        elif isinstance(polygons_ref, pd.DataFrame):
            self.polys = polygons_ref  # direct table (tests / local use)
        else:
            import ray

            self.polys = ray.get(polygons_ref)
        # bbox prefilter arrays (built once per actor)
        self.boxes = np.stack([
            np.array([r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()])
            for r in self.polys["ring2"]
        ])
        self.aid = self.polys["admin_id"].to_numpy()
        self.rings = list(self.polys["ring2"])
        gx0 = int(self.boxes[:, 0].min())
        gy0 = int(self.boxes[:, 1].min())
        gx1 = int(self.boxes[:, 2].max())
        gy1 = int(self.boxes[:, 3].max())
        self.gx0, self.gy0, self.gx1, self.gy1 = gx0, gy0, gx1, gy1
        self.grid_n = grid_n
        self.csx = max(1, -(-(gx1 - gx0 + 1) // grid_n))
        self.csy = max(1, -(-(gy1 - gy0 + 1) // grid_n))
        cells: dict[int, list[int]] = {}
        for i in np.argsort(-self.aid, kind="stable"):  # DESC admin_id
            b = self.boxes[i]
            cx0 = max(0, (int(b[0]) - gx0) // self.csx)
            cx1 = min(grid_n - 1, (int(b[2]) - gx0) // self.csx)
            cy0 = max(0, (int(b[1]) - gy0) // self.csy)
            cy1 = min(grid_n - 1, (int(b[3]) - gy0) // self.csy)
            for cx in range(cx0, cx1 + 1):
                for cy in range(cy0, cy1 + 1):
                    cells.setdefault(cx * grid_n + cy, []).append(int(i))
        self.cells = {k: np.asarray(v, dtype=np.int64)
                      for k, v in cells.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        # exact microdegrees back from the float degrees (lossless: lat=us/1e6)
        y2 = (np.round(lat * 1e6) * 2).astype(np.int64)
        x2 = (np.round(lon * 1e6) * 2).astype(np.int64)
        assigned = np.full(x2.shape[0], -1, dtype=np.int64)
        inb = ((x2 >= self.gx0) & (x2 <= self.gx1)
               & (y2 >= self.gy0) & (y2 <= self.gy1))
        pidx = np.nonzero(inb)[0]
        if pidx.size:
            key = (((x2[pidx] - self.gx0) // self.csx) * self.grid_n
                   + ((y2[pidx] - self.gy0) // self.csy))
            order = np.argsort(key, kind="stable")
            key_s, pidx = key[order], pidx[order]
            starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
            bounds = np.r_[starts, key_s.size]
            for s, e in zip(bounds[:-1], bounds[1:]):
                cand = self.cells.get(int(key_s[s]))
                if cand is None:
                    continue
                sub = pidx[s:e]
                xs, ys = x2[sub], y2[sub]
                for i in cand:  # DESC admin_id -> final write is MIN id
                    box = self.boxes[i]
                    m = ((xs >= box[0]) & (ys >= box[1])
                         & (xs <= box[2]) & (ys <= box[3]))
                    if not m.any():
                        continue
                    j = np.nonzero(m)[0]
                    hit = _points_in_convex(self.rings[i], xs[j], ys[j])
                    assigned[sub[j[hit]]] = self.aid[i]
        return batch.append_column("admin_id", pa.array(assigned, pa.int64()))


class KNNJoin:
    """Exact nearest-POI: broadcast POI matrix, int64 squared distances,
    ties → poi_id asc. Vectorized (B×P) distance matrix per batch."""

    def __init__(self, pois_ref=None) -> None:
        if pois_ref is not None:
            import ray

            pois = ray.get(pois_ref)
        else:
            pois = poi_table()
        self.pid = pois["poi_id"].to_numpy()
        self.px = pois["px_us"].to_numpy().astype(np.int64)
        self.py = pois["py_us"].to_numpy().astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat_us = np.round(batch.column("lat").to_numpy() * 1e6).astype(np.int64)
        lon_us = np.round(batch.column("lon").to_numpy() * 1e6).astype(np.int64)
        dx = lon_us[:, None] - self.px[None, :]
        dy = lat_us[:, None] - self.py[None, :]
        d2 = dx * dx + dy * dy
        best = np.argmin(d2, axis=1)  # first occurrence = lowest index = lowest poi_id
        return (
            batch.append_column("poi_id", pa.array(self.pid[best], pa.int64()))
            .append_column("poi_d2", pa.array(d2[np.arange(d2.shape[0]), best], pa.int64()))
        )


def cell_knn_join(points_ds, cell_us: int = 10_000_000, rings: int = 3,
                  n_buckets: int = 32):
    """Cell-keyed CO-PARTITIONED nearest-POI join (SURVEY §2.4).

    Both sides shuffle on the SAME coarse-cell key: POIs are replicated
    into every cell within ``rings`` Chebyshev distance (boundary-cell
    duplication), points carry their own cell, and each shuffle group
    resolves its points against only the locally-present candidates —
    processed as per-cell COHORTS with one vectorized distance matrix per
    cell (no per-row Python walker). A point whose best local candidate
    cannot be proven globally nearest (best_d2 >= (rings*cell_us)^2, or
    no local candidate at all) falls back to the exact broadcast pass, so
    results are IDENTICAL to KNNJoin. Partitioning assumption: for dense
    POI corpora the fallback set is empty; with the synthetic 256-POI
    world it is the sparse-region tail.
    """
    import ray
    import ray.data as rd

    pois = poi_table()
    # small side replicated to its neighbor cells (P * (2R+1)^2 rows)
    reps = []
    for di in range(-rings, rings + 1):
        for dj in range(-rings, rings + 1):
            reps.append(pd.DataFrame({
                "kind": np.int8(1),
                "url": "",
                "a_us": pois["px_us"].to_numpy(),
                "b_us": pois["py_us"].to_numpy(),
                "cellx": pois["px_us"].to_numpy() // cell_us + di,
                "celly": pois["py_us"].to_numpy() // cell_us + dj,
                "poi_id": pois["poi_id"].to_numpy(),
            }))
    rep = pd.concat(reps, ignore_index=True).sort_values("poi_id", kind="stable")
    rep["bucket"] = ((rep.cellx * 73856093 ^ rep.celly * 19349663)
                     % n_buckets).astype(np.int32)
    poi_ds = rd.from_pandas(rep.reset_index(drop=True))

    def prep_points(t: pa.Table) -> pa.Table:
        lat_us = np.round(t.column("lat").to_numpy() * 1e6).astype(np.int64)
        lon_us = np.round(t.column("lon").to_numpy() * 1e6).astype(np.int64)
        cx = lon_us // cell_us
        cy = lat_us // cell_us
        return pa.table({
            "kind": pa.array(np.zeros(len(t), np.int8)),
            "url": t.column("url"),
            "a_us": pa.array(lon_us),
            "b_us": pa.array(lat_us),
            "cellx": pa.array(cx),
            "celly": pa.array(cy),
            "poi_id": pa.array(np.full(len(t), -1, np.int64)),
            "bucket": pa.array(((cx * 73856093) ^ (cy * 19349663))
                               .astype(np.int64) % n_buckets, pa.int32()),
        })

    pts = points_ds.map_batches(prep_points, batch_format="pyarrow")
    both = pts.union(poi_ds.map_batches(lambda t: t.select(
        ["kind", "url", "a_us", "b_us", "cellx", "celly", "poi_id", "bucket"]),
        batch_format="pyarrow"))

    guard2 = (rings * cell_us) ** 2

    def resolve(t: pa.Table) -> pa.Table:
        # Arrow-native group processor (VERDICT r4 #6): ONE lexsort puts
        # each cell's rows contiguous with points (kind 0, original
        # order) before its poi_id-ascending candidates — argmin's
        # first-minimum rule then implements the (d2, poi_id) tie-break
        # exactly as the old pandas groupby did.
        empty = pa.table({"url": pa.array([], pa.string()),
                          "poi_id": pa.array([], pa.int64()),
                          "poi_d2": pa.array([], pa.int64()),
                          "certain": pa.array([], pa.bool_()),
                          "lat": pa.array([], pa.float64()),
                          "lon": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        kind = t.column("kind").to_numpy().astype(np.int8)
        a = t.column("a_us").to_numpy().astype(np.int64)
        b = t.column("b_us").to_numpy().astype(np.int64)
        cx_ = t.column("cellx").to_numpy().astype(np.int64)
        cy_ = t.column("celly").to_numpy().astype(np.int64)
        pid = t.column("poi_id").to_numpy().astype(np.int64)
        urls = t.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        order = np.lexsort((pid, kind, cy_, cx_))
        sc_x, sc_y, sk = cx_[order], cy_[order], kind[order]
        change = np.r_[True, (sc_x[1:] != sc_x[:-1])
                       | (sc_y[1:] != sc_y[:-1])]
        bounds = np.r_[np.flatnonzero(change), order.shape[0]]
        out_u, out_pid, out_d2, out_cert = [], [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n_p = int(np.searchsorted(sk[s:e], 1))
            if n_p == 0:
                continue
            p_idx = order[s:s + n_p]
            c_idx = order[s + n_p:e]
            out_u.append(p_idx)
            if c_idx.shape[0] == 0:
                out_pid.append(np.full(n_p, -1, np.int64))
                out_d2.append(np.full(n_p, -1, np.int64))
                out_cert.append(np.zeros(n_p, bool))
                continue
            dx = a[p_idx][:, None] - a[c_idx][None, :]
            dy = b[p_idx][:, None] - b[c_idx][None, :]
            d2 = dx * dx + dy * dy
            best = np.argmin(d2, axis=1)
            bd2 = d2[np.arange(d2.shape[0]), best]
            out_pid.append(pid[c_idx][best])
            out_d2.append(bd2)
            out_cert.append(bd2 < guard2)
        if not out_u:
            return empty
        u = np.concatenate(out_u)
        return pa.table({
            "url": pa.compute.take(urls, pa.array(u)),
            "poi_id": pa.array(np.concatenate(out_pid)),
            "poi_d2": pa.array(np.concatenate(out_d2)),
            "certain": pa.array(np.concatenate(out_cert)),
            "lat": pa.array(b[u] / 1e6, pa.float64()),
            "lon": pa.array(a[u] / 1e6, pa.float64()),
        })

    resolved = both.groupby("bucket").map_groups(resolve,
                                                 batch_format="pyarrow")

    # sparse-region fallback FUSED into one pass-through stage: certain rows
    # keep their local result, uncertain rows are re-resolved exactly against
    # the broadcast POI matrix. (Two filter branches over `resolved` would
    # re-execute the whole co-partitioned join once per branch — Ray Data
    # lineage has no shared-subplan cache.)
    class Finalize(KNNJoin):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ok = batch.column("certain").to_numpy(zero_copy_only=False)
            if ok.all():
                return batch.select(["url", "poi_id", "poi_d2"])
            sure = batch.filter(pa.array(ok)).select(["url", "poi_id", "poi_d2"])
            redo = KNNJoin.__call__(
                self, batch.filter(pa.array(~ok)).select(["url", "lat", "lon"])
            ).select(["url", "poi_id", "poi_d2"])
            return pa.concat_tables([sure, redo])

    return resolved.map_batches(Finalize, batch_format="pyarrow",
                                concurrency=(1, 4))


class KNNGrid:
    """Scale-path kNN: coarse-cell grid over POIs built once per actor;
    ring-expansion search guarantees exactness (expand until the best found
    distance is <= the minimum possible distance of the next unexplored
    ring). Results identical to KNNJoin."""

    CELL_US = 10_000_000  # 10-degree cells

    def __init__(self, pois_ref=None) -> None:
        if pois_ref is not None:
            import ray

            pois = ray.get(pois_ref)
        else:
            pois = poi_table()
        self.pid = pois["poi_id"].to_numpy()
        self.px = pois["px_us"].to_numpy().astype(np.int64)
        self.py = pois["py_us"].to_numpy().astype(np.int64)
        cx = self.px // self.CELL_US
        cy = self.py // self.CELL_US
        self.grid: dict[tuple[int, int], np.ndarray] = {}
        for i in range(self.pid.shape[0]):
            self.grid.setdefault((int(cx[i]), int(cy[i])), []).append(i)
        self.grid = {k: np.array(v, dtype=np.int64) for k, v in self.grid.items()}

    def _ring_candidates(self, cx: int, cy: int, ring: int) -> np.ndarray | None:
        """POI indices (poi_id-ascending) in grid cells at exactly Chebyshev
        distance ``ring`` from (cx, cy); None if the ring is empty."""
        idxs = []
        for gx in range(cx - ring, cx + ring + 1):
            for gy in range(cy - ring, cy + ring + 1):
                if max(abs(gx - cx), abs(gy - cy)) == ring and (gx, gy) in self.grid:
                    idxs.append(self.grid[(gx, gy)])
        if not idxs:
            return None
        # ascending POI index == ascending poi_id → argmin's first-minimum
        # rule implements the (d2, poi_id) tie-break for free
        return np.sort(np.concatenate(idxs))

    def _nearest_cohort(self, xs: np.ndarray, ys: np.ndarray,
                        cx: int, cy: int) -> tuple[np.ndarray, np.ndarray]:
        """All points of one cell, resolved together: one (rows × ring-cands)
        distance matrix per ring, rows retiring as soon as their best found
        distance beats the next ring's minimum possible distance."""
        n = xs.shape[0]
        best_d2 = np.full(n, np.iinfo(np.int64).max, np.int64)
        best_i = np.full(n, -1, np.int64)
        active = np.arange(n)
        ring = 0
        while active.size and ring <= 41:
            cand = self._ring_candidates(cx, cy, ring)
            if cand is not None:
                dx = self.px[cand][None, :] - xs[active][:, None]
                dy = self.py[cand][None, :] - ys[active][:, None]
                d2 = dx * dx + dy * dy
                j = np.argmin(d2, axis=1)  # first min → smallest poi_id
                nd2 = d2[np.arange(active.size), j]
                ni = cand[j]
                better = (nd2 < best_d2[active]) | (
                    (nd2 == best_d2[active]) & (ni < best_i[active]))
                upd = active[better]
                best_d2[upd] = nd2[better]
                best_i[upd] = ni[better]
            ring += 1
            min_next = (ring - 1) * self.CELL_US
            # strict <: on an exact boundary tie the next ring may hold an
            # equidistant POI with a smaller poi_id — explore one more ring
            if min_next > 0:
                settled = best_d2[active] < min_next * min_next
                active = active[~settled]
        return best_i, best_d2

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat_us = np.round(batch.column("lat").to_numpy() * 1e6).astype(np.int64)
        lon_us = np.round(batch.column("lon").to_numpy() * 1e6).astype(np.int64)
        cx = lon_us // self.CELL_US
        cy = lat_us // self.CELL_US
        # cohort rows by home cell: few distinct cells, one vectorized
        # ring-search per cohort (no per-row Python walker)
        key = cx * np.int64(1 << 20) + cy
        uniq, inv = np.unique(key, return_inverse=True)
        out_id = np.empty(lat_us.shape[0], dtype=np.int64)
        out_d2 = np.empty(lat_us.shape[0], dtype=np.int64)
        for u in range(uniq.shape[0]):
            rows = np.nonzero(inv == u)[0]
            bi, bd2 = self._nearest_cohort(
                lon_us[rows], lat_us[rows], int(cx[rows[0]]), int(cy[rows[0]]))
            out_id[rows] = self.pid[bi]
            out_d2[rows] = bd2
        return (
            batch.append_column("poi_id", pa.array(out_id, pa.int64()))
            .append_column("poi_d2", pa.array(out_d2, pa.int64()))
        )
