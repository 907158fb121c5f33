"""Geo ops (functions/geo.py): geohash against the classic test vector
and an independent bisection decoder; path lengths against a brute-force
per-site recomputation from the world points."""

import numpy as np
import pandas as pd
import pytest

from vtzero_ray.functions.geo import (GEOHASH_ALPHABET, _geohash_from_us,
                                      geohash_cells, path_lengths)

SF = "/root/testdata/sf0.001"


def _decode_geohash(gh: str):
    """Independent decoder: classic bisection → (lat_lo, lat_hi, lon_lo,
    lon_hi) bounding box in degrees."""
    lat = [-90.0, 90.0]
    lon = [-180.0, 180.0]
    is_lon = True
    for ch in gh:
        d = GEOHASH_ALPHABET.index(ch)
        for bit in (16, 8, 4, 2, 1):
            rng = lon if is_lon else lat
            mid = (rng[0] + rng[1]) / 2
            rng[0 if d & bit else 1] = mid
            is_lon = not is_lon
    return lat[0], lat[1], lon[0], lon[1]


class TestGeohash:
    def test_classic_vector(self):
        # the canonical example: geohash.org/u4pruydq
        codes = _geohash_from_us(np.array([57649110], np.int64),
                                 np.array([10407440], np.int64))
        assert bytes(codes[0]).decode() == "u4pruydq"

    def test_corners_and_zero(self):
        codes = _geohash_from_us(
            np.array([0, -90_000_000, 89_999_999], np.int64),
            np.array([0, -180_000_000, 179_999_999], np.int64))
        got = [bytes(c).decode() for c in codes]
        assert got[0] == "s0000000"  # (0,0) → s000…
        assert got[1] == "00000000"  # SW corner → all zeros
        assert got[2][0] == "z"      # NE corner → z…

    def test_roundtrip_containment(self, ray_session):
        """Every emitted geohash's bisection bbox contains its page's
        lat/lon (up to the microdegree grid)."""
        out = geohash_cells(SF).to_pandas()
        assert len(out) > 0
        assert out.geohash.str.len().eq(8).all()
        # recompute the microdegrees from doc_id (the synth formula)
        from vtzero_ray.sources.pages import _geo_microdeg

        lat_us, lon_us = _geo_microdeg(out.doc_id.to_numpy())
        for gh, la, lo in zip(out.geohash, lat_us / 1e6, lon_us / 1e6):
            la0, la1, lo0, lo1 = _decode_geohash(gh)
            # cell width is 180/2^20 deg ≈ 1.7e-4 — allow the half-open
            # boundary on the high side
            assert la0 - 1e-9 <= la <= la1 + 1e-9
            assert lo0 - 1e-9 <= lo <= lo1 + 1e-9


class TestGridClusters:
    def test_matches_independent_closure(self, ray_session):
        """Cluster labels equal a plain-Python BFS over the occupied
        4-adjacent cells, recomputed from the synth formula."""
        from vtzero_ray.functions.geo import grid_clusters
        from vtzero_ray.sources.pages import _geo_microdeg

        got = grid_clusters(SF, cell_us=500).to_pandas()

        import duckdb
        n_docs = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()[0]
        lat_us, lon_us = _geo_microdeg(np.arange(n_docs, dtype=np.int64))
        gy = (lat_us + 90_000_000) // 500
        gx = (lon_us + 180_000_000) // 500
        cells = {}
        for x, y in zip(gx, gy):
            cells[(int(x), int(y))] = cells.get((int(x), int(y)), 0) + 1
        # BFS components over 4-adjacency
        label = {}
        for c in sorted(cells):
            if c in label:
                continue
            comp, stack = [], [c]
            seen = {c}
            while stack:
                u = stack.pop()
                comp.append(u)
                for v in ((u[0] + 1, u[1]), (u[0] - 1, u[1]),
                          (u[0], u[1] + 1), (u[0], u[1] - 1)):
                    if v in cells and v not in seen:
                        seen.add(v)
                        stack.append(v)
            root = min(x * (1 << 30) + y for x, y in comp)
            for u in comp:
                label[u] = root

        assert len(got) == len(cells)
        for r in got.itertuples():
            assert cells[(r.gx, r.gy)] == r.n_points
            assert label[(r.gx, r.gy)] == r.cluster_id

    def test_hot_cluster_forms(self, ray_session):
        """The synth corpus's hot-NYC 30% lands in one multi-cell
        cluster holding ~30% of the pages."""
        from vtzero_ray.functions.geo import grid_clusters

        got = grid_clusters(SF, cell_us=500).to_pandas()
        agg = got.groupby("cluster_id").agg(cells=("gx", "count"),
                                            pts=("n_points", "sum"))
        top = agg.sort_values("cells", ascending=False).iloc[0]
        assert top.cells > 1
        assert top.pts >= 0.29 * got.n_points.sum()


class TestGeoIndex:
    BBOX = (39_000_000, 46_000_000, -76_000_000, -73_000_000)

    def _build(self, tmp_path):
        from vtzero_ray.functions.geo import build_geo_index

        idx = str(tmp_path / "geoidx")
        build_geo_index(SF, idx)
        return idx

    def test_matches_full_scan(self, ray_session, tmp_path):
        from vtzero_ray.functions.geo import bbox_query_indexed
        from vtzero_ray.sources.pages import _geo_microdeg

        idx = self._build(tmp_path)
        got = bbox_query_indexed(idx, *self.BBOX).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # brute force from the synth formula
        import duckdb
        n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')").fetchone()[0]
        ids = np.arange(n, dtype=np.int64)
        lat_us, lon_us = _geo_microdeg(ids)
        la0, la1, lo0, lo1 = self.BBOX
        m = (lat_us >= la0) & (lat_us <= la1) & (lon_us >= lo0) & (lon_us <= lo1)
        exp = pd.DataFrame({"doc_id": ids[m], "lat_us": lat_us[m],
                            "lon_us": lon_us[m]}).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
        assert len(got) > 0

    def test_unqueried_partitions_never_read(self, ray_session, tmp_path):
        """Deleting every partition OUTSIDE the bbox's bands must not
        change the result — proof the query lists only probed files."""
        import glob
        import os
        import shutil

        from vtzero_ray.functions.geo import _BAND_US, bbox_query_indexed

        idx = self._build(tmp_path)
        before = bbox_query_indexed(idx, *self.BBOX).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        la0, la1, lo0, lo1 = self.BBOX
        keep = {by * 24 + bx
                for by in range((la0 + 90_000_000) // _BAND_US,
                                (la1 + 90_000_000) // _BAND_US + 1)
                for bx in range((lo0 + 180_000_000) // _BAND_US,
                                (lo1 + 180_000_000) // _BAND_US + 1)}
        removed = 0
        for d in glob.glob(f"{idx}/pts/bpart=*"):
            if int(os.path.basename(d).split("=")[1]) not in keep:
                shutil.rmtree(d)
                removed += 1
        assert removed > 0  # the corpus does occupy other bands
        after = bbox_query_indexed(idx, *self.BBOX).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(after, before)

    def test_empty_bbox(self, ray_session, tmp_path):
        from vtzero_ray.functions.geo import bbox_query_indexed

        idx = self._build(tmp_path)
        # mid-Pacific 1µdeg sliver — a band may be occupied, the box isn't
        out = bbox_query_indexed(idx, -1_000_001, -1_000_000,
                                 -171_000_001, -171_000_000).to_pandas()
        assert len(out) == 0


class TestPathLengths:
    def test_matches_bruteforce(self, ray_session):
        from vtzero_ray.pipelines.clip_paths import _world_points

        pts = _world_points(SF, zoom=6, extent=4096).to_pandas()
        exp = {}
        for site, g in pts.groupby("site"):
            g = g.sort_values("doc_id", kind="stable")
            wx = g.wx.to_numpy(np.int64)
            wy = g.wy.to_numpy(np.int64)
            keep = np.ones(len(g), bool)
            keep[1:] = (wx[1:] != wx[:-1]) | (wy[1:] != wy[:-1])
            wx, wy = wx[keep], wy[keep]
            if len(wx) < 2:
                continue
            dx = wx[1:] - wx[:-1]
            dy = wy[1:] - wy[:-1]
            ln = np.floor(np.sqrt((dx * dx + dy * dy).astype(np.float64))
                          * 1e6 + 0.5).astype(np.int64)
            exp[int(site)] = (len(dx), int(ln.sum()))

        got = path_lengths(SF, zoom=6).to_pandas()
        got_map = {int(r.site): (int(r.n_segments), int(r.length_q6))
                   for r in got.itertuples()}
        assert got_map == exp

    def test_batching_independence(self, ray_session):
        a = path_lengths(SF, zoom=6).to_pandas() \
            .sort_values("site").reset_index(drop=True)
        b = path_lengths(SF, zoom=6).to_pandas() \
            .sort_values("site").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestHilbert:
    def test_canonical_order1_curve(self):
        from vtzero_ray.functions.geo import hilbert_d

        d = hilbert_d(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]), 1)
        assert d.tolist() == [0, 1, 2, 3]

    def test_bijection_and_locality(self):
        """On the full grid the key is a bijection onto [0, 4^z) and
        consecutive keys are 4-adjacent tiles — the property Morton
        interleaving lacks and the reason to order a tile sink by it."""
        from vtzero_ray.functions.geo import hilbert_d

        for z in (2, 3, 5):
            n = 1 << z
            xs, ys = np.meshgrid(np.arange(n), np.arange(n),
                                 indexing="ij")
            d = hilbert_d(xs.ravel(), ys.ravel(), z)
            assert sorted(d.tolist()) == list(range(n * n))
            order = np.argsort(d)
            dx = np.abs(np.diff(xs.ravel()[order]))
            dy = np.abs(np.diff(ys.ravel()[order]))
            assert ((dx + dy) == 1).all()

    def test_out_of_range_raises(self):
        from vtzero_ray.functions.geo import hilbert_d

        with pytest.raises(ValueError):
            hilbert_d(np.array([4]), np.array([0]), 2)

    def test_sql_twin_full_grid(self):
        import duckdb

        from vtzero_ray.functions.geo import hilbert_d, hilbert_sql

        con = duckdb.connect()
        df = con.execute(hilbert_sql(
            "SELECT a.range::INTEGER AS x, b.range::INTEGER AS y, "
            "1::BIGINT AS n_pages FROM range(16) a, range(16) b", 4)) \
            .df().sort_values(["x", "y"]).reset_index(drop=True)
        want = hilbert_d(df["x"].to_numpy(), df["y"].to_numpy(), 4)
        assert (df["hkey"].to_numpy() == want).all()

    def test_pipeline_matches_twin(self, ray_session):
        import duckdb
        import pandas as pd

        import __ray_entry__ as e

        sf = "/root/testdata/sf0.001"
        got = e.queries_extra()["hilbert_tiles_z6"](sf).to_pandas() \
            .sort_values(["x", "y"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(e.oracle_sql_extra()["hilbert_tiles_z6"]).df() \
            .sort_values(["x", "y"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestNearestSegment:
    def test_hand_distances(self, ray_session):
        """Brute-force recomputation with exact rational arithmetic on a
        small slice: the chosen segment truly minimizes distance and
        d_q3 matches an independent scalar derivation."""
        from fractions import Fraction

        import duckdb

        import __ray_entry__ as e

        sf = "/root/testdata/sf0.001"
        got = e.queries_extra()["nearest_segment_z6"](sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        # independent scalar check on 25 docs: exact-rational min d2
        from __ray_entry__ import _sql_site_path_ctes
        pts = con.execute(
            f"WITH {_sql_site_path_ctes(6)} SELECT site, doc_id, wx, wy "
            "FROM pts ORDER BY doc_id").df()
        segs = con.execute(
            f"WITH {_sql_site_path_ctes(6)} SELECT site, wx, wy, pt_idx "
            "FROM e ORDER BY site, pt_idx").df()
        seg_rows = []
        for site, g in segs.groupby("site"):
            g = g.sort_values("pt_idx")
            xs, ys = g.wx.to_numpy(), g.wy.to_numpy()
            for i in range(len(g) - 1):
                seg_rows.append((site, i, xs[i], ys[i], xs[i+1], ys[i+1]))
        for _, p in pts.head(25).iterrows():
            best = None
            for (site, i, x0, y0, x1, y1) in seg_rows:
                if site == p.site:
                    continue
                dx, dy = int(x1 - x0), int(y1 - y0)
                pax, pay = int(p.wx - x0), int(p.wy - y0)
                len2 = dx * dx + dy * dy
                dot = pax * dx + pay * dy
                if len2 == 0 or dot <= 0:
                    d2 = Fraction(pax * pax + pay * pay)
                elif dot >= len2:
                    d2 = Fraction((int(p.wx - x1)) ** 2
                                  + (int(p.wy - y1)) ** 2)
                else:
                    d2 = Fraction(pax * pax + pay * pay) \
                        - Fraction(dot * dot, len2)
                key = (d2, site, i)
                if best is None or key < best:
                    best = key
            row = got[got.doc_id == p.doc_id].iloc[0]
            assert (row.site, row.seg_idx) == (best[1], best[2]), p.doc_id

    def test_own_site_excluded_and_total(self, ray_session):
        import __ray_entry__ as e

        sf = "/root/testdata/sf0.001"
        got = e.queries_extra()["nearest_segment_z6"](sf).to_pandas()
        assert len(got) == 500                      # every page snapped
        assert (got.site != got.doc_id % 50).all()  # never its own site


class TestNearestSegmentCells:
    """Cell-bucketed co-partitioned variant: byte-identical to the
    broadcast path, with the certainty guard + fallback net exercised."""

    def test_equals_broadcast(self, ray_session):
        from vtzero_ray.functions.geo import (nearest_segment,
                                              nearest_segment_cells)

        sf = "/root/testdata/sf0.001"
        want = nearest_segment(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        got = nearest_segment_cells(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(got, want)

    def test_equals_broadcast_tiny_cells(self, ray_session):
        """Tiny cells + rings=1 force a real sparse-region fallback tail
        (most pages have no nearby foreign segment at this grid): the
        result must STILL be byte-identical."""
        from vtzero_ray.functions.geo import (nearest_segment,
                                              nearest_segment_cells)

        sf = "/root/testdata/sf0.001"
        want = nearest_segment(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        got = nearest_segment_cells(sf, cell=512, rings=1, n_buckets=8) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(got, want)

    def test_explode_cells(self):
        import numpy as np

        from vtzero_ray.functions.geo import _explode_cells

        idx, cx, cy = _explode_cells(np.array([0, 5]), np.array([1, 5]),
                                     np.array([2, 7]), np.array([3, 7]))
        got = sorted(zip(idx.tolist(), cx.tolist(), cy.tolist()))
        assert got == [(0, 0, 2), (0, 0, 3), (0, 1, 2), (0, 1, 3),
                       (1, 5, 7)]

    def test_candidate_pruning(self, ray_session):
        """The point of the co-partitioned path: per-cell candidate
        lists are far smaller than the full network. Measured through
        the replication table itself: mean candidates per occupied cell
        << total segments."""
        import numpy as np

        from vtzero_ray.functions.geo import _explode_cells
        from vtzero_ray.pipelines.clip_paths import world_segments

        sf = "/root/testdata/sf0.001"
        seg = world_segments(sf, zoom=6, extent=4096).to_pandas()
        cell, rings = 8192, 1
        x0 = seg.wx0.to_numpy(); x1 = seg.wx1.to_numpy()
        y0 = seg.wy0.to_numpy(); y1 = seg.wy1.to_numpy()
        idx, cx, cy = _explode_cells(
            np.minimum(x0, x1) // cell - rings,
            np.maximum(x0, x1) // cell + rings,
            np.minimum(y0, y1) // cell - rings,
            np.maximum(y0, y1) // cell + rings)
        import pandas as pd
        per_cell = pd.DataFrame({"cx": cx, "cy": cy}) \
            .groupby(["cx", "cy"]).size()
        assert per_cell.mean() < len(seg) / 4
