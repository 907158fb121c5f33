"""Geometry clipping: Liang-Barsky kernel vs scalar reference,
Sutherland-Hodgman ring clip, part chaining, and the clipped-path tile
pipeline round-trip (encode → decode → identical multi-part geometry)."""

import numpy as np
import pytest

from vtzero_ray.stages.clip import chain_parts, clip_ring, liang_barsky

SF = "/root/testdata/sf0.001"


def _clip_scalar(x0, y0, x1, y1, lo, hi):
    """Textbook per-segment Liang-Barsky (independent formulation)."""
    t0, t1 = 0.0, 1.0
    dx, dy = x1 - x0, y1 - y0
    for p, q in ((-dx, x0 - lo), (dx, hi - x0), (-dy, y0 - lo), (dy, hi - y0)):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            t0 = max(t0, r)
        else:
            t1 = min(t1, r)
    if t0 >= t1:
        return None
    rnd = lambda v: int(np.floor(v + 0.5))
    out = (rnd(x0 + t0 * dx), rnd(y0 + t0 * dy),
           rnd(x0 + t1 * dx), rnd(y0 + t1 * dy))
    if out[0] == out[2] and out[1] == out[3]:
        return None
    return out


class TestLiangBarsky:
    def test_matches_scalar_reference_randomized(self):
        rng = np.random.default_rng(7)
        n = 5000
        x0 = rng.integers(-6000, 10000, n)
        y0 = rng.integers(-6000, 10000, n)
        x1 = x0 + rng.integers(-8000, 8000, n)
        y1 = y0 + rng.integers(-8000, 8000, n)
        keep0 = (x0 != x1) | (y0 != y1)
        x0, y0, x1, y1 = x0[keep0], y0[keep0], x1[keep0], y1[keep0]
        lo, hi = -64.0, 4160.0
        keep, cx0, cy0, cx1, cy1 = liang_barsky(x0, y0, x1, y1, lo, hi)
        for i in range(x0.shape[0]):
            want = _clip_scalar(float(x0[i]), float(y0[i]),
                                float(x1[i]), float(y1[i]), lo, hi)
            if want is None:
                assert not keep[i], i
            else:
                assert keep[i], i
                assert (cx0[i], cy0[i], cx1[i], cy1[i]) == want, i

    def test_inside_segment_untouched(self):
        keep, cx0, cy0, cx1, cy1 = liang_barsky(
            np.array([10]), np.array([20]), np.array([100]), np.array([200]),
            0.0, 4096.0)
        assert keep[0] and (cx0[0], cy0[0], cx1[0], cy1[0]) == (10, 20, 100, 200)

    def test_outside_and_touching_rejected(self):
        # fully left of box; vertical on the boundary (t0 == t1 corner graze)
        keep, *_ = liang_barsky(
            np.array([-10, -5]), np.array([0, -5]),
            np.array([-1, 5]), np.array([100, -5]), 0.0, 4096.0)
        assert not keep[0]
        assert not keep[1]


class TestChainParts:
    def test_contiguous_one_part(self):
        offs, px, py = chain_parts(
            np.array([0, 1, 2]), np.array([0, 10, 20]), np.array([0, 1, 2]),
            np.array([10, 20, 30]), np.array([1, 2, 3]))
        assert offs.tolist() == [0, 4]
        assert px.tolist() == [0, 10, 20, 30]
        assert py.tolist() == [0, 1, 2, 3]

    def test_gap_and_mismatch_break_parts(self):
        # seg 0, then seg 2 (gap), then seg 3 with shifted start (mismatch)
        offs, px, py = chain_parts(
            np.array([0, 2, 3]), np.array([0, 50, 99]), np.array([0, 0, 0]),
            np.array([10, 60, 120]), np.array([0, 0, 0]))
        assert offs.tolist() == [0, 2, 4, 6]
        assert px.tolist() == [0, 10, 50, 60, 99, 120]


class TestClipRing:
    def test_square_fully_inside(self):
        ring = np.array([[10, 10], [90, 10], [90, 90], [10, 90]], float)
        out = clip_ring(ring, 0.0, 100.0)
        assert sorted(map(tuple, out)) == sorted(map(tuple, ring))

    def test_square_clipped_to_box(self):
        ring = np.array([[-50, -50], [150, -50], [150, 150], [-50, 150]], float)
        out = clip_ring(ring, 0.0, 100.0)
        assert sorted(map(tuple, out)) == [(0.0, 0.0), (0.0, 100.0),
                                           (100.0, 0.0), (100.0, 100.0)]

    def test_disjoint_ring_empty(self):
        ring = np.array([[200, 200], [300, 200], [250, 300]], float)
        assert clip_ring(ring, 0.0, 100.0).shape[0] == 0

    def test_triangle_corner_cut_area(self):
        # right triangle poking past the corner: clipped area is the
        # square minus the corner triangle above x+y=150 (legs 50)
        ring = np.array([[0, 0], [150, 0], [0, 150]], float)
        out = clip_ring(ring, 0.0, 100.0)

        def area(r):
            x, y = r[:, 0], r[:, 1]
            return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

        # 11250 (triangle) minus two 50-leg corner cuts -> 10000 - 1250
        assert area(out) == pytest.approx(8750.0)


class TestClippedPathTiles:
    def test_roundtrip_matches_stats(self, ray_session):
        """Encoded tile geometry decodes back to exactly the chained
        parts the stats query reports (n_features, per-feature parts and
        point counts)."""
        from vtzero_ray.mvt.decoder import VectorTile
        from vtzero_ray.mvt import codec
        from vtzero_ray.pipelines.clip_paths import (clipped_path_stats,
                                                     clipped_path_tiles)

        stats = clipped_path_stats(SF, zoom=2).to_pandas()
        tiles = clipped_path_tiles(SF, zoom=2).to_pandas()
        assert set(zip(tiles.z, tiles.x, tiles.y)) == \
            set(zip(stats.z, stats.x, stats.y))
        by_tile = stats.groupby(["z", "x", "y"])
        for row in tiles.itertuples():
            vt = VectorTile(row.mvt)
            layer = next(iter(vt.layers()))
            assert layer.name == b"clipped_paths"
            want = by_tile.get_group((row.z, row.x, row.y)) \
                .set_index("site")
            n = 0
            for f in layer.features():
                parts = f.decode_geometry()
                site = f.id
                exp = want.loc[site]
                assert len(parts) == exp.n_parts
                assert sum(len(p) for p in parts) == exp.n_points
                n += 1
            assert n == row.n_features == len(want)

    def test_cross_tile_segments_exist(self, ray_session):
        """The corpus genuinely exercises clipping: some segments appear
        in >1 tile and some clipped coords lie in the buffer margin."""
        from vtzero_ray.pipelines.clip_paths import clipped_segments

        segs = clipped_segments(SF, zoom=2).to_pandas()
        per_seg = segs.groupby(["site", "seg_idx"]).size()
        assert (per_seg > 1).any()
        cs = segs[["cx0", "cy0", "cx1", "cy1"]].to_numpy()
        assert (cs < 0).any() or (cs > 4096).any()
