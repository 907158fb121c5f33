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
