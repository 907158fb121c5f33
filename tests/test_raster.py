"""Raster ↔ vector stages: density grids + polygon re-vectorization."""

import numpy as np
import pytest

from vtzero_ray.mvt import codec
from vtzero_ray.mvt.check import check_tile
from vtzero_ray.mvt.decoder import VectorTile


@pytest.fixture(scope="module")
def tiles(ray_session, sf_dir):
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    return tiles_pipeline(sf_dir, zooms=(6,), validate=False).materialize()


class TestRaster:
    def test_rasterize_conserves_points(self, tiles, sf_dir):
        from vtzero_ray.pipelines.decode import decode_tiles
        from vtzero_ray.stages.raster import rasterize_tiles

        r = rasterize_tiles(tiles, grid=16).to_pandas()
        n_feats = decode_tiles(tiles).to_pandas().shape[0]
        assert r.n_points.sum() == n_feats
        assert ((r.cell_row >= 0) & (r.cell_row < 16)).all()
        assert ((r.cell_col >= 0) & (r.cell_col < 16)).all()

    def test_raster_matches_bruteforce(self, tiles):
        from vtzero_ray.pipelines.decode import decode_tiles
        from vtzero_ray.stages.raster import rasterize_tiles

        r = rasterize_tiles(tiles, grid=16).to_pandas()
        feats = decode_tiles(tiles).to_pandas()
        # brute force: decode each geometry, count per cell
        from collections import Counter

        exp = Counter()
        for row in feats.itertuples():
            cmds = np.array(row.geom_cmds, dtype=np.uint32)
            pts = codec.decode_point(cmds)
            for px, py in pts:
                exp[(row.z, row.x, row.y, py // 256, px // 256)] += 1
        got = {(r_.z, r_.x, r_.y, r_.cell_row, r_.cell_col): r_.n_points
               for r_ in r.itertuples()}
        assert got == dict(exp)

    def test_raster_to_vector_roundtrip(self, tiles):
        from vtzero_ray.stages.raster import raster_to_vector, rasterize_tiles

        r = rasterize_tiles(tiles, grid=16)
        vec = raster_to_vector(r, threshold=2, grid=16).to_pandas()
        assert len(vec) > 0
        for row in vec.itertuples():
            code, diags = check_tile(row.mvt)
            assert code == 0, diags
            layer = VectorTile(row.mvt).get_layer(0)
            assert layer.name == b"hotcells"
            for f in layer.features():
                rings = f.decode_geometry()
                assert len(rings) == 1
                ring, area2, rt = rings[0]
                assert rt == codec.RING_OUTER
                assert area2 == 2 * 256 * 256  # one 256x256 cell
                props = f.properties()
                assert props["n_points"] >= 2


class TestSitePaths:
    def test_linestring_tiles_validate_and_decode(self, ray_session, sf_dir):
        from vtzero_ray.pipelines.paths import site_paths_tiles

        out = site_paths_tiles(sf_dir, zoom=2).to_pandas()
        assert len(out) > 0
        total = 0
        for row in out.itertuples():
            code, diags = check_tile(row.mvt)
            assert code == 0, diags
            layer = VectorTile(row.mvt).get_layer(0)
            assert layer.name == b"site_paths"
            for f in layer.features():
                assert f.geom_type == codec.GEOM_LINESTRING
                parts = f.decode_geometry()
                assert all(p.shape[0] >= 2 for p in parts)
                props = f.properties()
                assert props["site"] == f.id
                total += 1
        assert total == out.n_features.sum()


class TestRasterVectorByteIdentity:
    def test_vectorized_matches_scalar_builders(self, ray_session, tiles):
        from vtzero_ray.stages.raster import (raster_to_vector,
                                              raster_to_vector_scalar,
                                              rasterize_tiles)

        r = rasterize_tiles(tiles, grid=16).materialize()
        fast = raster_to_vector(r, threshold=2, grid=16).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        slow = raster_to_vector_scalar(r, threshold=2, grid=16).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(fast) == len(slow) > 0
        for a, b in zip(fast.itertuples(), slow.itertuples()):
            assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
            assert bytes(a.mvt) == bytes(b.mvt)

    def test_holed_vectorized_matches_scalar_builders(self, ray_session,
                                                      tiles):
        from vtzero_ray.stages.raster import (raster_to_vector,
                                              raster_to_vector_scalar,
                                              rasterize_tiles)

        r = rasterize_tiles(tiles, grid=16).materialize()
        fast = raster_to_vector(r, threshold=2, grid=16,
                                hole_inset=64).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        slow = raster_to_vector_scalar(r, threshold=2, grid=16,
                                       hole_inset=64).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(fast) == len(slow) > 0
        for a, b in zip(fast.itertuples(), slow.itertuples()):
            assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
            assert bytes(a.mvt) == bytes(b.mvt)
        # holed tiles validate and decode to paired (outer, inner) rings
        code, diags = check_tile(fast.iloc[0].mvt)
        assert code == 0, diags
        layer = VectorTile(fast.iloc[0].mvt).get_layer(0)
        for f in layer.features():
            rings = f.decode_geometry()
            assert [rt for _r, _a, rt in rings] == [codec.RING_OUTER,
                                                    codec.RING_INNER]
            assert rings[0][1] == 2 * 256 * 256
            assert rings[1][1] == -2 * 128 * 128
