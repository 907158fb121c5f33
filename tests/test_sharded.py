"""Salted hot-tile encoding: logical equivalence with the unsalted kernel,
validation cleanliness, determinism."""

import numpy as np
import pandas as pd
import pytest

from vtzero_ray.mvt.decoder import VectorTile


def decode_logical(mvt: bytes):
    """tile bytes → sorted list of (id, (x,y), url, lang) + table sizes."""
    layer = VectorTile(mvt).get_layer(0)
    feats = []
    for f in layer.features():
        pts = f.decode_geometry()
        props = f.properties()
        feats.append((f.id, tuple(pts[0]), props[b"url".decode()], props["lang"]))
    return sorted(feats), len(layer.key_table()), len(layer.value_table())


@pytest.fixture(scope="module")
def both_paths(ray_session, sf_dir):
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    plain = tiles_pipeline(sf_dir, zooms=(6,), validate=True).to_pandas()
    sharded = tiles_pipeline(sf_dir, zooms=(6,), validate=True,
                             hot_threshold=30, n_salt=4).to_pandas()
    return plain, sharded


class TestShardedEncode:
    def test_same_tiles_same_features(self, both_paths):
        plain, sharded = both_paths
        a = plain.sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = sharded.sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert list(zip(a.z, a.x, a.y)) == list(zip(b.z, b.x, b.y))
        assert (a.n_features.to_numpy() == b.n_features.to_numpy()).all()

    def test_all_validate(self, both_paths):
        _, sharded = both_paths
        assert (sharded.check_code == 0).all()

    def test_hot_tiles_logically_equal(self, both_paths):
        plain, sharded = both_paths
        a = plain.set_index(["z", "x", "y"])
        b = sharded.set_index(["z", "x", "y"])
        hot = a[a.n_features > 30]
        assert len(hot) > 0  # the NYC hot cell
        for key in hot.index:
            fa, ka, va = decode_logical(a.loc[key].mvt)
            fb, kb, vb = decode_logical(b.loc[key].mvt)
            assert fa == fb
            assert (ka, va) == (kb, vb)

    def test_cold_tiles_byte_identical(self, both_paths):
        plain, sharded = both_paths
        a = plain.set_index(["z", "x", "y"])
        b = sharded.set_index(["z", "x", "y"])
        cold = a[a.n_features <= 30]
        same = sum(1 for key in cold.index if a.loc[key].mvt == b.loc[key].mvt)
        assert same == len(cold)

    def test_deterministic(self, ray_session, sf_dir, both_paths):
        from vtzero_ray.pipelines.tiling import tiles_pipeline

        _, first = both_paths
        again = tiles_pipeline(sf_dir, zooms=(6,), validate=True,
                               hot_threshold=30, n_salt=4).to_pandas()
        a = first.sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = again.sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert (a.mvt == b.mvt).all()


class TestShardFuzz:
    @pytest.mark.parametrize("n_salt", [2, 3, 8])
    def test_logical_equality_any_salt(self, ray_session, sf_dir, n_salt, both_paths):
        """Any salt count must produce logically identical hot tiles."""
        from vtzero_ray.pipelines.tiling import tiles_pipeline

        plain, _ = both_paths
        sharded = tiles_pipeline(sf_dir, zooms=(6,), validate=True,
                                 hot_threshold=30, n_salt=n_salt).to_pandas()
        assert (sharded.check_code == 0).all()
        a = plain.set_index(["z", "x", "y"])
        b = sharded.set_index(["z", "x", "y"])
        hot = a[a.n_features > 30]
        for key in hot.index:
            fa, ka, va = decode_logical(a.loc[key].mvt)
            fb, kb, vb = decode_logical(b.loc[key].mvt)
            assert fa == fb and (ka, va) == (kb, vb)
