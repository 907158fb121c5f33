"""Vectorized linestring encode: byte-identity with the scalar builder
path, geometry round-trip, and the site_paths pipeline end-to-end."""

import numpy as np
import pyarrow as pa

from vtzero_ray.mvt import codec
from vtzero_ray.mvt.check import check_tile
from vtzero_ray.mvt.decoder import VectorTile
from vtzero_ray.mvt.pbf import encode_varints_np
from vtzero_ray.stages.encode_lines import (LinePathAssembler,
                                            polyline_geometry_payloads)


def test_payloads_match_scalar_codec():
    rng = np.random.default_rng(3)
    pts = []
    offs = [0]
    for n in (2, 3, 7, 50, 2, 19):
        p = rng.integers(-100, 4200, size=(n, 2))
        # dedup consecutive (caller contract)
        keep = np.ones(n, bool)
        keep[1:] = (p[1:] != p[:-1]).any(axis=1)
        p = p[keep]
        if p.shape[0] < 2:
            p = np.array([[0, 0], [5, 5]])
        pts.append(p)
        offs.append(offs[-1] + p.shape[0])
    px = np.concatenate([p[:, 0] for p in pts])
    py = np.concatenate([p[:, 1] for p in pts])
    blob, fs, fe = polyline_geometry_payloads(np.array(offs), px, py)
    for i, p in enumerate(pts):
        expect = encode_varints_np(codec.encode_linestring([p]).astype(np.uint32))
        assert blob[fs[i]:fe[i]] == expect, f"feature {i}"


def test_assembler_bytes_match_scalar_pipeline(ray_session, sf_dir):
    from vtzero_ray.pipelines.paths import (site_paths_tiles,
                                            site_paths_tiles_scalar)

    fast = site_paths_tiles(sf_dir, zoom=2).to_pandas() \
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    slow = site_paths_tiles_scalar(sf_dir, zoom=2).to_pandas() \
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    assert len(fast) == len(slow)
    for i in range(len(fast)):
        assert fast.mvt[i] == slow.mvt[i], f"tile {i} bytes differ"
    # tiles validate + decode back
    for m in fast.mvt:
        assert check_tile(m)[0] == 0
        layer = VectorTile(m).get_layer_by_name("site_paths")
        for f in layer.features():
            parts = f.decode_geometry()
            assert all(p.shape[0] >= 2 for p in parts)
            props = f.properties()
            assert props["site"] == f.id


def test_assembler_empty():
    out = LinePathAssembler()(pa.table({
        "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
        "y": pa.array([], pa.int32()), "doc_id": pa.array([], pa.int64()),
        "px": pa.array([], pa.int32()), "py": pa.array([], pa.int32()),
    }))
    assert len(out) == 0
