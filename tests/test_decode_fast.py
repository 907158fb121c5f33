"""Vectorized decode / stats / check parity: decode_fast must produce the
same rows as the scalar path on every corpus we have — the flagship
tiles, the real-world golden mapbox tile (multi-geometry, big tables),
and adversarial fixture tiles (which must route to the scalar path and
reproduce its quarantine semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vtzero_ray.mvt.check import check_tile
from vtzero_ray.mvt.decode_fast import check_codes_fast
from vtzero_ray.pipelines.decode import (decode_tiles_batch,
                                         decode_tiles_batch_v)

GOLDEN = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"


def tiles_table(mvts, zs=None):
    n = len(mvts)
    return pa.table({
        "z": pa.array(zs if zs is not None else np.zeros(n, np.int32),
                      pa.int32()),
        "x": pa.array(np.arange(n, dtype=np.int32)),
        "y": pa.array(np.arange(n, dtype=np.int32)),
        "mvt": pa.array(mvts, pa.binary()),
    })


def canon(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    for c in ("geom_cmds", "prop_keys", "prop_vals_raw"):
        if c in df.columns:
            df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def assert_same(batch: pa.Table, **kw):
    fast = canon(decode_tiles_batch_v(batch, **kw))
    slow = canon(decode_tiles_batch(batch, **kw))
    pd.testing.assert_frame_equal(fast, slow)


class TestDecodeParity:
    def test_golden_tile(self):
        data = open(GOLDEN, "rb").read()
        batch = tiles_table([data])
        assert_same(batch)
        out = decode_tiles_batch_v(batch)
        assert len(out) == 8096  # 12 layers, 8096 features

    def test_flagship_tiles(self, ray_session, sf_dir):
        from vtzero_ray.pipelines.tiling import tiles_pipeline

        tiles = tiles_pipeline(sf_dir, zooms=(2, 6), validate=False)
        t = pa.Table.from_pandas(tiles.to_pandas())
        assert_same(t)
        assert_same(t, with_props=False, with_geometry=False)

    def test_synthetic_multi_geometry(self):
        from vtzero_ray.mvt import builder as b

        tb = b.TileBuilder()
        lb = tb.add_layer("mixed")
        fb = b.PointFeatureBuilder(lb)
        fb.set_id(7)
        fb.add_point(10, 20)
        fb.add_property("name", "pt")
        fb.commit()
        fb = b.LinestringFeatureBuilder(lb)
        fb.set_id(8)
        fb.add_linestring_from_container([(0, 0), (5, 5), (9, 2)])
        fb.commit()
        fb = b.PolygonFeatureBuilder(lb)
        fb.set_id(9)
        fb.add_ring_from_container([(0, 0), (10, 0), (10, 10), (0, 0)])
        fb.commit()
        batch = tiles_table([tb.serialize()])
        assert_same(batch)

    def test_bad_tiles_quarantined_identically(self):
        good = _point_tile()
        bads = [b"\x00\x01garbage", b"\x1a\x05trunc", good[:25]]
        batch = tiles_table([good] + bads + [good])
        assert_same(batch)
        out = decode_tiles_batch_v(batch)
        errs = [e for e in out.column("error").to_pylist() if e]
        assert len(errs) >= 1  # quarantined rows present, pipeline alive

    def test_empty_batch(self):
        batch = tiles_table([])
        out = decode_tiles_batch_v(batch)
        assert len(out) == 0


def _point_tile(n=5, extent=4096):
    from vtzero_ray.mvt import builder as b

    tb = b.TileBuilder()
    lb = tb.add_layer("pts", extent=extent)
    for i in range(n):
        fb = b.PointFeatureBuilder(lb)
        fb.set_id(i + 1)
        fb.add_point(17 * i % 4096, 31 * i % 4096)
        fb.add_property("k", f"v{i}")
        fb.commit()
    return tb.serialize()


class TestStatsParity:
    def test_flagship_stats(self, ray_session, sf_dir):
        from vtzero_ray.mvt.decode_fast import tile_stats_batch_fast
        from vtzero_ray.pipelines.tiling import tiles_pipeline

        tiles = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
        t = pa.Table.from_pandas(tiles.to_pandas())
        fast, bad = tile_stats_batch_fast(t)
        assert bad == []
        # scalar recompute
        from vtzero_ray.mvt.decoder import VectorTile

        df = fast.to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
        rows = []
        for r in t.to_pandas().itertuples():
            for layer in VectorTile(r.mvt).layers():
                gb = sum(len(f.geometry_data) for f in layer.features())
                rows.append((r.x, r.y, layer.num_features, gb,
                             len(layer.key_table()), len(layer.value_table())))
        exp = pd.DataFrame(rows, columns=["x", "y", "n_features", "geom_bytes",
                                          "n_keys", "n_values"]) \
            .sort_values(["x", "y"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            df[["x", "y", "n_features", "geom_bytes", "n_keys", "n_values"]]
            .astype("int64"), exp.astype("int64"))


class TestCheckParity:
    def test_point_tiles_grade(self):
        good = _point_tile()
        batch = tiles_table([good, good])
        codes = check_codes_fast(batch)
        assert list(codes) == [0, 0]
        assert check_tile(good)[0] == 0

    def test_out_of_bounds_point_warns(self):
        from vtzero_ray.mvt import builder as b

        tb = b.TileBuilder()
        lb = tb.add_layer("pts", extent=256)
        fb = b.PointFeatureBuilder(lb)
        fb.add_point(4000, 4000)  # beyond 2*extent=512 → warning
        fb.commit()
        data = tb.serialize()
        codes = check_codes_fast(tiles_table([data]))
        assert codes[0] == 1
        assert check_tile(data)[0] == 1

    def test_golden_tile_routes_to_scalar(self):
        data = open(GOLDEN, "rb").read()
        codes = check_codes_fast(tiles_table([data]))
        assert codes[0] == -1  # multi-geometry → scalar decides
        assert check_tile(data)[0] in (0, 1, 2)

    @pytest.mark.parametrize("bad", [b"\x00garbage", b"\x1a\x05trunc"])
    def test_malformed_routes_to_scalar(self, bad):
        codes = check_codes_fast(tiles_table([bad]))
        assert codes[0] == -1
        assert check_tile(bad)[0] == 3


class TestMultipointCoords:
    def test_multipoint_and_bad_layout(self):
        import pyarrow as pa
        from vtzero_ray.mvt import codec
        from vtzero_ray.mvt.decode_fast import multipoint_coords

        # feature 0: 2-point multipoint; feature 1: single point;
        # feature 2: linestring layout (not single-MoveTo) -> bad;
        # feature 3: empty stream -> not bad, no points
        mp = codec.encode_point([[10, 20], [7, 5]])
        sp = codec.encode_point([[4096, 0]])
        ls = codec.encode_linestring([[[0, 0], [10, 10]]])
        col = pa.array([mp.tolist(), sp.tolist(), ls.tolist(), []],
                       pa.list_(pa.uint32()))
        feat_of, px, py, bad = multipoint_coords(col)
        assert bad.tolist() == [False, False, True, False]
        assert feat_of.tolist() == [0, 0, 1]
        assert px.tolist() == [10, 7, 4096]
        assert py.tolist() == [20, 5, 0]

    def test_negative_deltas(self):
        import pyarrow as pa
        from vtzero_ray.mvt import codec
        from vtzero_ray.mvt.decode_fast import multipoint_coords

        pts = [[100, 100], [-50, 200], [3, -7]]
        col = pa.array([codec.encode_point(pts).tolist()], pa.list_(pa.uint32()))
        _, px, py, bad = multipoint_coords(col)
        assert not bad.any()
        assert list(zip(px.tolist(), py.tolist())) == [tuple(p) for p in pts]
