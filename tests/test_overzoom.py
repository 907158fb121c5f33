"""Overzoom (pipelines/overzoom.py): z→z+1 child tiles derived from
encoded parent tiles by the exact integer transform

    cpx = 2·px;  dx = cpx // extent;  px' = cpx − dx·extent;  x' = 2x+dx

Anchors: a pure-Python scalar twin (decode parent via VectorTile →
integer child math → scalar_reference_tile bytes) must be BYTE-IDENTICAL
to OverzoomPoints; feature count is conserved; chaining levels composes.
"""

import numpy as np
import pyarrow as pa
import pytest

from tests.test_encode_stage import make_case, scalar_reference_tile
from vtzero_ray.mvt.check import check_tile
from vtzero_ray.mvt.decoder import VectorTile
from vtzero_ray.pipelines.overzoom import (OverzoomPoints, overzoom_tiles,
                                           point_tile_summary_batch)
from vtzero_ray.stages.encode import PointTileAssembler

EXT = 4096


def make_parent_tiles(n_tiles=3, n=80, seed=40):
    """Encode n_tiles parent tiles at z=6 through the real assembler."""
    rows = {"z": [], "x": [], "y": [], "doc_id": [], "px": [], "py": [],
            "url": [], "lang": []}
    per_tile = []
    for t in range(n_tiles):
        fids, px, py, urls, langs = make_case(n, seed=seed + t)
        per_tile.append((fids, px, py, urls, langs))
        for i in range(n):
            rows["z"].append(6)
            rows["x"].append(10 + t)
            rows["y"].append(20 + 2 * t)
            rows["doc_id"].append(int(fids[i]))
            rows["px"].append(int(px[i]))
            rows["py"].append(int(py[i]))
            rows["url"].append(urls[i])
            rows["lang"].append(langs[i])
    batch = pa.table({
        "z": pa.array(rows["z"], pa.int32()),
        "x": pa.array(rows["x"], pa.int32()),
        "y": pa.array(rows["y"], pa.int32()),
        "doc_id": pa.array(rows["doc_id"], pa.uint64()),
        "px": pa.array(rows["px"], pa.int32()),
        "py": pa.array(rows["py"], pa.int32()),
        "url": pa.array(rows["url"], pa.string()),
        "lang": pa.array(rows["lang"], pa.string()),
    })
    return PointTileAssembler()(batch), per_tile


def scalar_overzoom(tiles: pa.Table, extent=EXT):
    """Pure-Python twin: decode each parent with the scalar VectorTile
    reader, apply the child transform, re-encode each child with the
    scalar reference builder (fid-ascending, matching assembler order)."""
    children = {}
    for r in range(len(tiles)):
        z = tiles.column("z")[r].as_py()
        x = tiles.column("x")[r].as_py()
        y = tiles.column("y")[r].as_py()
        tile = VectorTile(tiles.column("mvt")[r].as_py())
        for layer in tile.layers():
            for f in layer.features():
                pts = f.decode_geometry()  # (n,2) int32
                px, py = int(pts[0, 0]), int(pts[0, 1])
                props = f.properties()
                cpx, cpy = 2 * px, 2 * py
                dx, dy = cpx // extent, cpy // extent
                key = (z + 1, 2 * x + dx, 2 * y + dy)
                children.setdefault(key, []).append(
                    (f.id, cpx - dx * extent, cpy - dy * extent,
                     props["url"], props["lang"]))
    out = {}
    for key, feats in children.items():
        feats.sort(key=lambda t: t[0])
        out[key] = scalar_reference_tile(
            np.array([f[0] for f in feats], np.uint64),
            [f[1] for f in feats], [f[2] for f in feats],
            [f[3] for f in feats], [f[4] for f in feats])
    return out


class TestOverzoomBytes:
    def test_byte_identical_to_scalar_twin(self):
        tiles, _ = make_parent_tiles(n_tiles=3, n=80)
        expected = scalar_overzoom(tiles)
        got = OverzoomPoints()(tiles)
        got_map = {(got.column("z")[i].as_py(), got.column("x")[i].as_py(),
                    got.column("y")[i].as_py()): got.column("mvt")[i].as_py()
                   for i in range(len(got))}
        assert set(got_map) == set(expected)
        for key in expected:
            assert got_map[key] == expected[key], key
            assert check_tile(got_map[key])[0] == 0

    def test_feature_conservation_and_keys(self):
        tiles, _ = make_parent_tiles(n_tiles=2, n=120, seed=55)
        got = OverzoomPoints()(tiles)
        assert int(pa.compute.sum(got.column("n_features")).as_py()) == 240
        z = got.column("z").to_numpy()
        x = got.column("x").to_numpy()
        y = got.column("y").to_numpy()
        assert (z == 7).all()
        # children of parent (10+t, 20+2t) live in its 2x2 quad
        for t in range(2):
            sel = np.isin(x, [2 * (10 + t), 2 * (10 + t) + 1])
            assert np.isin(y[sel], [2 * (20 + 2 * t), 2 * (20 + 2 * t) + 1]).all()

    def test_interning_conflict_fallback_in_children(self):
        # url == lang value in one feature: the shared encode_sorted path
        # must re-encode the affected CHILD through scalar interning
        fids, px, py, urls, langs = make_case(60, seed=77)
        urls = list(urls)
        urls[7] = langs[7] = "en"
        batch = pa.table({
            "z": pa.array([6] * 60, pa.int32()),
            "x": pa.array([10] * 60, pa.int32()),
            "y": pa.array([20] * 60, pa.int32()),
            "doc_id": pa.array([int(f) for f in fids], pa.uint64()),
            "px": pa.array([int(v) for v in px], pa.int32()),
            "py": pa.array([int(v) for v in py], pa.int32()),
            "url": pa.array(urls, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })
        tiles = PointTileAssembler()(batch)
        expected = scalar_overzoom(tiles)
        got = OverzoomPoints()(tiles)
        for i in range(len(got)):
            key = (got.column("z")[i].as_py(), got.column("x")[i].as_py(),
                   got.column("y")[i].as_py())
            assert got.column("mvt")[i].as_py() == expected[key]

    def test_unsplit_tile_idempotent_with_assembler(self):
        # all features inside one quadrant -> ONE child; its bytes must
        # equal assembling the transformed features directly (shared path)
        fids, px, py, urls, langs = make_case(40, seed=88)
        px = (px % 2048).astype(np.int32)
        py = (py % 2048).astype(np.int32)
        batch = pa.table({
            "z": pa.array([6] * 40, pa.int32()),
            "x": pa.array([10] * 40, pa.int32()),
            "y": pa.array([20] * 40, pa.int32()),
            "doc_id": pa.array([int(f) for f in fids], pa.uint64()),
            "px": pa.array([int(v) for v in px], pa.int32()),
            "py": pa.array([int(v) for v in py], pa.int32()),
            "url": pa.array(urls, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })
        tiles = PointTileAssembler()(batch)
        got = OverzoomPoints()(tiles)
        assert len(got) == 1
        assert (got.column("x")[0].as_py(), got.column("y")[0].as_py()) == (20, 40)
        direct = PointTileAssembler()(pa.table({
            "z": pa.array([7] * 40, pa.int32()),
            "x": pa.array([20] * 40, pa.int32()),
            "y": pa.array([40] * 40, pa.int32()),
            "doc_id": pa.array([int(f) for f in fids], pa.uint64()),
            "px": pa.array([int(v) * 2 for v in px], pa.int32()),
            "py": pa.array([int(v) * 2 for v in py], pa.int32()),
            "url": pa.array(urls, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }))
        assert got.column("mvt")[0].as_py() == direct.column("mvt")[0].as_py()

    def test_two_levels_compose(self):
        tiles, _ = make_parent_tiles(n_tiles=1, n=64, seed=99)
        one = OverzoomPoints()(tiles)
        two = OverzoomPoints()(one)
        expected = scalar_overzoom(one)
        for i in range(len(two)):
            key = (two.column("z")[i].as_py(), two.column("x")[i].as_py(),
                   two.column("y")[i].as_py())
            assert two.column("mvt")[i].as_py() == expected[key]
        assert int(pa.compute.sum(two.column("n_features")).as_py()) == 64


class TestOverzoomErrors:
    def test_rejects_line_layers(self):
        from vtzero_ray.mvt import builder as b

        tb = b.TileBuilder()
        lb = tb.add_layer("roads")
        fb = b.LinestringFeatureBuilder(lb)
        fb.set_id(1)
        fb.add_linestring_from_container([(0, 0), (10, 10)])
        fb.add_property("url", "u")
        fb.add_property("lang", "en")
        fb.commit()
        tiles = pa.table({
            "z": pa.array([6], pa.int32()), "x": pa.array([1], pa.int32()),
            "y": pa.array([2], pa.int32()),
            "mvt": pa.array([tb.serialize()], pa.binary()),
        })
        with pytest.raises(ValueError, match="point"):
            OverzoomPoints()(tiles)

    def test_rejects_unexpected_props(self):
        from vtzero_ray.mvt import builder as b

        tb = b.TileBuilder()
        lb = tb.add_layer("pages")
        fb = b.PointFeatureBuilder(lb)
        fb.set_id(1)
        fb.add_point(5, 5)
        fb.add_property("name", "x")
        fb.commit()
        tiles = pa.table({
            "z": pa.array([6], pa.int32()), "x": pa.array([1], pa.int32()),
            "y": pa.array([2], pa.int32()),
            "mvt": pa.array([tb.serialize()], pa.binary()),
        })
        with pytest.raises(ValueError):
            OverzoomPoints()(tiles)

    def test_empty_batch(self):
        empty = pa.table({
            "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
        })
        out = OverzoomPoints()(empty)
        assert len(out) == 0
        assert out.column_names == ["z", "x", "y", "mvt", "n_features"]


class TestOverzoomDataset:
    def test_pipeline_end_to_end(self, ray_session):
        from vtzero_ray.pipelines.tiling import tiles_pipeline, validate_tiles

        sf_dir = "/root/testdata/sf0.001"
        parents = tiles_pipeline(sf_dir, zooms=(6,), validate=False)
        pt = parents.materialize()
        n_parent_feats = sum(
            b.column("n_features").to_numpy().sum()
            for b in pt.iter_batches(batch_format="pyarrow"))
        children = overzoom_tiles(pt, levels=2)
        children = children.map_batches(validate_tiles, batch_format="pyarrow")
        summ = children.map_batches(point_tile_summary_batch,
                                    batch_format="pyarrow")
        st = summ.to_pandas()
        assert (st["z"] == 8).all()
        assert st["n_features"].sum() == n_parent_feats
        assert (st["check_code"] == 0).all()
        # decoded coordinate sums follow the closed-form integer transform:
        # recompute expected from the parent tiles scalar-decoded
        exp = {}
        for b in pt.iter_batches(batch_format="pyarrow"):
            lvl1 = scalar_overzoom(b)
            t1 = pa.table({
                "z": pa.array([k[0] for k in lvl1], pa.int32()),
                "x": pa.array([k[1] for k in lvl1], pa.int32()),
                "y": pa.array([k[2] for k in lvl1], pa.int32()),
                "mvt": pa.array(list(lvl1.values()), pa.binary()),
            })
            for key, mvt in scalar_overzoom(t1).items():
                assert key not in exp  # child tiles partition parents
                tile = VectorTile(mvt)
                spx = spy = nf = 0
                for layer in tile.layers():
                    for f in layer.features():
                        pts = f.decode_geometry()
                        spx += int(pts[0, 0])
                        spy += int(pts[0, 1])
                        nf += 1
                exp[key] = (nf, spx, spy)
        for _, row in st.iterrows():
            key = (int(row["z"]), int(row["x"]), int(row["y"]))
            assert exp[key] == (int(row["n_features"]),
                                int(row["sum_px"]), int(row["sum_py"]))
