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


class TestDownzoom:
    def test_roundtrip_identity(self):
        from vtzero_ray.pipelines.overzoom import (DownzoomToFeatures,
                                                   OverzoomPoints)

        tiles, _ = make_parent_tiles(n_tiles=3, n=80)
        kids = OverzoomPoints()(tiles)
        back = PointTileAssembler()(DownzoomToFeatures()(kids))
        orig = {(tiles.column("x")[i].as_py(), tiles.column("y")[i].as_py()):
                tiles.column("mvt")[i].as_py() for i in range(len(tiles))}
        got = {(back.column("x")[i].as_py(), back.column("y")[i].as_py()):
               back.column("mvt")[i].as_py() for i in range(len(back))}
        assert got == orig  # downzoom ∘ overzoom == identity on bytes

    def test_halving_formula_and_merge(self):
        from vtzero_ray.pipelines.overzoom import DownzoomToFeatures

        # two sibling children (2a, 2b) and (2a+1, 2b) merge into (a, b)
        rows = []
        for t, (cx, cy, px, py) in enumerate([(20, 41, 101, 4095),
                                              (21, 41, 3, 0)]):
            rows.append((6, cx, cy, 10 + t, px, py,
                         f"https://e.x/{t}", "en"))
        batch = pa.table({
            "z": pa.array([r[0] for r in rows], pa.int32()),
            "x": pa.array([r[1] for r in rows], pa.int32()),
            "y": pa.array([r[2] for r in rows], pa.int32()),
            "doc_id": pa.array([r[3] for r in rows], pa.uint64()),
            "px": pa.array([r[4] for r in rows], pa.int32()),
            "py": pa.array([r[5] for r in rows], pa.int32()),
            "url": pa.array([r[6] for r in rows]),
            "lang": pa.array([r[7] for r in rows]),
        })
        tiles = PointTileAssembler()(batch)
        feats = DownzoomToFeatures()(tiles)
        d = feats.to_pydict()
        assert d["z"] == [5, 5] and d["x"] == [10, 10] and d["y"] == [20, 20]
        # child (20,41): even x → px'=(0*4096+101)//2=50; odd y → py'=(4096+4095)//2
        assert d["px"] == [50, (4096 + 3) // 2]
        assert d["py"] == [(4096 + 4095) // 2, (4096 + 0) // 2]

    def test_rejects_z0(self):
        from vtzero_ray.pipelines.overzoom import DownzoomToFeatures

        fids, px, py, urls, langs = make_case(3, seed=9)
        batch = pa.table({
            "z": pa.array([0] * 3, pa.int32()),
            "x": pa.array([0] * 3, pa.int32()),
            "y": pa.array([0] * 3, pa.int32()),
            "doc_id": pa.array([int(f) for f in fids], pa.uint64()),
            "px": pa.array([int(v) for v in px], pa.int32()),
            "py": pa.array([int(v) for v in py], pa.int32()),
            "url": pa.array(urls), "lang": pa.array(langs),
        })
        tiles = PointTileAssembler()(batch)
        with pytest.raises(ValueError, match="no parent"):
            from vtzero_ray.pipelines.overzoom import DownzoomToFeatures
            DownzoomToFeatures()(tiles)

    def test_dataset_two_levels(self, ray_session):
        from vtzero_ray.pipelines.overzoom import (downzoom_points,
                                                   point_tile_summary_batch)
        from vtzero_ray.pipelines.tiling import tiles_pipeline, validate_tiles

        tiles = tiles_pipeline("/root/testdata/sf0.001", zooms=(6,),
                               validate=False)
        mt = tiles.materialize()
        n_src = sum(b.column("n_features").to_numpy().sum()
                    for b in mt.iter_batches(batch_format="pyarrow"))
        down = downzoom_points(mt, levels=2)
        down = down.map_batches(validate_tiles, batch_format="pyarrow")
        st = down.map_batches(point_tile_summary_batch,
                              batch_format="pyarrow").to_pandas()
        assert (st["z"] == 4).all()
        assert st["n_features"].sum() == n_src  # features conserved
        assert (st["check_code"] == 0).all()


class TestBuildPyramid:
    def test_store_levels_and_resume(self, ray_session, tmp_path):
        from vtzero_ray.pipelines.overzoom import downzoom_points
        from vtzero_ray.pipelines.pyramid import build_pyramid
        from vtzero_ray.pipelines.tiling import tiles_pipeline
        from vtzero_ray.sources.mvt_io import read_tiles

        out = str(tmp_path / "store")
        tiles = tiles_pipeline("/root/testdata/sf0.001", zooms=(6,),
                               validate=False)
        manifests = build_pyramid(tiles, out, base_zoom=6, min_zoom=4)
        assert len(manifests) == 3
        back = read_tiles(out).to_pandas()
        assert sorted(back["z"].unique()) == [4, 5, 6]
        # each level must equal deriving it freshly from the base
        base = tiles_pipeline("/root/testdata/sf0.001", zooms=(6,),
                              validate=False).materialize()
        expect = {6: base.to_pandas()}
        expect[5] = downzoom_points(base, levels=1).to_pandas()
        expect[4] = downzoom_points(base, levels=2).to_pandas()
        for z, exp in expect.items():
            got = back[back["z"] == z]
            gm = {(r.x, r.y): r.mvt for r in got.itertuples()}
            em = {(r.x, r.y): r.mvt for r in exp.itertuples()}
            assert gm == em, f"level {z} store mismatch"
        # resume: a second build into the same store skips every level
        m2 = build_pyramid(tiles, out, base_zoom=6, min_zoom=4)
        for s in m2:
            assert s["tiles"] == 0
            assert len(s["skipped_partitions"]) >= 1


class TestGetTile:
    def test_virtual_deep_zoom(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.pipelines.overzoom import OverzoomPoints
        from vtzero_ray.pipelines.pyramid import get_tile
        from vtzero_ray.sources.mvt_io import write_tiles

        tiles, _ = make_parent_tiles(n_tiles=2, n=40, seed=70)  # z6
        out = str(tmp_path / "store")
        write_tiles(rd.from_arrow(tiles), out)
        # stored level: byte-equal direct read
        got = get_tile(out, 6, 10, 20)
        assert got == tiles.column("mvt")[0].as_py()
        # one level deeper: equals overzooming the parent and picking
        # the requested child
        kids = OverzoomPoints()(tiles)
        for i in range(len(kids)):
            kx, ky = kids.column("x")[i].as_py(), kids.column("y")[i].as_py()
            assert get_tile(out, 7, kx, ky) == kids.column("mvt")[i].as_py()
        # two levels deeper on a populated path
        kk = OverzoomPoints()(kids)
        gx, gy = kk.column("x")[0].as_py(), kk.column("y")[0].as_py()
        assert get_tile(out, 8, gx, gy) == kk.column("mvt")[0].as_py()
        # empty child -> None; empty ancestor -> None
        kidset = {(kids.column("x")[i].as_py(), kids.column("y")[i].as_py())
                  for i in range(len(kids))}
        empties = [(2 * 10 + dx, 2 * 20 + dy) for dx in (0, 1)
                   for dy in (0, 1) if (2 * 10 + dx, 2 * 20 + dy) not in kidset]
        if empties:
            assert get_tile(out, 7, *empties[0]) is None
        assert get_tile(out, 9, 0, 0) is None
        # above the coarsest stored level: loud error
        with pytest.raises(ValueError, match="coarsest"):
            get_tile(out, 5, 5, 10)


def square_tile(z, x, y, squares, layer="hotcells"):
    """(fid, x0, y0, size, n_points) squares → one polygon tile."""
    from vtzero_ray.mvt import builder as b

    tb = b.TileBuilder()
    lb = tb.add_layer(layer, 2, 4096)
    for fid, x0, y0, size, npnts in squares:
        fb = b.PolygonFeatureBuilder(lb)
        fb.set_id(fid)
        fb.add_ring(5)
        fb.set_point(x0, y0)
        fb.set_point(x0 + size, y0)
        fb.set_point(x0 + size, y0 + size)
        fb.set_point(x0, y0 + size)
        fb.close_ring()
        fb.add_property("n_points", npnts)
        fb.commit()
    return pa.table({
        "z": pa.array([z], pa.int32()), "x": pa.array([x], pa.int32()),
        "y": pa.array([y], pa.int32()),
        "mvt": pa.array([tb.serialize()], pa.binary()),
    })


class TestDownzoomPaths:
    def test_collapse_rechains_through_gap(self, ray_session):
        from vtzero_ray.mvt import codec
        from vtzero_ray.pipelines.decode import decode_tiles_batch_v
        from vtzero_ray.pipelines.overzoom import downzoom_paths
        import ray.data as rd

        # middle segment (100,100)->(101,100) halves to zero length;
        # the neighbors re-chain into ONE part of 3 points
        pt = path_tiles_from_segments(
            [(3, 2, 2, 7, 0, 20, 100, 100, 100),
             (3, 2, 2, 7, 1, 100, 100, 101, 100),
             (3, 2, 2, 7, 2, 101, 100, 300, 200)])
        out = downzoom_paths(rd.from_arrow(pt)).to_pandas()
        assert len(out) == 1 and out.iloc[0]["n_features"] == 1
        t = pa.table({
            "z": pa.array(out["z"].astype("int32")),
            "x": pa.array(out["x"].astype("int32")),
            "y": pa.array(out["y"].astype("int32")),
            "mvt": pa.array(list(out["mvt"]), pa.binary()),
        })
        feats = decode_tiles_batch_v(t, with_props=True, with_geometry=True)
        parts = codec.decode_linestring(
            np.asarray(feats.column("geom_cmds")[0].as_py(), np.uint32))
        assert len(parts) == 1
        assert parts[0].tolist() == [[10, 50], [50, 50], [150, 100]]

    def test_children_stay_separate_parts(self, ray_session):
        import ray.data as rd

        from vtzero_ray.mvt import codec
        from vtzero_ray.pipelines.decode import decode_tiles_batch_v
        from vtzero_ray.pipelines.overzoom import downzoom_paths

        # same site in two sibling children of parent (1,1): pieces stay
        # separate parts even though endpoints meet after halving
        pt1 = path_tiles_from_segments([(3, 2, 2, 7, 0, 4000, 96, 4096, 96)])
        pt2 = path_tiles_from_segments([(3, 3, 2, 7, 0, 0, 96, 200, 96)])
        tiles = pa.concat_tables([pt1, pt2])
        out = downzoom_paths(rd.from_arrow(tiles)).to_pandas()
        assert len(out) == 1
        t = pa.table({
            "z": pa.array(out["z"].astype("int32")),
            "x": pa.array(out["x"].astype("int32")),
            "y": pa.array(out["y"].astype("int32")),
            "mvt": pa.array(list(out["mvt"]), pa.binary()),
        })
        feats = decode_tiles_batch_v(t, with_props=True, with_geometry=True)
        parts = codec.decode_linestring(
            np.asarray(feats.column("geom_cmds")[0].as_py(), np.uint32))
        assert len(parts) == 2  # NW piece ends (2048,48); NE starts there
        assert parts[0].tolist() == [[2000, 48], [2048, 48]]
        assert parts[1].tolist() == [[2048, 48], [2148, 48]]

    def test_stitch_merges_seam_meeting_parts(self, ray_session):
        import ray.data as rd

        from vtzero_ray.mvt import codec
        from vtzero_ray.pipelines.decode import decode_tiles_batch_v
        from vtzero_ray.pipelines.overzoom import downzoom_paths

        # the test_children_stay_separate_parts geometry, stitched:
        # NW piece ends (2048,48) exactly where the NE piece starts —
        # stitch=True merges them into ONE 3-point part
        pt1 = path_tiles_from_segments([(3, 2, 2, 7, 0, 4000, 96, 4096, 96)])
        pt2 = path_tiles_from_segments([(3, 3, 2, 7, 0, 0, 96, 200, 96)])
        tiles = pa.concat_tables([pt1, pt2])
        out = downzoom_paths(rd.from_arrow(tiles), stitch=True).to_pandas()
        assert len(out) == 1
        t = pa.table({
            "z": pa.array(out["z"].astype("int32")),
            "x": pa.array(out["x"].astype("int32")),
            "y": pa.array(out["y"].astype("int32")),
            "mvt": pa.array(list(out["mvt"]), pa.binary()),
        })
        feats = decode_tiles_batch_v(t, with_props=True, with_geometry=True)
        parts = codec.decode_linestring(
            np.asarray(feats.column("geom_cmds")[0].as_py(), np.uint32))
        assert len(parts) == 1
        assert parts[0].tolist() == [[2000, 48], [2048, 48], [2148, 48]]
        # n_parts property tracks the stitched count
        from vtzero_ray.mvt.values import decode_value
        pk = feats.column("prop_keys")[0].as_py()
        pv = feats.column("prop_vals_raw")[0].as_py()
        assert decode_value(pv[pk.index("n_parts")])[1] == 1

    def test_stitch_byte_identity_on_seam_free_input(self, ray_session):
        import ray.data as rd

        from vtzero_ray.pipelines.overzoom import downzoom_paths

        # two disjoint pieces in different children whose halved
        # endpoints do NOT meet: stitched and unstitched tile bytes
        # must be identical
        pt1 = path_tiles_from_segments([(3, 2, 2, 7, 0, 100, 96, 600, 96)])
        pt2 = path_tiles_from_segments([(3, 3, 2, 7, 0, 300, 96, 900, 96)])
        tiles = pa.concat_tables([pt1, pt2])
        a = downzoom_paths(rd.from_arrow(tiles), stitch=True).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = downzoom_paths(rd.from_arrow(tiles), stitch=False).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(a) == len(b) == 1
        assert bytes(a.iloc[0]["mvt"]) == bytes(b.iloc[0]["mvt"])

    def test_stitch_transitive_chain(self, ray_session):
        import ray.data as rd

        from vtzero_ray.mvt import codec
        from vtzero_ray.pipelines.decode import decode_tiles_batch_v
        from vtzero_ray.pipelines.overzoom import downzoom_paths

        # three pieces across three children chaining end-to-start:
        # NW → NE at (2048,48), NE → SW? no — same row children; use a
        # path re-entering: NW piece, NE piece, then a second NE part
        # continuing from the first's end
        pt1 = path_tiles_from_segments([(3, 2, 2, 7, 0, 4000, 96, 4096, 96)])
        pt2 = path_tiles_from_segments(
            [(3, 3, 2, 7, 0, 0, 96, 200, 96),
             (3, 3, 2, 7, 5, 200, 96, 300, 200)])  # gap in seg_idx → new
        #                                             part, but meets end
        tiles = pa.concat_tables([pt1, pt2])
        out = downzoom_paths(rd.from_arrow(tiles), stitch=True).to_pandas()
        t = pa.table({
            "z": pa.array(out["z"].astype("int32")),
            "x": pa.array(out["x"].astype("int32")),
            "y": pa.array(out["y"].astype("int32")),
            "mvt": pa.array(list(out["mvt"]), pa.binary()),
        })
        feats = decode_tiles_batch_v(t, with_props=True, with_geometry=True)
        parts = codec.decode_linestring(
            np.asarray(feats.column("geom_cmds")[0].as_py(), np.uint32))
        assert len(parts) == 1
        assert parts[0].tolist() == [[2000, 48], [2048, 48], [2148, 48],
                                     [2198, 100]]

    def test_negative_buffer_coords_floor(self, ray_session):
        import ray.data as rd

        from vtzero_ray.pipelines.overzoom import DownzoomPathsToSegments

        # odd negative halves DOWN (floor), matching the SQL floor/2.0
        pt = path_tiles_from_segments([(3, 2, 2, 7, 0, -63, -1, 100, 50)])
        segs = DownzoomPathsToSegments()(pt)
        assert segs.column("cx0").to_pylist() == [-32]
        assert segs.column("cy0").to_pylist() == [-1]

    def test_rejects_z0_and_points(self, ray_session):
        from vtzero_ray.pipelines.overzoom import DownzoomPathsToSegments

        pt = path_tiles_from_segments([(0, 0, 0, 1, 0, 0, 0, 10, 10)])
        with pytest.raises(ValueError, match="no parent"):
            DownzoomPathsToSegments()(pt)


class TestOverzoomPolygons:
    def test_straddling_square_splits_into_quads(self):
        from vtzero_ray.pipelines.overzoom import (OverzoomPolygons,
                                                   polygon_tile_summary_batch)

        # [1920,2176]² doubles to [3840,4352]² → one 256² corner per child
        t = square_tile(6, 10, 20, [(5, 1920, 1920, 256, 7)])
        s = polygon_tile_summary_batch(OverzoomPolygons()(t)).to_pydict()
        assert s["z"] == [7, 7, 7, 7]
        assert sorted(zip(s["x"], s["y"])) == [(20, 40), (20, 41),
                                               (21, 40), (21, 41)]
        assert s["sum_area2"] == [2 * 256 * 256] * 4
        assert s["sum_points"] == [7] * 4
        assert s["sum_fid"] == [5] * 4

    def test_interior_square_exact(self):
        from vtzero_ray.pipelines.overzoom import (OverzoomPolygons,
                                                   polygon_tile_summary_batch)

        t = square_tile(6, 10, 20, [(0, 0, 0, 256, 3), (17, 512, 256, 256, 4)])
        s = polygon_tile_summary_batch(OverzoomPolygons()(t)).to_pydict()
        # both squares double wholly into the NW child
        assert (s["z"], s["x"], s["y"]) == ([7], [20], [40])
        assert s["n_features"] == [2]
        assert s["sum_x0"] == [0 + 1024]
        assert s["sum_y0"] == [0 + 512]
        assert s["sum_area2"] == [2 * (2 * 512 * 512)]

    def test_triangle_matches_python_reference(self):
        from vtzero_ray.mvt import builder as b, codec
        from vtzero_ray.pipelines.overzoom import OverzoomPolygons
        from vtzero_ray.pipelines.decode import decode_tiles_batch_v

        # CCW-on-screen triangle straddling the center with non-axis
        # edges: the clipped children must match a pure-Python
        # Sutherland-Hodgman + rounding reference
        tri = [(1000, 1500), (3100, 1900), (1700, 3300)]
        tb = b.TileBuilder()
        lb = tb.add_layer("hotcells", 2, 4096)
        fb = b.PolygonFeatureBuilder(lb)
        fb.set_id(1)
        fb.add_ring(4)
        for px, py in tri:
            fb.set_point(px, py)
        fb.close_ring()
        fb.add_property("n_points", 1)
        fb.commit()
        t = pa.table({
            "z": pa.array([6], pa.int32()), "x": pa.array([0], pa.int32()),
            "y": pa.array([0], pa.int32()),
            "mvt": pa.array([tb.serialize()], pa.binary()),
        })
        kids = OverzoomPolygons()(t)

        def sh_clip(pts, lo, hi):
            for axis, bound, keep_ge in ((0, lo, True), (0, hi, False),
                                         (1, lo, True), (1, hi, False)):
                out = []
                m = len(pts)
                for i in range(m):
                    prv, cur = pts[i - 1], pts[i]
                    pin = (prv[axis] >= bound) if keep_ge else (prv[axis] <= bound)
                    cin = (cur[axis] >= bound) if keep_ge else (cur[axis] <= bound)
                    if cin != pin:
                        tt = (bound - prv[axis]) / (cur[axis] - prv[axis])
                        ix = [prv[0] + tt * (cur[0] - prv[0]),
                              prv[1] + tt * (cur[1] - prv[1])]
                        ix[axis] = float(bound)
                        out.append(tuple(ix))
                    if cin:
                        out.append(tuple(cur))
                pts = out
                if not pts:
                    break
            return pts

        dbl = [(2.0 * px, 2.0 * py) for px, py in tri]
        expected = {}
        for dx in (0, 1):
            for dy in (0, 1):
                local = [(px - dx * 4096, py - dy * 4096) for px, py in dbl]
                cl = sh_clip(local, 0.0, 4096.0)
                pts = [(int(np.floor(px + 0.5)), int(np.floor(py + 0.5)))
                       for px, py in cl]
                dd = [p for i, p in enumerate(pts) if p != pts[i - 1]]
                if len(dd) >= 3:
                    expected[(2 * 0 + dx, 2 * 0 + dy)] = dd
        feats = decode_tiles_batch_v(kids, with_props=False,
                                     with_geometry=True)
        got = {}
        for i in range(len(feats)):
            ring = codec.decode_polygon(np.asarray(
                feats.column("geom_cmds")[i].as_py(), np.uint32))[0][0]
            got[(feats.column("x")[i].as_py(),
                 feats.column("y")[i].as_py())] = \
                [tuple(p) for p in ring[:-1].tolist()]
        assert set(got) == set(expected)
        for k in expected:
            # same cyclic ring — rotate to align first points
            e, g = expected[k], got[k]
            assert len(e) == len(g), k
            ri = g.index(e[0])
            assert e == g[ri:] + g[:ri], k

    def test_rejects_first_ring_not_outer_and_points(self):
        from vtzero_ray.mvt import builder as b
        from vtzero_ray.pipelines.overzoom import OverzoomPolygons

        # first ring traverses +y-then-+x → negative shoelace → classified
        # INNER; ring pairing has no owner for it (geometry.hpp:120-169)
        tb = b.TileBuilder()
        lb = tb.add_layer("hotcells", 2, 4096)
        fb = b.PolygonFeatureBuilder(lb)
        fb.set_id(1)
        fb.add_ring(5)
        for px, py in [(10, 10), (10, 20), (20, 20), (20, 10)]:
            fb.set_point(px, py)
        fb.close_ring()
        fb.add_property("n_points", 1)
        fb.commit()
        t = pa.table({
            "z": pa.array([6], pa.int32()), "x": pa.array([0], pa.int32()),
            "y": pa.array([0], pa.int32()),
            "mvt": pa.array([tb.serialize()], pa.binary()),
        })
        with pytest.raises(ValueError, match="not an outer ring"):
            OverzoomPolygons()(t)

        fids, px, py, urls, langs = make_case(3, seed=4)
        pts = PointTileAssembler()(pa.table({
            "z": pa.array([6] * 3, pa.int32()),
            "x": pa.array([1] * 3, pa.int32()),
            "y": pa.array([1] * 3, pa.int32()),
            "doc_id": pa.array([int(f) for f in fids], pa.uint64()),
            "px": pa.array([int(v) for v in px], pa.int32()),
            "py": pa.array([int(v) for v in py], pa.int32()),
            "url": pa.array(urls), "lang": pa.array(langs),
        }))
        with pytest.raises(ValueError, match="polygon"):
            OverzoomPolygons()(pts)


def holed_tile(z, x, y, squares, layer="hotcells"):
    """(fid, x0, y0, size, inset, n_points) → polygon tile; inset > 0
    adds a centered inset-square hole (reversed traversal → inner)."""
    from vtzero_ray.mvt import builder as b

    tb = b.TileBuilder()
    lb = tb.add_layer(layer, 2, 4096)
    for fid, x0, y0, size, inset, npnts in squares:
        x1, y1 = x0 + size, y0 + size
        fb = b.PolygonFeatureBuilder(lb)
        fb.set_id(fid)
        fb.add_ring(5)
        fb.set_point(x0, y0)
        fb.set_point(x1, y0)
        fb.set_point(x1, y1)
        fb.set_point(x0, y1)
        fb.close_ring()
        if inset:
            ix0, iy0, ix1, iy1 = x0 + inset, y0 + inset, x1 - inset, y1 - inset
            fb.add_ring(5)
            fb.set_point(ix0, iy0)
            fb.set_point(ix0, iy1)
            fb.set_point(ix1, iy1)
            fb.set_point(ix1, iy0)
            fb.close_ring()
        fb.add_property("n_points", npnts)
        fb.commit()
    return pa.table({
        "z": pa.array([z], pa.int32()), "x": pa.array([x], pa.int32()),
        "y": pa.array([y], pa.int32()),
        "mvt": pa.array([tb.serialize()], pa.binary()),
    })


class TestHoledPolygons:
    def test_interior_holed_square_exact(self):
        from vtzero_ray.pipelines.overzoom import (OverzoomPolygons,
                                                   polygon_tile_summary_batch)

        kids = OverzoomPolygons()(holed_tile(6, 10, 20,
                                             [(5, 256, 512, 256, 64, 9)]))
        assert check_tile(kids.column("mvt")[0].as_py())[0] == 0
        s = polygon_tile_summary_batch(kids).to_pydict()
        # doubled: outer 512² at (512, 1024), hole 256² — wholly NW child
        assert (s["z"], s["x"], s["y"]) == ([7], [20], [40])
        assert s["sum_rings"] == [2]
        assert s["sum_x0"] == [512] and s["sum_y0"] == [1024]
        assert s["sum_area2"] == [2 * 512 * 512 - 2 * 256 * 256]
        assert s["sum_points"] == [9]

    def test_straddling_hole_quarters_into_all_children(self):
        from vtzero_ray.pipelines.overzoom import (OverzoomPolygons,
                                                   polygon_tile_summary_batch)

        # outer [1792,2304]² and hole [1920,2176]² BOTH straddle the
        # center → every child keeps a 512² outer corner minus a 256²
        # hole corner
        kids = OverzoomPolygons()(holed_tile(6, 10, 20,
                                             [(3, 1792, 1792, 512, 128, 4)]))
        s = polygon_tile_summary_batch(kids).to_pydict()
        assert sorted(zip(s["x"], s["y"])) == [(20, 40), (20, 41),
                                               (21, 40), (21, 41)]
        assert s["sum_rings"] == [2] * 4
        assert s["sum_area2"] == [2 * 512 * 512 - 2 * 256 * 256] * 4
        assert s["n_features"] == [1] * 4

    def test_hole_in_one_child_drops_alone_elsewhere(self):
        from vtzero_ray.mvt import builder as b
        from vtzero_ray.pipelines.overzoom import (OverzoomPolygons,
                                                   polygon_tile_summary_batch)

        # outer straddles the center; the hole sits wholly in the NW
        # quadrant — the other three children keep the outer corner only
        tb = b.TileBuilder()
        lb = tb.add_layer("hotcells", 2, 4096)
        fb = b.PolygonFeatureBuilder(lb)
        fb.set_id(1)
        fb.add_ring(5)
        for px, py in [(1792, 1792), (2304, 1792), (2304, 2304),
                       (1792, 2304)]:
            fb.set_point(px, py)
        fb.close_ring()
        fb.add_ring(5)
        for px, py in [(1856, 1856), (1856, 1920), (1920, 1920),
                       (1920, 1856)]:
            fb.set_point(px, py)
        fb.close_ring()
        fb.add_property("n_points", 2)
        fb.commit()
        t = pa.table({
            "z": pa.array([6], pa.int32()), "x": pa.array([10], pa.int32()),
            "y": pa.array([20], pa.int32()),
            "mvt": pa.array([tb.serialize()], pa.binary()),
        })
        s = polygon_tile_summary_batch(OverzoomPolygons()(t)).to_pydict()
        by_child = {(x, y): (r, a) for x, y, r, a in
                    zip(s["x"], s["y"], s["sum_rings"], s["sum_area2"])}
        assert by_child[(20, 40)] == (2, 2 * 512 * 512 - 2 * 128 * 128)
        for k in [(20, 41), (21, 40), (21, 41)]:
            assert by_child[k] == (1, 2 * 512 * 512)

    def test_net_area_cancellation_drops_polygon(self):
        from vtzero_ray.pipelines.overzoom import _clip_poly_to_box

        outer = np.array([[-100, -100], [4196, -100], [4196, 4196],
                          [-100, 4196]], np.int64)
        # a hole congruent to the outer cancels the whole clipped box
        assert _clip_poly_to_box(outer, [outer[::-1]], 4096) is None
        rings = _clip_poly_to_box(outer, [], 4096)
        assert rings is not None and len(rings) == 1
        assert sorted(map(tuple, rings[0].tolist())) == \
            [(0, 0), (0, 4096), (4096, 0), (4096, 4096)]

    def test_downzoom_holed_exact(self, ray_session):
        import ray.data as rd

        from vtzero_ray.pipelines.overzoom import (
            downzoom_polygons, polygon_tile_summary_batch)

        t = holed_tile(6, 10, 20, [(5, 256, 512, 256, 64, 9)])
        out = downzoom_polygons(rd.from_arrow(t))
        s = pa.concat_tables(
            polygon_tile_summary_batch(b)
            for b in out.iter_batches(batch_format="pyarrow")).to_pydict()
        # even (x, y) → child offset (0, 0): outer halves to 128² at
        # (128, 256), hole to 64²
        assert (s["z"], s["x"], s["y"]) == ([5], [5], [10])
        assert s["sum_rings"] == [2]
        assert s["sum_x0"] == [128] and s["sum_y0"] == [256]
        assert s["sum_area2"] == [2 * 128 * 128 - 2 * 64 * 64]

    def test_downzoom_tiny_hole_collapses_alone(self, ray_session):
        import ray.data as rd

        from vtzero_ray.pipelines.overzoom import (
            downzoom_polygons, polygon_tile_summary_batch)

        # inner side 257 − 2·128 = 1 halves to < 3 distinct points →
        # the hole sliver-drops; the outer survives
        t = holed_tile(6, 10, 20, [(5, 256, 512, 257, 128, 9)])
        out = downzoom_polygons(rd.from_arrow(t))
        s = pa.concat_tables(
            polygon_tile_summary_batch(b)
            for b in out.iter_batches(batch_format="pyarrow")).to_pydict()
        assert s["sum_rings"] == [1]
        assert s["n_features"] == [1]


class TestDownzoomPolygons:
    def test_sibling_merge_exact(self, ray_session):
        import ray.data as rd

        from vtzero_ray.pipelines.overzoom import (
            downzoom_polygons, polygon_tile_summary_batch)

        t1 = square_tile(3, 2, 2, [(5, 256, 512, 256, 7)])
        t2 = square_tile(3, 3, 2, [(9, 0, 0, 512, 4)])
        out = downzoom_polygons(
            rd.from_arrow(pa.concat_tables([t1, t2]))).to_pandas()
        t = pa.table({"z": pa.array(out["z"].astype("int32")),
                      "x": pa.array(out["x"].astype("int32")),
                      "y": pa.array(out["y"].astype("int32")),
                      "mvt": pa.array(list(out["mvt"]), pa.binary())})
        s = polygon_tile_summary_batch(t).to_pydict()
        assert s == {"z": [2], "x": [1], "y": [1], "n_features": [2],
                     "sum_fid": [14], "sum_x0": [128 + 2048],
                     "sum_y0": [256 + 0],
                     "sum_area2": [2 * 128 * 128 + 2 * 256 * 256],
                     "sum_points": [11], "sum_rings": [2]}

    def test_sliver_drops(self, ray_session):
        import ray.data as rd

        from vtzero_ray.pipelines.overzoom import downzoom_polygons

        # a 1-px square halves to a point -> dropped; the 4-px square
        # beside it survives as a 2-px square
        t = square_tile(3, 2, 2, [(1, 100, 100, 1, 3),
                                  (2, 200, 200, 4, 5)])
        out = downzoom_polygons(rd.from_arrow(t)).to_pandas()
        assert len(out) == 1 and int(out.iloc[0]["n_cells"]) == 1

    def test_rejects_z0(self, ray_session):
        from vtzero_ray.pipelines.overzoom import DownzoomPolygonsToFeatures

        t = square_tile(0, 0, 0, [(1, 0, 0, 256, 3)])
        with pytest.raises(ValueError, match="no parent"):
            DownzoomPolygonsToFeatures()(t)


def path_tiles_from_segments(rows, extent=4096):
    """(z,x,y,site,seg_idx,cx0,cy0,cx1,cy1) rows → clipped-path tiles."""
    import pandas as pd

    from vtzero_ray.pipelines.clip_paths import _encode_tile_group

    df = pd.DataFrame(rows, columns=["z", "x", "y", "site", "seg_idx",
                                     "cx0", "cy0", "cx1", "cy1"])
    df = df.astype({"z": "int32", "x": "int32", "y": "int32"})
    out = _encode_tile_group(df, extent)
    return pa.table({
        "z": pa.array(out["z"].to_numpy(), pa.int32()),
        "x": pa.array(out["x"].to_numpy(), pa.int32()),
        "y": pa.array(out["y"].to_numpy(), pa.int32()),
        "mvt": pa.array(list(out["mvt"]), pa.binary()),
        "n_features": pa.array(out["n_features"].to_numpy(), pa.int64()),
    })


class TestOverzoomPaths:
    def test_hand_case_bytes(self):
        from vtzero_ray.pipelines.overzoom import (OverzoomPaths,
                                                   path_tile_summary_batch)

        # one segment fully inside the NW child: child tile must be
        # byte-identical to encoding the doubled segment directly
        pt = path_tiles_from_segments(
            [(2, 1, 1, 7, 0, 100, 100, 900, 700)])
        kids = OverzoomPaths()(pt)
        assert len(kids) == 1
        expected = path_tiles_from_segments(
            [(3, 2, 2, 7, 0, 200, 200, 1800, 1400)])
        assert kids.column("mvt")[0].as_py() == expected.column("mvt")[0].as_py()
        summ = path_tile_summary_batch(kids)
        assert summ.to_pydict() == {"z": [3], "x": [2], "y": [2],
                                    "site": [7], "n_parts": [1],
                                    "n_points": [2]}

    def test_center_crossing_split(self):
        from vtzero_ray.pipelines.overzoom import (OverzoomPaths,
                                                   path_tile_summary_batch)

        # diagonal through the tile center: every child gets a clipped
        # piece; the split point 2048 doubles to 4096 == the boundary
        pt = path_tiles_from_segments(
            [(2, 1, 1, 3, 0, 0, 0, 4096, 4096)])
        kids = OverzoomPaths()(pt)
        summ = path_tile_summary_batch(kids)
        d = {(x, y): (p, n) for x, y, p, n in zip(
            summ.column("x").to_pylist(), summ.column("y").to_pylist(),
            summ.column("n_parts").to_pylist(),
            summ.column("n_points").to_pylist())}
        # NW and SE children carry the diagonal (extended into the
        # buffer); NE/SW children see only the ±64-buffered corner nick
        assert (2, 2) in d and (3, 3) in d
        assert d[(2, 2)] == (1, 2) and d[(3, 3)] == (1, 2)

    def test_part_break_preserved_when_endpoints_meet(self):
        from vtzero_ray.mvt import codec
        from vtzero_ray.pipelines.overzoom import OverzoomPaths
        from vtzero_ray.pipelines.decode import decode_tiles_batch_v

        # two segments of the SAME site with a seg_idx gap whose
        # endpoints meet: parent keeps 2 parts; after overzoom the
        # children must STILL see 2 parts (idx2 gap), not a merged one
        pt = path_tiles_from_segments(
            [(2, 1, 1, 5, 0, 100, 100, 500, 500),
             (2, 1, 1, 5, 7, 500, 500, 900, 300)])
        feats = decode_tiles_batch_v(pt, with_props=True, with_geometry=True)
        cmds = np.asarray(feats.column("geom_cmds")[0].as_py(), np.uint32)
        assert len(codec.decode_linestring(cmds)) == 2  # parent: 2 parts
        kids = OverzoomPaths()(pt)
        assert len(kids) == 1  # all inside NW child
        kf = decode_tiles_batch_v(kids, with_props=True, with_geometry=True)
        kcmds = np.asarray(kf.column("geom_cmds")[0].as_py(), np.uint32)
        assert len(codec.decode_linestring(kcmds)) == 2  # still 2 parts

    def test_two_levels_compose(self):
        from vtzero_ray.pipelines.overzoom import (OverzoomPaths,
                                                   path_tile_summary_batch)

        pt = path_tiles_from_segments(
            [(2, 1, 1, 3, 0, 0, 0, 4096, 4096),
             (2, 1, 1, 9, 0, 50, 4000, 4090, 100)])
        one = OverzoomPaths()(pt)
        two = OverzoomPaths()(one)
        assert (two.column("z").to_numpy() == 4).all()
        s = path_tile_summary_batch(two)
        assert len(s) > 0
        # grand-child keys live under the z2 parent (1,1) quad
        assert set(np.unique(two.column("x").to_numpy())) <= {4, 5, 6, 7}

    def test_rejects_point_layer(self):
        from vtzero_ray.pipelines.overzoom import OverzoomPaths

        fids, px, py, urls, langs = make_case(5, seed=3)
        batch = pa.table({
            "z": pa.array([6] * 5, pa.int32()),
            "x": pa.array([1] * 5, pa.int32()),
            "y": pa.array([2] * 5, pa.int32()),
            "doc_id": pa.array([int(f) for f in fids], pa.uint64()),
            "px": pa.array([int(v) for v in px], pa.int32()),
            "py": pa.array([int(v) for v in py], pa.int32()),
            "url": pa.array(urls), "lang": pa.array(langs),
        })
        tiles = PointTileAssembler()(batch)
        with pytest.raises(ValueError, match="linestring"):
            OverzoomPaths()(tiles)

    def test_segment_level_reference(self):
        """Decode→transform must equal running the library clip kernels
        directly on the parent's segment table (independent of the tile
        byte round trip)."""
        import pandas as pd

        from vtzero_ray.pipelines.overzoom import (OverzoomPaths,
                                                   path_tile_summary_batch)
        from vtzero_ray.stages.clip import liang_barsky

        rng = np.random.default_rng(123)
        rows = []
        for site in range(6):
            n = 8
            xs = rng.integers(-64, 4161, n)
            ys = rng.integers(-64, 4161, n)
            si = 0
            for j in range(n - 1):
                if (xs[j], ys[j]) == (xs[j + 1], ys[j + 1]):
                    continue
                rows.append((2, 1, 2, site, si, int(xs[j]), int(ys[j]),
                             int(xs[j + 1]), int(ys[j + 1])))
                si += 2 if rng.random() < 0.3 else 1  # inject part breaks
        pt = path_tiles_from_segments(rows)
        kids = OverzoomPaths()(pt)
        got = path_tile_summary_batch(kids).to_pandas()
        got = got.sort_values(["x", "y", "site"]).reset_index(drop=True)

        # reference: idx2 re-index per (site) with chain-break rule, then
        # double + clip per child, then count parts
        df = pd.DataFrame(rows, columns=["z", "x", "y", "site", "seg_idx",
                                         "cx0", "cy0", "cx1", "cy1"])
        ref_rows = {}
        for site, g in df.groupby("site"):
            g = g.sort_values("seg_idx")
            si = g["seg_idx"].to_numpy()
            new_part = np.ones(len(g), bool)
            new_part[1:] = ((si[1:] != si[:-1] + 1)
                            | (g["cx0"].to_numpy()[1:] != g["cx1"].to_numpy()[:-1])
                            | (g["cy0"].to_numpy()[1:] != g["cy1"].to_numpy()[:-1]))
            idx2 = np.arange(len(g)) + np.cumsum(new_part) - 1
            for dx in (0, 1):
                for dy in (0, 1):
                    keep, a0, b0, a1, b1 = liang_barsky(
                        2 * g["cx0"].to_numpy() - dx * 4096,
                        2 * g["cy0"].to_numpy() - dy * 4096,
                        2 * g["cx1"].to_numpy() - dx * 4096,
                        2 * g["cy1"].to_numpy() - dy * 4096,
                        -64.0, 4160.0)
                    if not keep.any():
                        continue
                    ki = idx2[keep]
                    np2 = np.ones(ki.shape[0], bool)
                    np2[1:] = ((ki[1:] != ki[:-1] + 1)
                               | (a0[keep][1:] != a1[keep][:-1])
                               | (b0[keep][1:] != b1[keep][:-1]))
                    ref_rows[(2 + dx, 4 + dy, site)] = (
                        int(np2.sum()), int(keep.sum() + np2.sum()))
        exp = pd.DataFrame(
            [(3, x, y, s, p, n) for (x, y, s), (p, n) in
             sorted(ref_rows.items())],
            columns=["z", "x", "y", "site", "n_parts", "n_points"])
        exp = exp.sort_values(["x", "y", "site"]).reset_index(drop=True)
        assert got["z"].tolist() == exp["z"].tolist()
        assert got["x"].tolist() == exp["x"].tolist()
        assert got["y"].tolist() == exp["y"].tolist()
        assert got["site"].tolist() == exp["site"].tolist()
        assert got["n_parts"].tolist() == exp["n_parts"].tolist()
        assert got["n_points"].tolist() == exp["n_points"].tolist()


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


class TestUpdatePyramid:
    """Incremental pyramid maintenance: update(store(A), shard(B)) must
    serve EXACTLY the tiles of build(A ∪ B), touching only the shard's
    affected keys (4×-shrinking per level)."""

    @staticmethod
    def _features(pred):
        from vtzero_ray.pipelines.tiling import features_dataset

        ds = features_dataset("/root/testdata/sf0.001", zooms=(6,)) \
            .select_columns(["z", "x", "y", "doc_id", "px", "py",
                             "url", "lang"])

        def f(t):
            ids = t.column("doc_id").to_numpy()
            mask = np.broadcast_to(np.asarray(pred(ids), dtype=bool),
                                   ids.shape)
            return t.filter(pa.array(np.ascontiguousarray(mask)))

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    @staticmethod
    def _assemble(feats):
        from vtzero_ray.stages.encode import (PointTileAssembler,
                                              add_tile_bucket)

        return feats.map_batches(add_tile_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(PointTileAssembler(),
                                          batch_format="pyarrow")

    def test_update_equals_full_rebuild(self, ray_session, tmp_path):
        import glob
        import os

        from vtzero_ray.pipelines.pyramid import (build_pyramid,
                                                  compact_pyramid,
                                                  get_tile,
                                                  read_tiles_current,
                                                  update_pyramid)
        from vtzero_ray.sources.mvt_io import read_tiles

        store = str(tmp_path / "store")
        full = str(tmp_path / "full")
        base = self._assemble(self._features(lambda i: i % 5 != 0))
        build_pyramid(base, store, base_zoom=6, min_zoom=4)
        base_files = {f: os.path.getmtime(f) for f in
                      glob.glob(f"{store}/z=*/*.parquet")}

        shard = self._features(lambda i: i % 5 == 0)
        delta = update_pyramid(store, shard, base_zoom=6, min_zoom=4)
        assert os.path.isdir(delta)
        # base generation files untouched — the update is purely additive
        assert base_files == {f: os.path.getmtime(f) for f in
                              glob.glob(f"{store}/z=*/*.parquet")}

        both = self._assemble(self._features(lambda i: True))
        build_pyramid(both, full, base_zoom=6, min_zoom=4)
        exp = read_tiles(full).to_pandas()
        got = read_tiles_current(store).to_pandas()
        em = {(r.z, r.x, r.y): bytes(r.mvt) for r in exp.itertuples()}
        gm = {(r.z, r.x, r.y): bytes(r.mvt) for r in got.itertuples()}
        assert gm == em   # byte-identical current view, every level

        # the delta holds ONLY the shard's affected keys at the base
        shard_keys = set(map(tuple, self._features(
            lambda i: i % 5 == 0).select_columns(["x", "y"]).to_pandas()
            .drop_duplicates().to_numpy().tolist()))
        import pyarrow.parquet as pqr
        dz6 = pa.concat_tables([
            pqr.read_table(f, columns=["x", "y"])
            for f in glob.glob(f"{delta}/z=6/*.parquet")]).to_pandas()
        assert set(map(tuple, dz6.to_numpy().tolist())) == shard_keys

        # point reads serve the updated bytes
        zz, xx, yy = next(iter(shard_keys.__iter__())), None, None
        k = next(iter(sorted(shard_keys)))
        assert get_tile(store, 6, k[0], k[1]) == em[(6, k[0], k[1])]

        # compaction folds the chain into an identical plain store
        comp = str(tmp_path / "compact")
        compact_pyramid(store, comp)
        cm = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles(comp).to_pandas().itertuples()}
        assert cm == em

    def test_second_update_stacks_generations(self, ray_session, tmp_path):
        from vtzero_ray.pipelines.pyramid import (build_pyramid,
                                                  read_tiles_current,
                                                  update_pyramid)
        from vtzero_ray.sources.mvt_io import read_tiles

        store = str(tmp_path / "store")
        full = str(tmp_path / "full")
        build_pyramid(self._assemble(self._features(lambda i: i % 3 == 0)),
                      store, base_zoom=6, min_zoom=5)
        update_pyramid(store, self._features(lambda i: i % 3 == 1),
                       base_zoom=6, min_zoom=5)
        update_pyramid(store, self._features(lambda i: i % 3 == 2),
                       base_zoom=6, min_zoom=5)
        build_pyramid(self._assemble(self._features(lambda i: True)),
                      full, base_zoom=6, min_zoom=5)
        em = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles(full).to_pandas().itertuples()}
        gm = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles_current(store).to_pandas().itertuples()}
        assert gm == em


class TestPyramidKinds:
    """build_pyramid / get_tile across all three geometry kinds —
    polygon stores carry holed multi-ring features end to end."""

    def test_polygon_pyramid_store_and_serve(self, ray_session, tmp_path):
        from vtzero_ray.pipelines.overzoom import (OverzoomPolygons,
                                                   downzoom_polygons)
        from vtzero_ray.pipelines.pyramid import build_pyramid, get_tile
        from vtzero_ray.pipelines.tiling import tiles_pipeline
        from vtzero_ray.sources.mvt_io import read_tiles
        from vtzero_ray.stages.raster import (raster_to_vector,
                                              rasterize_tiles)

        store = str(tmp_path / "polystore")
        tiles = tiles_pipeline("/root/testdata/sf0.001", zooms=(6,),
                               validate=False)
        vec = raster_to_vector(rasterize_tiles(tiles, grid=16),
                               threshold=1, grid=16,
                               hole_inset=64).materialize()
        build_pyramid(vec, store, base_zoom=6, min_zoom=5,
                      kind="polygons")
        back = read_tiles(store).to_pandas()
        assert sorted(back["z"].unique()) == [5, 6]
        # stored z5 equals a fresh polygon downzoom of the base
        exp = downzoom_polygons(vec, levels=1).to_pandas()
        gm = {(r.x, r.y): bytes(r.mvt)
              for r in back[back.z == 5].itertuples()}
        em = {(r.x, r.y): bytes(r.mvt) for r in exp.itertuples()}
        assert gm == em
        # virtual deep zoom auto-sniffs the polygon kind: z7 serve
        # equals overzooming the stored base tile directly
        b6 = back[back.z == 6].iloc[0]
        kids = OverzoomPolygons()(pa.table({
            "z": pa.array([6], pa.int32()),
            "x": pa.array([int(b6.x)], pa.int32()),
            "y": pa.array([int(b6.y)], pa.int32()),
            "mvt": pa.array([bytes(b6.mvt)], pa.binary()),
        }))
        for i in range(len(kids)):
            kx = kids.column("x")[i].as_py()
            ky = kids.column("y")[i].as_py()
            got = get_tile(store, 7, kx, ky)
            assert got == kids.column("mvt")[i].as_py()

    def test_paths_pyramid_store_and_serve(self, ray_session, tmp_path):
        from vtzero_ray.pipelines.clip_paths import clipped_path_tiles
        from vtzero_ray.pipelines.overzoom import (OverzoomPaths,
                                                   downzoom_paths)
        from vtzero_ray.pipelines.pyramid import build_pyramid, get_tile
        from vtzero_ray.sources.mvt_io import read_tiles

        store = str(tmp_path / "pathstore")
        tiles = clipped_path_tiles("/root/testdata/sf0.001",
                                   zoom=2).materialize()
        build_pyramid(tiles, store, base_zoom=2, min_zoom=1, kind="paths")
        back = read_tiles(store).to_pandas()
        assert sorted(back["z"].unique()) == [1, 2]
        exp = downzoom_paths(tiles, levels=1).to_pandas()
        gm = {(r.x, r.y): bytes(r.mvt)
              for r in back[back.z == 1].itertuples()}
        em = {(r.x, r.y): bytes(r.mvt) for r in exp.itertuples()}
        assert gm == em
        b2 = back[back.z == 2].iloc[0]
        kids = OverzoomPaths()(pa.table({
            "z": pa.array([2], pa.int32()),
            "x": pa.array([int(b2.x)], pa.int32()),
            "y": pa.array([int(b2.y)], pa.int32()),
            "mvt": pa.array([bytes(b2.mvt)], pa.binary()),
        }))
        for i in range(min(2, len(kids))):
            kx = kids.column("x")[i].as_py()
            ky = kids.column("y")[i].as_py()
            assert get_tile(store, 3, kx, ky) == \
                kids.column("mvt")[i].as_py()

    def test_unknown_kind_raises(self, ray_session):
        from vtzero_ray.pipelines.pyramid import _downzoom_fn

        with pytest.raises(ValueError, match="unknown pyramid kind"):
            _downzoom_fn("hexagons")


class TestRemoveFromPyramid:
    def test_removal_equals_rebuild_without(self, ray_session, tmp_path):
        """remove(store(ALL), R) must serve exactly build(ALL − R),
        including a TOMBSTONE for a tile that loses every feature."""
        from vtzero_ray.pipelines.pyramid import (build_pyramid, get_tile,
                                                  read_tiles_current,
                                                  remove_from_pyramid)
        from vtzero_ray.sources.mvt_io import read_tiles

        feats_all = TestUpdatePyramid._features(lambda i: True) \
            .to_pandas()
        # victim tile: the first base tile by key — every feature of it
        # goes, so it must tombstone out of the current view
        kx, ky = sorted(set(zip(feats_all.x, feats_all.y)))[0]
        rm = (feats_all.doc_id % 5 == 0) | \
            ((feats_all.x == kx) & (feats_all.y == ky))
        removals = feats_all[rm][["x", "y", "doc_id"]]
        keep_ids = set(feats_all[~rm].doc_id)

        import ray.data as rd

        store = str(tmp_path / "store")
        full = str(tmp_path / "survivors")
        build_pyramid(TestUpdatePyramid._assemble(
            TestUpdatePyramid._features(lambda i: True)),
            store, base_zoom=6, min_zoom=4)
        delta = remove_from_pyramid(store, rd.from_pandas(removals),
                                    base_zoom=6, min_zoom=4)
        import os
        assert os.path.isdir(delta)
        build_pyramid(TestUpdatePyramid._assemble(
            TestUpdatePyramid._features(
                lambda i: np.isin(i, list(keep_ids)))),
            full, base_zoom=6, min_zoom=4)
        em = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles(full).to_pandas().itertuples()}
        gm = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles_current(store).to_pandas().itertuples()}
        assert gm == em
        # the emptied tile is gone from the current view and the server
        assert (6, kx, ky) not in gm
        assert get_tile(store, 6, int(kx), int(ky)) is None
        # a surviving tile still serves its updated bytes
        sz, sx, sy = sorted(k for k in gm if k[0] == 6)[0]
        assert get_tile(store, 6, int(sx), int(sy)) == gm[(6, sx, sy)]

    def test_noop_removal_keeps_bytes(self, ray_session, tmp_path):
        """Removing a doc_id that is not in its named tile re-encodes
        the tile to identical bytes — the delta changes nothing."""
        from vtzero_ray.pipelines.pyramid import (build_pyramid,
                                                  read_tiles_current,
                                                  remove_from_pyramid)
        from vtzero_ray.sources.mvt_io import read_tiles

        import pandas as pd
        import ray.data as rd

        store = str(tmp_path / "store")
        build_pyramid(TestUpdatePyramid._assemble(
            TestUpdatePyramid._features(lambda i: True)),
            store, base_zoom=6, min_zoom=5)
        before = {(r.z, r.x, r.y): bytes(r.mvt)
                  for r in read_tiles(store).to_pandas().itertuples()}
        feats = TestUpdatePyramid._features(lambda i: True).to_pandas()
        k = feats.iloc[0]
        removals = pd.DataFrame({"x": [int(k.x)], "y": [int(k.y)],
                                 "doc_id": [10**15]})   # absent doc
        remove_from_pyramid(store, rd.from_pandas(removals),
                            base_zoom=6, min_zoom=5)
        after = {(r.z, r.x, r.y): bytes(r.mvt)
                 for r in read_tiles_current(store).to_pandas()
                 .itertuples()}
        assert after == before


class TestUpdatePolygonPyramid:
    def test_update_equals_full_rebuild(self, ray_session, tmp_path):
        """update(polygon store(raster A), raster shard B) must serve
        exactly build(raster A+B) — counts add, holed cells re-encode,
        parents re-derive."""
        from vtzero_ray.pipelines.pyramid import (build_pyramid,
                                                  read_tiles_current,
                                                  update_polygon_pyramid)
        from vtzero_ray.sources.mvt_io import read_tiles
        from vtzero_ray.stages.raster import (raster_to_vector,
                                              rasterize_tiles)

        def tiles_of(pred):
            return TestUpdatePyramid._assemble(
                TestUpdatePyramid._features(pred)).materialize()

        store = str(tmp_path / "polystore")
        full = str(tmp_path / "polyfull")
        vec_a = raster_to_vector(
            rasterize_tiles(tiles_of(lambda i: i % 2 == 0), grid=16),
            threshold=1, grid=16, hole_inset=64)
        build_pyramid(vec_a, store, base_zoom=6, min_zoom=4,
                      kind="polygons")
        shard = rasterize_tiles(tiles_of(lambda i: i % 2 == 1), grid=16)
        delta = update_polygon_pyramid(store, shard, base_zoom=6,
                                       min_zoom=4, grid=16,
                                       hole_inset=64)
        import os
        assert os.path.isdir(delta)
        vec_all = raster_to_vector(
            rasterize_tiles(tiles_of(lambda i: True), grid=16),
            threshold=1, grid=16, hole_inset=64)
        build_pyramid(vec_all, full, base_zoom=6, min_zoom=4,
                      kind="polygons")
        em = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles(full).to_pandas().itertuples()}
        gm = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles_current(store).to_pandas().itertuples()}
        assert gm == em and len(gm) > 0


class TestHilbertPrunedUpdate:
    def test_file_pruning_and_update_equality(self, ray_session, tmp_path):
        """A Hilbert-laid-out store lets the incremental update list
        only the files whose footer hkey range can contain an affected
        tile — and the update still serves exactly the full rebuild."""
        import glob

        from vtzero_ray.pipelines.pyramid import (_pruned_level_paths,
                                                  build_pyramid,
                                                  read_tiles_current,
                                                  update_pyramid)
        from vtzero_ray.sources.mvt_io import read_tiles

        store = str(tmp_path / "hstore")
        full = str(tmp_path / "hfull")
        base = TestUpdatePyramid._assemble(
            TestUpdatePyramid._features(lambda i: i % 5 != 0)) \
            .repartition(6)
        build_pyramid(base, store, base_zoom=6, min_zoom=4, hilbert=True)
        all_files = sorted(glob.glob(f"{store}/z=6/*.parquet"))
        shard = TestUpdatePyramid._features(lambda i: i % 5 == 0)
        sk = shard.select_columns(["x", "y"]).to_pandas().drop_duplicates()
        keys = np.sort((sk["x"].to_numpy(np.int64) << 32)
                       | sk["y"].to_numpy(np.int64))
        # restrict to ONE tile key: its file subset must be a strict
        # subset when the level spans several files
        one = keys[:1]
        pruned = _pruned_level_paths(store, 6, one)
        assert set(pruned) <= set(all_files) and len(pruned) >= 1
        if len(all_files) > 1:
            assert len(pruned) < len(all_files)

        update_pyramid(store, shard, base_zoom=6, min_zoom=4)
        build_pyramid(TestUpdatePyramid._assemble(
            TestUpdatePyramid._features(lambda i: True)),
            full, base_zoom=6, min_zoom=4)
        em = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles(full).to_pandas().itertuples()}
        gm = {(r.z, r.x, r.y): bytes(r.mvt)
              for r in read_tiles_current(store).to_pandas().itertuples()}
        assert gm == em

    def test_unsorted_store_never_prunes(self, ray_session, tmp_path):
        import glob

        from vtzero_ray.pipelines.pyramid import (_pruned_level_paths,
                                                  build_pyramid)

        store = str(tmp_path / "plain")
        build_pyramid(TestUpdatePyramid._assemble(
            TestUpdatePyramid._features(lambda i: True)),
            store, base_zoom=6, min_zoom=5)
        all_files = sorted(glob.glob(f"{store}/z=6/*.parquet"))
        # no hkey column → every file kept (pruning must stay a superset)
        assert _pruned_level_paths(store, 6,
                                   np.array([0], np.int64)) == all_files
