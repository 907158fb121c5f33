"""Example-CLI parity (SURVEY §2: vtzero's operators include the example
program pipelines). Each CLI is driven as a subprocess over tiles built
by this engine, mirroring reference semantics:

- vtzero_stats.py    — examples/vtzero-stats.cpp:20-60 CSV columns
- vtzero_filter.py   — examples/vtzero-filter.cpp:23-110 (layer / feature)
- vtzero_streets.py  — examples/vtzero-streets.cpp:22-85 (predicate copy)
- vtzero_encode_geom.py — examples/vtzero-encode-geom.cpp:36-145
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"


def run(script, *args):
    return subprocess.run([sys.executable, str(SCRIPTS / script), *args],
                          capture_output=True, text=True, timeout=120)


@pytest.fixture(scope="module")
def sample_tile(tmp_path_factory):
    from vtzero_ray.mvt.builder import PointFeatureBuilder, TileBuilder

    tb = TileBuilder()
    lb = tb.add_layer("roads")
    for i, cls in enumerate(["street", "path", "street"]):
        fb = PointFeatureBuilder(lb)
        fb.set_id(i + 1)
        fb.add_point(10 + i, 20 + i)
        fb.add_property("class", cls)
        fb.commit()
    lb2 = tb.add_layer("pois")
    fb = PointFeatureBuilder(lb2)
    fb.set_id(9)
    fb.add_point(7, 7)
    fb.add_property("kind", "cafe")
    fb.commit()
    p = tmp_path_factory.mktemp("cli") / "sample.mvt"
    p.write_bytes(tb.serialize())
    return p


class TestStatsCLI:
    def test_csv_columns(self, sample_tile):
        r = run("vtzero_stats.py", str(sample_tile))
        assert r.returncode == 0
        lines = r.stdout.strip().splitlines()
        assert lines[0] == ("layer,num_features,raw_size,raw_geometries_size,"
                            "key_table_size,value_table_size")
        rows = dict((l.split(",")[0], l.split(",")) for l in lines[1:])
        assert rows["roads"][1] == "3" and rows["pois"][1] == "1"
        # key/value table sizes reflect interning (1 key, 2 distinct values)
        assert rows["roads"][4] == "1" and rows["roads"][5] == "2"

    def test_bad_tile_exits_nonzero(self, tmp_path):
        p = tmp_path / "junk.mvt"
        p.write_bytes(b"\x00\x01\x02garbage")
        r = run("vtzero_stats.py", str(p))
        assert r.returncode == 1 and "Error" in r.stderr


class TestFilterCLI:
    def test_whole_layer_by_name(self, sample_tile, tmp_path):
        from vtzero_ray.mvt.decoder import VectorTile

        out = tmp_path / "out.mvt"
        r = run("vtzero_filter.py", str(sample_tile), "pois", "-o", str(out))
        assert r.returncode == 0 and "Found layer: pois" in r.stderr
        layers = list(VectorTile(out.read_bytes()).layers())
        assert [(l.name, l.num_features) for l in layers] == [(b"pois", 1)]

    def test_single_feature_by_id(self, sample_tile, tmp_path):
        from vtzero_ray.mvt.decoder import VectorTile
        from vtzero_ray.mvt.values import decode_value

        out = tmp_path / "out.mvt"
        r = run("vtzero_filter.py", str(sample_tile), "0", "2", "-o", str(out))
        assert r.returncode == 0
        layer = list(VectorTile(out.read_bytes()).layers())[0]
        feats = list(layer.features())
        assert len(feats) == 1 and feats[0].id == 2
        props = [(k, decode_value(v)) for k, v in feats[0].properties_raw()]
        assert props == [(b"class", (1, b"path"))]  # type 1 = string

    def test_missing_feature_id(self, sample_tile, tmp_path):
        r = run("vtzero_filter.py", str(sample_tile), "roads", "42")
        assert r.returncode == 1 and "No feature with that id" in r.stderr


class TestStreetsCLI:
    def test_default_predicate(self, sample_tile, tmp_path):
        from vtzero_ray.mvt.decoder import VectorTile

        out = tmp_path / "out.mvt"
        r = run("vtzero_streets.py", str(sample_tile), "roads",
                "-o", str(out))
        assert r.returncode == 0 and "kept 2 features" in r.stderr
        layer = list(VectorTile(out.read_bytes()).layers())[0]
        assert layer.num_features == 2
        assert sorted(f.id for f in layer.features()) == [1, 3]


class TestEncodeGeomCLI:
    def test_reference_example(self):
        """M1 5 7 L2 3 2 1 1 C — the multipoint/line command stream from
        test_geometry.cpp-style vectors."""
        r = run("vtzero_encode_geom.py", "M1", "5", "7", "L2",
                "3", "2", "1", "1", "C")
        assert r.returncode == 0
        assert r.stdout.strip().endswith("[ 9, 10, 14, 18, 6, 4, 2, 2, 15 ]")
        assert "MOVE_TO(1)\t9" in r.stdout
        assert "CLOSE_PATH\t15" in r.stdout

    def test_negative_number_zigzag(self):
        r = run("vtzero_encode_geom.py", "-1")
        assert r.returncode == 0 and "number(-1)\t1" in r.stdout

    def test_bad_count(self):
        r = run("vtzero_encode_geom.py", "M0")
        assert r.returncode == 1 and "must be 1 or larger" in r.stderr
