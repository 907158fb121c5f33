"""mvt-fixtures-style conformance corpus (FIXTURES.md F4), synthesized from
the documented byte content of the reference's fixture tests
(/root/reference/test/fixture_tests.cpp; the upstream submodule is not
vendored). Case numbers mirror the upstream corpus."""

import numpy as np
import pytest

from vtzero_ray.exceptions import (FormatError, GeometryError,
                                   OutOfRangeError, VersionError)
from vtzero_ray.mvt import builder as b
from vtzero_ray.mvt import codec, values
from vtzero_ray.mvt.decoder import VectorTile
from vtzero_ray.mvt.pbf import encode_varints_np, field_bytes, field_varint


def layer_payload(*, version=2, name=b"hello", extent=4096, features=(),
                  keys=(), vals=()):
    p = field_varint(15, version) + field_bytes(1, name) + field_varint(5, extent)
    for f in features:
        p += field_bytes(2, f)
    for k in keys:
        p += field_bytes(3, k)
    for v in vals:
        p += field_bytes(4, v)
    return p


def feature_body(*, fid=None, geom=None, geom_type=1, tags=None):
    body = b""
    if fid is not None:
        body += field_varint(1, fid)
    if tags is not None:
        body += field_bytes(2, encode_varints_np(np.array(tags, dtype=np.uint64)))
    if geom_type is not None:  # None = omit the type field (case 003)
        body += field_varint(3, geom_type)
    if geom is not None:
        body += field_bytes(4, encode_varints_np(np.array(geom, dtype=np.uint32)))
    return body


def one_feature_tile(**kw):
    return field_bytes(3, layer_payload(features=[feature_body(**kw)],
                                        keys=kw.pop("keys_", ()) or (),
                                        vals=kw.pop("vals_", ()) or ()))


class TestFixtureCorpus:
    def test_001_empty_tile(self):
        tile = VectorTile(b"")
        assert tile.count_layers() == 0

    def test_002_single_point_with_id(self):
        data = one_feature_tile(fid=1, geom=[9, 50, 34])
        f = next(VectorTile(data).get_layer(0).features())
        assert f.has_id and f.id == 1
        assert f.decode_geometry().tolist() == [[25, 17]]

    def test_004_missing_geometry(self):
        data = field_bytes(3, layer_payload(features=[field_varint(3, 1)]))
        with pytest.raises(FormatError, match=r"Missing geometry field in feature \(spec 4.2\)"):
            list(VectorTile(data).get_layer(0).features())

    def test_005_odd_tag_count(self):
        data = one_feature_tile(geom=[9, 50, 34], tags=[0])
        with pytest.raises(FormatError, match=r"unpaired property key/value indexes \(spec 4.4\)"):
            list(VectorTile(data).get_layer(0).features())

    def test_006_bad_geom_type(self):
        data = one_feature_tile(geom=[9, 50, 34], geom_type=5)
        with pytest.raises(FormatError, match=r"Unknown geometry type \(spec 4.3.4\)"):
            list(VectorTile(data).get_layer(0).features())

    @pytest.mark.parametrize("version", [0, 3, 99])
    def test_012_024_unsupported_versions(self, version):
        p = layer_payload(version=version, features=[feature_body(geom=[9, 50, 34])])
        with pytest.raises(VersionError, match=f"unknown vector tile version: {version}"):
            list(VectorTile(field_bytes(3, p)).layers())

    def test_014_missing_layer_name(self):
        p = field_varint(15, 2) + field_varint(5, 4096)
        with pytest.raises(FormatError, match=r"missing name field in layer \(spec 4.1\)"):
            list(VectorTile(field_bytes(3, p)).layers())

    # 032-038: property value type matrix
    @pytest.mark.parametrize("vt,val,blob_check", [
        (values.VT_STRING, b"ello", None),
        (values.VT_FLOAT, 3.5, b"\x15\x00\x00\x60\x40"),
        (values.VT_DOUBLE, 1.25, None),
        (values.VT_INT, -99, None),
        (values.VT_UINT, 99, b"\x28\x63"),
        (values.VT_SINT, -87, None),
        (values.VT_BOOL, True, b"\x38\x01"),
    ])
    def test_032_038_property_types(self, vt, val, blob_check):
        blob = values.encode_value(val, vt)
        if blob_check:
            assert blob == blob_check
        data = one_feature_tile(geom=[9, 50, 34], tags=[0, 0])
        # rebuild with tables
        p = layer_payload(features=[feature_body(geom=[9, 50, 34], tags=[0, 0])],
                          keys=[b"k"], vals=[blob])
        f = next(VectorTile(field_bytes(3, p)).get_layer(0).features())
        props = f.properties()
        assert props["k"] == val

    def test_040_out_of_range_key_index(self):
        p = layer_payload(features=[feature_body(geom=[9, 50, 34], tags=[7, 0])],
                          keys=[b"k"], vals=[values.encode_value(1, values.VT_UINT)])
        f = next(VectorTile(field_bytes(3, p)).get_layer(0).features())
        with pytest.raises(OutOfRangeError, match="index out of range: 7"):
            list(f.properties_raw())

    def test_042_out_of_range_value_index(self):
        p = layer_payload(features=[feature_body(geom=[9, 50, 34], tags=[0, 9])],
                          keys=[b"k"], vals=[values.encode_value(1, values.VT_UINT)])
        f = next(VectorTile(field_bytes(3, p)).get_layer(0).features())
        with pytest.raises(OutOfRangeError, match="index out of range: 9"):
            list(f.properties_raw())

    # 053-056: clipped squares (fixture_tests.cpp:910-988)
    @pytest.mark.parametrize("lo,hi", [(0, 4096), (-1, 4097), (1, 4095), (-200, 4296)])
    def test_053_056_clipped_squares(self, lo, hi):
        ring = np.array([[lo, lo], [hi, lo], [hi, hi], [lo, hi], [lo, lo]])
        cmds = codec.encode_polygon([ring])
        data = one_feature_tile(geom=cmds.tolist(), geom_type=3)
        f = next(VectorTile(data).get_layer(0).features())
        rings = f.decode_geometry()
        assert rings[0][0].tolist() == ring.tolist()

    def test_057_gigantic_moveto(self):
        # MoveTo(2^29-1) with only 2 parameter bytes on the wire
        data = one_feature_tile(geom=[codec.command_integer(1, (1 << 29) - 1), 10, 14])
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="count too large"):
            f.decode_geometry()

    def test_058_gigantic_lineto(self):
        data = one_feature_tile(
            geom=[9, 4, 4, codec.command_integer(2, (1 << 29) - 1), 0, 16],
            geom_type=2,
        )
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="count too large"):
            f.decode_geometry()

    def test_044_unknown_geom_in_decode(self):
        data = one_feature_tile(geom=[9, 50, 34], geom_type=0)
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="unknown geometry type"):
            f.decode_geometry()


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"),
    reason="reference golden tile not available",
)
class TestGoldenTile:
    """Real-world golden tile (test/t/test_builder.cpp:333-360 analogue)."""

    PATH = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"

    def test_size_and_structure(self):
        data = open(self.PATH, "rb").read()
        assert len(data) == 269388  # test_builder.cpp:339
        tile = VectorTile(data)
        assert tile.count_layers() == 12
        total = sum(l.num_features for l in tile.layers())
        assert total == 8096

    def test_full_decode(self):
        data = open(self.PATH, "rb").read()
        for layer in VectorTile(data).layers():
            for f in layer.features():
                f.decode_geometry()
                dict(f.properties())

    def test_copy_roundtrip_logical_equality(self):
        data = open(self.PATH, "rb").read()
        tb = b.TileBuilder()
        for layer in VectorTile(data).layers():
            if layer.num_features == 0:
                continue  # empty layers dropped at serialize
            lb = tb.add_layer_from(layer)
            for f in layer.features():
                lb.copy_feature(f)
        copied = tb.serialize()

        def snap(d):
            out = []
            for layer in VectorTile(d).layers():
                feats = [(f.has_id, f.id, f.geom_type,
                          sorted(f.properties().items()))
                         for f in layer.features()]
                out.append((layer.name, layer.version, layer.extent, feats))
            return out

        assert snap(copied) == [s for s in snap(data) if s[3]]


class TestFixtureCorpus2:
    """Analogues for the remaining upstream cases (007-016, 039-052)."""

    def test_007_version_as_string(self):
        # field 15 with wire type 2 → unknown field in layer
        p = field_bytes(15, b"2") + field_bytes(1, b"hello")
        with pytest.raises(FormatError, match=r"unknown field in layer \(tag=15, type=2\)"):
            list(VectorTile(field_bytes(3, p)).layers())

    def test_008_extent_as_string(self):
        p = field_varint(15, 2) + field_bytes(1, b"hello") + field_bytes(5, b"4096")
        with pytest.raises(FormatError, match=r"unknown field in layer \(tag=5, type=2\)"):
            list(VectorTile(field_bytes(3, p)).layers())

    def test_009_extent_missing_defaults_4096(self):
        p = layer_payload(version=2, name=b"hello", features=[feature_body(fid=1, geom=[9, 50, 34])])
        p = field_varint(15, 2) + field_bytes(1, b"hello") + field_bytes(
            2, feature_body(fid=1, geom=[9, 50, 34]))
        layer = VectorTile(field_bytes(3, p)).get_layer(0)
        assert layer.extent == 4096
        assert next(layer.features()).id == 1

    def test_010_011_bad_value_types(self):
        # value blob with varint field 1 (string tag, wrong wire) / unknown tag
        for blob in (field_varint(1, 7), field_varint(9, 1)):
            with pytest.raises(FormatError, match="illegal property value type"):
                values.value_type(blob)

    def test_013_key_encoded_as_int(self):
        p = field_varint(15, 2) + field_bytes(1, b"hello") + field_varint(3, 7)
        with pytest.raises(FormatError, match=r"unknown field in layer \(tag=3, type=0\)"):
            list(VectorTile(field_bytes(3, p)).layers())

    def test_015_duplicate_layer_names_readable(self):
        p = layer_payload(name=b"hello", features=[feature_body(geom=[9, 50, 34])])
        tile = VectorTile(field_bytes(3, p) + field_bytes(3, p))
        assert tile.count_layers() == 2
        assert all(l.name == b"hello" for l in tile.layers())
        assert tile.get_layer_by_name("hello").name == b"hello"

    def test_016_valid_unknown_geometry(self):
        data = one_feature_tile(geom=[9, 50, 34], geom_type=0)
        f = next(VectorTile(data).get_layer(0).features())
        assert f.geom_type == 0
        with pytest.raises(GeometryError, match="unknown geometry type"):
            f.decode_geometry()

    def test_039_explicit_default_values(self):
        # id=0 and type=UNKNOWN explicitly encoded; decode raises
        data = one_feature_tile(fid=0, geom=[9, 50, 34], geom_type=0)
        f = next(VectorTile(data).get_layer(0).features())
        assert f.has_id and f.id == 0
        assert f.geom_type == 0
        assert f.num_properties == 0
        with pytest.raises(GeometryError):
            f.decode_geometry()

    def test_044_geometry_begins_with_closepath(self):
        data = one_feature_tile(geom=[15], geom_type=1)
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="expected command 1 but got 7"):
            f.decode_geometry()

    def test_045_half_coordinates(self):
        data = one_feature_tile(geom=[9, 50], geom_type=1)
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="too few points in geometry"):
            f.decode_geometry()

    def test_046_duplicate_points_decode_fine(self):
        # decoding tolerates OGC-invalid duplicate points (encoder forbids)
        data = one_feature_tile(geom=[9, 4, 4, 18, 0, 16, 0, 0], geom_type=2)
        f = next(VectorTile(data).get_layer(0).features())
        parts = f.decode_geometry()
        assert parts[0].tolist() == [[2, 2], [2, 10], [2, 10]]
        # but the validator flags it
        from vtzero_ray.mvt.check import ERROR, check_tile
        code, diags = check_tile(data)
        assert code == ERROR
        assert any("Duplicate point in linestring" in m for _, m in diags)

    def test_051_huge_multipoint_count(self):
        data = one_feature_tile(geom=[codec.command_integer(1, (1 << 20)), 10, 14])
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="count too large"):
            f.decode_geometry()

    def test_052_multipoint_not_enough_points(self):
        # upstream asserts only geometry_exception: with 3 geometry bytes the
        # byte-plausibility bound (max_count = bytes/2 = 1) trips FIRST,
        # exactly as in the reference (geometry.hpp:397,240-242)
        data = one_feature_tile(geom=[codec.command_integer(1, 2), 10, 14])
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="count too large"):
            f.decode_geometry()
        # with a plausible byte budget the point check fires instead
        with pytest.raises(GeometryError, match="too few points in geometry"):
            codec.decode_point(np.array([17, 10, 14], dtype=np.uint32), max_count=10)

    def test_043_shared_key_unique_values(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("hello")
        names = ["swing", "water_fountain", "slide", "bench", "tree", "path"]
        for i, v in enumerate(names):
            fb = b.PointFeatureBuilder(lb)
            fb.add_point(i, i + 1)
            fb.add_property("poi", v)
            fb.commit()
        layer = VectorTile(tb.serialize()).get_layer(0)
        assert layer.key_table() == [b"poi"]
        assert len(layer.value_table()) == 6
        feats = list(layer.features())
        assert feats[0].properties() == {"poi": b"swing"}
        assert feats[1].properties() == {"poi": b"water_fountain"}


class TestFixtureCorpus3:
    def test_030_two_geometry_fields(self):
        geom = encode_varints_np(np.array([9, 50, 34], dtype=np.uint32))
        feat = field_varint(3, 1) + field_bytes(4, geom) + field_bytes(4, geom)
        p = layer_payload(features=[feat])
        with pytest.raises(FormatError, match="Feature has more than one geometry field"):
            list(VectorTile(field_bytes(3, p)).get_layer(0).features())

    def test_two_tags_fields(self):
        geom = encode_varints_np(np.array([9, 50, 34], dtype=np.uint32))
        tags = encode_varints_np(np.array([0, 0], dtype=np.uint64))
        feat = (field_varint(3, 1) + field_bytes(2, tags) + field_bytes(2, tags)
                + field_bytes(4, geom))
        p = layer_payload(features=[feat])
        with pytest.raises(FormatError, match="Feature has more than one tags field"):
            list(VectorTile(field_bytes(3, p)).get_layer(0).features())

    def test_041_tags_as_packed_floats(self):
        # garbage packed bytes under the tags field: either a parity error
        # at parse or an out-of-range index at property access — never a
        # crash or silent wrong data (mirrors upstream 041's throw)
        import struct

        geom = encode_varints_np(np.array([9, 50, 34], dtype=np.uint32))
        float_payload = struct.pack("<ff", 1.5, 2.5)
        feat = field_varint(3, 1) + field_bytes(2, float_payload) + field_bytes(4, geom)
        p = layer_payload(features=[feat], keys=[b"k"],
                          vals=[values.encode_value(1, values.VT_UINT)])
        try:
            f = next(VectorTile(field_bytes(3, p)).get_layer(0).features())
            with pytest.raises((OutOfRangeError, ValueError)):
                list(f.properties_raw())
        except (FormatError, ValueError):
            pass  # parity/varint error at parse — also acceptable


class TestFixtureCorpusRound2:
    """Cases 003, 017-027, 047-050 — completes the 001-058 coverage
    (fixture_tests.cpp:73-90, 283-420, 424-520, 822-906)."""

    def test_003_missing_geometry_type(self):
        # geometry present, TYPE field absent → GeomType UNKNOWN
        data = one_feature_tile(fid=1, geom=[9, 50, 34], geom_type=None)
        f = next(VectorTile(data).get_layer(0).features())
        assert f.has_id and f.id == 1
        assert f.geom_type == codec.GEOM_UNKNOWN

    def test_017_valid_point(self):
        data = one_feature_tile(fid=1, geom=[9, 50, 34])
        f = next(VectorTile(data).get_layer(0).features())
        assert f.geom_type == codec.GEOM_POINT
        assert f.decode_geometry().tolist() == [[25, 17]]

    def test_018_valid_linestring(self):
        cmds = codec.encode_linestring([np.array([[2, 2], [2, 10], [10, 10]])])
        data = one_feature_tile(geom=cmds.tolist(), geom_type=2)
        f = next(VectorTile(data).get_layer(0).features())
        parts = f.decode_geometry()
        assert len(parts) == 1
        assert parts[0].tolist() == [[2, 2], [2, 10], [10, 10]]

    def test_019_valid_polygon(self):
        ring = np.array([[3, 6], [8, 12], [20, 34], [3, 6]])
        cmds = codec.encode_polygon([ring])
        data = one_feature_tile(geom=cmds.tolist(), geom_type=3)
        f = next(VectorTile(data).get_layer(0).features())
        rings = f.decode_geometry()
        assert len(rings) == 1
        assert rings[0][0].tolist() == ring.tolist()

    def test_020_valid_multipoint(self):
        # MoveTo(2): (5,7) then (3,2) — deltas (-2,-5)
        cmds = [codec.command_integer(1, 2), 10, 14, 3, 9]
        data = one_feature_tile(geom=cmds)
        f = next(VectorTile(data).get_layer(0).features())
        assert f.decode_geometry().tolist() == [[5, 7], [3, 2]]

    def test_021_valid_multilinestring(self):
        parts = [np.array([[2, 2], [2, 10], [10, 10]]), np.array([[1, 1], [3, 5]])]
        cmds = codec.encode_linestring(parts)
        data = one_feature_tile(geom=cmds.tolist(), geom_type=2)
        f = next(VectorTile(data).get_layer(0).features())
        out = f.decode_geometry()
        assert [p.tolist() for p in out] == [p.tolist() for p in parts]

    def test_022_valid_multipolygon(self):
        rings = [
            np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]),
            np.array([[11, 11], [20, 11], [20, 20], [11, 20], [11, 11]]),
            np.array([[13, 13], [13, 17], [17, 17], [17, 13], [13, 13]]),
        ]
        cmds = codec.encode_polygon(rings)
        data = one_feature_tile(geom=cmds.tolist(), geom_type=3)
        f = next(VectorTile(data).get_layer(0).features())
        out = f.decode_geometry()
        assert len(out) == 3
        for got, want in zip(out, rings):
            assert got[0].tolist() == want.tolist()

    def test_023_missing_layer_name_with_feature(self):
        p = (field_varint(15, 2) + field_varint(5, 4096)
             + field_bytes(2, feature_body(geom=[9, 50, 34])))
        tile = VectorTile(field_bytes(3, p))
        assert tile.count_layers() == 1  # counting doesn't parse
        with pytest.raises(FormatError, match=r"missing name field in layer"):
            list(tile.layers())
        with pytest.raises(FormatError):
            tile.get_layer_by_name("foo")

    def test_025_layer_without_features(self):
        data = field_bytes(3, layer_payload(features=[]))
        layer = VectorTile(data).get_layer(0)
        assert layer.num_features == 0

    def test_026_extra_value_type(self):
        # value blob with an out-of-range type field (tag 9, varint)
        weird = bytes([(9 << 3) | 0, 1])
        p = layer_payload(features=[feature_body(geom=[9, 50, 34])],
                          vals=[weird])
        layer = VectorTile(field_bytes(3, p)).get_layer(0)
        f = next(layer.features())
        assert f.num_properties == 0
        assert len(layer.value_table()) == 1
        with pytest.raises(FormatError, match="illegal property value type"):
            values.decode_value(layer.value_table()[0])

    def test_027_unused_bool_value(self):
        blob = values.encode_value(True, values.VT_BOOL)
        p = layer_payload(features=[feature_body(geom=[9, 50, 34])],
                          vals=[blob])
        layer = VectorTile(field_bytes(3, p)).get_layer(0)
        f = next(layer.features())
        assert f.num_properties == 0
        assert len(layer.value_table()) == 1
        assert values.decode_value(layer.value_table()[0]) == (values.VT_BOOL, True)

    @pytest.mark.parametrize("count", [2, 0])
    def test_047_048_wrong_closepath_count(self, count):
        cmds = [9, 0, 0, codec.command_integer(2, 2), 20, 0, 0, 20,
                codec.command_integer(7, count)]
        data = one_feature_tile(geom=cmds, geom_type=3)
        f = next(VectorTile(data).get_layer(0).features())
        with pytest.raises(GeometryError, match="ClosePath command count is not 1"):
            f.decode_geometry()

    def test_049_linestring_int32_overflow_x(self):
        int32_max, int32_min = 2**31 - 1, -(2**31)
        # MoveTo (int32max, 0); LineTo delta (+1, +1) wraps x to int32min
        cmds = [9, 0xFFFFFFFE, 0, codec.command_integer(2, 1), 2, 2]
        data = one_feature_tile(geom=cmds, geom_type=2)
        f = next(VectorTile(data).get_layer(0).features())
        parts = f.decode_geometry()
        assert parts[0].tolist() == [[int32_max, 0], [int32_min, 1]]

    def test_050_linestring_int32_overflow_y(self):
        int32_max, int32_min = 2**31 - 1, -(2**31)
        # MoveTo (0, int32min); LineTo delta (-1, -1) wraps y to int32max
        cmds = [9, 0, 0xFFFFFFFF, codec.command_integer(2, 1), 1, 1]
        data = one_feature_tile(geom=cmds, geom_type=2)
        f = next(VectorTile(data).get_layer(0).features())
        parts = f.decode_geometry()
        assert parts[0].tolist() == [[0, int32_min], [-1, int32_max]]
