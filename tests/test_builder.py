"""Builder ↔ decoder round-trips mirroring /root/reference/test/t/test_builder_*.cpp
and the property-value matrix from test_property_value.cpp."""

import numpy as np
import pytest

from vtzero_ray.exceptions import FormatError, GeometryError, OutOfRangeError, TypeError_, VersionError
from vtzero_ray.mvt import builder as b
from vtzero_ray.mvt import codec, values
from vtzero_ray.mvt.decoder import VectorTile, is_vector_tile


def build_one_point_tile(**kwargs):
    tb = b.TileBuilder()
    lb = tb.add_layer("test")
    fb = b.PointFeatureBuilder(lb)
    if "feature_id" in kwargs:
        fb.set_id(kwargs["feature_id"])
    fb.add_point(10, 20)
    for k, v in kwargs.get("props", {}).items():
        fb.add_property(k, v)
    fb.commit()
    return tb.serialize()


class TestTileStructure:
    def test_first_byte_is_0x1a(self):
        data = build_one_point_tile()
        assert is_vector_tile(data)
        assert data[0] == 0x1A

    def test_layer_header(self):
        data = build_one_point_tile()
        tile = VectorTile(data)
        assert tile.count_layers() == 1
        layer = tile.get_layer(0)
        assert layer.name == b"test"
        assert layer.version == 2
        assert layer.extent == 4096
        assert layer.num_features == 1

    def test_empty_layer_dropped(self):
        tb = b.TileBuilder()
        tb.add_layer("empty")
        lb = tb.add_layer("full")
        fb = b.PointFeatureBuilder(lb)
        fb.add_point(1, 1)
        fb.commit()
        tile = VectorTile(tb.serialize())
        assert [l.name for l in tile.layers()] == [b"full"]

    def test_empty_tile_serializes_to_nothing(self):
        tb = b.TileBuilder()
        tb.add_layer("empty")
        assert tb.serialize() == b""

    def test_existing_layer_passthrough(self):
        data = build_one_point_tile()
        src = VectorTile(data)
        payload = next(iter(src.layer_views()))
        tb = b.TileBuilder()
        tb.add_existing_layer(payload)
        assert tb.serialize() == data

    def test_get_layer_by_name(self):
        tb = b.TileBuilder()
        for name in ("a", "bb", "ccc"):
            lb = tb.add_layer(name)
            fb = b.PointFeatureBuilder(lb)
            fb.add_point(1, 1)
            fb.commit()
        tile = VectorTile(tb.serialize())
        assert tile.get_layer_by_name("bb").name == b"bb"
        assert tile.get_layer_by_name("zz") is None


class TestFeatures:
    def test_point_feature_with_id(self):
        data = build_one_point_tile(feature_id=17)
        f = next(VectorTile(data).get_layer(0).features())
        assert f.has_id and f.id == 17
        assert f.geom_type == codec.GEOM_POINT
        assert f.decode_geometry().tolist() == [[10, 20]]

    def test_point_feature_without_id(self):
        data = build_one_point_tile()
        f = next(VectorTile(data).get_layer(0).features())
        assert not f.has_id

    def test_properties_roundtrip(self):
        data = build_one_point_tile(props={"name": "x", "n": 7, "ok": True, "pi": 3.5})
        f = next(VectorTile(data).get_layer(0).features())
        props = f.properties()
        assert props == {"name": b"x", "n": 7, "ok": True, "pi": 3.5}

    def test_linestring_roundtrip(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.LinestringFeatureBuilder(lb)
        fb.add_linestring(3)
        fb.set_point(2, 2)
        fb.set_point(2, 10)
        fb.set_point(10, 10)
        fb.commit()
        f = next(VectorTile(tb.serialize()).get_layer(0).features())
        parts = f.decode_geometry()
        assert parts[0].tolist() == [[2, 2], [2, 10], [10, 10]]

    def test_polygon_roundtrip(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.PolygonFeatureBuilder(lb)
        fb.add_ring(4)
        fb.set_point(0, 0)
        fb.set_point(10, 0)
        fb.set_point(0, 10)
        fb.close_ring()
        fb.commit()
        f = next(VectorTile(tb.serialize()).get_layer(0).features())
        rings = f.decode_geometry()
        assert rings[0][0].tolist() == [[0, 0], [10, 0], [0, 10], [0, 0]]

    def test_rollback_removes_feature_keeps_interning(self):
        # feature_builder_impl.hpp:113-118: rollback truncates the feature
        # but interned keys/values stay in the tables
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.PointFeatureBuilder(lb)
        fb.add_point(1, 1)
        fb.add_property("ghost", "value")
        fb.rollback()
        fb2 = b.PointFeatureBuilder(lb)
        fb2.add_point(2, 2)
        fb2.add_property("real", "value")
        fb2.commit()
        layer = VectorTile(tb.serialize()).get_layer(0)
        assert layer.num_features == 1
        assert layer.key_table() == [b"ghost", b"real"]
        # "value" interned once, reused
        assert len(layer.value_table()) == 1

    def test_zero_length_segment_raises(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.LinestringFeatureBuilder(lb)
        fb.add_linestring(3)
        fb.set_point(2, 2)
        with pytest.raises(GeometryError, match="Zero-length segments in linestrings"):
            fb.set_point(2, 2)

    def test_unclosed_ring_raises(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.PolygonFeatureBuilder(lb)
        fb.add_ring(4)
        fb.set_point(0, 0)
        fb.set_point(10, 0)
        fb.set_point(10, 10)
        with pytest.raises(GeometryError, match="Last point in a ring"):
            fb.set_point(5, 5)

    def test_commit_without_geometry_asserts(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.PointFeatureBuilder(lb)
        with pytest.raises(AssertionError, match="commit before geometry"):
            fb.commit()


class TestInterning:
    def test_first_occurrence_order(self):
        # builder_impl.hpp:104-147: stable index assignment
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        assert lb.add_key("a") == 0
        assert lb.add_key("b") == 1
        assert lb.add_key("a") == 0
        assert lb.add_key("c") == 2
        assert lb.add_key_without_dup_check(b"a") == 3

    def test_interning_past_flat_threshold(self):
        # crossover at 20 entries (max_entries_flat, builder_impl.hpp:67-75)
        # must not change observable index assignment
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        for i in range(50):
            assert lb.add_key(f"k{i}") == i
        for i in range(50):
            assert lb.add_key(f"k{i}") == i

    def test_value_interning_on_bytes(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        v1 = lb.add_value(values.encode_value("x"))
        v2 = lb.add_value(values.encode_value("x"))
        v3 = lb.add_value(values.encode_value(7))
        assert (v1, v2, v3) == (0, 0, 1)

    def test_int_and_uint_intern_separately(self):
        # same numeric value, different wire encodings → different entries
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        a = lb.add_value(values.encode_value(7, values.VT_INT))
        u = lb.add_value(values.encode_value(7, values.VT_UINT))
        assert a != u


class TestPropertyValues:
    # mirrors test_property_value.cpp: all 7 types
    @pytest.mark.parametrize("vt,val", [
        (values.VT_STRING, b"hello"),
        (values.VT_FLOAT, 1.5),
        (values.VT_DOUBLE, 3.141592653589793),
        (values.VT_INT, -17),
        (values.VT_UINT, 17),
        (values.VT_SINT, -42),
        (values.VT_BOOL, True),
    ])
    def test_roundtrip(self, vt, val):
        blob = values.encode_value(val, vt)
        assert values.value_type(blob) == vt
        t, out = values.decode_value(blob)
        assert t == vt
        assert out == val

    def test_type_mismatch_raises(self):
        blob = values.encode_value("hello")
        with pytest.raises(TypeError_, match="wrong property value type"):
            values.decode_value(blob, values.VT_INT)

    def test_last_field_wins(self):
        # property_value.hpp:86-103: repeated fields, last wins
        blob = values.encode_value(1, values.VT_INT) + values.encode_value(2, values.VT_INT)
        assert values.decode_value(blob, values.VT_INT)[1] == 2

    def test_negative_int_ten_byte_varint(self):
        blob = values.encode_value(-1, values.VT_INT)
        assert len(blob) == 11  # tag + 10-byte varint
        assert values.decode_value(blob)[1] == -1


class TestMalformed:
    def test_version_3_rejected(self):
        lb = b.LayerBuilder("test", version=3)
        fb = b.PointFeatureBuilder(lb)
        fb.add_point(1, 1)
        fb.commit()
        tb = b.TileBuilder()
        tb._layers.append(lb)
        with pytest.raises(VersionError, match="unknown vector tile version: 3"):
            list(VectorTile(tb.serialize()).layers())

    def test_missing_layer_name(self):
        from vtzero_ray.mvt.pbf import field_bytes, field_varint
        payload = field_varint(15, 2) + field_varint(5, 4096)
        tile = field_bytes(3, payload)
        with pytest.raises(FormatError, match=r"missing name field in layer \(spec 4.1\)"):
            list(VectorTile(tile).layers())

    def test_unknown_layer_field(self):
        from vtzero_ray.mvt.pbf import field_bytes, field_varint
        payload = field_varint(15, 2) + field_bytes(1, b"x") + field_varint(9, 1)
        tile = field_bytes(3, payload)
        with pytest.raises(FormatError, match=r"unknown field in layer \(tag=9, type=0\)"):
            list(VectorTile(tile).layers())

    def test_missing_geometry(self):
        from vtzero_ray.mvt.pbf import field_bytes, field_varint
        feat = field_varint(3, 1)  # type only
        payload = field_varint(15, 2) + field_bytes(1, b"x") + field_bytes(2, feat)
        tile = field_bytes(3, payload)
        layer = VectorTile(tile).get_layer(0)
        with pytest.raises(FormatError, match=r"Missing geometry field in feature \(spec 4.2\)"):
            list(layer.features())

    def test_odd_tag_count(self):
        from vtzero_ray.mvt.pbf import encode_varints_np, field_bytes, field_varint
        geom = encode_varints_np(np.array([9, 0, 0], dtype=np.uint32))
        tags = encode_varints_np(np.array([0], dtype=np.uint64))
        feat = field_varint(3, 1) + field_bytes(4, geom) + field_bytes(2, tags)
        payload = field_varint(15, 2) + field_bytes(1, b"x") + field_bytes(2, feat)
        tile = field_bytes(3, payload)
        layer = VectorTile(tile).get_layer(0)
        with pytest.raises(FormatError, match=r"unpaired property key/value indexes \(spec 4.4\)"):
            list(layer.features())

    def test_bad_geom_type(self):
        from vtzero_ray.mvt.pbf import encode_varints_np, field_bytes, field_varint
        geom = encode_varints_np(np.array([9, 0, 0], dtype=np.uint32))
        feat = field_varint(3, 5) + field_bytes(4, geom)
        payload = field_varint(15, 2) + field_bytes(1, b"x") + field_bytes(2, feat)
        tile = field_bytes(3, payload)
        layer = VectorTile(tile).get_layer(0)
        with pytest.raises(FormatError, match=r"Unknown geometry type \(spec 4.3.4\)"):
            list(layer.features())

    def test_out_of_range_tag_index(self):
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.PointFeatureBuilder(lb)
        fb.add_point(1, 1)
        fb.add_property_indexes(5, 9)  # indexes beyond table sizes
        fb.commit()
        f = next(VectorTile(tb.serialize()).get_layer(0).features())
        with pytest.raises(OutOfRangeError, match="index out of range: 5"):
            list(f.properties_raw())


class TestCopyAndRemap:
    def test_copy_feature_geometry_opaque(self):
        # vtzero-streets.cpp pattern: copy without re-encoding geometry
        src_data = build_one_point_tile(feature_id=3, props={"class": "street", "x": 1})
        src_layer = VectorTile(src_data).get_layer(0)
        tb = b.TileBuilder()
        lb = tb.add_layer_from(src_layer)
        for f in src_layer.features():
            lb.copy_feature(f)
        out = VectorTile(tb.serialize()).get_layer(0)
        f = next(out.features())
        assert f.id == 3
        assert f.properties() == {"class": b"street", "x": 1}
        assert f.decode_geometry().tolist() == [[10, 20]]

    def test_property_mapper(self):
        # property_mapper.hpp:31-99 semantics: first-use assignment order
        src_data = build_one_point_tile(props={"a": 1, "b": 2, "c": 3})
        src_layer = VectorTile(src_data).get_layer(0)
        tb = b.TileBuilder()
        lb = tb.add_layer_from(src_layer)
        mapper = b.PropertyMapper(src_layer, lb)
        # map only keys b and c, in that order
        assert mapper.map_key(1) == 0  # "b" gets new index 0
        assert mapper.map_key(2) == 1
        assert mapper.map_key(1) == 0  # memoized
        assert mapper.map_value(0) == 0

    def test_byte_identical_reencode(self):
        """Full tile → decode → rebuild via copy → byte-identical output."""
        tb = b.TileBuilder()
        lb = tb.add_layer("roads", version=2, extent=4096)
        fb = b.LinestringFeatureBuilder(lb)
        fb.set_id(1)
        fb.add_linestring(3)
        fb.set_point(0, 0)
        fb.set_point(5, 5)
        fb.set_point(10, 0)
        fb.add_property("kind", "road")
        fb.commit()
        fb = b.PointFeatureBuilder(lb)
        fb.set_id(2)
        fb.add_point(7, 7)
        fb.add_property("kind", "poi")
        fb.add_property("name", "x")
        fb.commit()
        data = tb.serialize()

        def snapshot(tile_bytes):
            out = []
            for layer in VectorTile(tile_bytes).layers():
                feats = []
                for f in layer.features():
                    geo = f.decode_geometry()
                    geo_repr = (
                        geo.tolist() if hasattr(geo, "tolist")
                        else [p.tolist() if hasattr(p, "tolist") else p[0].tolist() for p in geo]
                    )
                    feats.append((f.has_id, f.id, f.geom_type, geo_repr, sorted(f.properties().items())))
                out.append((layer.name, layer.version, layer.extent, feats))
            return out

        src = VectorTile(data).get_layer(0)
        tb2 = b.TileBuilder()
        lb2 = tb2.add_layer_from(src)
        for f in src.features():
            lb2.copy_feature(f)
        copied = tb2.serialize()
        # copy is logically equal (vector_tile_equal-style deep compare,
        # test_builder.cpp:289-331) — NOT byte-equal, because the typed
        # builders write type(3) before id(1) while the copy path writes
        # id first (builder.hpp:1208-1249), exactly like the reference
        assert snapshot(copied) == snapshot(data)
        # and a second copy of the copy IS byte-identical (stable fixpoint)
        src2 = VectorTile(copied).get_layer(0)
        tb3 = b.TileBuilder()
        lb3 = tb3.add_layer_from(src2)
        for f in src2.features():
            lb3.copy_feature(f)
        assert tb3.serialize() == copied
