"""vtzero-check-equivalent validator tests (rules from
/root/reference/examples/vtzero-check.cpp:51-229)."""

import numpy as np

from vtzero_ray.mvt import builder as b
from vtzero_ray.mvt import check
from vtzero_ray.mvt.pbf import encode_varints_np, field_bytes, field_varint


def _tile_with_raw_feature(geom_cmds, geom_type=1, name=b"t", extent=4096):
    geom = encode_varints_np(np.array(geom_cmds, dtype=np.uint32))
    feat = field_varint(3, geom_type) + field_bytes(4, geom)
    payload = (
        field_varint(15, 2) + field_bytes(1, name) + field_varint(5, extent)
        + field_bytes(2, feat)
    )
    return field_bytes(3, payload)


def _ok_tile():
    tb = b.TileBuilder()
    lb = tb.add_layer("test")
    fb = b.PointFeatureBuilder(lb)
    fb.add_point(10, 10)
    fb.commit()
    return tb.serialize()


class TestCheck:
    def test_valid_tile_ok(self):
        code, diags = check.check_tile(_ok_tile())
        assert code == check.OK
        assert diags == []

    def test_no_layers_warning(self):
        code, diags = check.check_tile(b"")
        assert code == check.WARNING
        assert "No layers" in diags[0][1]

    def test_duplicate_layer_name(self):
        tb = b.TileBuilder()
        for _ in range(2):
            lb = tb.add_layer("same")
            fb = b.PointFeatureBuilder(lb)
            fb.add_point(1, 1)
            fb.commit()
        code, diags = check.check_tile(tb.serialize())
        assert code == check.ERROR
        assert any("duplicate of previous layer" in m for _, m in diags)

    def test_point_beyond_extent_warning(self):
        # vtzero-check.cpp:81-88: outside [-extent, 2*extent]
        tb = b.TileBuilder()
        lb = tb.add_layer("test")
        fb = b.PointFeatureBuilder(lb)
        fb.add_point(10000, 10)
        fb.commit()
        code, diags = check.check_tile(tb.serialize())
        assert code == check.WARNING
        assert "waaaay beyond the extent" in diags[0][1]

    def test_duplicate_point_in_linestring(self):
        # raw stream: MoveTo(1) (0,0), LineTo(2) (0,0)... can't have zero delta?
        # zero delta IS representable on the wire: LineTo with param 0,0
        code, diags = check.check_tile(
            _tile_with_raw_feature([9, 0, 0, 18, 0, 0, 2, 2], geom_type=2)
        )
        assert code == check.ERROR
        assert any("Duplicate point in linestring" in m for _, m in diags)

    def test_zero_area_ring(self):
        code, diags = check.check_tile(
            _tile_with_raw_feature([9, 0, 0, 18, 8, 0, 7, 0, 15], geom_type=3)
        )
        assert code == check.ERROR
        msgs = [m for _, m in diags]
        assert any("Invalid ring with area 0" in m for m in msgs)
        assert any("First ring isn't an outer ring" in m for m in msgs)

    def test_first_ring_inner_error(self):
        # clockwise-on-screen ring (negative shoelace) = inner first
        cmds = [9, 0, 0, 26, 0, 20, 20, 0, 0, 19, 15]
        code, diags = check.check_tile(_tile_with_raw_feature(cmds, geom_type=3))
        assert any("First ring isn't an outer ring" in m for _, m in diags)

    def test_fatal_on_malformed(self):
        code, diags = check.check_tile(_tile_with_raw_feature([9, 0], geom_type=1))
        assert code == check.FATAL
        assert "Fatal error" in diags[0][1]

    def test_no_features_warning(self):
        # a layer with no features can only come from raw bytes
        payload = field_varint(15, 2) + field_bytes(1, b"empty") + field_varint(5, 4096)
        tile = field_bytes(3, payload)
        code, diags = check.check_tile(tile)
        assert code == check.WARNING
        assert "No features in layer 0" in diags[0][1]
