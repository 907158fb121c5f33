"""Geometry codec conformance vectors, reused verbatim from the reference's
unit tests (/root/reference/test/t/test_geometry.cpp) per FIXTURES.md F3."""

import numpy as np
import pytest

from vtzero_ray.exceptions import GeometryError
from vtzero_ray.mvt import codec
from vtzero_ray.mvt.pbf import (
    decode_packed_uint32,
    encode_varint,
    encode_varints_np,
    zigzag_decode32,
    zigzag_encode32,
)


def u32(*vals):
    return np.array(vals, dtype=np.uint32)


class TestCommandIntegers:
    def test_pack_unpack(self):
        # geometry.hpp:91-118
        assert codec.command_integer(codec.CMD_MOVE_TO, 1) == 9
        assert codec.command_integer(codec.CMD_LINE_TO, 3) == 26
        assert codec.command_integer(codec.CMD_CLOSE_PATH, 1) == 15
        assert codec.get_command_id(9) == 1
        assert codec.get_command_count(9) == 1
        assert codec.MAX_COMMAND_COUNT == (1 << 29) - 1

    def test_zigzag_roundtrip(self):
        for v in (0, 1, -1, 25, -25, 2**31 - 1, -(2**31)):
            assert zigzag_decode32(zigzag_encode32(v)) == v


class TestDecodePoint:
    def test_point(self):
        # test_geometry.cpp:24-50: {9, 50, 34} -> (25, 17)
        pts = codec.decode_point(u32(9, 50, 34))
        assert pts.tolist() == [[25, 17]]

    def test_multipoint(self):
        # test_geometry.cpp:73-89: {17, 10, 14, 3, 9} -> (5,7),(3,2)
        pts = codec.decode_point(u32(17, 10, 14, 3, 9))
        assert pts.tolist() == [[5, 7], [3, 2]]

    def test_empty(self):
        with pytest.raises(GeometryError, match=r"expected MoveTo command \(spec 4.3.4.2\)"):
            codec.decode_point(u32())

    def test_wrong_command(self):
        with pytest.raises(GeometryError, match="expected command 1 but got 2"):
            codec.decode_point(u32(codec.command_integer(2, 1), 50, 34))

    def test_count_zero(self):
        with pytest.raises(GeometryError, match=r"MoveTo command count is zero \(spec 4.3.4.2\)"):
            codec.decode_point(u32(codec.command_integer(1, 0)))

    def test_trailing_data(self):
        with pytest.raises(GeometryError, match="additional data after end of geometry"):
            codec.decode_point(u32(9, 50, 34, 9))

    def test_too_few_points(self):
        # MoveTo(2) but only one coordinate pair
        with pytest.raises(GeometryError, match="too few points in geometry"):
            codec.decode_point(u32(codec.command_integer(1, 2), 10, 14), max_count=10)

    def test_huge_count(self):
        # test_geometry.cpp:314-323: MoveTo(2^29-1) with tiny max_count
        with pytest.raises(GeometryError, match="count too large"):
            codec.decode_point(u32(codec.command_integer(1, (1 << 29) - 1), 10, 14), max_count=1)


class TestDecodeLinestring:
    def test_linestring(self):
        # test_geometry.cpp:91-110: {9,4,4,18,0,16,16,0} -> (2,2),(2,10),(10,10)
        parts = codec.decode_linestring(u32(9, 4, 4, 18, 0, 16, 16, 0))
        assert len(parts) == 1
        assert parts[0].tolist() == [[2, 2], [2, 10], [10, 10]]

    def test_multilinestring(self):
        # test_geometry.cpp:133-161
        parts = codec.decode_linestring(u32(9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8))
        assert len(parts) == 2
        assert parts[0].tolist() == [[2, 2], [2, 10], [10, 10]]
        assert parts[1].tolist() == [[1, 1], [3, 5]]

    def test_moveto_count_not_1(self):
        with pytest.raises(GeometryError, match=r"MoveTo command count is not 1 \(spec 4.3.4.3\)"):
            codec.decode_linestring(u32(codec.command_integer(1, 2), 4, 4, 4, 4, 18, 0, 16))

    def test_missing_lineto(self):
        with pytest.raises(GeometryError, match=r"expected LineTo command \(spec 4.3.4.3\)"):
            codec.decode_linestring(u32(9, 4, 4))

    def test_lineto_count_zero(self):
        with pytest.raises(GeometryError, match=r"LineTo command count is zero \(spec 4.3.4.3\)"):
            codec.decode_linestring(u32(9, 4, 4, codec.command_integer(2, 0)))


class TestDecodePolygon:
    def test_polygon(self):
        # test_geometry.cpp:163-184: {9,6,12,18,10,12,24,44,15}
        rings = codec.decode_polygon(u32(9, 6, 12, 18, 10, 12, 24, 44, 15))
        assert len(rings) == 1
        ring, area2, rt = rings[0]
        assert ring.tolist() == [[3, 6], [8, 12], [20, 34], [3, 6]]
        assert rt == codec.RING_OUTER

    def test_multipolygon(self):
        # test_geometry.cpp:218-270: 3 rings
        g = u32(
            9, 0, 0, 26, 20, 0, 0, 20, 19, 0, 15,
            9, 22, 2, 26, 18, 0, 0, 18, 17, 0, 15,
            9, 4, 13, 26, 0, 8, 8, 0, 0, 7, 15,
        )
        rings = codec.decode_polygon(g)
        assert len(rings) == 3
        r0, _, t0 = rings[0]
        assert r0.tolist() == [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
        assert t0 == codec.RING_OUTER
        r1, _, t1 = rings[1]
        assert r1.tolist() == [[11, 11], [20, 11], [20, 20], [11, 20], [11, 11]]
        assert t1 == codec.RING_OUTER
        r2, _, t2 = rings[2]
        assert r2.tolist() == [[13, 13], [13, 17], [17, 17], [17, 13], [13, 13]]
        assert t2 == codec.RING_INNER

    def test_closepath_count_not_1(self):
        # test_geometry.cpp:186-216
        with pytest.raises(GeometryError, match="ClosePath command count is not 1"):
            codec.decode_polygon(u32(9, 6, 12, 18, 10, 12, 24, 44, codec.command_integer(7, 2)))

    def test_missing_closepath(self):
        with pytest.raises(GeometryError, match=r"expected ClosePath command \(spec 4.3.4.4\)"):
            codec.decode_polygon(u32(9, 6, 12, 18, 10, 12, 24, 44))

    def test_zero_area_ring_classified_invalid(self):
        # degenerate ring (0,0)->(4,0)->(0,0)+close has area 0
        g = u32(9, 0, 0, 18, 8, 0, 7, 0, 15)
        rings = codec.decode_polygon(g)
        assert rings[0][2] == codec.RING_INVALID


class TestInt32Overflow:
    def test_wraparound_tolerated(self):
        # test_geometry.cpp:272-312: cursor addition wraps in int32
        imax, imin = 2**31 - 1, -(2**31)
        g = u32(
            codec.command_integer(1, 3),
            zigzag_encode32(imax), zigzag_encode32(imax),
            1, 1,  # zigzag(+... ) small step causing overflow: delta -1? use +1
            zigzag_encode32(1), zigzag_encode32(1),
        )
        # build explicitly: first point at (imax, imax); second point delta +1 wraps to imin
        g = u32(
            codec.command_integer(1, 2),
            zigzag_encode32(imax), zigzag_encode32(imax),
            zigzag_encode32(1), zigzag_encode32(1),
        )
        pts = codec.decode_point(g, max_count=10)
        assert pts.tolist() == [[imax, imax], [imin, imin]]


class TestEncode:
    def test_point_roundtrip(self):
        cmds = codec.encode_point(np.array([[25, 17]]))
        assert cmds.tolist() == [9, 50, 34]

    def test_multipoint_roundtrip(self):
        cmds = codec.encode_point(np.array([[5, 7], [3, 2]]))
        assert cmds.tolist() == [17, 10, 14, 3, 9]

    def test_linestring_roundtrip(self):
        cmds = codec.encode_linestring([np.array([[2, 2], [2, 10], [10, 10]])])
        assert cmds.tolist() == [9, 4, 4, 18, 0, 16, 16, 0]

    def test_multilinestring_cursor_persists(self):
        cmds = codec.encode_linestring([
            np.array([[2, 2], [2, 10], [10, 10]]),
            np.array([[1, 1], [3, 5]]),
        ])
        assert cmds.tolist() == [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8]

    def test_polygon_roundtrip(self):
        cmds = codec.encode_polygon([np.array([[3, 6], [8, 12], [20, 34], [3, 6]])])
        assert cmds.tolist() == [9, 6, 12, 18, 10, 12, 24, 44, 15]

    def test_multipolygon_roundtrip(self):
        rings = [
            np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]),
            np.array([[11, 11], [20, 11], [20, 20], [11, 20], [11, 11]]),
            np.array([[13, 13], [13, 17], [17, 17], [17, 13], [13, 13]]),
        ]
        cmds = codec.encode_polygon(rings)
        expected = [
            9, 0, 0, 26, 20, 0, 0, 20, 19, 0, 15,
            9, 22, 2, 26, 18, 0, 0, 18, 17, 0, 15,
            9, 4, 13, 26, 0, 8, 8, 0, 0, 7, 15,
        ]
        assert cmds.tolist() == expected

    def test_zero_length_segment_rejected(self):
        # builder.hpp:850-852
        with pytest.raises(GeometryError, match="Zero-length segments in linestrings"):
            codec.encode_linestring([np.array([[2, 2], [2, 2], [10, 10]])])

    def test_unclosed_ring_rejected(self):
        # builder.hpp:1027-1030
        with pytest.raises(GeometryError, match="Last point in a ring must be the same"):
            codec.encode_polygon([np.array([[0, 0], [4, 0], [4, 4], [1, 1]])])

    def test_encode_decode_fuzz(self):
        rng = np.random.default_rng(42)
        for _ in range(50):
            n = int(rng.integers(1, 50))
            pts = rng.integers(-5000, 5000, size=(n, 2))
            cmds = codec.encode_point(pts)
            out = codec.decode_point(cmds, max_count=10**9)
            assert out.tolist() == pts.tolist()


class TestVarint:
    def test_vectorized_matches_scalar(self):
        vals = np.array([0, 1, 127, 128, 300, 2**32 - 1, 2**63, 2**64 - 1], dtype=np.uint64)
        blob = encode_varints_np(vals)
        expected = b"".join(encode_varint(int(v)) for v in vals)
        assert blob == expected

    def test_packed_decode_roundtrip(self):
        vals = np.array([9, 50, 34, 0, 127, 128, 2**32 - 1], dtype=np.uint64)
        blob = encode_varints_np(vals)
        out = decode_packed_uint32(blob)
        assert out.tolist() == [9, 50, 34, 0, 127, 128, 2**32 - 1]
