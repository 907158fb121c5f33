"""Property-based round-trips (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5 notes the reference has none; we add them)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vtzero_ray.mvt import builder as b
from vtzero_ray.mvt import codec, values
from vtzero_ray.mvt.decoder import VectorTile

coord = st.integers(min_value=-(2**31), max_value=2**31 - 1)
small_coord = st.integers(min_value=-70000, max_value=70000)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(small_coord, small_coord), min_size=1, max_size=50))
def test_point_roundtrip(points):
    pts = np.array(points, dtype=np.int64)
    cmds = codec.encode_point(pts)
    out = codec.decode_point(cmds, max_count=10**9)
    assert out.tolist() == pts.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.lists(st.tuples(small_coord, small_coord), min_size=2, max_size=20),
    min_size=1, max_size=5,
))
def test_linestring_roundtrip(parts):
    # drop consecutive duplicates (encoder rejects zero-length segments)
    clean = []
    for part in parts:
        p = [part[0]]
        for q in part[1:]:
            if q != p[-1]:
                p.append(q)
        if len(p) >= 2:
            clean.append(np.array(p, dtype=np.int64))
    if not clean:
        return
    cmds = codec.encode_linestring(clean)
    out = codec.decode_linestring(cmds, max_count=10**9)
    assert [o.tolist() for o in out] == [c.tolist() for c in clean]


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_value_roundtrip(data):
    vt = data.draw(st.sampled_from(
        [values.VT_STRING, values.VT_DOUBLE, values.VT_FLOAT,
         values.VT_INT, values.VT_UINT, values.VT_SINT, values.VT_BOOL]))
    if vt == values.VT_STRING:
        v = data.draw(st.text(max_size=50))
        expect = v.encode("utf-8")
    elif vt == values.VT_DOUBLE:
        v = expect = data.draw(st.floats(allow_nan=False))
    elif vt == values.VT_FLOAT:
        v = expect = data.draw(
            st.floats(allow_nan=False, width=32).map(lambda f: float(np.float32(f))))
    elif vt in (values.VT_INT, values.VT_SINT):
        v = expect = data.draw(st.integers(-(2**63), 2**63 - 1))
    elif vt == values.VT_UINT:
        v = expect = data.draw(st.integers(0, 2**64 - 1))
    else:
        v = expect = data.draw(st.booleans())
    blob = values.encode_value(v, vt)
    t, out = values.decode_value(blob)
    assert t == vt
    assert out == expect


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(0, 2**60),                         # id
        st.tuples(small_coord, small_coord),           # point
        st.dictionaries(st.text(min_size=1, max_size=8),
                        st.one_of(st.text(max_size=8), st.integers(-100, 100),
                                  st.booleans()),
                        max_size=4),
    ),
    min_size=1, max_size=20,
))
def test_tile_roundtrip(feats):
    tb = b.TileBuilder()
    lb = tb.add_layer("t")
    for fid, (x, y), props in feats:
        fb = b.PointFeatureBuilder(lb)
        fb.set_id(fid)
        fb.add_point(x, y)
        for k, v in props.items():
            fb.add_property(k, v)
        fb.commit()
    data = tb.serialize()
    decoded = list(VectorTile(data).get_layer(0).features())
    assert len(decoded) == len(feats)
    for f, (fid, (x, y), props) in zip(decoded, feats):
        assert f.id == fid
        assert f.decode_geometry().tolist() == [[x, y]]
        got = f.properties()
        expect = {k: (v.encode() if isinstance(v, str) else v) for k, v in props.items()}
        assert got == expect
