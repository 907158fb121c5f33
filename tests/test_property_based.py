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


# --- JPEG codec (stages/jpeg.py) ---------------------------------------

from vtzero_ray.stages.jpeg import decode_jpeg, encode_jpeg  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_jpeg_flat_blocks_exact(data):
    """ANY image that is constant per 8x8 block round-trips exactly at
    quality 100 (single integer DC coefficient per block), for arbitrary
    dims, block values and restart intervals — the generalization of the
    driver corpus's formula-based exactness."""
    h = data.draw(st.integers(8, 40))
    w = data.draw(st.integers(8, 40))
    dri = data.draw(st.integers(0, 3))
    bh, bw = (h + 7) // 8, (w + 7) // 8
    blocks = data.draw(st.lists(st.integers(0, 255), min_size=bh * bw,
                                max_size=bh * bw))
    bv = np.array(blocks, np.uint8).reshape(bh, bw)
    px = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1)[:h, :w]
    out = decode_jpeg(encode_jpeg(px, quality=100, restart_interval=dri))
    assert out.shape == (h, w) and out.dtype == np.uint8
    assert np.array_equal(out, px)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_jpeg_gray_q100_bounded(data):
    """Arbitrary grayscale content at quality 100: every pixel within a
    small rounding bound (quantizers are all 1, so the only error is
    coefficient/IDCT rounding)."""
    h = data.draw(st.integers(1, 33))
    w = data.draw(st.integers(1, 33))
    seed = data.draw(st.integers(0, 2**31))
    px = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert out.shape == (h, w)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 6


# --- PNG codec (stages/png.py) ------------------------------------------

from vtzero_ray.stages.png import decode_png, encode_png  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_png_roundtrip_all_filters(data):
    """Arbitrary RGB pixels × every scanline filter type round-trip
    bit-exactly (PNG is lossless; each filter exercises a distinct
    defilter branch: None / Sub cumsum / Up / Average / Paeth scans)."""
    h = data.draw(st.integers(1, 20))
    w = data.draw(st.integers(1, 20))
    ft = data.draw(st.integers(0, 4))
    seed = data.draw(st.integers(0, 2**31))
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                              dtype=np.uint8)
    out = decode_png(encode_png(px, filter_type=ft))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.array_equal(out, px)


# --- WAV codec (stages/wav.py) -------------------------------------------

from vtzero_ray.stages.wav import decode_wav, encode_wav  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_wav_roundtrip(data):
    """Arbitrary int16 samples × 1–8 channels × any rate round-trip
    bit-exactly, including full-range extremes and n=0 frames."""
    n = data.draw(st.integers(0, 200))
    ch = data.draw(st.integers(1, 8))
    rate = data.draw(st.integers(1, 192000))
    seed = data.draw(st.integers(0, 2**31))
    s = np.random.default_rng(seed).integers(-(2**15), 2**15, (n, ch))
    s = s.astype(np.int16)
    out, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate
    assert out.shape == (n, ch)
    assert np.array_equal(out, s)


# --- PBF varint / zigzag (mvt/pbf.py) -------------------------------------

from vtzero_ray.mvt import pbf  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.integers(-(2**31), 2**31 - 1))
def test_zigzag32_roundtrip(v):
    assert pbf.zigzag_decode32(pbf.zigzag_encode32(v)) == v


@settings(max_examples=200, deadline=None)
@given(st.integers(-(2**63), 2**63 - 1))
def test_zigzag64_roundtrip(v):
    assert pbf.zigzag_decode64(pbf.zigzag_encode64(v)) == v


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**32 - 1), max_size=100))
def test_packed_varint_roundtrip(vals):
    """Scalar encode_varint, vectorized encode_varints_np and the packed
    decoder agree for arbitrary u32 sequences (incl. multi-byte
    boundaries 2^7k ± 1)."""
    arr = np.array(vals, dtype=np.uint32)
    packed = pbf.encode_varints_np(arr.astype(np.uint64))
    scalar = b"".join(pbf.encode_varint(int(v)) for v in vals)
    assert packed == scalar
    assert pbf.decode_packed_uint32(packed).tolist() == vals
    assert pbf.varint_lengths_np(arr.astype(np.uint64)).sum() == len(packed)


# --- zigzag scalar vs vectorized twin --------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=64))
def test_zigzag32_np_matches_scalar(vals):
    arr = np.array(vals, dtype=np.int64)
    enc = pbf.zigzag_encode32_np(arr)
    assert enc.tolist() == [pbf.zigzag_encode32(v) for v in vals]
    assert pbf.zigzag_decode32_np(enc).tolist() == vals


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_jpeg_rgb_decodes_valid(data):
    """Arbitrary RGB content, any quality/subsampling/restart setting:
    the stream always parses back to the exact dims, and 4:4:4 quality
    100 stays within the rounding bound of the YCbCr round trip."""
    h = data.draw(st.integers(1, 24))
    w = data.draw(st.integers(1, 24))
    q = data.draw(st.integers(5, 100))
    sub = data.draw(st.sampled_from(["444", "420"]))
    dri = data.draw(st.integers(0, 2))
    seed = data.draw(st.integers(0, 2**31))
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                              dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=q, subsample=sub,
                                  restart_interval=dri))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    if sub == "444" and q == 100:
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 6
