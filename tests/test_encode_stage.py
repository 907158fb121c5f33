"""The vectorized point-tile kernel must be byte-identical to the scalar
builder path (same vtzero semantics, zero per-feature Python)."""

import numpy as np
import pyarrow as pa
import pytest

from vtzero_ray.mvt import builder as b
from vtzero_ray.mvt import values as mval
from vtzero_ray.mvt.check import check_tile
from vtzero_ray.mvt.decoder import VectorTile
from vtzero_ray.stages.encode import encode_point_tile


def scalar_reference_tile(fids, px, py, urls, langs, layer_name="pages"):
    tb = b.TileBuilder()
    lb = tb.add_layer(layer_name)
    for i in range(len(fids)):
        fb = b.PointFeatureBuilder(lb)
        fb.set_id(int(fids[i]))
        fb.add_point(int(px[i]), int(py[i]))
        fb.add_property("url", urls[i])
        fb.add_property("lang", langs[i])
        fb.commit()
    return tb.serialize()


def make_case(n, seed=0, n_langs=4):
    rng = np.random.default_rng(seed)
    fids = np.sort(rng.choice(10 * n, size=n, replace=False)).astype(np.uint64)
    px = rng.integers(0, 4096, n).astype(np.int32)
    py = rng.integers(0, 4096, n).astype(np.int32)
    urls = [f"https://site{i % 97}.example/p/{fid}" for i, fid in enumerate(fids)]
    langs = [["en", "de", "fr", "es", "pt"][int(c)] for c in rng.integers(0, n_langs, n)]
    return fids, px, py, urls, langs


@pytest.mark.parametrize("n,seed", [(1, 0), (3, 1), (25, 2), (48, 5), (49, 6),
                                    (500, 3), (2000, 4)])
def test_vectorized_matches_scalar(n, seed):
    fids, px, py, urls, langs = make_case(n, seed)
    expected = scalar_reference_tile(fids, px, py, urls, langs)
    got = encode_point_tile(
        fids, px, py, pa.array(urls, pa.string()), pa.array(langs, pa.string())
    )
    assert got == expected


@pytest.mark.parametrize("n,seed", [(1, 10), (7, 11), (48, 12)])
def test_small_fast_path_matches_vectorized(n, seed):
    from vtzero_ray.stages.encode import _encode_point_tile_small

    fids, px, py, urls, langs = make_case(n, seed)
    small = _encode_point_tile_small(
        [int(v) for v in fids], [int(v) for v in px], [int(v) for v in py],
        urls, langs, b"pages", 2, 4096,
    )
    assert small == scalar_reference_tile(fids, px, py, urls, langs)


def test_single_lang():
    fids, px, py, urls, _ = make_case(10, 7)
    langs = ["en"] * 10
    expected = scalar_reference_tile(fids, px, py, urls, langs)
    got = encode_point_tile(fids, px, py, pa.array(urls), pa.array(langs))
    assert got == expected


def test_kernel_output_validates_and_decodes():
    fids, px, py, urls, langs = make_case(300, 9)
    data = encode_point_tile(fids, px, py, pa.array(urls), pa.array(langs))
    code, diags = check_tile(data)
    assert code == 0, diags
    layer = VectorTile(data).get_layer(0)
    assert layer.name == b"pages"
    feats = list(layer.features())
    assert len(feats) == 300
    f = feats[0]
    assert f.id == int(fids[0])
    props = f.properties()
    assert props["url"] == urls[0].encode()
    assert props["lang"] == langs[0].encode()
    assert f.decode_geometry().tolist() == [[int(px[0]), int(py[0])]]
    # value table: urls unique + distinct langs, interned once each
    assert len(layer.value_table()) == 300 + len(set(langs))
    assert layer.key_table() == [b"url", b"lang"]
