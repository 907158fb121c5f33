"""Interning-conflict guard: the closed-form vectorized value-table math
assumes per-tile-distinct urls disjoint from lang strings. When a tile
violates that (duplicate url, or a url equal to a lang value), the kernels
must detect it and fall back to the scalar interning path — byte-identical
to the reference builder semantics (builder_impl.hpp:104-147 interning)."""

import numpy as np
import pyarrow as pa

from tests.test_encode_stage import make_case, scalar_reference_tile
from vtzero_ray.mvt.check import check_tile
from vtzero_ray.mvt.decoder import VectorTile
from vtzero_ray.stages.encode import PointTileAssembler, encode_point_tile


def test_dup_url_falls_back_to_scalar_interning():
    fids, px, py, urls, langs = make_case(200, seed=21)
    urls = list(urls)
    urls[10] = urls[50] = urls[150] = "https://dup.example/page"
    expected = scalar_reference_tile(fids, px, py, urls, langs)
    got = encode_point_tile(fids, px, py, pa.array(urls), pa.array(langs))
    assert got == expected
    # dup url interned ONCE: 198 distinct urls + distinct langs
    layer = VectorTile(got).get_layer(0)
    assert len(layer.value_table()) == 198 + len(set(langs))


def test_url_equal_to_lang_falls_back():
    fids, px, py, urls, langs = make_case(100, seed=22)
    urls = list(urls)
    urls[30] = langs[30] = "en"  # url string collides with a lang value
    expected = scalar_reference_tile(fids, px, py, urls, langs)
    got = encode_point_tile(fids, px, py, pa.array(urls), pa.array(langs))
    assert got == expected


def test_assembler_reencodes_only_conflicted_tiles():
    # one bucket holding three tiles; the middle tile has a dup url
    rows = []
    for t, (x, y) in enumerate([(1, 2), (3, 4), (5, 6)]):
        fids, px, py, urls, langs = make_case(60, seed=30 + t)
        urls = list(urls)
        if t == 1:
            urls[5] = urls[25] = "https://dup.example/x"
        for i in range(60):
            rows.append((6, x, y, int(fids[i]), int(px[i]), int(py[i]),
                         urls[i], langs[i]))
    batch = pa.table({
        "z": pa.array([r[0] for r in rows], pa.int32()),
        "x": pa.array([r[1] for r in rows], pa.int32()),
        "y": pa.array([r[2] for r in rows], pa.int32()),
        "doc_id": pa.array([r[3] for r in rows], pa.uint64()),
        "px": pa.array([r[4] for r in rows], pa.int32()),
        "py": pa.array([r[5] for r in rows], pa.int32()),
        "url": pa.array([r[6] for r in rows], pa.string()),
        "lang": pa.array([r[7] for r in rows], pa.string()),
    })
    out = PointTileAssembler()(batch)
    assert len(out) == 3
    for t in range(3):
        fids, px, py, urls, langs = make_case(60, seed=30 + t)
        urls = list(urls)
        if t == 1:
            urls[5] = urls[25] = "https://dup.example/x"
        order = np.argsort(fids, kind="stable")
        expected = scalar_reference_tile(
            fids[order], px[order], py[order],
            [urls[i] for i in order], [langs[i] for i in order])
        got = out.column("mvt")[t].as_py()
        assert got == expected
        assert check_tile(got)[0] == 0


def test_assembler_empty_batch():
    empty = pa.table({
        "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
        "y": pa.array([], pa.int32()), "doc_id": pa.array([], pa.uint64()),
        "px": pa.array([], pa.int32()), "py": pa.array([], pa.int32()),
        "url": pa.array([], pa.string()), "lang": pa.array([], pa.string()),
    })
    out = PointTileAssembler()(empty)
    assert len(out) == 0
    assert out.column_names == ["z", "x", "y", "mvt", "n_features"]
