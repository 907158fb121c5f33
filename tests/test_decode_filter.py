"""Decode / stats / filter / merge pipelines + multimodal stage plumbing."""

import numpy as np
import pytest

from vtzero_ray.mvt.decoder import VectorTile


@pytest.fixture(scope="module")
def tiles(ray_session, sf_dir):
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    return tiles_pipeline(sf_dir, zooms=(6,), validate=False).materialize()


class TestDecodePipeline:
    def test_explode_features(self, tiles, sf_dir):
        from vtzero_ray.pipelines.decode import decode_tiles

        feats = decode_tiles(tiles).to_pandas()
        assert feats.error.isna().all()
        assert (feats.layer == "pages").all()
        assert (feats.geom_type == 1).all()
        assert (feats.n_props == 2).all()
        import pyarrow.parquet as pq

        n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        assert len(feats) == n_docs
        # feature ids are the doc ids
        assert set(feats.feature_id) == set(range(n_docs))

    def test_quarantine_bad_tile(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from vtzero_ray.pipelines.decode import decode_tiles

        bad = pa.table({"z": pa.array([0], pa.int32()), "x": pa.array([0], pa.int32()),
                        "y": pa.array([0], pa.int32()),
                        "mvt": pa.array([b"\xde\xad"], pa.binary())})
        out = decode_tiles(rd.from_arrow(bad)).to_pandas()
        assert len(out) == 1
        assert out.error.iloc[0] is not None

    def test_tile_stats(self, tiles):
        from vtzero_ray.pipelines.decode import tile_stats

        st = tile_stats(tiles).to_pandas()
        assert (st.n_keys == 2).all()  # url, lang
        assert (st.n_values >= st.n_features).all()  # urls unique per feature
        assert st.n_features.sum() == 500

    def test_check_corpus(self, tiles):
        from vtzero_ray.pipelines.decode import check_corpus

        ck = check_corpus(tiles).to_pandas()
        assert (ck.check_code == 0).all()


class TestFilterPipelines:
    def test_filter_features_reinterns(self, tiles):
        from vtzero_ray.pipelines.decode import decode_tiles
        from vtzero_ray.pipelines.filter import filter_features

        filtered = filter_features(tiles, "pages", "lang", "en")
        feats = decode_tiles(filtered).to_pandas()
        # only en features survive; properties re-interned correctly
        full = decode_tiles(tiles).to_pandas()
        assert 0 < len(feats) < len(full)
        # geometry passthrough: same command streams per feature id
        f_by_id = {r.feature_id: r.geom_cmds for r in feats.itertuples()}
        for r in full.itertuples():
            if r.feature_id in f_by_id:
                assert list(f_by_id[r.feature_id]) == list(r.geom_cmds)

    def test_select_layer_verbatim(self, tiles):
        from vtzero_ray.pipelines.filter import select_layer

        sel = select_layer(tiles, "pages").to_pandas()
        orig = tiles.to_pandas()
        assert len(sel) == len(orig)
        # single-layer tiles: layer extraction is byte-verbatim
        a = sel.sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = orig.sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert (a.mvt == b.mvt).all()

    def test_merge_tiles(self, ray_session, tiles, sf_dir):
        from vtzero_ray.pipelines.filter import filter_features, merge_tiles
        from vtzero_ray.pipelines.decode import decode_tiles

        en = filter_features(tiles, "pages", "lang", "en")
        de = filter_features(tiles, "pages", "lang", "de")
        merged = merge_tiles(en, de)
        feats = decode_tiles(merged).to_pandas()
        n_en = decode_tiles(en).to_pandas().shape[0]
        n_de = decode_tiles(de).to_pandas().shape[0]
        assert len(feats) == n_en + n_de
        # merged tiles have two layers with the same name (spec-dup warning
        # territory — the merge primitive is add_existing_layer concat)
        row = merged.take(1)[0]
        names = [l.name for l in VectorTile(row["mvt"]).layers()]
        assert all(n == b"pages" for n in names)

    def test_merge_single_task_byte_identical(self, ray_session, tiles):
        """The output-sized single-task merge path produces byte-identical
        tiles to the bucketed-shuffle path (both are merge_group under
        the hood; single_task only removes the groupby orchestration)."""
        from vtzero_ray.pipelines.filter import filter_features, merge_tiles

        en = filter_features(tiles, "pages", "lang", "en").materialize()
        de = filter_features(tiles, "pages", "lang", "de").materialize()
        a = (merge_tiles(en, de).to_pandas()
             .sort_values(["z", "x", "y"]).reset_index(drop=True))
        b = (merge_tiles(en, de, single_task=True).to_pandas()
             .sort_values(["z", "x", "y"]).reset_index(drop=True))
        assert len(a) == len(b)
        assert (a.mvt == b.mvt).all()
        assert list(a.columns) == list(b.columns)


class TestMultimodal:
    def test_image_decode_plumbing(self, ray_session):
        from vtzero_ray.stages.multimodal import media_pipeline

        feats, frames = media_pipeline(60)
        f = feats.to_pandas()
        assert (f.kind == "image").all()
        assert all(len(v) == 8 for v in f.features)
        fr = frames.to_pandas()
        assert len(fr) > 0
        assert all(isinstance(b, bytes) for b in fr.frame)

    def test_real_decoder_raises(self):
        from vtzero_ray.stages.multimodal import ImageDecode

        with pytest.raises(NotImplementedError, match="imaging library"):
            ImageDecode(decoder="real")

    def test_fake_decode_deterministic(self):
        import pyarrow as pa

        from vtzero_ray.stages.multimodal import ImageDecode, synth_media

        t = synth_media(8)
        d = ImageDecode()
        a = d(t).column("features").to_pylist()
        b = d(synth_media(8)).column("features").to_pylist()
        assert a == b


class TestSelectLayerFast:
    def test_multilayer_span_extraction_byte_identity(self, ray_session,
                                                      tiles):
        """Fast span walk output == full-parse output on multi-layer tiles
        (and equals the original single layer byte-verbatim)."""
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.mvt.builder import TileBuilder
        from vtzero_ray.mvt.decoder import VectorTile
        from vtzero_ray.pipelines.filter import merge_tiles, select_layer
        from vtzero_ray.pipelines.paths import site_paths_tiles

        paths = site_paths_tiles("/root/testdata/sf0.001", zoom=6)
        merged = merge_tiles(tiles, paths.select_columns(["z", "x", "y", "mvt"]))
        sel = select_layer(merged, "pages").to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        # oracle: full parse per tile
        md = merged.to_pandas().sort_values(["z", "x", "y"]) \
            .reset_index(drop=True)
        expect = {}
        for r in md.itertuples():
            for layer in VectorTile(bytes(r.mvt)).layers():
                if layer.name == b"pages":
                    tb = TileBuilder()
                    tb.add_existing_layer(layer.data)
                    expect[(r.z, r.x, r.y)] = tb.serialize()
                    break
        assert len(sel) == len(expect)
        for r in sel.itertuples():
            assert bytes(r.mvt) == expect[(r.z, r.x, r.y)]

    def test_garbage_tile_drops_not_crashes(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.pipelines.filter import select_layer

        bad = pa.table({
            "z": pa.array([0], pa.int32()), "x": pa.array([0], pa.int32()),
            "y": pa.array([0], pa.int32()),
            "mvt": pa.array([b"\xde\xad\xbe\xef"], pa.binary())})
        out = select_layer(rd.from_arrow(bad), "pages").to_pandas()
        assert len(out) == 0

    def test_layer_name_overrun_raises(self):
        """A name length running past the layer span must raise (take the
        scalar fallback), never slice into adjacent tile bytes."""
        from vtzero_ray.pipelines.filter import _layer_name_of

        # layer message: field 1 (name), declared len 200 >> actual span
        layer = b"\x0a\xc8\x01" + b"pages"
        buf = layer + b"pages_adjacent_tile_bytes"
        with pytest.raises(ValueError, match="overruns layer"):
            _layer_name_of(buf, 0, len(layer))


class TestBMPCodec:
    """Pure-NumPy BMP codec: the real (non-stub) media decode path."""

    def test_roundtrip_padding_cases(self):
        from vtzero_ray.stages.multimodal import (decode_bmp, encode_bmp,
                                                  synth_pixels)

        # widths covering all 4-byte row-padding remainders
        for w in (1, 2, 3, 4, 5, 13, 32):
            for h in (1, 7, 20):
                px = synth_pixels(3, w, h)
                rt = decode_bmp(encode_bmp(px))
                assert rt.shape == (h, w, 3)
                assert (rt == px).all()

    def test_adversarial_inputs_raise_cleanly(self):
        import pytest as _pytest

        from vtzero_ray.stages.multimodal import (decode_bmp, encode_bmp,
                                                  split_bmp_frames,
                                                  synth_pixels)

        good = encode_bmp(synth_pixels(1, 8, 8))
        for bad in (b"", b"\xde\xad", b"BM" + b"\x00" * 20,
                    good[:40], good[:-10],
                    good[:28] + b"\x20" + good[29:]):  # bpp=32
            with _pytest.raises(ValueError):
                decode_bmp(bad)
        with _pytest.raises(ValueError):
            split_bmp_frames(good + b"JUNK")
        with _pytest.raises(ValueError):
            split_bmp_frames(good[:-4])

    def test_numpy_decoder_real_features(self):
        import pyarrow as pa

        from vtzero_ray.stages.multimodal import (ImageDecode, encode_bmp,
                                                  synth_pixels)

        px = synth_pixels(7, 16, 10)
        t = pa.table({
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([encode_bmp(px)], pa.binary()),
        })
        f = np.asarray(ImageDecode(decoder="numpy")(t)
                       .column("features").to_pylist()[0])
        gray = px.astype(np.float64).mean(axis=2)
        expect = np.array([16, 10, px[:, :, 0].mean(), px[:, :, 1].mean(),
                           px[:, :, 2].mean(), gray.std(), gray.min(),
                           gray.max()], np.float32)
        assert np.allclose(f, expect)

    def test_numpy_resize_real_pixels(self):
        import pyarrow as pa

        from vtzero_ray.stages.multimodal import (ImageResize, decode_bmp,
                                                  encode_bmp, synth_pixels)

        px = synth_pixels(2, 20, 10)
        t = pa.table({
            "media_id": pa.array([2], pa.int64()),
            "payload": pa.array([encode_bmp(px)], pa.binary()),
            "width": pa.array([20], pa.int32()),
            "height": pa.array([10], pa.int32()),
        })
        out = ImageResize(target=10, decoder="numpy")(t)
        rp = decode_bmp(out.column("payload").to_pylist()[0])
        assert rp.shape == (5, 10, 3)
        # nearest-neighbor: out[y, x] = in[floor(y/scale), floor(x/scale)]
        for y, x in ((0, 0), (2, 3), (4, 9)):
            assert (rp[y, x] == px[y * 2, x * 2]).all()

    def test_numpy_frame_split(self):
        import pyarrow as pa

        from vtzero_ray.stages.multimodal import (FrameSample, decode_bmp,
                                                  encode_bmp, synth_pixels)

        frames_px = [synth_pixels(i, 8, 6) for i in range(3)]
        payload = b"".join(encode_bmp(p) for p in frames_px)
        t = pa.table({
            "media_id": pa.array([9], pa.int64()),
            "kind": pa.array(["video"], pa.string()),
            "duration_ms": pa.array([3000], pa.int32()),
            "payload": pa.array([payload], pa.binary()),
        })
        out = FrameSample(every_ms=1000, decoder="numpy")(t)
        assert out.num_rows == 3
        assert out.column("frame_ts_ms").to_pylist() == [0, 1000, 2000]
        for i, fb in enumerate(out.column("frame").to_pylist()):
            assert (decode_bmp(fb) == frames_px[i]).all()

    def test_bmp_stats_matches_formula(self, ray_session):
        import ray.data as rd

        from vtzero_ray.stages.multimodal import (BMPStats, synth_media_bmp,
                                                  synth_pixels, _bmp_dims)

        out = rd.from_arrow(synth_media_bmp(16)).map_batches(
            BMPStats, batch_format="pyarrow", batch_size=8,
            concurrency=(1, 2)).to_pandas().set_index("media_id")
        for mid in range(16):
            w, h = _bmp_dims(mid)
            px = synth_pixels(mid, w, h).astype(np.int64)
            row = out.loc[mid]
            assert (row.width, row.height) == (w, h)
            assert [row.sum_r, row.sum_g, row.sum_b] == \
                list(px.sum(axis=(0, 1)))


class TestZXYRoundtrip:
    def test_export_and_read_zxy(self, ray_session, tiles, tmp_path):
        from vtzero_ray.sources import mvt_io

        out = str(tmp_path / "zxy")
        n = mvt_io.export_zxy(tiles, out)
        back = mvt_io.read_zxy(out).to_pandas()
        assert len(back) == n == tiles.count()
        orig = tiles.to_pandas().set_index(["z", "x", "y"]).mvt
        got = back.set_index(["z", "x", "y"]).mvt
        for key in orig.index:
            assert bytes(got.loc[key]) == orig.loc[key]


class TestFilterFast:
    def test_byte_identity_with_scalar_path(self, ray_session, tiles):
        from vtzero_ray.pipelines.filter import (filter_features,
                                                 filter_features_fast)

        slow = filter_features(tiles, "pages", "lang", "en").to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        fast = filter_features_fast(tiles, "pages", "lang", "en").to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(fast) == len(slow) > 0
        for a, b in zip(fast.itertuples(), slow.itertuples()):
            assert (a.z, a.x, a.y, a.n_features) == (b.z, b.x, b.y, b.n_features)
            assert bytes(a.mvt) == bytes(b.mvt)

    def test_fallback_on_non_pages_tiles(self, ray_session, tiles):
        """Multi-layer merged tiles aren't pages-schema → the fast path
        must route them through the scalar copy and still match it."""
        from vtzero_ray.pipelines.filter import (filter_features,
                                                 filter_features_fast,
                                                 merge_tiles)
        from vtzero_ray.pipelines.paths import site_paths_tiles

        paths = site_paths_tiles("/root/testdata/sf0.001", zoom=6)
        merged = merge_tiles(tiles, paths.select_columns(["z", "x", "y", "mvt"]))
        slow = filter_features(merged, "pages", "lang", "en").to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        fast = filter_features_fast(merged, "pages", "lang", "en").to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(fast) == len(slow) > 0
        for a, b in zip(fast.itertuples(), slow.itertuples()):
            assert bytes(a.mvt) == bytes(b.mvt)

class TestFilterFastEdgeCases:
    """Regression tests for the round-2 ADVICE findings (filter.py)."""

    @staticmethod
    def _tile(props_list, ids=None, big_val=None):
        """One pages-layer tile; props_list = list of dict per feature."""
        from vtzero_ray.mvt.builder import PointFeatureBuilder, TileBuilder

        tb = TileBuilder()
        lb = tb.add_layer("pages")
        for i, props in enumerate(props_list):
            fb = PointFeatureBuilder(lb)
            fb.set_id((ids or range(1, len(props_list) + 1))[i])
            fb.add_point(10 + i, 20 + i)
            for k, v in props.items():
                fb.add_property(k, v)
            fb.commit()
        return tb.serialize()

    @staticmethod
    def _ds(tiles):
        import pyarrow as pa
        import ray.data as rd

        n = len(tiles)
        return rd.from_arrow(pa.table({
            "z": pa.array([6] * n, pa.int32()),
            "x": pa.array(list(range(n)), pa.int32()),
            "y": pa.array([0] * n, pa.int32()),
            "mvt": pa.array(tiles, pa.binary()),
        }))

    def _assert_matches_scalar(self, ds, key, value):
        from vtzero_ray.pipelines.filter import (filter_features,
                                                 filter_features_fast)

        slow = filter_features(ds, "pages", key, value).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        fast = filter_features_fast(ds, "pages", key, value).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(fast) == len(slow)
        for a, b in zip(fast.itertuples(), slow.itertuples()):
            assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
            assert bytes(a.mvt) == bytes(b.mvt)
        return slow

    def test_key_url_honored(self, ray_session):
        """ADVICE #1: fast path must compare the requested key, not
        always lang."""
        t = self._tile([{"url": "https://a", "lang": "en"},
                        {"url": "https://b", "lang": "en"}])
        slow = self._assert_matches_scalar(self._ds([t]), "url", "https://a")
        assert slow.n_features.sum() == 1

    def test_non_pages_key_scalar_route(self, ray_session):
        """Arbitrary keys (non url/lang) route to the scalar path and
        still return correct results."""
        t = self._tile([{"site": "x", "kind": "page"},
                        {"site": "y", "kind": "blog"}])
        slow = self._assert_matches_scalar(self._ds([t]), "kind", "page")
        assert slow.n_features.sum() == 1

    def test_single_prop_last_feature(self, ray_session):
        """ADVICE #3: a trailing feature with < 2 property values must
        not crash the vectorized gather (take past end of value table)."""
        good = self._tile([{"url": "https://a", "lang": "en"}])
        short = self._tile([{"url": "https://b", "lang": "en"},
                            {"only": "one"}])
        slow = self._assert_matches_scalar(self._ds([good, short]),
                                           "lang", "en")
        assert slow.n_features.sum() == 2

    def test_nonstring_value_invalid_utf8(self, ray_session):
        """ADVICE #2a: a uint property value whose entry bytes slice to
        invalid UTF-8 must not fail the batch (ArrowInvalid)."""
        t = self._tile([{"url": "https://a", "lang": "en"},
                        {"url": "https://b", "lang": 3000000}])
        slow = self._assert_matches_scalar(self._ds([t]), "lang", "en")
        assert slow.n_features.sum() == 1

    def test_long_string_no_corruption(self, ray_session):
        """ADVICE #2b: a string value >= 16384 bytes has a 3-byte varint
        length — must go ok=False (scalar path), not silently decode with
        a stray length byte prepended."""
        big = "s" * 16385
        t = self._tile([{"url": "https://a", "lang": big},
                        {"url": "https://b", "lang": "en"}])
        slow = self._assert_matches_scalar(self._ds([t]), "lang", big)
        assert slow.n_features.sum() == 1

    def test_strip_string_entries_unit(self):
        import pyarrow as pa

        from vtzero_ray.pipelines.filter import _strip_string_entries
        from vtzero_ray.mvt.values import encode_value

        entries = [
            encode_value("hi"),                 # 1-byte len
            encode_value("x" * 200),            # 2-byte len
            encode_value("y" * 16385),          # 3-byte len -> not ok
            encode_value(3000000),              # uint, invalid-utf8 slice
            encode_value(1.5),                  # double
        ]
        strs, ok = _strip_string_entries(pa.array(entries, pa.binary()))
        assert list(ok) == [True, True, False, False, False]
        assert strs[0].as_py() == "hi"
        assert strs[1].as_py() == "x" * 200


class TestFusedMultilayer:
    """pages_paths_tiles_fused: ONE shuffle, two layers — byte-identical to
    the multi-pass merge_tiles(points, paths) twin."""

    def test_byte_identity_with_merge_twin(self, ray_session, sf_dir):
        from vtzero_ray.pipelines.filter import merge_tiles
        from vtzero_ray.pipelines.paths import (pages_paths_tiles_fused,
                                                site_paths_tiles)
        from vtzero_ray.pipelines.tiling import tiles_pipeline

        fused = pages_paths_tiles_fused(sf_dir, zoom=2).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        pages = tiles_pipeline(sf_dir, zooms=(2,), validate=False)
        paths = site_paths_tiles(sf_dir, zoom=2)
        merged = merge_tiles(
            pages, paths.select_columns(["z", "x", "y", "mvt"])).to_pandas() \
            .sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert len(fused) == len(merged) > 0
        assert fused["z"].tolist() == merged["z"].tolist()
        assert fused["x"].tolist() == merged["x"].tolist()
        assert fused["y"].tolist() == merged["y"].tolist()
        for a, b in zip(fused["mvt"], merged["mvt"]):
            assert bytes(a) == bytes(b)

    def test_layers_and_counts_decode(self, ray_session, sf_dir):
        from vtzero_ray.pipelines.paths import pages_paths_tiles_fused

        fused = pages_paths_tiles_fused(sf_dir, zoom=2).to_pandas()
        two_layer = 0
        for r in fused.itertuples():
            layers = list(VectorTile(bytes(r.mvt)).layers())
            names = [l.name for l in layers]
            assert names[0] == b"pages"  # merge order: points first
            n = sum(l.num_features for l in layers)
            assert n == r.n_features
            if b"site_paths" in names:
                two_layer += 1
        assert two_layer > 0
