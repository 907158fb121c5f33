"""Pure-NumPy+zlib PNG codec (stages/png.py): round-trips through every
scanline filter, color-type decode matrix, adversarial inputs, and the
multimodal stage integration (format-sniffed decode/resize/stats)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from vtzero_ray.stages.png import (_SIG, _chunk, decode_image, decode_png,
                                   encode_png, sniff_image)


def _rand_px(h, w, ch=3, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)


def _build_png(ctype, w, h, body_px, extra=b""):
    """Hand-rolled single-IDAT PNG for color types encode_png doesn't emit."""
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    scan = np.zeros((h, 1 + ch * w), np.uint8)
    scan[:, 1:] = body_px.reshape(h, ch * w)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + _chunk(b"IEND", b""))


class TestPNGCodec:
    def test_rgb_roundtrip_every_filter(self):
        """Filters 0-4 (None/Sub/Up/Average/Paeth) all reconstruct the
        exact pixel array — the defilter scan is checked bit-for-bit."""
        px = _rand_px(23, 17)
        for f in range(5):
            assert np.array_equal(decode_png(encode_png(px, filter_type=f)),
                                  px), f"filter {f}"

    def test_odd_shapes_and_extremes(self):
        for h, w in ((1, 1), (1, 64), (64, 1), (7, 5)):
            px = _rand_px(h, w, seed=h * 100 + w)
            for f in (0, 1, 4):
                assert np.array_equal(
                    decode_png(encode_png(px, filter_type=f)), px)
        flat = np.zeros((4, 4, 3), np.uint8)
        assert np.array_equal(decode_png(encode_png(flat)), flat)

    def test_gray_rgba_palette_decode(self):
        gray = _rand_px(9, 11, ch=1)
        assert np.array_equal(decode_png(_build_png(0, 11, 9, gray)), gray)
        rgba = _rand_px(6, 7, ch=4)
        assert np.array_equal(decode_png(_build_png(6, 7, 6, rgba)), rgba)
        pal = np.random.default_rng(2).integers(0, 256, size=(5, 3),
                                                dtype=np.uint8)
        idx = np.random.default_rng(1).integers(0, 5, size=(4, 8, 1),
                                                dtype=np.uint8)
        out = decode_png(_build_png(3, 8, 4, idx,
                                    _chunk(b"PLTE", pal.tobytes())))
        assert np.array_equal(out, pal[idx[:, :, 0]])

    def test_multi_idat_concatenation(self):
        """The deflate stream may span several IDAT chunks."""
        px = _rand_px(10, 10)
        data = encode_png(px)
        # split the single IDAT into two chunks
        chunks = list(_iter_raw_chunks(data))
        out = _SIG
        for tag, body in chunks:
            if tag == b"IDAT":
                mid = len(body) // 2
                out += _chunk(b"IDAT", body[:mid]) + _chunk(b"IDAT", body[mid:])
            else:
                out += _chunk(tag, body)
        assert np.array_equal(decode_png(out), px)

    def test_adversarial_inputs_raise_cleanly(self):
        px = _rand_px(8, 8)
        good = encode_png(px)
        bads = [
            b"",                                  # empty
            b"junkjunk" * 8,                      # garbage
            _SIG + b"\x00" * 20,                  # no valid chunks
            good[:40],                            # truncated mid-chunk
            good[:-8],                            # missing IEND
        ]
        corrupt = bytearray(good)
        corrupt[20] ^= 0xFF                       # flip an IHDR byte → bad CRC
        bads.append(bytes(corrupt))
        # bad filter byte inside a valid deflate stream
        scan = np.zeros((2, 1 + 24), np.uint8)
        scan[0, 0] = 9
        bads.append(_SIG + _chunk(b"IHDR", struct.pack(
            ">IIBBBBB", 8, 2, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + _chunk(b"IEND", b""))
        for bad in bads:
            with pytest.raises(ValueError):
                decode_png(bad)

    def test_unsupported_modes_raise(self):
        # 16-bit depth
        ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
        bad = (_SIG + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
               + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(bad)
        # interlaced
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
        bad = (_SIG + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
               + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(bad)

    def test_decode_image_sniffs_formats(self):
        from vtzero_ray.stages.multimodal import encode_bmp

        px = _rand_px(12, 9)
        assert sniff_image(encode_png(px)) == "png"
        assert sniff_image(encode_bmp(px)) == "bmp"
        assert np.array_equal(decode_image(encode_png(px)), px)
        assert np.array_equal(decode_image(encode_bmp(px)), px)
        gray = _rand_px(5, 6, ch=1)
        assert np.array_equal(decode_image(_build_png(0, 6, 5, gray)),
                              np.repeat(gray[:, :, None], 3, axis=2))
        with pytest.raises(ValueError):
            decode_image(b"neither format")


def _iter_raw_chunks(data):
    off = 8
    while off + 12 <= len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4:off + 8]
        yield tag, data[off + 8:off + 8 + ln]
        off += 12 + ln


class TestPNGStages:
    def test_image_decode_numpy_on_png(self):
        from vtzero_ray.stages.multimodal import ImageDecode, synth_pixels

        px = synth_pixels(7, 16, 10)
        t = pa.table({
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([encode_png(px, filter_type=2)], pa.binary()),
        })
        f = np.asarray(ImageDecode(decoder="numpy")(t)
                       .column("features").to_pylist()[0])
        gray = px.astype(np.float64).mean(axis=2)
        expect = np.array([16, 10, px[:, :, 0].mean(), px[:, :, 1].mean(),
                           px[:, :, 2].mean(), gray.std(), gray.min(),
                           gray.max()], np.float32)
        assert np.allclose(f, expect)

    def test_resize_preserves_source_format(self):
        from vtzero_ray.stages.multimodal import ImageResize, synth_pixels

        px = synth_pixels(2, 20, 10)
        t = pa.table({
            "media_id": pa.array([2], pa.int64()),
            "payload": pa.array([encode_png(px, filter_type=4)], pa.binary()),
            "width": pa.array([20], pa.int32()),
            "height": pa.array([10], pa.int32()),
        })
        out = ImageResize(target=10, decoder="numpy")(t)
        payload = out.column("payload").to_pylist()[0]
        assert sniff_image(payload) == "png"  # PNG in → PNG out
        rp = decode_png(payload)
        assert rp.shape == (5, 10, 3)
        for y, x in ((0, 0), (2, 3), (4, 9)):
            assert (rp[y, x] == px[y * 2, x * 2]).all()

    def test_image_stats_matches_formula_all_filters(self, ray_session):
        """The driver-twin query path: REAL PNG corpus (filter type cycles
        through all five) → ImageStats over Ray → exact pixel-formula sums."""
        import ray.data as rd

        from vtzero_ray.stages.multimodal import (ImageStats, _png_dims,
                                                  synth_media_png,
                                                  synth_pixels)

        out = rd.from_arrow(synth_media_png(20)).map_batches(
            ImageStats, batch_format="pyarrow", batch_size=8,
            concurrency=(1, 2)).to_pandas().set_index("media_id")
        for mid in range(20):
            w, h = _png_dims(mid)
            px = synth_pixels(mid, w, h).astype(np.int64)
            row = out.loc[mid]
            assert (row.width, row.height) == (w, h)
            assert [row.sum_r, row.sum_g, row.sum_b] == \
                list(px.sum(axis=(0, 1)))
