"""Pure-NumPy baseline JPEG codec (stages/jpeg.py): exact flat-block
round-trips at quality 100, bounded-error round-trips for smooth RGB at
4:4:4 and 4:2:0, restart-marker segmentation, byte stuffing, adversarial
inputs, and the multimodal stage integration (sniffed decode + corpus).

The exactness anchor is independent math, not the codec's own output: a
constant 8x8 block of value v level-shifts to c=v-128, whose DCT is a
single DC coefficient 8c (an integer); at quality 100 every quantizer
entry is 1, so DC survives quantization exactly, and the IDCT of a pure
DC block is the constant c again — if any piece of the marker walk,
Huffman tables, bit reader, destuffer, dequantize or IDCT were wrong,
decode would not return v.
"""

import numpy as np
import pyarrow as pa
import pytest

from vtzero_ray.stages.jpeg import (_BitReader, _BitWriter, _extend,
                                    _magnitude, _scaled_qt, _QT_LUMA,
                                    decode_jpeg, encode_jpeg)


def _flat_block_gray(media_id: int, w: int, h: int) -> np.ndarray:
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    return ((media_id * 7 + bx[None, :] * 13 + by[:, None] * 31) % 256
            ).astype(np.uint8)


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 3) % 256,
                     ((yy * 2 + xx) % 256) // 2 + 60,
                     (xx + yy) % 200], axis=2).astype(np.uint8)


class TestExactGrayscale:
    def test_flat_blocks_exact_q100(self):
        """Flat 8x8 blocks at quality 100 decode with ZERO error —
        including non-multiple-of-8 dims (edge padding) and every
        restart-interval setting 0/1/2."""
        for mid, (h, w) in enumerate([(8, 8), (16, 24), (13, 29),
                                      (32, 32), (9, 9), (8, 31)]):
            px = _flat_block_gray(mid, w, h)
            for dri in (0, 1, 2):
                out = decode_jpeg(encode_jpeg(px, quality=100,
                                              restart_interval=dri))
                assert out.shape == (h, w)
                assert out.dtype == np.uint8
                assert np.array_equal(out, px), (h, w, dri)

    def test_flat_value_matches_hand_formula(self):
        """Pin one pixel to the hand-derived integer value so the test
        cannot pass by symmetric encoder/decoder bugs."""
        px = np.full((8, 8), 201, np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=100))
        assert int(out[3, 5]) == 201

    def test_checkerboard_q100(self):
        """Worst-case AC energy: a 0/255 checkerboard still round-trips
        exactly at quality 100 (all coefficients representable)."""
        cb = np.zeros((16, 16), np.uint8)
        cb[::2, 1::2] = 255
        cb[1::2, ::2] = 255
        assert np.array_equal(decode_jpeg(encode_jpeg(cb, quality=100)), cb)


class TestRGB:
    def test_smooth_444_small_error(self):
        rgb = _smooth_rgb(40, 56)
        dec = decode_jpeg(encode_jpeg(rgb, quality=90, subsample="444"))
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 8

    def test_smooth_420_small_error(self):
        rgb = _smooth_rgb(41, 55)  # odd dims force chroma edge padding
        dec = decode_jpeg(encode_jpeg(rgb, quality=90, subsample="420"))
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 12

    def test_noise_q100_tight(self):
        noise = np.random.default_rng(11).integers(
            0, 256, (24, 24, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(noise, quality=100))
        assert np.abs(dec.astype(int) - noise.astype(int)).max() <= 4

    def test_quality_monotone(self):
        """Lower quality → not-smaller reconstruction error (sanity that
        the quality knob reaches the quantizer)."""
        rgb = _smooth_rgb(32, 32)
        errs = []
        for q in (95, 50, 10):
            dec = decode_jpeg(encode_jpeg(rgb, quality=q))
            errs.append(float(np.abs(dec.astype(int) - rgb.astype(int)).mean()))
        assert errs[0] <= errs[1] <= errs[2]
        assert errs[2] > errs[0]

    def test_restart_interval_rgb(self):
        rgb = _smooth_rgb(48, 48)
        base = decode_jpeg(encode_jpeg(rgb, quality=90))
        with_rst = decode_jpeg(encode_jpeg(rgb, quality=90,
                                           restart_interval=2))
        # restart markers change segmentation, not reconstruction
        assert np.array_equal(base, with_rst)


class TestBitLayer:
    def test_magnitude_extend_inverse(self):
        for v in [-2047, -1024, -255, -1, 0, 1, 2, 255, 1023, 2047]:
            s, bits = _magnitude(v)
            assert _extend(bits, s) == v

    def test_byte_stuffing_roundtrip(self):
        """A writer emitting 0xFF bytes stuffs 0x00; the destuffed reader
        recovers the exact bit sequence."""
        w = _BitWriter()
        w.put(0xFF, 8)
        w.put(0xFF, 8)
        w.put(0b101, 3)
        w.flush()
        raw = bytes(w.buf)
        assert raw[0:2] == b"\xff\x00" and raw[2:4] == b"\xff\x00"
        from vtzero_ray.stages.jpeg import _destuff
        kept, bounds = _destuff(b"\xff\xd8" + raw + b"\xff\xd9", 2)
        rd = _BitReader(kept)
        assert rd.take(8) == 0xFF and rd.take(8) == 0xFF
        assert rd.take(3) == 0b101
        assert bounds == []

    def test_scaled_qt_bounds(self):
        assert _scaled_qt(_QT_LUMA, 100).max() == 1  # all-ones at q100
        assert _scaled_qt(_QT_LUMA, 1).max() <= 255
        assert _scaled_qt(_QT_LUMA, 50).tolist() == _QT_LUMA.tolist()


class TestErrors:
    def test_not_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")

    def test_truncated_stream(self):
        good = encode_jpeg(np.full((16, 16), 40, np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg(good[:20])

    def test_progressive_rejected_loudly(self):
        good = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
        i = bytes(good).find(b"\xff\xc0")
        good[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bytes(good))

    def test_12bit_rejected(self):
        good = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
        i = bytes(good).find(b"\xff\xc0")
        good[i + 4] = 12  # precision byte inside SOF
        with pytest.raises(ValueError, match="precision"):
            decode_jpeg(bytes(good))

    def test_encode_validates_input(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4, 2), np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((0, 4), np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4), np.uint8), subsample="422")


class TestStageIntegration:
    def test_sniff_and_decode_image(self):
        from vtzero_ray.stages.png import decode_image, sniff_image
        px = _flat_block_gray(3, 24, 16)
        payload = encode_jpeg(px, quality=100)
        assert sniff_image(payload) == "jpeg"
        rgb = decode_image(payload)
        assert rgb.shape == (16, 24, 3)
        for c in range(3):  # gray expands to 3 identical channels
            assert np.array_equal(rgb[:, :, c], px)

    def test_synth_corpus_exact_sums(self):
        """The driver-query corpus: every payload decodes to exactly the
        pixel formula (the same check the SQL oracle performs)."""
        from vtzero_ray.stages.multimodal import (ImageStats, _jpeg_dims,
                                                  synth_media_jpeg)
        tab = synth_media_jpeg(24)
        out = ImageStats()(tab)
        for row in out.to_pylist():
            mid = row["media_id"]
            w, h = _jpeg_dims(mid)
            px = _flat_block_gray(mid, w, h).astype(np.int64)
            assert (row["width"], row["height"]) == (w, h)
            assert row["sum_r"] == row["sum_g"] == row["sum_b"] == px.sum()

    def test_resize_keeps_jpeg_format(self):
        from vtzero_ray.stages.multimodal import ImageResize
        from vtzero_ray.stages.png import sniff_image
        px = _smooth_rgb(40, 64)
        payload = encode_jpeg(px, quality=95)
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([payload], pa.binary()),
            "width": pa.array([64], pa.int32()),
            "height": pa.array([40], pa.int32()),
        })
        out = ImageResize(target=32, decoder="numpy")(batch).to_pylist()[0]
        assert sniff_image(out["payload"]) == "jpeg"
        dec = decode_jpeg(out["payload"])
        assert dec.shape == (out["height"], out["width"], 3)
        assert out["width"] == 32
