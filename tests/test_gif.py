"""GIF codec (stages/gif.py): LZW round-trips across width boundaries
and table resets, interlace, palette handling, adversarial inputs,
sniffed-stage integration, index-space resize."""

import numpy as np
import pyarrow as pa
import pytest


def _pal(n):
    j = np.arange(n, dtype=np.int64)
    return np.stack([(j * 7) % 256, (j * 13) % 256, (j * 29) % 256],
                    axis=1).astype(np.uint8)


class TestLZW:
    def test_roundtrip_matrix(self):
        from vtzero_ray.stages.gif import lzw_decode, lzw_encode

        rng = np.random.default_rng(11)
        for mcs in (2, 4, 8):
            for n in (0, 1, 7, 1000, 20000):
                px = rng.integers(0, 1 << mcs, n).astype(np.uint8)
                out = lzw_decode(lzw_encode(px, mcs), mcs, n)
                assert (out == px).all()

    def test_width_boundaries_and_table_reset(self):
        """A long low-entropy stream crosses every code width and (at
        60k symbols) forces a 4096-entry table reset mid-stream."""
        from vtzero_ray.stages.gif import lzw_decode, lzw_encode

        px = (np.arange(60000) * 7919 % 16).astype(np.uint8)
        out = lzw_decode(lzw_encode(px, 4), 4, len(px))
        assert (out == px).all()

    def test_truncated_stream_raises(self):
        from vtzero_ray.stages.gif import lzw_decode, lzw_encode

        data = lzw_encode(np.arange(100, dtype=np.uint8) % 8, 3)
        with pytest.raises(ValueError):
            lzw_decode(data[: len(data) // 2], 3, 100)

    def test_wrong_pixel_count_raises(self):
        from vtzero_ray.stages.gif import lzw_decode, lzw_encode

        data = lzw_encode(np.zeros(10, np.uint8), 2)
        with pytest.raises(ValueError):
            lzw_decode(data, 2, 11)
        with pytest.raises(ValueError):
            lzw_decode(data, 2, 9)


class TestGIFContainer:
    def test_roundtrip_palettes_and_interlace(self):
        from vtzero_ray.stages.gif import (decode_gif, decode_gif_indexed,
                                           encode_gif)

        rng = np.random.default_rng(3)
        for nbits in (1, 3, 5, 8):
            n = 1 << nbits
            pal = _pal(n)
            idx = rng.integers(0, n, (23, 17)).astype(np.uint8)
            for inter in (False, True):
                data = encode_gif(idx, pal, interlace=inter)
                i2, p2 = decode_gif_indexed(data)
                assert (i2 == idx).all()
                assert (p2 == pal).all()
                assert (decode_gif(data) == pal[idx]).all()

    def test_single_row_and_column(self):
        from vtzero_ray.stages.gif import decode_gif_indexed, encode_gif

        pal = _pal(4)
        for shape in ((1, 9), (9, 1), (1, 1)):
            idx = (np.arange(np.prod(shape)) % 4).astype(np.uint8) \
                .reshape(shape)
            for inter in (False, True):
                i2, _ = decode_gif_indexed(encode_gif(idx, pal, inter))
                assert (i2 == idx).all()

    def test_extension_blocks_skipped(self):
        """A graphic-control extension injected before the image block
        is skipped (GIF89a animations lead with one)."""
        from vtzero_ray.stages.gif import decode_gif_indexed, encode_gif

        pal = _pal(8)
        idx = (np.arange(30) % 8).astype(np.uint8).reshape(5, 6)
        data = encode_gif(idx, pal)
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        head, rest = data[:13 + 3 * 8], data[13 + 3 * 8:]
        i2, _ = decode_gif_indexed(head + gce + rest)
        assert (i2 == idx).all()

    def test_adversarial(self):
        from vtzero_ray.stages.gif import decode_gif, encode_gif

        pal = _pal(16)
        idx = (np.arange(64) % 16).astype(np.uint8).reshape(8, 8)
        good = encode_gif(idx, pal)
        # offset 13 + 3*16 is the 0x2C image separator — corrupting it
        # makes an unknown block (palette-byte corruption, by contrast,
        # is structurally valid and must NOT raise)
        sep = 13 + 3 * 16
        assert good[sep] == 0x2C
        for bad in (b"", b"NOPE!!", b"GIF89a", good[:12], good[:30],
                    good[:-4], good[:sep] + b"\x99" + good[sep + 1:]):
            with pytest.raises(ValueError):
                decode_gif(bad)

    def test_bad_palette_rejected(self):
        from vtzero_ray.stages.gif import encode_gif

        idx = np.zeros((4, 4), np.uint8)
        with pytest.raises(ValueError):
            encode_gif(idx, _pal(3))          # not a power of two
        with pytest.raises(ValueError):
            encode_gif(np.full((4, 4), 5, np.uint8), _pal(4))  # idx >= n


class TestGIFStageIntegration:
    def test_sniff_and_stats(self, ray_session):
        """ImageStats decodes the GIF corpus to the same channel sums as
        the direct palette/index formulas."""
        import ray.data as rd

        from vtzero_ray.stages.multimodal import ImageStats, synth_media_gif

        tab = synth_media_gif(24)
        out = (rd.from_arrow(tab).repartition(4)
               .map_batches(ImageStats(), batch_format="pyarrow",
                            batch_size=8)
               .to_pandas().sort_values("media_id").reset_index(drop=True))
        for i in range(24):
            w = 8 + (i * 47) % 25
            h = 8 + (i * 19) % 25
            ps = 1 << ((i % 4) + 5)
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            j = (i * 11 + x * 3 + y * 5) % ps
            assert out.loc[i, "width"] == w and out.loc[i, "height"] == h
            assert out.loc[i, "sum_r"] == int(((j * 7) % 256).sum())
            assert out.loc[i, "sum_g"] == int(((j * 13) % 256).sum())
            assert out.loc[i, "sum_b"] == int(((j * 29) % 256).sum())

    def test_resize_stays_gif_and_exact(self, ray_session):
        """ImageResize re-encodes GIF sources as GIF, resizing in index
        space: every output pixel equals the nearest-neighbor source
        pixel through the SAME palette."""
        from vtzero_ray.stages.gif import decode_gif_indexed, encode_gif
        from vtzero_ray.stages.multimodal import ImageResize
        from vtzero_ray.stages.png import sniff_image

        pal = _pal(32)
        rng = np.random.default_rng(5)
        idx = rng.integers(0, 32, (20, 30)).astype(np.uint8)
        payload = encode_gif(idx, pal, interlace=True)
        t = pa.table({"media_id": pa.array([1], pa.int64()),
                      "payload": pa.array([payload], pa.binary()),
                      "width": pa.array([30], pa.int32()),
                      "height": pa.array([20], pa.int32())})
        out = ImageResize(target=10, decoder="numpy")(t)
        rp = out.column("payload")[0].as_py()
        assert sniff_image(rp) == "gif"
        ri, rpal = decode_gif_indexed(rp)
        assert (rpal == pal).all()
        scale = 10 / 30
        yi = np.minimum((np.arange(int(20 * scale)) / scale).astype(int), 19)
        xi = np.minimum((np.arange(10) / scale).astype(int), 29)
        assert (ri == idx[yi][:, xi]).all()
