"""Pure-NumPy WAV/PCM16 codec (stages/wav.py): round-trips, chunk-walk
robustness, adversarial inputs, and the AudioStats stage."""

import struct

import numpy as np
import pytest

from vtzero_ray.stages.wav import (AudioStats, decode_wav, encode_wav,
                                   synth_media_wav, synth_samples,
                                   _wav_shape)


class TestWAVCodec:
    def test_mono_stereo_roundtrip(self):
        rng = np.random.default_rng(5)
        mono = rng.integers(-32768, 32768, size=500, dtype=np.int16)
        s, rate = decode_wav(encode_wav(mono, 16000))
        assert rate == 16000 and np.array_equal(s[:, 0], mono)
        stereo = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
        s, rate = decode_wav(encode_wav(stereo, 44100))
        assert rate == 44100 and np.array_equal(s, stereo)

    def test_extremes_roundtrip(self):
        for arr in (np.array([], np.int16),
                    np.array([32767, -32768], np.int16),
                    np.zeros((1, 8), np.int16)):
            s, _ = decode_wav(encode_wav(arr, 8000))
            want = arr[:, None] if arr.ndim == 1 else arr
            assert np.array_equal(s, want)

    def test_unknown_chunks_skipped(self):
        """A LIST/INFO chunk (odd length → word-aligned) before data must
        be walked over, not break the parse."""
        samples = np.arange(10, dtype=np.int16)
        data = encode_wav(samples, 8000)
        # splice an odd-length junk chunk between fmt and data
        fmt_end = 12 + 8 + 16
        junk = b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"  # pad
        spliced = data[:fmt_end] + junk + data[fmt_end:]
        spliced = spliced[:4] + struct.pack(
            "<I", len(spliced) - 8) + spliced[8:]
        s, rate = decode_wav(spliced)
        assert rate == 8000 and np.array_equal(s[:, 0], samples)

    def test_adversarial_inputs_raise_cleanly(self):
        good = encode_wav(np.arange(16, dtype=np.int16), 8000)
        bads = [b"", b"RIFFxxxx", b"RIFF" + b"\x00" * 20,
                good[:20],                      # truncated mid-chunk
                good[:12],                      # no chunks at all
                good.replace(b"data", b"datx")]  # data chunk missing
        for bad in bads:
            with pytest.raises(ValueError):
                decode_wav(bad)
        # non-PCM format code
        bad = bytearray(good)
        bad[20] = 3  # fmt.audio_format = 3 (IEEE float)
        with pytest.raises(ValueError, match="unsupported"):
            decode_wav(bytes(bad))
        # declared data length not a whole number of samples
        odd = bytearray(good)
        (dlen,) = struct.unpack_from("<I", odd, 12 + 8 + 16 + 4)
        struct.pack_into("<I", odd, 12 + 8 + 16 + 4, dlen - 1)
        with pytest.raises(ValueError):
            decode_wav(bytes(odd))

    def test_encode_validation(self):
        with pytest.raises(ValueError):
            encode_wav(np.arange(4, dtype=np.int32), 8000)  # wrong dtype
        with pytest.raises(ValueError):
            encode_wav(np.zeros((2, 9), np.int16), 8000)    # too many ch


class TestAudioStats:
    def test_stats_match_formula(self, ray_session):
        import ray.data as rd

        out = rd.from_arrow(synth_media_wav(24)).map_batches(
            AudioStats, batch_format="pyarrow", batch_size=8,
            concurrency=(1, 2)).to_pandas().set_index("media_id")
        for mid in range(24):
            ns, rate, ch = _wav_shape(mid)
            s = synth_samples(mid, ns, ch).astype(np.int64)
            row = out.loc[mid]
            assert (row.sample_rate, row.channels, row.n_samples) == \
                (rate, ch, ns)
            assert row.sum_c0 == s[:, 0].sum()
            assert row.sum_c1 == (s[:, 1].sum() if ch > 1 else 0)
