"""Pure-NumPy WAV (RIFF PCM16) codec — the REAL audio codec in this
container (no soundfile/ffmpeg installed; like the BMP and PNG codecs in
this package, it is library-free by construction).

Scope: canonical RIFF/WAVE with a PCM (format 1) 16-bit ``fmt `` chunk,
1..8 channels, any sample rate; unknown chunks are skipped (LIST/INFO
etc.), malformed input raises ValueError — never crashes the process.
Decode is zero-copy-ish: one np.frombuffer over the data chunk.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT = "<HHIIHH"  # audio_format, channels, rate, byte_rate, align, bits


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, ch) int16 samples → RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or not 1 <= samples.shape[1] <= 8:
        raise ValueError("encode_wav expects (n,) or (n, ch<=8)")
    ch = samples.shape[1]
    body = np.ascontiguousarray(samples).tobytes()
    fmt = struct.pack(_FMT, 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → ((n, ch) int16 samples, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    off = 12
    fmt = None
    body = None
    while off + 8 <= len(data):
        tag = data[off:off + 4]
        (ln,) = struct.unpack_from("<I", data, off + 4)
        chunk = data[off + 8:off + 8 + ln]
        if len(chunk) != ln:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from(_FMT, chunk, 0)
        elif tag == b"data":
            body = chunk
            break  # canonical layout: data is last we need
        off += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format} bits={bits})")
    if not 1 <= ch <= 8:
        raise ValueError(f"bad WAV channel count {ch}")
    if len(body) % (2 * ch):
        raise ValueError("WAV data length not a sample multiple")
    samples = np.frombuffer(body, np.int16).reshape(-1, ch)
    return samples, int(rate)


def synth_samples(media_id: int, n: int, ch: int) -> np.ndarray:
    """Deterministic PCM16 samples: ((id*7 + i*13 + c*97) % 65536) - 32768
    — the same closed form the SQL oracle reproduces with generate_series
    (mirrors the image codecs' pixel formula)."""
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    return (((media_id * 7 + i * 13 + c * 97) % 65536) - 32768).astype(np.int16)


def _wav_shape(media_id: int) -> tuple[int, int, int]:
    """(n_samples, rate, channels) derived from media_id."""
    return (256 + (media_id * 31) % 512,
            8000 + (media_id % 3) * 4000,
            1 + media_id % 2)


def synth_media_wav(n: int = 128):
    """Deterministic REAL-WAV audio corpus (media_id-derived samples)."""
    import pyarrow as pa

    ids = np.arange(n, dtype=np.int64)
    payloads, rates, chs, lens = [], [], [], []
    for i in ids:
        ns, rate, ch = _wav_shape(int(i))
        payloads.append(encode_wav(synth_samples(int(i), ns, ch), rate))
        rates.append(rate)
        chs.append(ch)
        lens.append(ns)
    return pa.table({
        "media_id": pa.array(ids),
        "kind": pa.array(["audio"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "sample_rate": pa.array(np.array(rates, np.int32)),
        "channels": pa.array(np.array(chs, np.int32)),
        "n_samples": pa.array(np.array(lens, np.int32)),
    })


class AudioStats:
    """REAL sample statistics from WAV payloads — integer per-channel
    sums so the DuckDB oracle reproduces them exactly. Rate/shape come
    from the decoded header, NOT metadata. Stateless: drive as a
    task-pool stage (instance, no concurrency) — see ImageStats."""

    def __call__(self, batch):
        import pyarrow as pa

        ids, rates, chs, ns, s0, s1 = [], [], [], [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload")):
            samples, rate = decode_wav(p.as_py())
            ids.append(mid)
            rates.append(rate)
            chs.append(samples.shape[1])
            ns.append(samples.shape[0])
            sums = samples.astype(np.int64).sum(axis=0)
            s0.append(int(sums[0]))
            s1.append(int(sums[1]) if samples.shape[1] > 1 else 0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "sample_rate": pa.array(np.array(rates, np.int32)),
            "channels": pa.array(np.array(chs, np.int32)),
            "n_samples": pa.array(np.array(ns, np.int32)),
            "sum_c0": pa.array(s0, pa.int64()),
            "sum_c1": pa.array(s1, pa.int64()),
        })
