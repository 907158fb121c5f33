"""Perceptual image hashing + near-duplicate pairs — the multimodal
member of the dedup family (exact/MinHash/SimHash cover text; crawled
image corpora dedup on PERCEPTUAL hashes because re-encodes and small
edits change every byte but not the picture).

dHash (difference hash): decode → grayscale → 9×8 nearest-neighbor
downsample → 64 left>right comparisons → 64 bits, stored as FOUR 16-bit
band values (nonnegative int64 columns — no two's-complement ambiguity
crosses an engine boundary, and the bands ARE the LSH key). Everything
after the real PNG decode is integer arithmetic, so the DuckDB twin
re-derives each hash from the synth corpus' closed-form pixels.

Near-dup pairs: with B bands and threshold thr <= B-1, hamming(a, b)
<= thr forces some band equal (pigeonhole) — so ONE banded bucket
shuffle finds exactly the pairs an all-pairs scan would (the
simhash_near_dups guarantee), each pair emitted at its FIRST equal
band (the minhash pair-dedup rule, decidable locally because rows
carry all four bands).

The reference has no media ops (vtzero is tile codecs); this is the
brief's multimodal + dedup crossover, built on the repo's real
pure-NumPy PNG codec (stages/png.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()

# 16-bit popcount LUT (numpy 1.26 has no bitwise_count)
_POP16 = np.unpackbits(
    np.arange(65536, dtype=np.uint16).view(np.uint8).reshape(65536, 2),
    axis=1).sum(axis=1).astype(np.int64)

_GRID_W = 9   # sample columns (8 comparisons per row)
_GRID_H = 8   # sample rows (4 two-row bands)
N_BANDS = 4


def synth_media_dhash(n: int = 128) -> pa.Table:
    """Deterministic REAL-PNG corpus with planted near-duplicates:
    every 4th image re-renders its predecessor's pixel formula with a
    +1 brightness term (inside the mod-256, so a handful of wrapped
    pixels flip a few dHash bits — a NEAR duplicate, not an exact
    one). base_id drives dims so variant pairs share geometry."""
    from ..stages.png import encode_png

    ids = np.arange(n, dtype=np.int64)
    payloads, ws, hs = [], [], []
    for i in ids:
        base = int(i) - 1 if i % 4 == 3 else int(i)
        bright = 1 if i % 4 == 3 else 0
        w = 8 + (base * 41) % 25
        h = 8 + (base * 29) % 25
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        px = ((base * 7 + x * 13 + y * 31 + c * 97 + bright) % 256) \
            .astype(np.uint8)
        payloads.append(encode_png(px, filter_type=int(i) % 5))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(ids),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
    })


def dhash_bands(px: np.ndarray) -> list[int]:
    """(h, w, 3) uint8 pixels → four 16-bit dHash band values.

    gray = (r + g + b) // 3; sample row y of the 8×9 grid at source
    row (y*h)//8, column x at (x*w)//9 (pure-integer nearest-neighbor,
    mirrored in SQL); bit (gy%2)*8+gx of band gy//2 is set iff
    gray[gx] > gray[gx+1] on that sampled row."""
    gray = (px[:, :, 0].astype(np.int64) + px[:, :, 1] + px[:, :, 2]) // 3
    h, w = gray.shape
    sx = (np.arange(_GRID_W, dtype=np.int64) * w) // _GRID_W
    sy = (np.arange(_GRID_H, dtype=np.int64) * h) // _GRID_H
    g = gray[np.ix_(sy, sx)]
    bits = (g[:, :-1] > g[:, 1:]).astype(np.int64)      # (8, 8)
    shifts = (np.arange(16, dtype=np.int64))
    out = []
    for k in range(N_BANDS):
        row16 = bits[2 * k:2 * k + 2].reshape(16)
        out.append(int((row16 << shifts).sum()))
    return out


def dhash_signatures(ds):
    """media corpus → Dataset (media_id, b0, b1, b2, b3): REAL decode
    (format-sniffed — the PNG/BMP/GIF codecs) then the integer dHash.
    One scan; per-payload decode is the inherent unit of work (the
    ImageStats precedent)."""
    from ..stages.png import decode_image

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        ids = t.column("media_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pays = t.column("payload").to_pylist()
        bands = np.empty((len(ids), N_BANDS), np.int64)
        for i, p in enumerate(pays):
            bands[i] = dhash_bands(decode_image(p))
        return pa.table({"media_id": pa.array(ids),
                         "b0": pa.array(bands[:, 0]),
                         "b1": pa.array(bands[:, 1]),
                         "b2": pa.array(bands[:, 2]),
                         "b3": pa.array(bands[:, 3])})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def banded_pairs(sigs, thr: int = 3, n_buckets: int = 16,
                 id_column: str = "media_id"):
    """Generic banded hamming join over 4×16-bit signature frames
    (id, b0..b3) → Dataset (id_a, id_b, hamming <= thr). Shared by the
    image dHash and the audio energy fingerprint — any 64-bit
    perceptual hash stored as four nonnegative band columns rides it.
    thr <= N_BANDS-1 keeps the banded join EXACT (pigeonhole); larger
    thr would need more bands. ONE bucketed shuffle of signature rows
    (4 per item); per-bucket all-pairs cost is band-collision-bounded,
    each pair emitted at its FIRST equal band (locally decidable —
    rows carry all four bands)."""
    if thr > N_BANDS - 1:
        raise ValueError(f"thr={thr} breaks the pigeonhole guarantee "
                         f"(need thr <= {N_BANDS - 1})")

    def band_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = [t.column(f"b{k}").to_numpy() for k in range(N_BANDS)]
        band = np.repeat(np.arange(N_BANDS, dtype=np.int64), n)
        val = np.concatenate(cols)
        ids = np.tile(t.column(id_column).to_numpy(), N_BANDS)
        tab = {"bucket": pa.array(((band * 65537 + val) % n_buckets)
                                  .astype(np.int32)),
               "band": pa.array(band), "val": pa.array(val),
               "item_id": pa.array(ids)}
        for k in range(N_BANDS):
            tab[f"b{k}"] = pa.array(np.tile(cols[k], N_BANDS))
        return pa.table(tab)

    import pandas as pd

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        tune_allocator()
        out = []
        for (band, _val), g in df.groupby(["band", "val"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("item_id", kind="stable")
            ids = g["item_id"].to_numpy(np.int64)
            bs = [g[f"b{k}"].to_numpy(np.int64) for k in range(N_BANDS)]
            ai, bi = np.triu_indices(len(ids), k=1)
            ham = np.zeros(len(ai), np.int64)
            first_eq = np.full(len(ai), N_BANDS, np.int64)
            for k in range(N_BANDS - 1, -1, -1):
                eq = bs[k][ai] == bs[k][bi]
                first_eq[eq] = k
                ham += _POP16[np.bitwise_xor(bs[k][ai], bs[k][bi])]
            keep = (first_eq == band) & (ham <= thr)
            if keep.any():
                out.append(pd.DataFrame({
                    "id_a": ids[ai[keep]], "id_b": ids[bi[keep]],
                    "hamming": ham[keep]}))
        if not out:
            return pd.DataFrame({"id_a": np.empty(0, np.int64),
                                 "id_b": np.empty(0, np.int64),
                                 "hamming": np.empty(0, np.int64)})
        return pd.concat(out, ignore_index=True)

    return sigs.map_batches(band_rows, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")


def dhash_pairs(ds, thr: int = 3, n_buckets: int = 16):
    """→ Dataset (id_a, id_b, hamming): every unordered pair of images
    whose dHashes differ in <= thr of 64 bits (see banded_pairs)."""
    if thr > N_BANDS - 1:
        raise ValueError(f"thr={thr} breaks the pigeonhole guarantee "
                         f"(need thr <= {N_BANDS - 1})")
    return banded_pairs(dhash_signatures(ds), thr=thr,
                        n_buckets=n_buckets)


def _dhash_sig_sql(n: int = 128) -> str:
    """CTE chain re-deriving every signature from the closed-form
    pixels: base/bright per id, the 8×9 sampled grayscale grid, the
    same bit layout. Ends with sigs(id, b0, b1, b2, b3)."""
    gray = ("(((base*7 + sx*13 + sy*31 + bright) % 256) + "
            "((base*7 + sx*13 + sy*31 + 97 + bright) % 256) + "
            "((base*7 + sx*13 + sy*31 + 194 + bright) % 256)) // 3")
    return (
        f"m AS (SELECT range AS id, "
        "CASE WHEN range % 4 = 3 THEN range - 1 ELSE range END AS base, "
        "CASE WHEN range % 4 = 3 THEN 1 ELSE 0 END AS bright "
        f"FROM range({n})), "
        "md AS (SELECT id, base, bright, 8 + (base * 41) % 25 AS w, "
        "8 + (base * 29) % 25 AS h FROM m), "
        "grid AS (SELECT md.*, gx.range AS gx, gy.range AS gy, "
        f"(gx.range * w) // {_GRID_W} AS sx, "
        f"(gy.range * h) // {_GRID_H} AS sy "
        f"FROM md, range({_GRID_W}) gx, range({_GRID_H}) gy), "
        f"gv AS (SELECT id, gx, gy, {gray} AS gray FROM grid), "
        "bits AS (SELECT a.id, a.gy, a.gx, "
        "CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit "
        "FROM gv a JOIN gv b ON b.id = a.id AND b.gy = a.gy "
        f"AND b.gx = a.gx + 1 WHERE a.gx < {_GRID_W - 1}), "
        "sigs AS (SELECT id, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN gy // 2 = {k} THEN "
            f"bit << ((gy % 2) * 8 + gx) ELSE 0 END) AS BIGINT) AS b{k}"
            for k in range(N_BANDS)) +
        " FROM bits GROUP BY id)"
    )


def dhash_pairs_sql(thr: int = 3, n: int = 128) -> str:
    """DuckDB twin: all-pairs xor + bit_count over the re-derived
    signatures — with thr <= bands-1 the pigeonhole makes the banded
    Ray join return exactly this set."""
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))"
                     for k in range(N_BANDS))
    return (
        f"WITH {_dhash_sig_sql(n)} "
        f"SELECT a.id AS id_a, b.id AS id_b, CAST({ham} AS BIGINT) "
        "AS hamming FROM sigs a JOIN sigs b ON b.id > a.id "
        f"WHERE {ham} <= {thr}"
    )


def dhash_signatures_sql(n: int = 128) -> str:
    return (f"WITH {_dhash_sig_sql(n)} SELECT id AS media_id, "
            "b0, b1, b2, b3 FROM sigs")


# ---------------------------------------------------------------------------
# audio energy fingerprint — the audio member of the perceptual family
# ---------------------------------------------------------------------------

_AFP_WIN = 3        # samples per energy window
_AFP_NWIN = 65      # windows → 64 difference bits (Haitsma-Kalker shape)


def synth_media_audiofp(n: int = 128) -> pa.Table:
    """Deterministic REAL-WAV corpus with planted near-duplicates:
    every 4th clip re-renders its predecessor's sample formula with a
    +1 term inside the mod-65536 (wrapped samples flip a few energy
    comparisons — a near duplicate). base drives (length, rate,
    channels) so variant pairs share geometry."""
    from ..stages.wav import _wav_shape, encode_wav

    ids = np.arange(n, dtype=np.int64)
    payloads, rates, chs, lens = [], [], [], []
    for i in ids:
        base = int(i) - 1 if i % 4 == 3 else int(i)
        delta = 7 if i % 4 == 3 else 0
        ns, rate, ch = _wav_shape(base)
        si = np.arange(ns, dtype=np.int64)[:, None]
        c = np.arange(ch, dtype=np.int64)[None, :]
        # MULTIPLICATIVE quadratic phase: the WAV synth's linear formula
        # never wraps inside the fingerprint window (identical energy
        # ramps for every clip), and an additive base shift barely moves
        # wrap positions — (2*base+1)·(si²·13 + si·7) scrambles per clip
        # (unrelated pairs land at hamming >= 14). The variant's
        # distortion is PERIODIC ((si % 9) * 7): a uniform offset would
        # cancel in difference coding; the periodic one flips 0-1 bits
        # (true near-dup, measured)
        samples = ((((2 * base + 1) * (si * si * 13 + si * 7)
                     + c * 97 + (si % 9) * delta) % 65536)
                   - 32768).astype(np.int16)
        payloads.append(encode_wav(samples, rate))
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


def audiofp_bands(samples: np.ndarray) -> list[int]:
    """(n, ch) int16 samples → four 16-bit energy-fingerprint bands.

    mono = channel SUM (no division — DuckDB // truncates negatives
    where NumPy floors); window energy = sum |mono| over 3-sample
    windows of the first 195 samples; bit j = e[j] > e[j+1]; band k =
    bits 16k..16k+15."""
    need = _AFP_WIN * _AFP_NWIN
    if samples.shape[0] < need:
        raise ValueError(f"clip too short for fingerprint ({need} "
                         f"samples needed, got {samples.shape[0]})")
    mono = samples[:need].astype(np.int64).sum(axis=1)
    e = np.abs(mono).reshape(_AFP_NWIN, _AFP_WIN).sum(axis=1)
    bits = (e[:-1] > e[1:]).astype(np.int64)            # 64 bits
    shifts = np.arange(16, dtype=np.int64)
    return [int((bits[16 * k:16 * k + 16] << shifts).sum())
            for k in range(N_BANDS)]


def audiofp_signatures(ds):
    """audio corpus → Dataset (media_id, b0..b3): REAL WAV decode then
    the integer energy fingerprint."""
    from ..stages.wav import decode_wav

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        ids = t.column("media_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pays = t.column("payload").to_pylist()
        bands = np.empty((len(ids), N_BANDS), np.int64)
        for i, p in enumerate(pays):
            samples, _ = decode_wav(p)
            bands[i] = audiofp_bands(samples)
        return pa.table({"media_id": pa.array(ids),
                         "b0": pa.array(bands[:, 0]),
                         "b1": pa.array(bands[:, 1]),
                         "b2": pa.array(bands[:, 2]),
                         "b3": pa.array(bands[:, 3])})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def audiofp_pairs(ds, thr: int = 3, n_buckets: int = 16):
    """Near-duplicate audio pairs — audiofp_signatures through the
    SAME banded_pairs join the image dHash uses."""
    if thr > N_BANDS - 1:
        raise ValueError(f"thr={thr} breaks the pigeonhole guarantee "
                         f"(need thr <= {N_BANDS - 1})")
    return banded_pairs(audiofp_signatures(ds), thr=thr,
                        n_buckets=n_buckets)


def _audiofp_sig_sql(n: int = 128) -> str:
    """CTE chain re-deriving audio fingerprints from the closed-form
    samples. Ends with sigs(id, b0..b3)."""
    mono = ("SUM((((2*base+1) * (s.range*s.range*13 + s.range*7) "
            "+ c.range*97 + (s.range % 9) * delta) % 65536) - 32768)")
    return (
        f"m AS (SELECT range AS id, "
        "CASE WHEN range % 4 = 3 THEN range - 1 ELSE range END AS base, "
        "CASE WHEN range % 4 = 3 THEN 7 ELSE 0 END AS delta "
        f"FROM range({n})), "
        "md AS (SELECT id, base, delta, 1 + base % 2 AS ch FROM m), "
        f"mono AS (SELECT md.id, s.range AS i, {mono} AS v "
        f"FROM md, range({_AFP_WIN * _AFP_NWIN}) s, range(2) c "
        "WHERE c.range < md.ch GROUP BY md.id, s.range, md.base, "
        "md.delta), "
        f"en AS (SELECT id, i // {_AFP_WIN} AS w, SUM(abs(v)) AS e "
        "FROM mono GROUP BY 1, 2), "
        "bits AS (SELECT a.id, a.w AS j, "
        "CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit "
        "FROM en a JOIN en b ON b.id = a.id AND b.w = a.w + 1 "
        f"WHERE a.w < {_AFP_NWIN - 1}), "
        "sigs AS (SELECT id, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN j // 16 = {k} THEN "
            "bit << (j % 16) ELSE 0 END) AS BIGINT) AS b{0}".format(k)
            for k in range(N_BANDS)) +
        " FROM bits GROUP BY id)"
    )


def audiofp_pairs_sql(thr: int = 3, n: int = 128) -> str:
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))"
                     for k in range(N_BANDS))
    return (
        f"WITH {_audiofp_sig_sql(n)} "
        f"SELECT a.id AS id_a, b.id AS id_b, CAST({ham} AS BIGINT) "
        "AS hamming FROM sigs a JOIN sigs b ON b.id > a.id "
        f"WHERE {ham} <= {thr}"
    )


def audiofp_signatures_sql(n: int = 128) -> str:
    return (f"WITH {_audiofp_sig_sql(n)} SELECT id AS media_id, "
            "b0, b1, b2, b3 FROM sigs")
