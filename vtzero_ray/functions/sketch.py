"""Mergeable sketches for distributed aggregates (ray_guide: emit one
serialized sketch per batch, merge in a tiny second stage).

HyperLogLog (p-bit register array, standard bias-corrected estimator):
deterministic (blake2b hashes), exact merge = elementwise max — the shape
every distributed sketch follows, so partial sketches stream through a
small groupby instead of shuffling raw values.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> None:
        """Add 64-bit hashes (vectorized)."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of rest + 1, capped
        lz = np.zeros(h.shape[0], dtype=np.uint8)
        cur = rest.copy()
        mask_top = np.uint64(1) << np.uint64(63)
        alive = np.ones(h.shape[0], dtype=bool)
        for _ in range(64 - self.p + 1):
            top = (cur & mask_top) == 0
            inc = alive & top
            if not inc.any():
                break
            lz[inc] += 1
            alive &= top
            cur <<= np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, values, hash: str = "blake2b") -> None:
        """hash="md5" uses the lower-8-md5-bytes-little-endian hash
        (DuckDB ``md5_number_lower``) so the whole sketch is reproducible
        in SQL; "blake2b" is the (faster) default for library use."""
        if hash == "md5":
            gen = (int.from_bytes(hashlib.md5(
                (v if isinstance(v, bytes) else str(v).encode())
            ).digest()[8:], "little") for v in values)
        else:
            gen = (int.from_bytes(hashlib.blake2b(
                (v if isinstance(v, bytes) else str(v).encode()),
                digest_size=8).digest(), "little") for v in values)
        hs = np.fromiter(gen, dtype=np.uint64, count=len(values))
        self.add_hashes(hs)

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def facts(self) -> dict:
        """Integer-pinned register facts + the estimate, computed so a
        DuckDB oracle (sketch_sql.hll_facts_sql) reproduces every column
        exactly: all inputs to the one float expression are exact
        integers, ln/floor mirror DuckDB's libm calls.
        """
        regs = self.registers
        nz_idx = np.nonzero(regs)[0]
        n_zero = int(self.m - nz_idx.shape[0])
        register_sum = int(regs.sum(dtype=np.int64))
        payload = ",".join(
            f"{int(i)}:{int(regs[i])}" for i in nz_idx)
        checksum = hashlib.md5(payload.encode()).hexdigest()
        z_total = n_zero * (1 << 63) + sum(
            1 << (63 - int(regs[i])) for i in nz_idx)
        m = float(self.m)
        alpha_c = 0.7213 / (1 + 1.079 / m) * m * m * float(1 << 63)
        est = alpha_c / float(z_total)
        if est <= 2.5 * m and n_zero > 0:
            est = m * math.log(self.m / n_zero)
        return {
            "column": None,  # caller fills
            "n_zero_registers": n_zero,
            "register_sum": register_sum,
            "register_checksum": checksum,
            "approx_distinct": int(math.floor(est + 0.5)),
        }

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        return cls(b[0], np.frombuffer(b[1:], dtype=np.uint8).copy())


def approx_distinct(ds, column: str, p: int = 12, hash: str = "blake2b"):
    """Distributed approximate distinct count: per-batch partial HLL
    sketches → driver-side merge of ~#blocks tiny blobs (no value shuffle).

    Returns a 1-row pandas DataFrame of integer-pinned sketch facts
    (column, n_zero_registers, register_sum, register_checksum,
    approx_distinct) — with hash="md5" every column is reproducible by
    the DuckDB oracle in sketch_sql.hll_facts_sql.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_strings(batch.column(column).to_pylist(), hash=hash)
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = HLL(p)
    for row in parts.take_all():
        merged = merged.merge(HLL.from_bytes(row["sketch"]))
    facts = merged.facts()
    facts["column"] = column
    return pd.DataFrame({k: [v] for k, v in facts.items()})


# ---------------------------------------------------------------------------
# count-min sketch: mergeable heavy-hitter / point-frequency estimates
# ---------------------------------------------------------------------------


class CMS:
    """Count-min sketch over whitespace tokens.

    Same reproducibility contract as HLL: the hash is DuckDB
    ``md5_number_lower`` and row ``r``'s bucket is bit-slice
    ``(h >> 16*r) & (2^w_bits - 1)`` — pure integer ops both engines
    compute identically, so every counter (and therefore every point
    estimate) is exact in the SQL twin (sketch_sql.cms_est_sql). Merge is
    elementwise int64 addition: order-independent, bit-deterministic
    under any Ray block scheduling. depth <= 4 (4 disjoint-ish 16-bit
    slices of the 64-bit hash), w_bits <= 16.
    """

    __slots__ = ("w_bits", "depth", "counters")

    def __init__(self, w_bits: int = 12, depth: int = 4,
                 counters: np.ndarray | None = None) -> None:
        if not (1 <= depth <= 4 and 1 <= w_bits <= 16):
            raise ValueError(f"bad CMS shape depth={depth} w_bits={w_bits}")
        self.w_bits = w_bits
        self.depth = depth
        self.counters = (counters if counters is not None
                         else np.zeros((depth, 1 << w_bits), np.int64))

    @staticmethod
    def hash64(values) -> np.ndarray:
        """lower-8-md5-bytes little-endian = DuckDB md5_number_lower."""
        gen = (int.from_bytes(hashlib.md5(
            (v if isinstance(v, bytes) else str(v).encode())
        ).digest()[8:], "little") for v in values)
        return np.fromiter(gen, dtype=np.uint64, count=len(values))

    def _buckets(self, h: np.ndarray) -> np.ndarray:
        mask = np.uint64((1 << self.w_bits) - 1)
        return np.stack([((h >> np.uint64(16 * r)) & mask).astype(np.int64)
                         for r in range(self.depth)])

    def add(self, tokens, counts: np.ndarray) -> None:
        """Add distinct tokens with their counts (hash the vocabulary
        once, not every occurrence)."""
        if not len(tokens):
            return
        b = self._buckets(self.hash64(tokens))
        c = np.asarray(counts, np.int64)
        for r in range(self.depth):
            np.add.at(self.counters[r], b[r], c)

    def merge(self, other: "CMS") -> "CMS":
        return CMS(self.w_bits, self.depth, self.counters + other.counters)

    def estimate(self, tokens) -> np.ndarray:
        """Point estimates: min over rows of the token's bucket counter
        (>= true count; == bucket collision mass for absent tokens)."""
        if not len(tokens):
            return np.empty(0, np.int64)
        b = self._buckets(self.hash64(tokens))
        return np.stack([self.counters[r][b[r]]
                         for r in range(self.depth)]).min(axis=0)

    def to_bytes(self) -> bytes:
        return bytes([self.w_bits, self.depth]) + self.counters.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CMS":
        w_bits, depth = b[0], b[1]
        counters = np.frombuffer(b[2:], np.int64).reshape(depth, 1 << w_bits)
        return cls(w_bits, depth, counters.copy())


def _split_tokens(batch: "pa.Table", column: str):
    """Arrow whitespace split, empty tokens dropped (byte-equal to the
    SQL twin's regexp_split_to_array(trim(text),'\\s+') + token != '')
    → (vocab list, per-vocab int64 counts, total token count)."""
    import pyarrow.compute as pc

    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    if len(flat) == 0:
        return [], np.empty(0, np.int64), 0
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary.to_pylist()
    counts = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
    keep = [i for i, v in enumerate(vocab) if v]
    if len(keep) != len(vocab):
        vocab = [vocab[i] for i in keep]
        counts = counts[np.asarray(keep, np.int64)]
    return vocab, counts, int(counts.sum())


def cms_token_est(ds, probes, column: str = "text",
                  w_bits: int = 12, depth: int = 4):
    """Distributed token-frequency estimation: per-batch partial CMS
    over the batch vocabulary (the corpus never shuffles; only
    depth*2^w_bits-int64 blobs leave each task) → driver-side merge of
    ~#blocks sketches → point estimates for the fixed probe list.

    Returns a pandas DataFrame (token, est, total_tokens): est is the
    CMS upper bound (exact integer, reproduced by the SQL twin
    sketch_sql.cms_est_sql), total_tokens the exact corpus token count.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        tune_allocator()
        vocab, counts, total = _split_tokens(batch, column)
        c = CMS(w_bits, depth)
        c.add(vocab, counts)
        return pa.table({"sketch": pa.array([c.to_bytes()], pa.binary()),
                         "n_tokens": pa.array([total], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = CMS(w_bits, depth)
    total = 0
    for row in parts.take_all():
        merged = merged.merge(CMS.from_bytes(row["sketch"]))
        total += int(row["n_tokens"])
    probes = list(probes)
    return pd.DataFrame({
        "token": probes,
        "est": merged.estimate(probes).astype(np.int64),
        "total_tokens": np.full(len(probes), total, np.int64),
    })


# ---------------------------------------------------------------------------
# exact distributed quantiles via mergeable histograms
# ---------------------------------------------------------------------------


def _len_hist_partial(batch: "pa.Table") -> "pa.Table":
    """Per-batch histogram combiner: (lang, length, cnt) partials — the
    corpus never shuffles, only distinct (lang, length) rows do (bounded
    by the length distribution, not the row count)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    lens = pc.utf8_length(batch.column("text")).to_numpy().astype(np.int64)
    langs = batch.column("lang").to_pylist()
    df = pd.DataFrame({"lang": langs, "length": lens})
    part = df.groupby(["lang", "length"], sort=False).size().reset_index(name="cnt")
    return pa.table({"lang": pa.array(part["lang"], pa.string()),
                     "length": pa.array(part["length"].to_numpy(np.int64)),
                     "cnt": pa.array(part["cnt"].to_numpy(np.int64))})


def length_quantiles(ds, ps=(0.1, 0.5, 0.9, 0.99)):
    """Exact per-language text-length quantiles from merged histograms:
    (lang, p, len_q). Matches DuckDB quantile_disc exactly — sorted
    v[ceil(p*n)-1], read off the cumulative histogram. Same mergeable-
    sketch shape as the HLL operator; exact because the domain (lengths)
    is discrete and bounded."""
    import math

    import numpy as np
    import pandas as pd

    parts = ds.map_batches(_len_hist_partial, batch_format="pyarrow")
    totals = parts.groupby(["lang", "length"]).sum("cnt")
    totals = totals.map_batches(
        lambda t: t.rename_columns(
            [c if c != "sum(cnt)" else "cnt" for c in t.column_names]),
        batch_format="pyarrow")

    ps = tuple(float(p) for p in ps)

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("length", kind="stable")
        cum = df["cnt"].to_numpy(np.int64).cumsum()
        lengths = df["length"].to_numpy(np.int64)
        n = int(cum[-1])
        vals = [int(lengths[np.searchsorted(cum, max(math.ceil(p * n), 1))])
                for p in ps]
        return pd.DataFrame({"lang": [df["lang"].iloc[0]] * len(ps),
                             "p": np.array(ps, np.float64),
                             "len_q": np.array(vals, np.int64)})

    out = totals.groupby("lang").map_groups(per_lang, batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — mergeable frequent-items summary
# ---------------------------------------------------------------------------


def _mg_compress(toks: np.ndarray, cnts: np.ndarray, k: int):
    """Compress exact (token, count) pairs to <= k Misra-Gries counters:
    subtract the (k+1)-th largest count from everything and drop the
    non-positive remainder (Agarwal et al. 2012, "Mergeable Summaries").
    Returns (toks, cnts, decrement)."""
    if len(cnts) <= k:
        return toks, cnts, 0
    dec = int(np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1])
    keep = cnts > dec
    return toks[keep], cnts[keep] - dec, dec


def heavy_hitters(ds, k: int = 50, column: str = "text"):
    """Distributed Misra-Gries top-token summary → Dataset (token,
    est_lo, est_hi, rnk) of <= k tokens, plus the guarantee that makes
    sketches worth shipping at 100 TB: for every token,
    ``est_lo <= true_count <= est_hi`` and every token whose true count
    exceeds the global decrement mass (<= n_tokens / (k+1)) IS present.

    Shape: per-batch exact counts → LOCAL compress to k counters (only
    k rows + 2 scalars leave each task, vs a full vocabulary for the
    exact ngram_topk path) → ONE output-sized repartition(1) merge task
    (union-add, final compress, rank). The summary CONTENT below the
    guarantee line legitimately depends on batching (the MG error
    model), so tests assert the guarantees, not bit-equality — the
    bloom-index precedent; ngram_topk ★ is the exact driver twin.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vocab, cnts, total = _split_tokens(batch, column)
        if total == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "dec": pa.array([], pa.int64())})
        tt = np.asarray(vocab, dtype=object)
        tt, cnts, dec = _mg_compress(tt, cnts, k)
        n = len(tt)
        return pa.table({"token": pa.array(tt, pa.string()),
                         "n": pa.array(cnts),
                         "dec": pa.array([dec] + [0] * (n - 1), pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        total_dec = int(df["dec"].sum())
        agg = df.groupby("token", sort=False)["n"].sum().reset_index()
        tt = agg["token"].to_numpy(object)
        cc = agg["n"].to_numpy(np.int64)
        tt, cc, dec = _mg_compress(tt, cc, k)
        total_dec += dec
        out = pd.DataFrame({"token": tt, "est_lo": cc})
        out = out.sort_values(["est_lo", "token"],
                              ascending=[False, True], kind="stable") \
            .reset_index(drop=True)
        out["est_hi"] = (out["est_lo"] + total_dec).astype(np.int64)
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


# ---------------------------------------------------------------------------
# KLL quantile sketch — mergeable approximate quantiles
# ---------------------------------------------------------------------------


class KLL:
    """KLL-style quantile sketch (Karnin-Lang-Liberty 2016) with
    DETERMINISTIC compaction: level-l items carry weight 2^l; when a
    level buffer exceeds capacity it is sorted and its EVEN-index items
    promote (the random-offset variant trades this for tighter
    constants; determinism is this repo's oracle invariant, and the
    worst-case rank error stays O(n/k) — asserted in tests). Merge =
    levelwise concatenation + the same compaction, so partial sketches
    stream through the engine like HLL/CMS."""

    __slots__ = ("k", "levels")

    def __init__(self, k: int = 256) -> None:
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.int64)]

    def _cap(self, level: int) -> int:
        # geometrically decaying capacities, floor 8
        c = int(self.k * (2.0 / 3.0) ** (len(self.levels) - 1 - level))
        return max(c, 8)

    def _compact(self) -> None:
        lv = self.levels
        i = 0
        while i < len(lv):
            if len(lv[i]) <= self._cap(i):
                i += 1
                continue
            buf = np.sort(lv[i], kind="stable")
            # compact an EVEN count (weight conservation): an odd
            # buffer leaves its largest item behind at this level
            even = len(buf) & ~1
            promote = buf[:even][::2]
            lv[i] = buf[even:].copy()
            if i + 1 == len(lv):
                lv.append(np.empty(0, np.int64))
            lv[i + 1] = np.concatenate([lv[i + 1], promote])
            i += 1

    def add(self, values: np.ndarray) -> None:
        self.levels[0] = np.concatenate(
            [self.levels[0], np.asarray(values, np.int64)])
        self._compact()

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.int64))
        for i, buf in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self._compact()
        return self

    def n(self) -> int:
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def quantile(self, p: float) -> int:
        """quantile_disc semantics on the weighted items: the smallest
        value whose cumulative weight reaches ceil(p * n)."""
        import math

        vals = np.concatenate(self.levels)
        wts = np.concatenate([np.full(len(b), 1 << i, np.int64)
                              for i, b in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(wts[order])
        target = max(math.ceil(p * cum[-1]), 1)
        return int(vals[order][np.searchsorted(cum, target)])

    def to_table(self) -> pa.Table:
        lvl = np.concatenate([np.full(len(b), i, np.int64)
                              for i, b in enumerate(self.levels)])
        return pa.table({"level": pa.array(lvl),
                         "value": pa.array(np.concatenate(self.levels))})

    @classmethod
    def from_table(cls, t: pa.Table, k: int = 256) -> "KLL":
        s = cls(k)
        lvl = t.column("level").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        top = int(lvl.max(initial=0))
        s.levels = [val[lvl == i].copy() for i in range(top + 1)]
        return s


def kll_quantiles(ds, column: str, ps=(0.1, 0.5, 0.9, 0.99),
                  k: int = 256):
    """Distributed KLL quantiles of an int64 column → Dataset (p, q).
    Per-batch sketches (bounded ~k items regardless of batch size) →
    ONE output-sized merge task; the exact-histogram twin
    (length_quantiles) bounds the rank error in tests."""

    def partial(t: pa.Table) -> pa.Table:
        s = KLL(k)
        s.add(t.column(column).to_numpy(zero_copy_only=False)
              .astype(np.int64))
        return s.to_table()

    def merge(t: pa.Table) -> pa.Table:
        s = KLL.from_table(t, k)   # concat of partials == levelwise merge
        s._compact()
        return pa.table({"p": pa.array(list(ps), pa.float64()),
                         "q": pa.array([s.quantile(p) for p in ps],
                                       pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)
