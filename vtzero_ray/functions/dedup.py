"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide "Aggregation at scale"):
- exact: content-hash per batch (vectorized) → groupby(hash) keeps the min
  doc_id — hash-partitioned, no full-text shuffle (only hash + id move).
- MinHash/LSH: shingle→minhash per batch → explode (band, band_hash, id)
  rows → groupby(band, band_hash) emits candidate pairs → Jaccard verify.
- SimHash: 64-bit signature per batch; near-dup = hamming distance <= d via
  banded key groupby.
- embedding cosine: block-wise numpy matmul against a broadcast matrix
  (ray.put once) — no shuffle.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import tune_allocator
from ._mdhash import hash_u64  # shared md5 hash (leaf module; see _mdhash)
from .ann import sign_tensor  # acyclic now: ann only imports the leaf

log = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_md5(batch: pa.Table, column: str = "text") -> pa.Table:
    texts = batch.column(column).to_pandas()
    md5 = texts.map(lambda t: hashlib.md5(str(t).encode("utf-8")).hexdigest())
    return batch.append_column("md5", pa.array(md5, pa.string()))


def dedup_exact(ds, id_col: str = "doc_id", column: str = "text"):
    """Groups of identical content → (md5, keep_id, n_dups).

    keep_id = min id in group (first-occurrence-wins, the distributed
    analogue of vtzero's interning dedup A5, builder_impl.hpp:104-147).
    """
    from ray.data.aggregate import Count, Min

    ds = ds.map_batches(add_md5, batch_format="pyarrow",
                        fn_kwargs={"column": column})
    ds = ds.select_columns(["md5", id_col])
    agg = ds.groupby("md5").aggregate(Min(id_col), Count())
    return agg.rename_columns({f"min({id_col})": "keep_id", "count()": "n_dups"})


# ---------------------------------------------------------------------------
# shingles / minhash / LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)
_POLY_B = np.uint64(1099511628211)

# per-process token-hash cache: deterministic md5 (python's builtin hash()
# is salted per process and would break cross-worker determinism); the
# corpus vocabulary is small so the cache amortizes to O(1) per token.
# The hash is the LOWER 8 md5 bytes little-endian — exactly DuckDB's
# ``md5_number_lower`` — so every signature derived from it is
# reproducible in the SQL oracles (functions/dedup_sql.py); hash_u64
# itself lives in the _mdhash leaf so ann can share it without a cycle.


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-gram hashes (uint64) — the Jaccard universe of a document.

    Vectorized: tokens hashed once (cached), k-gram hash = polynomial
    combination over a sliding window (uint64 wraparound arithmetic).
    """
    words = text.split()
    if not words:
        return np.empty(0, np.uint64)
    tok = np.fromiter((hash_u64(w) for w in words), dtype=np.uint64, count=len(words))
    if len(words) < k:
        weights = _POLY_B ** np.arange(len(words) - 1, -1, -1, dtype=np.uint64)
        return np.array([(tok * weights).sum()], dtype=np.uint64)
    weights = _POLY_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    wins = np.lib.stride_tricks.sliding_window_view(tok, k)
    grams = (wins * weights).sum(axis=1, dtype=np.uint64)
    return np.unique(grams)


class MinHasher:
    """Per-batch minhash signatures (n_perm universal hashes), actor-pool
    stage: permutation coefficients drawn once in __init__ (seeded)."""

    def __init__(self, n_perm: int = 128, k: int = 5, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if sh.shape[0] == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (a*x + b) mod p, min over shingles — vectorized outer product
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def batch_signatures(self, texts: pa.Array) -> np.ndarray:
        """(n_docs, n_perm) signatures for a whole batch — vectorized:
        Arrow whitespace split, md5 only over the (small) vocabulary,
        flat sliding-window gram polynomial, per-doc dedup via lexsort,
        segmented min per (doc, perm). Identical outputs to
        ``signature`` (asserted in tests); short docs (< k tokens) take
        the scalar path."""
        k = self.k
        n_docs = len(texts)
        if n_docs == 0:
            return np.empty((0, self.n_perm), np.uint64)
        toks = pa.compute.utf8_split_whitespace(texts)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = np.asarray(toks.offsets)
        d = pa.compute.dictionary_encode(flat)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary.to_pylist()
        vocab_h = np.fromiter((hash_u64(w) for w in vocab),
                              dtype=np.uint64, count=len(vocab)) \
            if vocab else np.empty(0, np.uint64)
        nonempty = np.fromiter((len(w) > 0 for w in vocab),
                               dtype=bool, count=len(vocab)) \
            if vocab else np.empty(0, bool)
        counts_all = offs[1:] - offs[:-1]
        docid_all = np.repeat(np.arange(n_docs, dtype=np.int64), counts_all)
        keep = nonempty[codes] if len(vocab) else np.empty(0, bool)
        tokh = vocab_h[codes[keep]] if len(vocab) else np.empty(0, np.uint64)
        docid = docid_all[keep]
        counts = np.bincount(docid, minlength=n_docs)

        sig = np.zeros((n_docs, self.n_perm), np.uint64)
        weights = _POLY_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        N = tokh.shape[0]
        gv = np.empty(0, np.uint64)
        gd = np.empty(0, np.int64)
        if N >= k:
            g = np.zeros(N - k + 1, np.uint64)
            for j in range(k):
                g += weights[j] * tokh[j:N - k + 1 + j]
            valid = docid[:N - k + 1] == docid[k - 1:]
            gv = g[valid]
            gd = docid[:N - k + 1][valid]
        if gv.size:
            order = np.lexsort((gv, gd))
            gv = gv[order]
            gd = gd[order]
            uniq = np.ones(gv.shape[0], bool)
            uniq[1:] = (gv[1:] != gv[:-1]) | (gd[1:] != gd[:-1])
            gv = gv[uniq]
            gd = gd[uniq]
            bounds = np.searchsorted(gd, np.arange(n_docs + 1))
            has = bounds[1:] > bounds[:-1]
            starts = bounds[:-1][has]
            rows = np.flatnonzero(has)
            # one 1-D pass per permutation (2-D ufunc.reduceat measured 2x
            # the cost of the arithmetic itself)
            for p in range(self.n_perm):
                v = (gv * self.a[p] + self.b[p]) % _MERSENNE
                sig[rows, p] = np.minimum.reduceat(v, starts)
        # short docs (0 < tokens < k): single whole-doc gram — scalar path
        short = np.flatnonzero((counts > 0) & (counts < k))
        if short.size:
            texts_py = texts.to_pylist() if not isinstance(texts, list) else texts
            for i in short:
                sig[i] = self.signature(texts_py[int(i)])
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        sigs = self.batch_signatures(texts)
        sig = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(sigs).ravel()),
            self.n_perm).cast(pa.list_(pa.uint64(), self.n_perm))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": sig,
        })


_MINHASHERS: dict[tuple, "MinHasher"] = {}


def _minhash_sig_batch(batch: pa.Table, n_perm: int = 128, k: int = 5,
                       seed: int = 42) -> pa.Table:
    """Function-UDF signature stage: the MinHasher state (128 seeded RNG
    coefficients) costs microseconds to build, so a per-worker-process
    memo beats a per-query actor pool (actor startup is seconds per
    query; the shared worker pool is already warm)."""
    tune_allocator()
    key = (n_perm, k, seed)
    mh = _MINHASHERS.get(key)
    if mh is None:
        mh = _MINHASHERS[key] = MinHasher(n_perm=n_perm, k=k, seed=seed)
    return mh(batch)


def minhash_signatures(ds, n_perm: int = 128, k: int = 5, seed: int = 42):
    return ds.map_batches(_minhash_sig_batch, batch_format="pyarrow",
                          fn_kwargs={"n_perm": n_perm, "k": k, "seed": seed})


def _bands_batch(batch: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    """signatures → exploded (band, band_hash, doc_id, bhs) rows (LSH
    keys). ``bhs`` carries ALL n_bands hashes of the doc so that the
    pair stage can compute n_bands_hit and the first equal band locally
    — no cross-band dedup shuffle downstream (the 128-byte-per-row cost
    is traded against shuffling the candidate-pair set a second time,
    which for near-dup-heavy corpora is the larger side)."""
    ids = batch.column("doc_id").to_numpy()
    n = ids.shape[0]
    sig = np.stack(batch.column("sig").to_numpy(zero_copy_only=False)) if n else \
        np.empty((0, n_bands * rows_per_band), np.uint64)
    # (n_docs, n_bands) band hashes: FNV fold of the band's rows
    allh = np.zeros((n, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
        h = np.zeros(n, dtype=np.uint64)
        for r in range(rows_per_band):
            h = h * np.uint64(1099511628211) + chunk[:, r]
        allh[:, b] = h
    band_col = np.repeat(np.arange(n_bands, dtype=np.int32), n)
    return pa.table({
        "band": pa.array(band_col),
        "band_hash": pa.array(allh.T.reshape(-1)),
        "doc_id": pa.array(np.tile(ids, n_bands)),
        "bhs": pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(allh, (n_bands, 1)).reshape(-1)), n_bands),
    })


def minhash_lsh_candidates(ds, n_perm: int = 128, n_bands: int = 16, k: int = 5,
                           seed: int = 42, max_bucket: int = 1024):
    """documents → candidate near-dup pairs (doc_a < doc_b) via LSH buckets.

    ``max_bucket`` guards the O(n²) pair explosion of a degenerate bucket
    (boilerplate-heavy corpora put millions of near-identical docs in one
    LSH band bucket): buckets larger than the limit emit a STAR instead of
    a clique — every member paired with the bucket's min doc_id — so the
    pair count stays O(n) and transitive closure still recovers the dup
    cluster. The limit never triggers on the synthetic test corpus, so the
    all-pairs DuckDB oracle remains exact at test scale.
    """
    rows_per_band = n_perm // n_bands
    sigs = minhash_signatures(ds, n_perm=n_perm, k=k, seed=seed)
    bands = sigs.map_batches(_bands_batch, batch_format="pyarrow",
                             fn_kwargs={"n_bands": n_bands, "rows_per_band": rows_per_band})

    # group by a HASH BUCKET of the LSH key, not the raw key: most buckets
    # are singletons and per-group scheduling overhead dominates otherwise
    # (measured 40s → ~2s at 80k raw buckets). Within each shuffle group a
    # local pandas groupby recovers the exact buckets.
    def add_bucket(t: pa.Table) -> pa.Table:
        h = t.column("band_hash").to_numpy()
        b = t.column("band").to_numpy().astype(np.uint64)
        return t.append_column(
            "shuffle_bucket",
            pa.array(((h ^ (b * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(64)).astype(np.int32)),
        )

    bands = bands.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_n = [], [], []
        for (band, _), g in df.groupby(["band", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id", kind="stable")
            ids = g["doc_id"].to_numpy()
            bhs = np.stack(g["bhs"].to_numpy())  # (m, n_bands)
            if ids.shape[0] > max_bucket:
                # degenerate bucket → star around min id, not O(n²) clique
                ia = np.zeros(ids.shape[0] - 1, np.int64)
                ib = np.arange(1, ids.shape[0])
            else:
                ia, ib = np.triu_indices(ids.shape[0], k=1)
            # per-pair equal-band mask from the shipped band-hash vectors:
            # n_bands_hit and the FIRST equal band are local, so each pair
            # is emitted exactly once (at its first equal band) with its
            # final hit count — no cross-band dedup shuffle needed
            eq = bhs[ia] == bhs[ib]  # (n_pairs, n_bands)
            sel = eq.argmax(axis=1) == band
            out_a.append(ids[ia][sel])
            out_b.append(ids[ib][sel])
            out_n.append(eq[sel].sum(axis=1).astype(np.int64))
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "n_bands_hit": pd.Series([], dtype="int64")})
        return pd.DataFrame({"doc_a": np.concatenate(out_a).astype(np.int64),
                             "doc_b": np.concatenate(out_b).astype(np.int64),
                             "n_bands_hit": np.concatenate(out_n)})

    pairs = bands.groupby("shuffle_bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # back to arrow blocks (rename/aggregate on pandas blocks is flaky)
    return pairs.map_batches(lambda t: t, batch_format="pyarrow")


def _drop_empty_blocks(ds):
    """Normalize a Dataset to non-empty arrow blocks only.

    Ray's sort/groupby all-to-all operators emit schema-less empty
    blocks, and the map layer SKIPS the UDF on empty blocks — so a
    `map_batches(lambda t: t, batch_format="pyarrow")` cannot launder
    them, and a 0-column shard later fails `pa.Table.join` with "No
    match ... FieldRef" inside the join aggregator. This materializes
    (only refs + metadata touch the driver; blocks stay in the object
    store) and keeps blocks with rows — all of which the arrow-format
    map below HAS converted, because non-empty blocks do run the UDF.
    """
    import ray.data as rd

    mat = ds.map_batches(lambda t: t, batch_format="pyarrow").materialize()
    refs = [r for bundle in mat.iter_internal_ref_bundles()
            for r, md in bundle.blocks if md.num_rows]
    return rd.from_arrow_refs(refs)


def jaccard_pairs(texts_by_id: dict, pairs, k: int = 5) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage)."""
    rows = []
    cache = {i: _shingle_hashes(t, k) for i, t in texts_by_id.items()}
    for a, b in pairs:
        sa, sb = cache[a], cache[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).shape[0]
        union = sa.shape[0] + sb.shape[0] - inter
        rows.append({"doc_a": a, "doc_b": b,
                     "jaccard": round(inter / union, 9) if union else 0.0})
    return pd.DataFrame(rows)


def jaccard_verify(docs_ds, pairs_ds, k: int = 5, threshold: float = 0.5,
                   n_buckets: int = 64, num_partitions: int = 16):
    """DISTRIBUTED candidate-pair verification: exact n-gram Jaccard without
    materializing the corpus anywhere.

    Shape (the 100-TB-safe layout): explode each candidate pair into two
    (doc_a, doc_b, member) rows → hash-JOIN member against the documents
    table (only candidate texts move) → bucket the pair key → per-bucket
    pandas groupby computes Jaccard from the two member texts. No driver
    materialization; the corpus is touched only by the distributed join.
    """

    def explode(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        return pa.table({
            "doc_a": pa.array(np.concatenate([a, a]), pa.int64()),
            "doc_b": pa.array(np.concatenate([b, b]), pa.int64()),
            "member": pa.array(np.concatenate([a, b]), pa.int64()),
        })

    import ray.data as rd

    # Two block-level hazards poison pa.Table.join inside Ray's hash
    # shuffle: (a) a pairs_ds with ZERO candidate pairs has no schema at
    # all, and (b) sort/groupby all-to-all ops emit SCHEMA-LESS empty
    # blocks that map UDFs are skipped on (ray plan_udf_map_op.py
    # fast-path), so they reach the join as 0-column shards no matter
    # how many normalizing map_batches sit in between. Fix both at the
    # block level: union a sentinel pair (an id no corpus can hold —
    # the INNER join drops it because no document has that doc_id) so
    # the left side is never empty, then drop empty blocks by METADATA
    # (zero-copy — only refs reach the driver; candidates are
    # pair-bounded, so this materialization is not a corpus-sized one).
    sent = -(1 << 62)
    sentinel = rd.from_arrow(pa.table({
        "doc_a": pa.array([sent], pa.int64()),
        "doc_b": pa.array([sent], pa.int64()),
    }))
    pairs_keyed = _drop_empty_blocks(
        pairs_ds.select_columns(["doc_a", "doc_b"]).union(sentinel))
    members = pairs_keyed.map_batches(explode, batch_format="pyarrow")
    docs = docs_ds.select_columns(["doc_id", "text"])
    joined = members.join(docs, join_type="inner",
                          num_partitions=num_partitions,
                          on=("member",), right_on=("doc_id",))

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.uint64)
        b = t.column("doc_b").to_numpy().astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (b * np.uint64(0xC2B2AE3D27D4EB4F))
        return t.append_column("bucket",
                               pa.array((h % np.uint64(n_buckets)).astype(np.int32)))

    joined = joined.map_batches(add_bucket, batch_format="pyarrow")

    from fractions import Fraction

    thr = Fraction(threshold).limit_denominator(10**6)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_i, out_u, out_j = [], [], [], [], []
        for (a, b), g in df.groupby(["doc_a", "doc_b"], sort=False):
            by_member = dict(zip(g["member"], g["text"]))
            if len(by_member) < 2:
                continue  # a member text missing (shouldn't happen w/ inner join)
            sa = _shingle_hashes(by_member[a], k)
            sb = _shingle_hashes(by_member[b], k)
            inter = int(np.intersect1d(sa, sb, assume_unique=True).shape[0])
            union = int(sa.shape[0] + sb.shape[0] - inter)
            # EXACT integer threshold (J >= thr ⟺ inter*den >= num*union):
            # float division at the boundary would round differently than
            # the SQL oracle's integer compare
            if union and inter * thr.denominator >= thr.numerator * union:
                out_a.append(a)
                out_b.append(b)
                out_i.append(inter)
                out_u.append(union)
                out_j.append(round(inter / union, 9))
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64"),
                             "n_inter": pd.Series(out_i, dtype="int64"),
                             "n_union": pd.Series(out_u, dtype="int64"),
                             "jaccard": pd.Series(out_j, dtype="float64")})

    verified = joined.groupby("bucket").map_groups(verify, batch_format="pandas")
    return verified.map_batches(lambda t: t, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per document (token-hash bit voting), vectorized."""

    def __init__(self, seed: int = 42) -> None:
        self.seed = seed

    def signature(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        hs = np.array([hash_u64(w) for w in words], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        # int64 votes: uint64 arithmetic would wrap negatives to huge positives
        votes = bits.sum(axis=0).astype(np.int64) * 2 - hs.shape[0]
        return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _simhash_batch(batch)


def _simhash_batch(batch: pa.Table) -> pa.Table:
    """Whole-batch SimHash: one token array for ALL docs, bit matrix via
    unpackbits, per-doc bit votes via np.add.reduceat on doc offsets —
    no per-document Python loop (the per-doc path is SimHasher.signature,
    kept for the scalar API)."""
    tune_allocator()
    texts = batch.column("text").to_pylist()
    word_lists = [t.split() for t in texts]
    counts = np.array([len(w) for w in word_lists], dtype=np.int64)
    sigs = np.zeros(len(texts), dtype=np.uint64)
    nonempty = counts > 0
    if nonempty.any():
        all_words = [w for ws in word_lists for w in ws]
        toks = np.fromiter((hash_u64(w) for w in all_words),
                           dtype=np.uint64, count=len(all_words))
        # (n_tokens, 64) bit matrix: LE byte view + bitorder="little"
        # yields columns in bit index order 0..63. Widen before reduceat:
        # uint8 reduceat is ~50x slower in numpy AND overflows at >255
        # words per document. int32, not int64 — numpy's uint8->int64
        # cast takes a pathological slow path on reshape views (~600x)
        bits = np.unpackbits(toks.view(np.uint8), bitorder="little") \
            .reshape(-1, 64).astype(np.int32)
        starts = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
        ones = np.add.reduceat(bits, starts, axis=0)
        votes = ones.astype(np.int64) * 2 - counts[nonempty, None]
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sigs[nonempty] = ((votes > 0).astype(np.uint64) * weights).sum(axis=1)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(sigs),
    })


def simhash_signatures(ds):
    # plain function UDF: runs in the shared worker pool (no per-query
    # actor startup); the md5 token cache lives per worker process
    return ds.map_batches(_simhash_batch, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    if x.shape[0] == 0:
        return np.zeros(0, np.int64)
    return np.unpackbits(np.ascontiguousarray(x).view(np.uint8)) \
        .reshape(-1, 64).sum(axis=1).astype(np.int64)


def simhash_near_dups(ds, n_bands: int = 4, band_bits: int = 16,
                      max_hamming: int = 8, n_buckets: int = 64,
                      max_bucket: int = 1024):
    """SimHash banded hamming-join: signatures → 16-bit band keys → bucketed
    groupby → candidate pairs within equal-band groups → exact hamming
    verify (popcount of xor), keep <= max_hamming. The same
    explode-band/bucket-shuffle shape as MinHash-LSH. Pigeonhole: a pair
    with hamming < n_bands always shares at least one exact band, so
    recall is 1.0 up to hamming n_bands - 1; beyond that it is
    probabilistic (diffs must cluster outside some band)."""
    sigs = simhash_signatures(ds)

    def bands(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        s = t.column("simhash").to_numpy()
        mask = np.uint64((1 << band_bits) - 1)
        out_b, out_v, out_id, out_s = [], [], [], []
        for b in range(n_bands):
            out_b.append(np.full(ids.shape[0], b, np.int32))
            out_v.append((s >> np.uint64(band_bits * b)) & mask)
            out_id.append(ids)
            out_s.append(s)
        bv = np.concatenate(out_v)
        bb = np.concatenate(out_b).astype(np.uint64)
        bucket = ((bv ^ (bb * np.uint64(0x9E3779B97F4A7C15)))
                  % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "band": pa.array(np.concatenate(out_b)),
            "bv": pa.array(bv),
            "doc_id": pa.array(np.concatenate(out_id)),
            "simhash": pa.array(np.concatenate(out_s)),
            "bucket": pa.array(bucket),
        })

    banded = sigs.map_batches(bands, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b_, out_h = [], [], []
        mask = np.uint64((1 << band_bits) - 1)
        for (band, _), g in df.groupby(["band", "bv"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id", kind="stable")
            ids = g["doc_id"].to_numpy()
            sgs = g["simhash"].to_numpy().astype(np.uint64)
            if ids.shape[0] > max_bucket:
                ia = np.zeros(ids.shape[0] - 1, np.int64)
                ib = np.arange(1, ids.shape[0])
            else:
                ia, ib = np.triu_indices(ids.shape[0], k=1)
            x = sgs[ia] ^ sgs[ib]
            # Emit each pair only at its FIRST equal band: both full
            # signatures are in-group, so "is band j also equal" is
            # computable locally — the output is globally unique and the
            # cross-band dedup shuffle disappears entirely. (Uniqueness
            # holds even with the max_bucket star fallback: a pair has
            # exactly one first equal band.)
            first = np.full(x.shape[0], n_bands, np.int32)
            for j in range(n_bands - 1, -1, -1):
                eq = ((x >> np.uint64(band_bits * j)) & mask) == 0
                first[eq] = j
            sel = first == band
            ia, ib, x = ia[sel], ib[sel], x[sel]
            ham = _popcount64(x)
            keep = ham <= max_hamming
            out_a.append(ids[ia][keep])
            out_b_.append(ids[ib][keep])
            out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame({"doc_a": np.concatenate(out_a).astype(np.int64),
                             "doc_b": np.concatenate(out_b_).astype(np.int64),
                             "hamming": np.concatenate(out_h).astype(np.int64)})

    pairs = banded.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    return pairs.map_batches(lambda t: t, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _normalize_block(batch: pa.Table) -> pa.Table:
    """(vec_id, embedding) → unit-norm float64 rows (pre-pass for cosine)."""
    ids = batch.column("vec_id").to_numpy()
    mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64) \
        if len(batch) else np.empty((0, 0), np.float64)
    if mat.size:
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    dim = mat.shape[1] if mat.size else 0
    offs = (np.arange(0, (ids.shape[0] + 1) * dim, dim, dtype=np.int32)
            if dim else np.zeros(ids.shape[0] + 1, np.int32))
    emb = pa.ListArray.from_arrays(pa.array(offs),
                                   pa.array(mat.ravel(), pa.float64()))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": emb,
    })


def _block_pair_sims(ta: pa.Table, tb: pa.Table, same: bool,
                     threshold: float) -> pa.Table:
    if len(ta) == 0 or len(tb) == 0:
        return pa.table({
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })
    ids_a = ta.column("vec_id").to_numpy()
    ids_b = tb.column("vec_id").to_numpy()
    ma = np.stack(ta.column("embedding").to_numpy(zero_copy_only=False))
    mb = np.stack(tb.column("embedding").to_numpy(zero_copy_only=False))
    sims = ma @ mb.T
    keep = sims >= threshold
    ri, ci = np.nonzero(keep)
    a = ids_a[ri]
    b = ids_b[ci]
    if same:
        # diagonal block: every pair appears twice — keep one orientation
        mask = a < b
        lo, hi, s = a[mask], b[mask], sims[ri, ci][mask]
    else:
        # cross block: each pair appears once — orient by id
        mask = a != b
        a, b, s = a[mask], b[mask], sims[ri, ci][mask]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({
        "vec_a": pa.array(lo, pa.int64()),
        "vec_b": pa.array(hi, pa.int64()),
        "cosine": pa.array(np.round(s, 6), pa.float64()),
    })


def _uf_forest(a: np.ndarray, b: np.ndarray):
    """Union-find (union-by-min-id, path compression) over edge arrays →
    dict node → root. Roots are always the component's min id seen."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:          # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx            # root = smaller id
    return parent, find


def _forest_batch(batch: pa.Table) -> pa.Table:
    """One block of edges → its spanning forest as (root, node) edges.
    Components of the union of per-block forests equal components of the
    union of the original edge sets, so blocks compress independently."""
    if batch.num_columns == 0 or len(batch) == 0:  # schema-less empty block
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    a = batch.column("doc_a").to_numpy()
    b = batch.column("doc_b").to_numpy()
    parent, find = _uf_forest(a, b)
    nodes = sorted(parent)
    return pa.table({
        "doc_a": pa.array([find(n) for n in nodes], pa.int64()),
        "doc_b": pa.array(nodes, pa.int64()),
    })


def dup_clusters(pairs, fan_in=(16, 4, 1)):
    """Connected components over dup pairs → (doc_id, cluster_id) where
    cluster_id is the component's MIN doc_id (the canonical survivor).

    Shape: tree reduce. Each round repartitions the edge set into fewer
    blocks and compresses every block to its spanning forest (per-block
    union-find, ≤ one edge per distinct node), so the edge volume shrinks
    toward output size before the single final union-find task.
    Partitioning assumption at 100 TB: the final forest (one edge per
    paired doc) fits one worker; if dup-pair node counts outgrow that,
    extend ``fan_in`` with more rounds — the forests keep shrinking.
    """
    ds = pairs.select_columns(["doc_a", "doc_b"])
    for nb in fan_in:
        ds = ds.repartition(nb).map_batches(
            _forest_batch, batch_format="pyarrow", batch_size=None)

    def components(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64())})
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        parent, find = _uf_forest(a, b)
        nodes = sorted(parent)
        return pa.table({
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array([find(n) for n in nodes], pa.int64()),
        })

    # fan_in ends at 1 block → ONE output-sized task, already sorted
    return ds.map_batches(components, batch_format="pyarrow",
                          batch_size=None)


_SIGNS_MEMO: dict[tuple, np.ndarray] = {}


def _signs_memo(n_tables: int, n_bits: int, dim: int) -> np.ndarray:
    key = (n_tables, n_bits, dim)
    s = _SIGNS_MEMO.get(key)
    if s is None:
        s = _SIGNS_MEMO[key] = sign_tensor(n_tables, n_bits, dim)
    return s


def _verify_lsh_buckets(df: pd.DataFrame, threshold: float,
                        max_bucket: int) -> pd.DataFrame:
    """Per-shuffle-bucket verify task for embedding_near_dups_lsh: group
    by (table, bucket), emit each pair once at its first equal table,
    exact-cosine-verify locally. Star-truncates degenerate buckets
    LOUDLY (logged per task) — the divergence from all-pairs is modeled
    exactly by embedding_near_dups_lsh_sql, never silent."""
    out_a, out_b, out_s = [], [], []
    n_truncated = 0
    for (t, _), g in df.groupby(["t", "bucket"], sort=False):
        if len(g) < 2:
            continue
        g = g.sort_values("vec_id", kind="stable")
        ids = g["vec_id"].to_numpy()
        bhs = np.stack(g["bvec"].to_numpy())       # (m, n_tables)
        em = np.stack(g["emb"].to_numpy())         # (m, dim) unit-norm
        if ids.shape[0] > max_bucket:
            n_truncated += 1
            ia = np.zeros(ids.shape[0] - 1, np.int64)
            ib = np.arange(1, ids.shape[0])
        else:
            ia, ib = np.triu_indices(ids.shape[0], k=1)
        eq = bhs[ia] == bhs[ib]
        sel = eq.argmax(axis=1) == t               # first equal table
        ia, ib = ia[sel], ib[sel]
        if ia.shape[0] == 0:
            continue
        sims = np.round((em[ia] * em[ib]).sum(axis=1), 6)
        keep = sims >= threshold
        out_a.append(ids[ia][keep])
        out_b.append(ids[ib][keep])
        out_s.append(sims[keep])
    if n_truncated:
        # Loud, not silent (ADVICE r3): star fallback is recall-lossy —
        # pairs whose first-equal table lands in a truncated bucket are
        # dropped unless anchored at the bucket min. The SQL oracle
        # models this exactly, so driver rows stay comparable; an
        # operator seeing this at production scale should raise n_bits
        # (finer buckets) or max_bucket.
        log.warning(
            "embedding_near_dups_lsh: %d bucket(s) exceeded "
            "max_bucket=%d; star fallback engaged (recall-lossy)",
            n_truncated, max_bucket)
    if not out_a:
        return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                             "vec_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return pd.DataFrame({"vec_a": np.concatenate(out_a).astype(np.int64),
                         "vec_b": np.concatenate(out_b).astype(np.int64),
                         "cosine": np.concatenate(out_s)})


def embedding_near_dups_lsh(ds, threshold: float = 0.95, n_bits: int = 16,
                            n_tables: int = 8, max_bucket: int = 1024,
                            n_shuffle: int = 64):
    """Pairs (a<b) with cosine >= threshold via hyperplane-LSH candidate
    buckets + EXACT cosine verify — the sub-quadratic scale path (the
    all-pairs ``embedding_near_dups`` is its exact verification twin).

    Shape: one bucket groupby TOTAL. Each vector emits n_tables rows
    (table, bucket, its full bucket vector, its unit-norm embedding —
    embeddings are small, so shipping them into the bucket groupby is
    cheaper than a second pairs->vectors join); inside each bucket,
    pairs are emitted exactly once at their FIRST equal table (the
    band-vector trick from minhash_lsh_candidates) and cosine-verified
    locally. No O(B²) block-pair fan-out, no driver materialization.

    Recall is governed by (n_bits, n_tables): defaults (16, 8) suit
    production near-dup thresholds (>= 0.9); looser thresholds need
    coarser buckets (the driver query uses n_bits=4 at threshold 0.35 —
    measured recall 0.68 vs the exact twin on the test corpus).
    Degenerate buckets emit a star around the min vec_id (O(n) pairs),
    same guard as minhash_lsh_candidates.
    """
    import ray.data as rd

    from .ann import _int_buckets, quantize

    def band_rows(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "t": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int64()),
                "bvec": pa.array([], pa.list_(pa.int64(), n_tables)),
                "emb": pa.array([], pa.list_(pa.float64())),
                "shuffle_bucket": pa.array([], pa.int32()),
            })
        ids = batch.column("vec_id").to_numpy()
        raw = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        qm = quantize(raw)
        sgn = _signs_memo(n_tables, n_bits, qm.shape[1])
        b = _int_buckets(qm, sgn)  # (n_tables, N)
        nm = raw / np.clip(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12, None)
        n = ids.shape[0]
        ti = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        vi = np.tile(np.arange(n), n_tables)
        buckets = b[ti, vi]
        h = ((buckets.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             ^ (ti.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))) % np.uint64(n_shuffle)
        # list columns built straight from the flat numpy buffers — a
        # python-list construction here costs ~0.4 s per 200k rows
        bvec = pa.FixedSizeListArray.from_arrays(
            pa.array(b.T[vi].ravel()), n_tables).cast(
                pa.list_(pa.int64(), n_tables))
        dim = nm.shape[1]
        emb_vals = nm[vi].ravel()
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (vi.shape[0] + 1) * dim, dim,
                               dtype=np.int32)),
            pa.array(emb_vals))
        return pa.table({
            "vec_id": pa.array(ids[vi], pa.int64()),
            "t": pa.array(ti, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            "bvec": bvec,
            "emb": emb,
            "shuffle_bucket": pa.array(h.astype(np.int32)),
        })

    bands = ds.select_columns(["vec_id", "embedding"]).map_batches(
        band_rows, batch_format="pyarrow", batch_size=None)

    def bucket_verify(df: pd.DataFrame) -> pd.DataFrame:
        return _verify_lsh_buckets(df, threshold, max_bucket)

    pairs = bands.groupby("shuffle_bucket").map_groups(
        bucket_verify, batch_format="pandas")
    return pairs.map_batches(lambda t: t, batch_format="pyarrow")


def embedding_near_dups_lsh_sql(threshold: float, n_bits: int = 16,
                                n_tables: int = 8,
                                max_bucket: int = 1024) -> str:
    """DuckDB oracle for embedding_near_dups_lsh — identical quantization,
    md5 hyperplane signs and bucket membership (see ann.topk_lsh_sql),
    exact cosine verify on the raw embeddings.

    Models the Ray path's semantics EXACTLY, including the star guard:
    a candidate pair (a<b) is attributed to its FIRST equal table
    t* = min{t : bucket_a[t] = bucket_b[t]} and survives iff the
    (t*, bucket) group holds <= max_bucket members OR a is the group's
    min vec_id (the star anchor). With no truncated buckets the guard
    clauses are no-ops and this reduces to all bucket-sharing pairs."""
    from .ann import QSCALE

    return (
        f"WITH e AS (SELECT vec_id, embedding FROM embeddings), "
        f"comp0 AS (SELECT vec_id, unnest(embedding) AS x0,"
        f" unnest(generate_series(1, len(embedding))) AS d FROM e), "
        f"q AS (SELECT vec_id, d,"
        f" CAST(floor(x0::DOUBLE * {QSCALE} + 0.5) AS BIGINT) AS v FROM comp0), "
        f"dims AS (SELECT DISTINCT d FROM q), "
        f"signs AS (SELECT t.range AS t, j.range AS j, dims.d,"
        f" 1 - 2 * CAST(md5_number_lower(t.range::VARCHAR || ':' ||"
        f" j.range::VARCHAR || ':' || dims.d::VARCHAR) % 2 AS BIGINT) AS s"
        f" FROM range({n_tables}) t, range({n_bits}) j, dims), "
        f"bits AS (SELECT q.vec_id, s.t, s.j,"
        f" CASE WHEN SUM(q.v * s.s) > 0 THEN 1 ELSE 0 END AS bit"
        f" FROM q JOIN signs s ON s.d = q.d GROUP BY 1, 2, 3), "
        f"buckets AS (SELECT vec_id, t,"
        f" SUM(bit * CAST(power(2, j) AS BIGINT)) AS bucket"
        f" FROM bits GROUP BY 1, 2), "
        f"gstats AS (SELECT t, bucket, COUNT(*) AS cnt,"
        f" MIN(vec_id) AS mn FROM buckets GROUP BY 1, 2), "
        f"cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,"
        f" MIN(a.t) AS t_first"
        f" FROM buckets a JOIN buckets b"
        f" ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id"
        f" GROUP BY 1, 2), "
        f"kept AS (SELECT c.vec_a, c.vec_b FROM cand c"
        f" JOIN buckets ba ON ba.vec_id = c.vec_a AND ba.t = c.t_first"
        f" JOIN gstats g ON g.t = c.t_first AND g.bucket = ba.bucket"
        f" WHERE g.cnt <= {max_bucket} OR c.vec_a = g.mn) "
        f"SELECT c.vec_a, c.vec_b,"
        f" round(list_cosine_similarity(ea.embedding::DOUBLE[],"
        f" eb.embedding::DOUBLE[]), 6) AS cosine"
        f" FROM kept c JOIN e ea ON ea.vec_id = c.vec_a"
        f" JOIN e eb ON eb.vec_id = c.vec_b"
        f" WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],"
        f" eb.embedding::DOUBLE[]), 6) >= {threshold}"
    )


def embedding_near_dups(ds, threshold: float = 0.95, target_blocks: int = 32):
    """Pairs (a<b) of embeddings with cosine similarity >= threshold — EXACT.

    Distributed block-nested-loop: normalize per block, then one Ray task
    per block PAIR matmuls the two blocks read from the object store. The
    driver only handles block refs — the matrix never materializes on the
    driver or in any single task. Exact all-pairs is inherently quadratic
    in blocks; for the approximate sub-quadratic scale path see
    functions/ann.py (hyperplane-LSH buckets).
    """
    import ray
    import ray.data as rd

    norm = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _normalize_block, batch_format="pyarrow", batch_size=None)
    # bound the number of block-pair tasks: B blocks → B(B+1)/2 tasks
    norm = norm.repartition(target_blocks)
    refs = norm.to_arrow_refs()  # distributed materialization: refs only

    @ray.remote(num_cpus=1)
    def pair_task(ta, tb, same):
        return _block_pair_sims(ta, tb, same, threshold)

    out_refs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            out_refs.append(pair_task.remote(refs[i], refs[j], i == j))
    if not out_refs:
        return rd.from_arrow(pa.table({
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }))
    return rd.from_arrow_refs(out_refs)


# ---------------------------------------------------------------------------
# composed fuzzy-dedup removal (the GPT-3 / RefinedWeb recipe)
# ---------------------------------------------------------------------------


def _drops_keep_longest(clusters, docs_factory, bucket_of, drop_table,
                        n_buckets: int):
    """Drop-set under the quality-aware keep rule: per cluster, the
    member with the MOST characters survives (ties → min doc_id).

    Two bounded shuffles: (1) a doc-bucket tagged union of corpus
    (doc_id, n_chars) integer rows (kind 0) with cluster-member rows
    (kind 1) — each member's length is a local lookup; (2) a
    cluster-bucket pass where every member of a cluster is colocated,
    so the winner is one lexsort. The corpus TEXT never reshuffles."""
    import pyarrow.compute as pc

    def len_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        nch = pc.utf8_length(t.column("text")).to_numpy() \
            .astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket_of(ids), pa.int32()),
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "val": pa.array(nch),
            "kind": pa.array(np.zeros(len(t), np.int8)),
        })

    def member_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            t = pa.table({"doc_id": pa.array([], pa.int64()),
                          "cluster_id": pa.array([], pa.int64())})
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "bucket": pa.array(bucket_of(ids), pa.int32()),
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "val": pa.array(t.column("cluster_id").to_numpy()
                            .astype(np.int64)),
            "kind": pa.array(np.ones(len(t), np.int8)),
        })

    def attach_len(df):
        import pandas as pd

        lens = df[df["kind"] == 0]
        mem = df[df["kind"] == 1]
        if mem.empty:
            return pd.DataFrame({
                "bucket": pd.Series([], dtype="int32"),
                "cluster_id": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "n_chars": pd.Series([], dtype="int64")})
        lid = lens["doc_id"].to_numpy(np.int64)
        lval = lens["val"].to_numpy(np.int64)
        order = np.argsort(lid, kind="stable")
        lid, lval = lid[order], lval[order]
        mid = mem["doc_id"].to_numpy(np.int64)
        pos = np.searchsorted(lid, mid)
        if (pos >= lid.shape[0]).any() or \
                (lid[np.minimum(pos, lid.shape[0] - 1)] != mid).any():
            raise ValueError("near_dedup: cluster member missing from "
                             "corpus")
        cid = mem["val"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": bucket_of(cid).astype(np.int32),
            "cluster_id": cid, "doc_id": mid,
            "n_chars": lval[pos]})

    def winner_drops(df) -> pa.Table:
        if df.empty:
            return drop_table(np.empty(0, np.int64))
        cid = df["cluster_id"].to_numpy(np.int64)
        did = df["doc_id"].to_numpy(np.int64)
        nch = df["n_chars"].to_numpy(np.int64)
        # (cluster ASC, n_chars DESC, doc_id ASC): first row per
        # cluster is the keeper, the rest drop
        order = np.lexsort((did, -nch, cid))
        cs = cid[order]
        first = np.r_[True, cs[1:] != cs[:-1]]
        return drop_table(did[order][~first])

    lens_ds = docs_factory().map_batches(len_rows, batch_format="pyarrow",
                                         batch_size=None)
    mems = clusters.map_batches(member_rows, batch_format="pyarrow",
                                batch_size=None)
    attached = lens_ds.union(mems).groupby("bucket").map_groups(
        attach_len, batch_format="pandas")
    return attached.groupby("bucket").map_groups(
        winner_drops, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")


def near_dedup_corpus(docs_factory, n_perm: int = 128, n_bands: int = 16,
                      k: int = 5, seed: int = 42, threshold: float = 0.5,
                      n_buckets: int = 64, keep: str = "min_id"):
    """Fuzzy-dedup REMOVAL, composed from the engine's proven stages
    (the GPT-3 appendix-A / RefinedWeb recipe): MinHash+LSH candidate
    pairs → DISTRIBUTED exact n-gram Jaccard verification (keep pairs
    with J >= threshold) → connected components (tree-reduced
    union-find) → each cluster keeps ONE canonical member; every other
    member leaves the corpus.

    ``keep`` picks the canonical member: ``"min_id"`` (the GPT-3
    convention — free, the union-find label IS the min id) or
    ``"longest"`` (the RefinedWeb quality-aware rule: max character
    count, ties → min doc_id). The longest rule costs two extra bounded
    shuffles: a doc-bucket tagged union attaches each member's length
    (lengths ride as (id, len) integer rows — the corpus text never
    reshuffles), then a cluster-bucket pass picks each cluster's winner
    locally.

    ``docs_factory`` is a zero-arg callable returning a FRESH
    (doc_id, text) Dataset per call — the signature/verify/anti-join
    stages are independent consumers, and re-reading parquet is cheaper
    than re-executing shared lineage (CLAUDE.md lineage invariant).

    Scale shape: the drop-set (non-canonical cluster members) is
    pair-bounded, NOT corpus-bounded, but at 100 TB with 30-50% dup
    rates it is far too large to broadcast — so removal is ONE bucketed
    tagged-union anti-join: corpus rows and drop rows shuffle together
    on hash(doc_id) % n_buckets and each bucket filters locally. No
    driver materialization anywhere.
    """
    import pyarrow.compute as pc

    cands = minhash_lsh_candidates(docs_factory(), n_perm=n_perm,
                                   n_bands=n_bands, k=k, seed=seed)
    verified = jaccard_verify(docs_factory(), cands, k=k,
                              threshold=threshold, n_buckets=n_buckets)
    clusters = dup_clusters(verified)

    mult = np.uint64(0x9E3779B97F4A7C15)

    def _bucket_of(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * mult) >> np.uint64(40)) \
            .astype(np.int64) % n_buckets

    def tag_corpus(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "bucket": pa.array(_bucket_of(ids), pa.int32()),
            "doc_id": t.column("doc_id"),
            "text": t.column("text"),
            "is_drop": pa.array(np.zeros(len(t), np.int8)),
        })

    def _drop_table(ids: np.ndarray) -> pa.Table:
        return pa.table({
            "bucket": pa.array(_bucket_of(ids), pa.int32()),
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "text": pa.array([""] * len(ids), pa.string()),
            "is_drop": pa.array(np.ones(len(ids), np.int8)),
        })

    def to_drops(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            t = pa.table({"doc_id": pa.array([], pa.int64()),
                          "cluster_id": pa.array([], pa.int64())})
        t = t.filter(pc.not_equal(t.column("doc_id"),
                                  t.column("cluster_id")))
        return _drop_table(t.column("doc_id").to_numpy())

    corpus = docs_factory().map_batches(tag_corpus, batch_format="pyarrow",
                                        batch_size=None)
    if keep == "min_id":
        drops = clusters.map_batches(to_drops, batch_format="pyarrow",
                                     batch_size=None)
    elif keep == "longest":
        drops = _drops_keep_longest(clusters, docs_factory, _bucket_of,
                                    _drop_table, n_buckets)
    else:
        raise ValueError(f"unknown keep rule {keep!r} (min_id | longest)")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        drop_ids = df.loc[df["is_drop"] == 1, "doc_id"]
        out = df[(df["is_drop"] == 0) & ~df["doc_id"].isin(drop_ids)]
        return out[["doc_id", "text"]]

    kept = corpus.union(drops).groupby("bucket").map_groups(
        keep, batch_format="pandas")
    return kept.map_batches(lambda t: t, batch_format="pyarrow")
