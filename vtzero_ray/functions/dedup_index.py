"""Incremental exact dedup against a persisted fingerprint index — the
continuous-crawl shape: fingerprints of the corpus-so-far live in a
bucket-partitioned parquet index built ONCE; each new shard dedupes
against it by reading ONLY the buckets its own documents hash into.

This is the dedup-family member of the persisted-index pattern
(search.build_text_index / ann.build_ivf_index): at 100 TB the corpus-
so-far never rescans — the index is O(distinct documents) of 32-byte
hashes, new shards are the only data in flight, and file-level pruning
means an incremental batch touches a bounded subset of index files.

Semantics (exactly SQL-expressible — the driver oracle):
- keep a new-shard document iff its md5 is NOT in the index;
- within the new shard, first occurrence wins (min doc_id), n_dups
  counts the shard's copies — i.e. dedup_exact over the shard followed
  by an anti-join against the corpus-so-far.

Scale shape: md5 per batch (the add_md5 kernel) → per-batch combiner
(md5, min_id, cnt — only fingerprints shuffle, never text) → ONE
groupby(bucket) where each group task reads its OWN index bucket files
and anti-joins in memory. Bucket files are bounded by
|corpus| / n_buckets; raise n_buckets as the corpus grows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()
import pyarrow.compute as pc

_INDEX_VERSION = 1


def _md5_bucket_array(md5_hex: pa.Array, n_buckets: int) -> np.ndarray:
    """Bucket of each md5 hex string: first 8 hex chars as int, mod
    n_buckets. Deterministic and cheap; md5 is uniform so buckets
    balance."""
    return np.fromiter((int(m[:8], 16) % n_buckets
                        for m in md5_hex.to_pylist()),
                       np.int32, count=len(md5_hex))


def build_md5_index(ds, out_dir: str, n_buckets: int = 64,
                    column: str = "text") -> str:
    """Persist the corpus' content fingerprints: unique-per-batch md5
    rows written as parquet PARTITIONED BY bpart = int(md5[:8], 16) %
    n_buckets. ONE corpus pass, no shuffle (write_parquet
    partition_cols splits per task; cross-batch duplicate fingerprints
    are harmless — the index is a membership set).

    ATOMIC: built into a process-private temp dir, os.rename()d into
    place; meta.parquet is written LAST inside the temp dir, so
    presence implies a complete index (the build_text_index publish
    contract, functions/search.py:216)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from .dedup import add_md5

    def rows(t: pa.Table) -> pa.Table:
        tune_allocator()
        md5 = add_md5(t, column=column).column("md5")
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        uniq = pc.unique(md5)
        return pa.table({
            "md5": uniq,
            "bpart": pa.array(_md5_bucket_array(uniq, n_buckets)),
        })

    fps = ds.map_batches(rows, batch_format="pyarrow", batch_size=None)
    out_dir = os.path.normpath(out_dir)
    tmp_dir = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    try:
        fps.write_parquet(f"{tmp_dir}/md5s", partition_cols=["bpart"])
        pq.write_table(pa.table({
            "n_buckets": pa.array([n_buckets], pa.int64()),
            "version": pa.array([_INDEX_VERSION], pa.int64()),
        }), f"{tmp_dir}/meta.parquet")
        try:
            os.rename(tmp_dir, out_dir)  # atomic publish
        except OSError:
            if not os.path.isfile(f"{out_dir}/meta.parquet"):
                raise  # loser of a concurrent race is fine; else real
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def dedup_against_index(ds, index_dir: str, column: str = "text",
                        id_column: str = "doc_id"):
    """New-shard exact dedup against a persisted md5 index →
    Dataset (md5, keep_id, n_dups) of the shard's NOVEL documents
    (first shard occurrence wins; documents already fingerprinted in
    the index are dropped).

    Each bucket group's task reads ONLY its own ``bpart=`` partition
    files — untouched index buckets never leave storage (asserted in
    tests by deleting an untouched bucket)."""
    import glob

    import pyarrow.parquet as pq

    from .dedup import add_md5

    nb = int(pq.read_table(f"{index_dir}/meta.parquet")
             .column("n_buckets")[0].as_py())

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        t2 = add_md5(t, column=column)
        md5 = t2.column("md5")
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        ids = t2.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pc.dictionary_encode(md5)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(d.dictionary)
        min_id = np.full(nv, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(min_id, codes, ids)
        cnt = np.bincount(codes, minlength=nv).astype(np.int64)
        return pa.table({
            "md5": d.dictionary,
            "keep_id": pa.array(min_id),
            "n_dups": pa.array(cnt),
            "bpart": pa.array(_md5_bucket_array(d.dictionary, nb)),
        })

    def check_bucket(df):
        b = int(df["bpart"].iloc[0])
        agg = df.groupby("md5", sort=False).agg(
            keep_id=("keep_id", "min"), n_dups=("n_dups", "sum")
        ).reset_index()
        seen: set = set()
        for f in glob.glob(f"{index_dir}/md5s/bpart={b}/*.parquet"):
            seen.update(pq.read_table(f, columns=["md5"])
                        .column("md5").to_pylist())
        if seen:
            agg = agg[~agg["md5"].isin(seen)]
        return agg[["md5", "keep_id", "n_dups"]]

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return parts.groupby("bpart").map_groups(check_bucket,
                                             batch_format="pandas")


def extend_md5_index(index_dir: str, ds, column: str = "text",
                     md5_column: str | None = None) -> int:
    """Append a shard's fingerprints to a published index (the crawl
    loop: build → dedup shard → extend with its novel md5s → dedup the
    next shard). ``md5_column`` skips hashing when ``ds`` already
    carries fingerprints (e.g. dedup_against_index output).

    Files are staged by a normal partitioned write, then os.rename()d
    into the live ``bpart=`` dirs (Ray writes unique filenames, so no
    collisions). A crash mid-move leaves a PARTIALLY extended index,
    which is safe: the index is a membership set, so the worst case is
    a future shard keeping an already-seen duplicate — re-running the
    extension is idempotent for correctness (duplicate fingerprint rows
    are harmless). Returns the number of fingerprint rows appended."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from .dedup import add_md5

    nb = int(pq.read_table(f"{index_dir}/meta.parquet")
             .column("n_buckets")[0].as_py())

    def rows(t: pa.Table) -> pa.Table:
        tune_allocator()
        if md5_column is None:
            md5 = add_md5(t, column=column).column("md5")
        else:
            md5 = t.column(md5_column)
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        uniq = pc.unique(md5)
        return pa.table({
            "md5": uniq,
            "bpart": pa.array(_md5_bucket_array(uniq, nb)),
        })

    staging = f"{index_dir}.extending.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    n = 0
    try:
        fps = ds.map_batches(rows, batch_format="pyarrow", batch_size=None)
        fps.write_parquet(f"{staging}/md5s", partition_cols=["bpart"])
        for src in glob.glob(f"{staging}/md5s/bpart=*/*.parquet"):
            bdir = os.path.basename(os.path.dirname(src))
            dst_dir = f"{index_dir}/md5s/{bdir}"
            os.makedirs(dst_dir, exist_ok=True)
            n += pq.read_metadata(src).num_rows
            os.rename(src, f"{dst_dir}/{os.path.basename(src)}")
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return n


# ---------------------------------------------------------------------------
# deterministic synthetic corpus for the driver row (the synth_contacts
# precedent): real documents have no exact duplicates, so collapse texts
# onto a bounded template space; split old/new on doc_id % 3
# ---------------------------------------------------------------------------

SYNTH_MOD = 313  # > half the doc count → templates with 1 and 2 members


def synth_mod_for(n_docs: int) -> int:
    """Template modulus scaled to the corpus: max(313, 5*n//8). At
    ~500 docs this is exactly 313 (the original constant — driver
    results unchanged); at larger corpora it keeps template groups at
    1-2 members whose residues straddle the old/new doc_id%3 split.
    With a FIXED modulus, corpora big enough for >= 3 members per
    template put an old-shard member in EVERY template (313 ≡ 1 mod 3
    cycles all residues) and the incremental-dedup output saturates to
    zero rows — the sf0.1 sweep caught exactly that."""
    return max(SYNTH_MOD, n_docs * 5 // 8)


def synth_dup_corpus(ds, id_column: str = "doc_id", mod: int = SYNTH_MOD):
    """→ (doc_id, text) with text = 'crawl mirror page <doc_id % mod>'.
    Template groups of size 1 and 2 whose members straddle the old/new
    split, so the driver row exercises all three outcomes:
    dropped-as-indexed, kept with a within-shard dup, kept unique.
    Pass ``mod=synth_mod_for(n_docs)`` so the property holds at any
    scale."""

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column)
        m = pc.subtract(ids, pc.multiply(pc.divide(ids, mod), mod))
        txt = pc.binary_join_element_wise(
            "crawl mirror page ", pc.cast(m, pa.string()), "")
        return pa.table({id_column: ids, "text": txt})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Bloom-filter membership index — the memory-bounded md5-index variant
# ---------------------------------------------------------------------------
#
# The exact md5 index stores 32 bytes per distinct document (multi-TB at
# 10^11 docs); the Bloom index stores a fixed bit array per bucket
# (~1.3 bits/doc/hash). Trade: a false-positive DROPS a genuinely novel
# document (rate (k·n/m)^k, sized by log2_bits); there are NO false
# negatives — an indexed document is always dropped, so the output never
# contains a known duplicate. Pytest-anchored (approximate membership is
# not SQL-twinnable at the driver's exactness bar; the checkpoint /
# train_centroids precedent), with the exact-index comparison as the
# correctness net.

_BLOOM_K = 4  # bit positions per key: md5 hex slices [8:16][16:24][24:32][0:8]
_BLOOM_SLICES = ((8, 16), (16, 24), (24, 32), (0, 8))


def _bloom_positions(md5_hex_list: list, log2_bits: int) -> np.ndarray:
    """(n, k) bit positions from disjoint md5 hex slices — deterministic
    and independent of the [:8]-derived bucket only in the low bits, so
    mask with the bit-array size (a power of two)."""
    mask = (1 << log2_bits) - 1
    out = np.empty((len(md5_hex_list), _BLOOM_K), np.int64)
    for i, m in enumerate(md5_hex_list):
        for j, (a, b) in enumerate(_BLOOM_SLICES):
            out[i, j] = int(m[a:b], 16) & mask
    return out


def build_bloom_index(ds, out_dir: str, n_buckets: int = 64,
                      log2_bits: int = 20, column: str = "text") -> str:
    """Persist a sharded Bloom filter of the corpus' md5 fingerprints:
    per-batch (bucket, bitpos) rows (k small ints per doc — the only
    thing that shuffles) → ONE groupby(bucket) where each task ORs its
    bucket's bit array and writes it as a single binary blob. Atomic
    publish + meta-last, the build_md5_index contract."""
    import os
    import shutil

    import pandas as pd
    import pyarrow.parquet as pq

    from .dedup import add_md5

    def positions(t: pa.Table) -> pa.Table:
        tune_allocator()
        md5 = add_md5(t, column=column).column("md5")
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        uniq = pc.unique(md5).to_pylist()
        pos = _bloom_positions(uniq, log2_bits)
        b = np.repeat(_md5_bucket_array(pa.array(uniq), n_buckets),
                      _BLOOM_K) if uniq else np.empty(0, np.int32)
        return pa.table({"bucket": pa.array(b),
                         "pos": pa.array(pos.reshape(-1))})

    out_dir = os.path.normpath(out_dir)
    tmp_dir = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(f"{tmp_dir}/blooms", exist_ok=True)

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["bucket"].iloc[0])
        bits = np.zeros(1 << (log2_bits - 3), np.uint8)
        p = df["pos"].to_numpy(np.int64)
        np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        pq.write_table(pa.table({"bits": pa.array([bits.tobytes()],
                                                  pa.binary())}),
                       f"{tmp_dir}/blooms/bloom_{b}.parquet")
        return pd.DataFrame({"bucket": [b]})

    try:
        (ds.map_batches(positions, batch_format="pyarrow", batch_size=None)
         .groupby("bucket").map_groups(write_bucket, batch_format="pandas")
         .materialize())
        pq.write_table(pa.table({
            "n_buckets": pa.array([n_buckets], pa.int64()),
            "log2_bits": pa.array([log2_bits], pa.int64()),
            "version": pa.array([_INDEX_VERSION], pa.int64()),
        }), f"{tmp_dir}/meta.parquet")
        try:
            os.rename(tmp_dir, out_dir)
        except OSError:
            if not os.path.isfile(f"{out_dir}/meta.parquet"):
                raise
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def _bloom_meta(index_dir: str):
    import pyarrow.parquet as pq

    m = pq.read_table(f"{index_dir}/meta.parquet")
    return (int(m.column("n_buckets")[0].as_py()),
            int(m.column("log2_bits")[0].as_py()))


def dedup_against_bloom(ds, index_dir: str, column: str = "text",
                        id_column: str = "doc_id"):
    """dedup_against_index's memory-bounded twin: a new-shard doc is
    kept iff ANY of its k Bloom bits is unset (definitely novel) — an
    indexed doc is always dropped (no false negatives); a false positive
    drops a novel doc at the sized rate. Same output schema
    (md5, keep_id, n_dups); each bucket task reads ONLY its own 128 KiB
    blob (for log2_bits=20)."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from .dedup import add_md5

    nb, log2_bits = _bloom_meta(index_dir)

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        t2 = add_md5(t, column=column)
        md5 = t2.column("md5")
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        ids = t2.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pc.dictionary_encode(md5)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(d.dictionary)
        min_id = np.full(nv, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(min_id, codes, ids)
        cnt = np.bincount(codes, minlength=nv).astype(np.int64)
        pos = _bloom_positions(d.dictionary.to_pylist(), log2_bits)
        cols = {"md5": d.dictionary,
                "keep_id": pa.array(min_id),
                "n_dups": pa.array(cnt),
                "bucket": pa.array(_md5_bucket_array(d.dictionary, nb))}
        for j in range(_BLOOM_K):
            cols[f"p{j}"] = pa.array(pos[:, j])
        return pa.table(cols)

    def check_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["bucket"].iloc[0])
        agg = {"keep_id": ("keep_id", "min"), "n_dups": ("n_dups", "sum")}
        agg.update({f"p{j}": (f"p{j}", "first") for j in range(_BLOOM_K)})
        g = df.groupby("md5", sort=False).agg(**agg).reset_index()
        path = f"{index_dir}/blooms/bloom_{b}.parquet"
        if os.path.isfile(path):
            bits = np.frombuffer(
                pq.read_table(path).column("bits")[0].as_py(), np.uint8)
            hit = np.ones(len(g), bool)
            for j in range(_BLOOM_K):
                p = g[f"p{j}"].to_numpy(np.int64)
                hit &= (bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
            g = g[~hit]
        return g[["md5", "keep_id", "n_dups"]]

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return parts.groupby("bucket").map_groups(check_bucket,
                                              batch_format="pandas")


def extend_bloom_index(index_dir: str, ds, column: str = "text",
                       md5_column: str | None = None) -> None:
    """OR a shard's fingerprint bits into the live bucket blobs (write
    to a temp file, os.rename over — readers see the old or new blob,
    never a torn one). A crash mid-way under-extends a membership set:
    retry is idempotent, exactly the extend_md5_index contract."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from .dedup import add_md5

    nb, log2_bits = _bloom_meta(index_dir)

    def positions(t: pa.Table) -> pa.Table:
        tune_allocator()
        if md5_column is None:
            md5 = add_md5(t, column=column).column("md5")
        else:
            md5 = t.column(md5_column)
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        uniq = pc.unique(md5).to_pylist()
        pos = _bloom_positions(uniq, log2_bits)
        b = np.repeat(_md5_bucket_array(pa.array(uniq), nb), _BLOOM_K) \
            if uniq else np.empty(0, np.int32)
        return pa.table({"bucket": pa.array(b),
                         "pos": pa.array(pos.reshape(-1))})

    def or_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["bucket"].iloc[0])
        path = f"{index_dir}/blooms/bloom_{b}.parquet"
        bits = np.frombuffer(
            pq.read_table(path).column("bits")[0].as_py(), np.uint8
        ).copy() if os.path.isfile(path) else \
            np.zeros(1 << (log2_bits - 3), np.uint8)
        p = df["pos"].to_numpy(np.int64)
        np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(pa.table({"bits": pa.array([bits.tobytes()],
                                                  pa.binary())}), tmp)
        os.rename(tmp, path)
        return pd.DataFrame({"bucket": [b]})

    (ds.map_batches(positions, batch_format="pyarrow", batch_size=None)
     .groupby("bucket").map_groups(or_bucket, batch_format="pandas")
     .materialize())


# ---------------------------------------------------------------------------
# incremental NEAR-dup: persisted MinHash band-bucket index
# ---------------------------------------------------------------------------

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _band_bpart(t: pa.Table, n_buckets: int) -> pa.Table:
    """Index/probe partition of an LSH band row: hash-fold of
    (band, band_hash) — the minhash_lsh_candidates shuffle_bucket rule,
    so build and probe colocate identical keys by construction."""
    h = t.column("band_hash").to_numpy()
    b = t.column("band").to_numpy().astype(np.uint64)
    bp = ((h ^ (b * _GOLDEN)) % np.uint64(n_buckets)).astype(np.int32)
    return t.append_column("bpart", pa.array(bp))


def _band_rows(ds, n_perm: int, n_bands: int, k: int, seed: int,
               n_buckets: int):
    from .dedup import _bands_batch, minhash_signatures

    sigs = minhash_signatures(ds, n_perm=n_perm, k=k, seed=seed)
    bands = sigs.map_batches(
        _bands_batch, batch_format="pyarrow",
        fn_kwargs={"n_bands": n_bands,
                   "rows_per_band": n_perm // n_bands})
    return bands.map_batches(_band_bpart, batch_format="pyarrow",
                             fn_kwargs={"n_buckets": n_buckets})


def build_band_index(ds, out_dir: str, n_perm: int = 128,
                     n_bands: int = 16, k: int = 5, seed: int = 42,
                     n_buckets: int = 64) -> str:
    """Persist the corpus' MinHash LSH band rows (band, band_hash,
    doc_id, bhs) partitioned by the band-bucket hash — the near-dup
    analogue of build_md5_index. ``bhs`` (every band hash of the doc)
    rides along so probes can apply the first-equal-band pair-dedup rule
    locally (the _bands_batch trade). Atomic publish, meta-last."""
    import os
    import shutil

    import pyarrow.parquet as pq

    rows = _band_rows(ds, n_perm, n_bands, k, seed, n_buckets)
    out_dir = os.path.normpath(out_dir)
    tmp_dir = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    try:
        rows.write_parquet(f"{tmp_dir}/bands", partition_cols=["bpart"])
        pq.write_table(pa.table({
            "n_buckets": pa.array([n_buckets], pa.int64()),
            "n_perm": pa.array([n_perm], pa.int64()),
            "n_bands": pa.array([n_bands], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "seed": pa.array([seed], pa.int64()),
            "version": pa.array([_INDEX_VERSION], pa.int64()),
        }), f"{tmp_dir}/meta.parquet")
        try:
            os.rename(tmp_dir, out_dir)
        except OSError:
            if not os.path.isfile(f"{out_dir}/meta.parquet"):
                raise
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def _band_meta(index_dir: str) -> dict:
    import pyarrow.parquet as pq

    m = pq.read_table(f"{index_dir}/meta.parquet")
    return {c: int(m.column(c)[0].as_py()) for c in m.column_names}


def near_dup_candidates_vs_index(ds, index_dir: str,
                                 max_bucket: int = 1024):
    """New-shard near-dup candidates against a persisted band index →
    Dataset (doc_a, doc_b, n_bands_hit): every LSH candidate pair with
    AT LEAST ONE new-shard member (old-old pairs were known when the
    index was built). Pairs are emitted once, at their first equal band
    (the minhash_lsh_candidates rule — both members' full band vectors
    are local). Each bucket's task reads ONLY its own ``bpart=``
    partition files, pre-filtered to the (band, band_hash) keys the new
    shard actually probes."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    meta = _band_meta(index_dir)

    probes = _band_rows(ds, meta["n_perm"], meta["n_bands"], meta["k"],
                        meta["seed"], meta["n_buckets"])

    def probe_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tune_allocator()
        bp = int(df["bpart"].iloc[0])
        keys = df[["band", "band_hash"]].drop_duplicates()
        olds = []
        for f in glob.glob(f"{index_dir}/bands/bpart={bp}/*.parquet"):
            o = pq.read_table(
                f, columns=["band", "band_hash", "doc_id", "bhs"]
            ).to_pandas()
            # keep only keys the new shard probes
            olds.append(o.merge(keys, on=["band", "band_hash"]))
        new = df[["band", "band_hash", "doc_id", "bhs"]].copy()
        new["is_new"] = True
        if olds:
            old = pd.concat(olds, ignore_index=True)
            old["is_new"] = False
            allr = pd.concat([old, new], ignore_index=True)
        else:
            allr = new
        out_a, out_b, out_n = [], [], []
        for (band, _), g in allr.groupby(["band", "band_hash"],
                                         sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id", kind="stable")
            ids = g["doc_id"].to_numpy()
            isnew = g["is_new"].to_numpy(bool)
            bhs = np.stack(g["bhs"].to_numpy())
            if ids.shape[0] > max_bucket:
                ia = np.zeros(ids.shape[0] - 1, np.int64)
                ib = np.arange(1, ids.shape[0])
            else:
                ia, ib = np.triu_indices(ids.shape[0], k=1)
            eq = bhs[ia] == bhs[ib]
            sel = (eq.argmax(axis=1) == band) & (isnew[ia] | isnew[ib])
            out_a.append(ids[ia][sel])
            out_b.append(ids[ib][sel])
            out_n.append(eq[sel].sum(axis=1).astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "n_bands_hit": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a).astype(np.int64),
             "doc_b": np.concatenate(out_b).astype(np.int64),
             "n_bands_hit": np.concatenate(out_n)})

    pairs = probes.groupby("bpart").map_groups(probe_bucket,
                                               batch_format="pandas")
    return pairs.map_batches(lambda t: t, batch_format="pyarrow")


def extend_band_index(index_dir: str, ds) -> int:
    """Append a shard's band rows to a published band index (ALL its
    docs, not just novel ones — future probes must see every fingerprint
    of the corpus-so-far). Same staged-write + per-file-rename mechanics
    and crash-retry idempotence as extend_md5_index. Returns rows
    appended."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    meta = _band_meta(index_dir)
    rows = _band_rows(ds, meta["n_perm"], meta["n_bands"], meta["k"],
                      meta["seed"], meta["n_buckets"])
    staging = f"{index_dir}.extending.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    n = 0
    try:
        rows.write_parquet(f"{staging}/bands", partition_cols=["bpart"])
        for src in glob.glob(f"{staging}/bands/bpart=*/*.parquet"):
            bdir = os.path.basename(os.path.dirname(src))
            dst_dir = f"{index_dir}/bands/{bdir}"
            os.makedirs(dst_dir, exist_ok=True)
            n += pq.read_metadata(src).num_rows
            os.rename(src, f"{dst_dir}/{os.path.basename(src)}")
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return n


def minhash_incremental_sql(n_perm: int = 128, n_bands: int = 16,
                            k: int = 5, seed: int = 42) -> str:
    """DuckDB twin of build_band_index(old) |>
    near_dup_candidates_vs_index(new) with old = doc_id % 3 == 0:
    the full-corpus candidate CTEs (dedup_sql._minhash_ctes — identical
    signatures/band hashes) filtered to pairs with >= 1 new member."""
    from .dedup_sql import _minhash_ctes

    ctes = _minhash_ctes(n_perm, n_bands, k, seed)
    return (f"WITH {ctes}"
            f"final AS (SELECT doc_a, doc_b, COUNT(*) AS n_bands_hit"
            f" FROM cands WHERE NOT (doc_a % 3 = 0 AND doc_b % 3 = 0)"
            f" GROUP BY 1, 2) SELECT * FROM final")


def dedup_incremental_sql(table: str = "documents",
                          id_column: str = "doc_id") -> str:
    """DuckDB twin of synth_dup_corpus |> split |> build_md5_index(old)
    |> dedup_against_index(new): DuckDB's md5() equals hashlib md5
    hexdigest (the dedup_exact oracle precedent)."""
    return (
        # modulus mirrors synth_mod_for(): max(313, 5*n//8)
        f"WITH nn AS (SELECT greatest({SYNTH_MOD}, COUNT(*) * 5 // 8) "
        f"AS m FROM {table}), "
        f"s AS (SELECT {id_column} AS doc_id, "
        f"'crawl mirror page ' || ({id_column} % nn.m) AS t "
        f"FROM {table}, nn), "
        "old AS (SELECT md5(t) AS m FROM s WHERE doc_id % 3 = 0), "
        "new AS (SELECT doc_id, md5(t) AS md5 FROM s WHERE doc_id % 3 <> 0) "
        "SELECT md5, CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "CAST(count(*) AS BIGINT) AS n_dups FROM new "
        "WHERE md5 NOT IN (SELECT m FROM old) GROUP BY 1"
    )
