"""Sequence packing for training-data prep: assign every document a
GLOBAL token offset (exclusive prefix sum of token counts in doc_id
order) and the fixed-length context window it starts in.

This is the distributed prefix-sum pattern — the one aggregate shape the
engine didn't have yet. No single task may see the whole corpus, yet
every row's output depends on the sum of everything before it. Two-level
scan:

1. RANGE PARTIALS: rid = doc_id // range_width buckets the id space into
   contiguous ranges. A per-batch integer combiner emits (rid, partial
   token sum) — order-independent int64 adds, so the merged per-range
   totals are bit-deterministic under any block scheduling. The reduced
   frame is O(n_docs / range_width) and the driver turns it into BASE
   offsets with one exclusive cumsum (at 10^12 docs pick range_width so
   this stays ~10^6 rows; a third scan level would lift that too, but
   two levels already cover 10^13 docs at range_width 2^20).
2. IN-RANGE SCAN: ONE bounded shuffle co-locates each range
   (groupby(rid) — rid IS the bucketed key, per the repo's
   high-cardinality-groupby invariant), sorts the group by doc_id,
   local exclusive cumsum + broadcast base offset = global offset.

Everything is int64 arithmetic → the DuckDB window-cumsum oracle
(pack_sequences_sql) hash-matches exactly.

Token counts reuse textstats._token_counts — the oracle-proven
whitespace tokenizer (len(split(trim(text))), empty → 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_sequences(ds, seq_len: int = 2048, range_width: int = 4096,
                   column: str = "text", id_column: str = "doc_id"):
    """→ Dataset(doc_id, n_tokens, t_offset, seq_id, seq_pos): t_offset =
    exclusive prefix sum of n_tokens in doc_id order; seq_id / seq_pos =
    the context window (of seq_len tokens) and position the doc starts
    at under greedy concat-then-chunk packing."""
    import pyarrow.compute as pc
    import ray

    from .textstats import _token_counts

    def with_counts(t: pa.Table) -> pa.Table:
        stripped = pc.utf8_trim_whitespace(t.column(column))
        if isinstance(stripped, pa.ChunkedArray):
            stripped = stripped.combine_chunks()
        n = _token_counts(stripped)
        ids = t.column(id_column)
        rid = pc.divide(ids, range_width)  # int64 floor-div for >= 0 ids
        return pa.table({id_column: ids,
                         "n_tokens": pa.array(n, pa.int64()),
                         "rid": pc.cast(rid, pa.int64())})

    counted = ds.map_batches(with_counts, batch_format="pyarrow",
                             batch_size=None)

    # level 1: per-batch per-range integer partials → tiny driver scan
    def range_partial(t: pa.Table) -> pa.Table:
        rid = t.column("rid").to_numpy()
        n = t.column("n_tokens").to_numpy()
        ur, inv = np.unique(rid, return_inverse=True)
        sums = np.zeros(len(ur), np.int64)
        np.add.at(sums, inv, n.astype(np.int64))  # int64 scatter-add: exact
        return pa.table({"rid": pa.array(ur), "tsum": pa.array(sums)})

    parts = counted.map_batches(range_partial, batch_format="pyarrow",
                                batch_size=None).take_all()
    agg: dict = {}
    for r in parts:
        agg[r["rid"]] = agg.get(r["rid"], 0) + int(r["tsum"])
    rids = np.array(sorted(agg), np.int64)
    totals = np.array([agg[r] for r in rids], np.int64)
    base = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)
    base_ref = ray.put(dict(zip(rids.tolist(), base.tolist())))

    # level 2: co-locate each range, local exclusive scan + base offset
    def scan_range(df):
        import pandas as pd

        bases = ray.get(base_ref)
        df = df.sort_values("doc_id", kind="stable").reset_index(drop=True)
        n = df["n_tokens"].to_numpy(np.int64)
        off = (np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
               + bases[int(df["rid"].iloc[0])])
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tokens": n,
            "t_offset": off,
            "seq_id": off // seq_len,
            "seq_pos": off % seq_len,
        })

    return counted.groupby("rid").map_groups(scan_range,
                                             batch_format="pandas")


def pack_sequences_sql(seq_len: int = 2048, column: str = "text",
                       table: str = "documents",
                       id_column: str = "doc_id") -> str:
    """DuckDB twin: window cumsum in doc_id order, same tokenizer as the
    token_stats oracle, pure-integer outputs."""
    ntok = (f"(CASE WHEN trim({column}) = '' THEN 0 ELSE "
            f"length(regexp_split_to_array(trim({column}), '\\s+')) END)")
    return (
        f"WITH t AS (SELECT {id_column} AS doc_id, "
        f"CAST({ntok} AS BIGINT) AS n_tokens FROM {table}), "
        f"o AS (SELECT doc_id, n_tokens, "
        f"COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t_offset "
        f"FROM t) "
        f"SELECT doc_id, n_tokens, CAST(t_offset AS BIGINT) AS t_offset, "
        f"CAST(t_offset // {seq_len} AS BIGINT) AS seq_id, "
        f"CAST(t_offset % {seq_len} AS BIGINT) AS seq_pos FROM o"
    )


# ---------------------------------------------------------------------------
# epoch shuffle — deterministic global permutation for training order
# ---------------------------------------------------------------------------

def _shuffle_keys(ids: np.ndarray, seed: int) -> np.ndarray:
    """uint64 shuffle key per doc: md5 digest bytes [8:16] little-endian
    of '{seed}:{doc_id}' — DuckDB ``md5_number_lower`` exactly (the
    sketch.py hash64 precedent). Per-row Python, crypto-bound like
    fingerprint_md5; at 100 TB the production shape is to persist the
    keyed column once (the text-index pattern) rather than re-hash per
    epoch."""
    import hashlib

    pre = f"{seed}:".encode()
    return np.fromiter(
        (int.from_bytes(hashlib.md5(pre + str(i).encode()).digest()[8:],
                        "little") for i in ids),
        np.uint64, count=len(ids))


def shuffle_epoch(ds, seed: int = 0, id_column: str = "doc_id"):
    """→ Dataset(doc_id, pos): pos = dense 0..N-1 rank of the md5 shuffle
    key (ties → doc_id) — a deterministic, seed-parameterized global
    permutation, the training-epoch document order.

    Same two-level scan as pack_sequences, but ordered by HASH instead
    of id: bucket = top 8 key bits (256 ordered, uniformly-filled
    buckets), per-batch integer bucket counts → tiny driver exclusive
    scan → ONE bounded groupby(bucket) shuffle, local sort + broadcast
    base offset. No global sort barrier; the hash itself IS the
    balanced range partitioner."""
    import pyarrow.compute as pc
    import ray

    def with_keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy().astype(np.int64)
        hk = _shuffle_keys(ids, seed)
        return pa.table({id_column: t.column(id_column),
                         "hkey": pa.array(hk, pa.uint64()),
                         "bucket": pa.array((hk >> np.uint64(56))
                                            .astype(np.int64))})

    def bucket_counts(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy()
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub),
                         "n": pa.array(cnt.astype(np.int64))})

    # pass 1: bucket histogram (counts only) → exclusive scan on driver
    parts = (ds.map_batches(with_keys, batch_format="pyarrow",
                            batch_size=None)
             .map_batches(bucket_counts, batch_format="pyarrow",
                          batch_size=None).take_all())
    agg: dict = {}
    for r in parts:
        agg[r["bucket"]] = agg.get(r["bucket"], 0) + int(r["n"])
    buckets = sorted(agg)
    base = {}
    run = 0
    for bkt in buckets:
        base[bkt] = run
        run += agg[bkt]
    base_ref = ray.put(base)

    # pass 2: co-locate each bucket, local sort by (hkey, doc_id) + base
    def rank_bucket(df):
        import pandas as pd

        bases = ray.get(base_ref)
        df = df.sort_values(["hkey", "doc_id"],
                            kind="stable").reset_index(drop=True)
        off = bases[int(df["bucket"].iloc[0])]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "pos": np.arange(off, off + len(df), dtype=np.int64),
        })

    keyed = ds.map_batches(with_keys, batch_format="pyarrow",
                           batch_size=None)
    return keyed.groupby("bucket").map_groups(rank_bucket,
                                              batch_format="pandas")


def shuffle_epoch_sql(seed: int = 0, table: str = "documents",
                      id_column: str = "doc_id") -> str:
    """DuckDB twin: row_number over the same md5_number_lower key."""
    key = (f"md5_number_lower('{seed}:' || "
           f"CAST({id_column} AS VARCHAR))::UBIGINT")
    return (f"SELECT {id_column} AS doc_id, "
            f"CAST(row_number() OVER (ORDER BY {key}, {id_column}) - 1 "
            f"AS BIGINT) AS pos FROM {table}")


# ---------------------------------------------------------------------------
# dataset mixing — weighted per-source up/down-sampling (training mixture)
# ---------------------------------------------------------------------------

def _micro_weights(weights: dict, default_weight: float):
    """Resolve float weights to exact integer micro-weights ONCE on the
    driver: w → (floor copies, fractional-part micro threshold). Both
    engines then compare integers only — no float weight ever reaches a
    task or the SQL."""
    out = {}
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative mix weight for {s!r}: {w}")
        micro = int(round(float(w) * 1_000_000))
        out[s] = (micro // 1_000_000, micro % 1_000_000)
    dmicro = int(round(float(default_weight) * 1_000_000))
    return out, (dmicro // 1_000_000, dmicro % 1_000_000)


def mix_weighted(ds, weights: dict, default_weight: float = 1.0,
                 seed: int = 0, id_column: str = "doc_id",
                 source_column: str = "source"):
    """Training-mixture composition: re-weight a multi-source corpus →
    Dataset (doc_id, source, copy). A source with weight w keeps
    floor(w) copies of every doc plus one more with probability
    frac(w), decided by the deterministic per-doc md5 key (the
    shuffle_epoch key — seed-parameterized, reproducible across runs
    and engines). w < 1 down-samples, w > 1 up-samples (the Pile-style
    epoch weighting); copy = 1..n is the repeat index so downstream
    packing/shuffling can treat repeats as distinct rows.

    ONE map_batches, no shuffle at any corpus size: the weight map
    rides the closure (driver-resolved integer thresholds), each row's
    fate depends only on its own id hash."""
    micro, dflt = _micro_weights(weights, default_weight)

    def mix(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids_col = t.column(id_column)
        src = t.column(source_column)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = pc.dictionary_encode(src)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(t) else np.empty(0, np.int64)
        per = [micro.get(s, dflt) for s in d.dictionary.to_pylist()]
        base = np.array([p[0] for p in per], np.int64)[codes] \
            if len(per) else np.empty(0, np.int64)
        frac = np.array([p[1] for p in per], np.int64)[codes] \
            if len(per) else np.empty(0, np.int64)
        ids = ids_col.to_numpy(zero_copy_only=False).astype(np.int64)
        h = (_shuffle_keys(ids, seed) % np.uint64(1_000_000)).astype(np.int64)
        copies = base + (h < frac)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), copies)
        ends = np.cumsum(copies)
        copy_idx = np.arange(int(ends[-1]) if len(ends) else 0,
                             dtype=np.int64) - np.repeat(ends - copies,
                                                         copies) + 1
        return pa.table({
            "doc_id": pa.array(ids[rep]),
            "source": src.take(pa.array(rep)),
            "copy": pa.array(copy_idx),
        })

    return ds.map_batches(mix, batch_format="pyarrow", batch_size=None)


def mix_weighted_sql(weights: dict, default_weight: float = 1.0,
                     seed: int = 0, table: str = "documents",
                     id_column: str = "doc_id",
                     source_column: str = "source") -> str:
    """DuckDB twin: same md5 key, same driver-resolved integer
    thresholds (inlined literals), same generate_series explode."""
    micro, (dbase, dfrac) = _micro_weights(weights, default_weight)
    base_case = " ".join(f"WHEN '{s}' THEN {b}"
                         for s, (b, _) in sorted(micro.items()))
    frac_case = " ".join(f"WHEN '{s}' THEN {f}"
                         for s, (_, f) in sorted(micro.items()))
    return (
        f"WITH d AS (SELECT {id_column} AS doc_id, {source_column} AS source, "
        f"CAST(md5_number_lower('{seed}:' || CAST({id_column} AS VARCHAR))"
        f"::UBIGINT % 1000000 AS BIGINT) AS h, "
        f"CASE {source_column} {base_case} ELSE {dbase} END AS base, "
        f"CASE {source_column} {frac_case} ELSE {dfrac} END AS frac "
        f"FROM {table}), "
        "c AS (SELECT doc_id, source, "
        "base + CASE WHEN h < frac THEN 1 ELSE 0 END AS n FROM d) "
        "SELECT doc_id, source, "
        "CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy "
        "FROM c WHERE n > 0"
    )


# ---------------------------------------------------------------------------
# document chunking — sliding token windows (RAG / embedding prep)
# ---------------------------------------------------------------------------

def chunk_docs(ds, size: int = 32, overlap: int = 8, column: str = "text",
               id_column: str = "doc_id"):
    """Split every doc into overlapping token windows → Dataset
    (doc_id, chunk_id, start_tok, n_toks, chunk_text) — the split-side
    complement of pack_sequences (which concatenates), and the prep
    stage ahead of embed→index in a RAG pipeline.

    Chunk c covers tokens [c*stride+1, min(c*stride+size, n)] (1-based,
    stride = size - overlap); a doc with n <= size yields one chunk;
    empty docs yield none. ONE vectorized map_batches — tokens are
    gathered with a single take over the batch's flat token array and
    joined per chunk with one Arrow binary_join; no shuffle, no per-row
    Python."""
    from .lm import _split_codes

    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap

    def chunk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        codes, tok_doc, vocab, n_docs = _split_codes(t, column)
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "n_toks": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
        if codes.size == 0:
            return empty
        flat = vocab.take(pa.array(codes))  # compacted tokens, doc order
        doc_off = np.searchsorted(tok_doc, np.arange(n_docs + 1))
        n = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
        n_chunks = np.where(
            n == 0, 0,
            np.where(n <= size, 1, (n - size + stride - 1) // stride + 1))
        total_chunks = int(n_chunks.sum())
        if total_chunks == 0:
            return empty
        doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
        excl = np.cumsum(n_chunks) - n_chunks
        chunk_id = np.arange(total_chunks, dtype=np.int64) - \
            np.repeat(excl, n_chunks)
        start0 = chunk_id * stride
        end0 = np.minimum(start0 + size, n[doc_rep])
        n_toks = end0 - start0
        gstart = doc_off[:-1][doc_rep] + start0
        total_toks = int(n_toks.sum())
        texcl = np.cumsum(n_toks) - n_toks
        idx = np.arange(total_toks, dtype=np.int64) - \
            np.repeat(texcl, n_toks) + np.repeat(gstart, n_toks)
        taken = flat.take(pa.array(idx))
        offs = np.concatenate([[0], np.cumsum(n_toks)]).astype(np.int32)
        larr = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), taken)
        texts = pc.binary_join(larr, " ")
        return pa.table({
            "doc_id": pa.array(ids[doc_rep]),
            "chunk_id": pa.array(chunk_id),
            "start_tok": pa.array(start0 + 1),
            "n_toks": pa.array(n_toks),
            "chunk_text": texts,
        })

    return ds.map_batches(chunk, batch_format="pyarrow", batch_size=None)


def chunk_docs_sql(size: int = 32, overlap: int = 8,
                   table: str = "documents", column: str = "text",
                   id_column: str = "doc_id") -> str:
    """DuckDB twin: same tokenizer, same integer chunk arithmetic,
    1-based-inclusive list slice + array_to_string."""
    stride = size - overlap
    return (
        f"WITH t AS (SELECT {id_column} AS doc_id, "
        f"regexp_split_to_array(trim({column}), '\\s+') AS ws FROM {table}), "
        "nn AS (SELECT doc_id, ws, CASE WHEN len(ws) = 1 AND ws[1] = '' "
        "THEN 0 ELSE len(ws) END AS n FROM t), "
        f"c AS (SELECT doc_id, ws, n, unnest(generate_series(0, "
        f"CASE WHEN n <= {size} THEN 0 "
        f"ELSE (n - {size} + {stride} - 1) // {stride} END)) AS chunk_id "
        "FROM nn WHERE n > 0) "
        "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
        f"CAST(chunk_id * {stride} + 1 AS BIGINT) AS start_tok, "
        f"CAST(LEAST(chunk_id * {stride} + {size}, n) - chunk_id * {stride} "
        "AS BIGINT) AS n_toks, "
        f"array_to_string(ws[chunk_id * {stride} + 1 : "
        f"LEAST(chunk_id * {stride} + {size}, n)], ' ') AS chunk_text "
        "FROM c"
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

def weighted_sample(ds, k: int = 50, weight_column: str = "n_chars",
                    seed: str = "ws", id_column: str = "doc_id"):
    """Deterministic weighted sample of ``k`` docs WITHOUT replacement
    (Efraimidis & Spirakis 2006, log-space variant) → Dataset
    (doc_id, weight, key_q9): the k largest keys
    ``ln(u)/w`` where u is an exact dyadic uniform built from the
    doc's md5 (53 mantissa bits + 1, over 2^53 — bit-equal in both
    engines) and w its integer weight; inclusion probability rises
    with w, and fixing the seed makes the sample a pure function of
    the corpus (the shuffle_epoch contract). Zero/negative weights are
    unsampleable and dropped.

    Shape: ONE scan with per-batch top-k pruning under the FULL merge
    order (key_q9 DESC, doc_id ASC — the boundary-tie rule) → single
    output-sized merge task (the ANN merge shape). key_q9 =
    floor((ln(u)/w)*1e9+0.5), one IEEE expression over exact ints,
    mirrored token-for-token in SQL."""
    import hashlib

    mask = np.uint64((1 << 53) - 1)
    pre = f"{seed}:".encode()

    def topk_local(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = t.column(weight_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = w > 0
        ids = ids[pos]
        w = w[pos]
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(pre + str(i).encode())
                            .digest()[8:], "little") for i in ids),
            np.uint64, count=len(ids))
        u = ((h & mask) + np.uint64(1)).astype(np.float64) \
            / 9007199254740992.0
        q = np.floor((np.log(u) / w.astype(np.float64))
                     * 1000000000.0 + 0.5).astype(np.int64)
        # prune under the FULL total order (key DESC, id ASC)
        order = np.lexsort((ids, -q))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "weight": pa.array(w[order]),
                         "key_q9": pa.array(q[order])})

    def merge(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        q = t.column("key_q9").to_numpy()
        order = np.lexsort((ids, -q))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "weight": pa.array(t.column("weight")
                                            .to_numpy()[order]),
                         "key_q9": pa.array(q[order])})

    return ds.map_batches(topk_local, batch_format="pyarrow",
                          batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pyarrow", batch_size=None)


def weighted_sample_sql(k: int = 50, weight_column: str = "n_chars",
                        seed: str = "ws", table: str = "documents",
                        id_column: str = "doc_id") -> str:
    """DuckDB twin: md5_number_lower 53-bit dyadic uniform, the same
    ln(u)/w expression, QUALIFY top-k under (key DESC, id ASC)."""
    key = (f"CAST(floor((ln(CAST(((md5_number_lower('{seed}:' || "
           f"CAST({id_column} AS VARCHAR)) & 9007199254740991) + 1) "
           "AS DOUBLE) / 9007199254740992.0) / "
           f"CAST({weight_column} AS DOUBLE)) * 1000000000.0 + 0.5) "
           "AS BIGINT)")
    return (
        f"SELECT {id_column} AS doc_id, "
        f"CAST({weight_column} AS BIGINT) AS weight, {key} AS key_q9 "
        f"FROM {table} WHERE {weight_column} > 0 "
        f"QUALIFY row_number() OVER (ORDER BY {key} DESC, "
        f"{id_column} ASC) <= {k}"
    )
