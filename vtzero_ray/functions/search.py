"""BM25 keyword search over a text column — the lexical complement of
the embedding ANN family (functions/ann.py).

Two-pass shape (the only one that scales: term statistics are corpus
globals, scores are per-doc locals):

1. STATS pass: per-batch integer combiner → (n_docs, total_tokens,
   df per query term). Everything is an int64 sum, so the merged stats
   are bit-deterministic under any block scheduling, and the reduced
   frame is O(len(terms)) — broadcast, never shuffled.
2. SCORE pass: one vectorized scan; per-batch top-k prune (a doc's
   score is independent of other docs, so global top-k ⊆ union of
   per-batch top-k) → ONE output-sized repartition(1) merge task (the
   repo's ngram_topk / ANN merge rule — no groupby barrier).

Float parity contract: the BM25 expression is written token-for-token
identically here and in bm25_sql (same literals, same parse order, libm
ln in both engines — the clip/HLL precedent), then np.round(.,9) /
round(.,9) before ranking, so the DuckDB oracle reproduces scores and
ranks exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator


def _doc_term_stats(batch: pa.Table, terms: tuple, column: str):
    """Vectorized per-doc token stats: (dl int64[n], tf int64[t, n]).

    Tokenization matches the SQL twin byte-for-byte: whitespace split,
    empty tokens dropped.
    """
    import pyarrow.compute as pc

    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offs = np.asarray(toks.offsets, np.int64)
    counts = np.diff(offs)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    if len(flat):
        lens = pc.binary_length(flat).to_numpy().astype(np.int64)
        nonempty = lens > 0
        dl = np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64)
        tf = np.empty((len(terms), n), np.int64)
        for i, t in enumerate(terms):
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            hit = np.nan_to_num(hit.astype(np.float64)).astype(bool)
            tf[i] = np.bincount(doc_idx[hit], minlength=n)
    else:
        dl = np.zeros(n, np.int64)
        tf = np.zeros((len(terms), n), np.int64)
    return dl, tf


def _score(tf: np.ndarray, dl: np.ndarray, idf: list, avgdl: float,
           k1: float, b: float) -> np.ndarray:
    """The BM25 sum, parse-order-identical to bm25_sql: terms added
    left-to-right in the given order; per-term expression
    ``idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl / avgdl)))``
    with (k1+1) and (1-b) pre-folded to the SAME decimal literals the
    SQL inlines."""
    dn = dl.astype(np.float64) / avgdl
    s = np.zeros(tf.shape[1], np.float64)
    for i in range(tf.shape[0]):
        t = tf[i].astype(np.float64)
        s = s + (idf[i] * (t * (k1 + 1.0))) / (t + k1 * ((1.0 - b) + b * dn))
    return np.round(s, 9)


def _merge_topk(cands, k: int):
    """Final output-sized merge: ONE repartition(1)+map_batches task (the
    repo's merge rule — no second groupby barrier). Shared by the scan
    and indexed paths so their ranking is one code path."""
    import pandas as pd

    def merge_all(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)
        df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = cands.repartition(1).map_batches(merge_all, batch_format="pyarrow",
                                           batch_size=None).to_pandas()
    if len(out) == 0:  # zero candidates → typed empty frame
        out = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "score": pd.Series([], dtype=np.float64),
                            "rnk": pd.Series([], dtype=np.int64)})
    return out


def bm25_topk(ds, terms, k: int = 10, k1: float = 1.2, b: float = 0.75,
              column: str = "text", id_column: str = "doc_id"):
    """Top-k documents by BM25 for a fixed term list → pandas DataFrame
    (doc_id, score, rnk), rank = (score DESC, doc_id ASC), score > 0."""
    terms = tuple(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tf = _doc_term_stats(batch, terms, column)
        cols = {"n_docs": pa.array([len(dl)], pa.int64()),
                "total_tokens": pa.array([int(dl.sum())], pa.int64())}
        for i in range(len(terms)):
            cols[f"df_{i}"] = pa.array([int((tf[i] > 0).sum())], pa.int64())
        return pa.table(cols)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow",
                           batch_size=None).take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    total = sum(r["total_tokens"] for r in parts)
    dfs = [sum(r[f"df_{i}"] for r in parts) for i in range(len(terms))]
    avgdl = total / n_docs  # int/int -> float64, same op as SQL ::DOUBLE /
    # idf inputs are exact integers (+0.5/+1.0 halves): ln is libm in both
    idf = [float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
           for df in dfs]

    def score_topk(batch: pa.Table) -> pa.Table:
        tune_allocator()
        dl, tf = _doc_term_stats(batch, terms, column)
        s = _score(tf, dl, idf, avgdl, k1, b)
        ids = batch.column(id_column).to_numpy().astype(np.int64)
        keep = s > 0.0
        ids, s = ids[keep], s[keep]
        # per-batch prune: global top-k ⊆ union of per-batch top-k
        order = np.lexsort((ids, -s))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "score": pa.array(s[order], pa.float64())})

    cands = ds.map_batches(score_topk, batch_format="pyarrow",
                           batch_size=None)
    return _merge_topk(cands, k)


# ---------------------------------------------------------------------------
# persisted inverted index — the 100-TB scale path (build once, then every
# query reads ONLY the posting buckets of its terms; mirrors the
# build_ivf_index / topk_ivf_indexed pattern in functions/ann.py)
# ---------------------------------------------------------------------------

_INDEX_VERSION = 1


def _term_bucket(term: str, n_buckets: int) -> int:
    import zlib

    return zlib.crc32(term.encode()) % n_buckets


def _postings_of(batch: pa.Table, column: str, id_column: str,
                 n_buckets: int) -> pa.Table:
    """Posting rows (term, doc_id, tf, dl, bpart) for one batch, plus ONE
    stats row per batch in the sentinel partition bpart == n_buckets
    (term='', doc_id=<batch rows incl. empty docs>, tf=<batch token
    total>, dl=0) — so corpus-global stats ride the same single pass.

    Vectorized: dictionary-encode the flat token stream, then count
    unique (doc, code) pairs with one np.unique over a fused int64 key
    (dl replicated per posting keeps query-time scoring join-free)."""
    import pyarrow.compute as pc
    import zlib

    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ids = batch.column(id_column).to_numpy().astype(np.int64)
    n = len(texts)
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offs = np.asarray(toks.offsets, np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    terms = np.empty(0, object)
    docs = tfs = dls = np.empty(0, np.int64)
    dl = np.zeros(n, np.int64)
    if len(flat):
        nonempty = pc.binary_length(flat).to_numpy().astype(np.int64) > 0
        doc_idx = doc_idx[nonempty]
        dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
        d = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(d.dictionary.to_pylist(), object)
        pair, tfs = np.unique(doc_idx * len(vocab) + codes,
                              return_counts=True)
        pdoc, pcode = pair // len(vocab), pair % len(vocab)
        terms, docs, dls = vocab[pcode], ids[pdoc], dl[pdoc]
        tfs = tfs.astype(np.int64)
    # bucket via the batch vocabulary (crc32 once per unique term)
    if len(terms):
        uvoc, inv = np.unique(terms, return_inverse=True)
        vh = np.fromiter((zlib.crc32(v.encode()) for v in uvoc),
                         np.int64, count=len(uvoc))
        bparts = (vh[inv] % n_buckets).astype(np.int64)
    else:
        bparts = np.empty(0, np.int64)
    return pa.table({
        "term": pa.array(np.append(terms, [""]), pa.string()),
        "doc_id": pa.array(np.append(docs, [n])),
        "tf": pa.array(np.append(tfs, [int(dl.sum())])),
        "dl": pa.array(np.append(dls, [0])),
        "bpart": pa.array(np.append(bparts, [n_buckets])),
    })


def build_text_index(ds, out_dir: str, n_buckets: int = 64,
                     column: str = "text", id_column: str = "doc_id") -> str:
    """Persist a BM25 inverted index: posting rows written as parquet
    PARTITIONED BY bpart = crc32(term) % n_buckets, stats rows in the
    sentinel partition bpart == n_buckets. ONE corpus pass, no shuffle
    (write_parquet partition_cols splits per task). Built once; every
    query after that reads only its terms' buckets (bm25_topk_indexed).

    ATOMIC: built into a process-private temp dir, os.rename()d into
    place; meta.parquet is written LAST inside the temp dir, so presence
    implies a complete index (the build_ivf_index publish contract,
    functions/ann.py:461)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    postings = ds.map_batches(
        lambda t: _postings_of(t, column, id_column, n_buckets),
        batch_format="pyarrow", batch_size=None)
    out_dir = os.path.normpath(out_dir)
    tmp_dir = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    try:
        postings.write_parquet(f"{tmp_dir}/postings", partition_cols=["bpart"])
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


def index_paths_for(index_dir: str, terms) -> list:
    """Parquet files of ONLY the buckets the query terms hash into —
    unmatched buckets never leave storage (file-level pruning; the
    topk_ivf_indexed probe-partition rule)."""
    import glob

    import pyarrow.parquet as pq

    nb = int(pq.read_table(f"{index_dir}/meta.parquet")
             .column("n_buckets")[0].as_py())
    needed = sorted({_term_bucket(t, nb) for t in terms})
    return sorted(f for bkt in needed for f in
                  glob.glob(f"{index_dir}/postings/bpart={bkt}/*.parquet"))


def _index_stats(index_dir: str, n_buckets: int):
    """Corpus globals from the tiny sentinel partition: (n_docs,
    total_tokens) — integer sums, order-independent."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{index_dir}/postings/bpart={n_buckets}/*.parquet")
    n_docs = total = 0
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "tf"])
        n_docs += int(np.asarray(t.column("doc_id")).sum())
        total += int(np.asarray(t.column("tf")).sum())
    return n_docs, total


def bm25_topk_indexed(index_dir: str, terms, k: int = 10, k1: float = 1.2,
                      b: float = 0.75):
    """BM25 over a PERSISTED inverted index — byte-equal to bm25_topk on
    the same corpus (asserted in tests), but reads only the posting
    buckets of the query terms instead of scanning the corpus.

    Shape: pruned read → per-batch df partials (integer, tiny) → pruned
    read again for scoring → ONE bounded doc-bucket shuffle (a doc's
    postings for different terms live in different bucket partitions, so
    its score sum crosses blocks) → in-group term-ORDER summation
    (np.add.at per term, reproducing the scan path's left-to-right float
    adds exactly) → per-group top-k prune → one output-sized merge."""
    import pyarrow.compute as pc_mod
    import pyarrow.parquet as pq
    import ray.data as rd

    terms = tuple(terms)
    nb = int(pq.read_table(f"{index_dir}/meta.parquet")
             .column("n_buckets")[0].as_py())
    n_docs, total = _index_stats(index_dir, nb)
    paths = index_paths_for(index_dir, terms)
    avgdl = total / n_docs
    term_list = list(terms)

    if not paths:  # no query term bucket exists in the corpus at all
        import pandas as pd

        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64),
                             "rnk": pd.Series([], dtype=np.int64)})

    def read_pruned():
        return rd.read_parquet(
            paths, columns=["term", "doc_id", "tf", "dl"],
            filter=pc_mod.field("term").isin(term_list))

    # pass 1: df per term (posting rows are unique (term, doc) pairs, so
    # df == row count per term) — integer partials, bit-deterministic
    def df_partial(t: pa.Table) -> pa.Table:
        tcol = t.column("term")
        cols = {f"df_{i}": pa.array(
            [int(pc_mod.sum(pc_mod.equal(tcol, trm)).as_py() or 0)],
            pa.int64()) for i, trm in enumerate(terms)}
        return pa.table(cols)

    parts = read_pruned().map_batches(df_partial, batch_format="pyarrow",
                                      batch_size=None).take_all()
    dfs = [sum(r[f"df_{i}"] for r in parts) for i in range(len(terms))]
    idf = [float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
           for df in dfs]

    # pass 2: route postings to doc buckets (bounded key space), sum each
    # doc's contributions IN TERM ORDER, prune per group
    def add_term_idx(t: pa.Table) -> pa.Table:
        tcol = t.column("term")
        tidx = pc_mod.index_in(tcol, value_set=pa.array(term_list))
        db = pc_mod.cast(
            pc_mod.bit_wise_and(t.column("doc_id"), 63), pa.int64())
        return (t.drop_columns(["term"])
                 .append_column("tidx", pc_mod.cast(tidx, pa.int64()))
                 .append_column("dbucket", db))

    routed = read_pruned().map_batches(add_term_idx, batch_format="pyarrow",
                                       batch_size=None)

    def score_group(df):
        tune_allocator()
        ids = df["doc_id"].to_numpy(np.int64)
        tf = df["tf"].to_numpy(np.int64)
        dl = df["dl"].to_numpy(np.int64)
        ti = df["tidx"].to_numpy(np.int64)
        uids, pos = np.unique(ids, return_inverse=True)
        s = np.zeros(len(uids), np.float64)
        dn_all = dl.astype(np.float64) / avgdl
        for i in range(len(terms)):  # term order == scan path's sum order
            m = ti == i
            t = tf[m].astype(np.float64)
            s[pos[m]] += (idf[i] * (t * (k1 + 1.0))) / (
                t + k1 * ((1.0 - b) + b * dn_all[m]))
        s = np.round(s, 9)
        keep = s > 0.0
        uids, s = uids[keep], s[keep]
        order = np.lexsort((uids, -s))[:k]
        import pandas as pd

        return pd.DataFrame({"doc_id": uids[order], "score": s[order]})

    cands = routed.groupby("dbucket").map_groups(score_group,
                                                 batch_format="pandas")

    def drop_key(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "score"]) if t.num_columns > 2 else t

    return _merge_topk(cands.map_batches(drop_key, batch_format="pyarrow",
                                         batch_size=None), k)


def bm25_sql(terms, k: int = 10, k1: float = 1.2, b: float = 0.75,
             column: str = "text", table: str = "documents",
             id_column: str = "doc_id") -> str:
    """Exact DuckDB twin of bm25_topk: same tokenizer, same integer
    stats, and the SAME float expression text (literal constants, parse
    order, ln) so round(score, 9) hash-matches."""
    terms = tuple(terms)
    k1p1 = repr(k1 + 1.0)
    one_mb = repr(1.0 - b)
    tf_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END), 0)"
        f"::BIGINT AS tf_{i}" for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"(SELECT COUNT(*) FROM dstats WHERE tf_{i} > 0)::DOUBLE AS df_{i}"
        for i in range(len(terms)))
    term_exprs = " + ".join(
        f"(ln((g.n_docs - g.df_{i} + 0.5) / (g.df_{i} + 0.5) + 1.0)"
        f" * (d.tf_{i}::DOUBLE * {k1p1}))"
        f" / (d.tf_{i}::DOUBLE + {k1!r} * ({one_mb}"
        f" + {b!r} * (d.dl::DOUBLE / g.avgdl)))"
        for i in range(len(terms)))
    return (
        f"WITH toks AS (SELECT {id_column}, unnest(regexp_split_to_array("
        f"trim({column}), '\\s+')) AS tok FROM {table}"
        f" WHERE trim({column}) != ''), "
        f"dstats AS (SELECT t.{id_column}, COUNT(*)::BIGINT AS dl, {tf_cols}"
        f" FROM toks t WHERE tok != '' GROUP BY 1), "
        f"globals AS (SELECT (SELECT COUNT(*) FROM {table})::DOUBLE AS"
        f" n_docs, (SELECT COALESCE(SUM(dl), 0) FROM dstats)::DOUBLE"
        f" / (SELECT COUNT(*) FROM {table}) AS avgdl, {df_cols}), "
        f"scores AS (SELECT d.{id_column} AS doc_id,"
        f" round({term_exprs}, 9) AS score FROM dstats d, globals g) "
        f"SELECT doc_id, score, CAST(row_number() OVER"
        f" (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk"
        f" FROM scores WHERE score > 0.0"
        f" ORDER BY score DESC, doc_id LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# hybrid search — reciprocal-rank fusion of BM25 and vector top-k
# ---------------------------------------------------------------------------


def hybrid_topk(ds_docs, ds_emb, sf_dir: str, terms, k: int = 10,
                pool: int = 20, kr: int = 60):
    """Hybrid lexical+vector retrieval via Reciprocal Rank Fusion
    (Cormack et al. 2009): fuse the BM25 top-``pool`` (terms query)
    with the exact-cosine top-``pool`` of the first embedding query →
    pandas DataFrame (doc_id, rrf_q9, rnk) of the top ``k``.

    rrf_q9(d) = Σ_legs floor(1e9 / (kr + rank_leg(d))) over legs where
    d is ranked — each term integer-derived, so the fusion is exact in
    SQL (the quantize-then-rank contract). Both legs run their normal
    distributed shapes; the fusion joins two <= pool-row lists on the
    driver (output-sized — the repo's merge rule). Doc ids and vec ids
    share the id space by construction of the synthetic tables; a real
    deployment passes the doc-keyed embedding table.
    """
    import pandas as pd

    from .ann import topk_bruteforce

    lex = bm25_topk(ds_docs, terms, k=pool)
    vec = topk_bruteforce(ds_emb, sf_dir, k=pool, n_queries=1)
    vec = vec.to_pandas() if hasattr(vec, "to_pandas") else vec
    contrib = []
    for frame, idc, rc in ((lex, "doc_id", "rnk"), (vec, "vec_id", "rank")):
        q = np.floor(1e9 / (kr + frame[rc].to_numpy(np.float64))) \
            .astype(np.int64)
        contrib.append(pd.DataFrame(
            {"doc_id": frame[idc].to_numpy(np.int64), "q": q}))
    f = pd.concat(contrib).groupby("doc_id")["q"].sum().reset_index()
    f = f.sort_values(["q", "doc_id"], ascending=[False, True],
                      kind="stable").head(k).reset_index(drop=True)
    f["rnk"] = np.arange(1, len(f) + 1, dtype=np.int64)
    return f.rename(columns={"q": "rrf_q9"})[["doc_id", "rrf_q9", "rnk"]]


def hybrid_sql(terms, k: int = 10, pool: int = 20, kr: int = 60) -> str:
    """DuckDB twin: the bm25 oracle and the brute-force cosine oracle
    as CTEs, the same floor(1e9/(kr+rank)) fusion terms."""
    bm = bm25_sql(terms, k=pool)
    return (
        f"WITH bm AS ({bm}), "
        "qv AS (SELECT vec_id, embedding FROM embeddings "
        "ORDER BY vec_id LIMIT 1), "
        "vv AS (SELECT e.vec_id, row_number() OVER (ORDER BY "
        "round(list_cosine_similarity(qv.embedding::DOUBLE[], "
        "e.embedding::DOUBLE[]), 6) DESC, e.vec_id) AS rank "
        f"FROM qv CROSS JOIN embeddings e QUALIFY rank <= {pool}), "
        "c AS (SELECT doc_id, CAST(floor(1000000000.0 / "
        f"({kr} + rnk)) AS BIGINT) AS q FROM bm "
        "UNION ALL SELECT vec_id AS doc_id, CAST(floor(1000000000.0 / "
        f"({kr} + rank)) AS BIGINT) AS q FROM vv), "
        "f AS (SELECT doc_id, CAST(SUM(q) AS BIGINT) AS rrf_q9 "
        "FROM c GROUP BY 1) "
        "SELECT doc_id, rrf_q9, CAST(row_number() OVER "
        "(ORDER BY rrf_q9 DESC, doc_id) AS BIGINT) AS rnk FROM f "
        f"QUALIFY rnk <= {k}"
    )
