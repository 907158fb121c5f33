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


def bm25_topk(ds, terms, k: int = 10, k1: float = 1.2, b: float = 0.75,
              column: str = "text", id_column: str = "doc_id"):
    """Top-k documents by BM25 for a fixed term list → pandas DataFrame
    (doc_id, score, rnk), rank = (score DESC, doc_id ASC), score > 0."""
    import pandas as pd

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
        from ..runtime import tune_allocator

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

    def merge_all(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)
        df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = cands.repartition(1).map_batches(merge_all, batch_format="pyarrow",
                                           batch_size=None)
    return out.to_pandas()


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
