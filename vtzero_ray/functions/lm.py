"""Unigram language-model scoring — a CCNet-style perplexity quality
filter for training-data pipelines.

Two passes, the only shape that scales (model statistics are corpus
globals, scores are per-doc locals — the BM25 precedent in
functions/search.py):

1. TRAIN: per-batch combiner (dictionary-coded tokens, one np.bincount)
   → ONE bounded crc32-bucket shuffle (the ngram_topk invariant: never
   groupby the raw high-cardinality token key) → in-bucket integer sums
   → the vocabulary table collects to the driver for broadcast. The
   collected frame is bounded by MODEL VOCABULARY, not corpus size; at
   100 TB prune to top-V tokens + an OOV mass before broadcasting
   (``max_vocab``).
2. SCORE: broadcast (ray.put once) token→count arrays; one vectorized
   scan emits each doc's add-1-smoothed negative log-likelihood.

Float parity contract (STRONGER than BM25's order mirroring): each
per-(doc, distinct token) term is quantized to int64 BEFORE any
summation — ``q = floor((tf * ln((c+1)/(T+V))) * 1e9 + 0.5)`` — so the
per-doc reduction is an integer sum: order-independent under any block
scheduling and bit-equal to DuckDB's ``SUM`` (CAST to BIGINT). ln is
libm in both engines and every ln argument is derived from exact
integers, so the doubles agree bit-for-bit (the clip/HLL/BM25
precedent). No float addition ever crosses a task boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()
import pyarrow.compute as pc

QUANT = 1_000_000_000.0  # 1e-9 logprob quantum (the repo's round-9 grid)


def _split_codes(batch: pa.Table, column: str):
    """Trim+split tokenizer shared with textstats: whitespace split,
    empty tokens dropped → (codes, tok_doc, vocab, n_docs)."""
    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offs = np.asarray(toks.offsets, dtype=np.int64)
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64) \
        if len(flat) else np.empty(0, np.int64)
    vocab = d.dictionary
    tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64),
                        offs[1:] - offs[:-1])
    if len(vocab):
        keep = pc.utf8_length(vocab).to_numpy().astype(np.int64)[codes] > 0
        codes = codes[keep]
        tok_doc = tok_doc[keep]
    return codes, tok_doc, vocab, n_docs


_EMPTY_COUNTS = pa.table({"tok": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})


def unigram_counts(ds, column: str = "text", n_buckets: int = 64):
    """Corpus unigram counts → Dataset (tok, n). The corpus text never
    shuffles: only per-batch (tok, n) partials (bounded by batch
    vocabulary) leave each task, then ONE crc32(tok)%n_buckets bucket
    shuffle sums them (each token lives in exactly one bucket)."""
    import zlib

    def partial(batch: pa.Table) -> pa.Table:
        tune_allocator()
        codes, _, vocab, _ = _split_codes(batch, column)
        if codes.size == 0:
            return _EMPTY_COUNTS
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        nz = cnt > 0
        return pa.table({"tok": vocab.filter(pa.array(nz)),
                         "n": pa.array(cnt[nz])})

    def add_bucket(t: pa.Table) -> pa.Table:
        toks = t.column("tok")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        b = np.fromiter((zlib.crc32(v.encode()) % n_buckets
                         for v in toks.to_pylist()),
                        np.int32, count=len(toks))
        return t.append_column("bucket", pa.array(b))

    def bucket_sum(df):
        tot = df.groupby("tok", sort=False)["n"].sum().reset_index()
        return tot[["tok", "n"]]

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_sum, batch_format="pandas"))


def doc_perplexity(ds, column: str = "text", id_column: str = "doc_id",
                   max_vocab: int | None = None,
                   keep_columns: tuple[str, ...] = ()):
    """Per-doc add-1-smoothed unigram NLL over the corpus' own LM →
    Dataset (doc_id, n_tokens, nll_q9) with nll_q9 = the integer-
    quantized negative log-likelihood (sum of per-term
    ``-floor((tf * ln((c+1)/(T+V))) * 1e9 + 0.5)``; divide by 1e9 and by
    n_tokens for the average NLL; exp of that is the perplexity).

    Pure-integer outputs — the oracle-exactness invariant. ``max_vocab``
    truncates the broadcast model to the most frequent tokens (count
    desc, token asc) for huge vocabularies; truncated-away tokens score
    as unseen (c=0). The driver query leaves it None (exact twin).
    """
    import ray

    vocab_tab = unigram_counts(ds, column=column).to_pandas()
    vocab_tab = vocab_tab.sort_values(["n", "tok"], ascending=[False, True],
                                      kind="stable")
    T = int(vocab_tab["n"].sum())
    V = int(len(vocab_tab))  # smoothing denominator uses the FULL vocab
    if max_vocab is not None:
        vocab_tab = vocab_tab.head(max_vocab)
    # sorted token array so the score scan can searchsorted-join against it
    vocab_tab = vocab_tab.sort_values("tok", kind="stable")
    model_ref = ray.put((vocab_tab["tok"].to_numpy(),
                         vocab_tab["n"].to_numpy().astype(np.int64), T, V))

    def score(batch: pa.Table) -> pa.Table:
        tune_allocator()
        toks_sorted, cnts, T_, V_ = ray.get(model_ref)
        codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
        ids = batch.column(id_column)
        n_tokens = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)
        nll = np.zeros(n_docs, np.int64)
        if codes.size:
            # per-(doc, distinct token) tf via one sorted np.unique pass
            key = tok_doc * np.int64(len(vocab)) + codes
            uniq, tf = np.unique(key, return_counts=True)
            ud = uniq // len(vocab)
            uc = uniq % len(vocab)
            # batch vocab → model counts (absent → 0, scores as unseen)
            vtoks = vocab.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(toks_sorted, vtoks)
            pos_c = np.minimum(pos, len(toks_sorted) - 1)
            hit = (len(toks_sorted) > 0) & (toks_sorted[pos_c] == vtoks)
            c = np.where(hit, cnts[pos_c], 0).astype(np.int64) \
                if len(toks_sorted) else np.zeros(len(vocab), np.int64)
            denom = np.float64(T_ + V_)
            lnp = np.log((c.astype(np.float64) + 1.0) / denom)
            q = np.floor((tf.astype(np.float64) * lnp[uc]) * QUANT + 0.5) \
                .astype(np.int64)
            # uniq is sorted → pairs grouped by doc: cumsum-diff segments
            cum = np.concatenate([[0], np.cumsum(q)])
            starts = np.searchsorted(ud, np.arange(n_docs + 1))
            nll = -(cum[starts[1:]] - cum[starts[:-1]])
        out = {id_column: ids,
               "n_tokens": pa.array(n_tokens),
               "nll_q9": pa.array(nll)}
        for c in keep_columns:  # pass-through facts (e.g. lang) ride
            out[c] = batch.column(c)  # along — no join needed later
        return pa.table(out)

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def doc_perplexity_sql(table: str = "documents", column: str = "text",
                       id_column: str = "doc_id") -> str:
    """DuckDB twin: same tokenizer, same add-1 smoothing, same int64
    quantization before the per-doc sum (ln is libm in both engines and
    every argument is integer-derived, so terms agree bit-for-bit)."""
    return (
        f"WITH toks AS (SELECT doc_id, tok FROM (SELECT {id_column} AS doc_id, "
        f"unnest(regexp_split_to_array(trim({column}), '\\s+')) AS tok "
        f"FROM {table}) WHERE tok <> ''), "
        "cs AS (SELECT COUNT(*) AS T, COUNT(DISTINCT tok) AS V FROM toks), "
        "cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1), "
        "dtf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM toks GROUP BY 1, 2), "
        "terms AS (SELECT d.doc_id, d.tf, CAST(floor((CAST(d.tf AS DOUBLE) * "
        "ln((CAST(c.c AS DOUBLE) + 1.0) / CAST(cs.T + cs.V AS DOUBLE))) * "
        "1000000000.0 + 0.5) AS BIGINT) AS q "
        "FROM dtf d JOIN cnt c USING (tok) CROSS JOIN cs) "
        f"SELECT doc.{id_column} AS doc_id, "
        "CAST(COALESCE(s.nt, 0) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(-s.snll, 0) AS BIGINT) AS nll_q9 "
        f"FROM {table} doc LEFT JOIN (SELECT doc_id, SUM(tf) AS nt, "
        "SUM(q) AS snll FROM terms GROUP BY 1) s "
        f"ON s.doc_id = doc.{id_column}"
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction — per-document top-k terms
# ---------------------------------------------------------------------------


def doc_freqs(ds, column: str = "text", n_buckets: int = 64):
    """Corpus document frequencies → Dataset (tok, df). Same shape as
    unigram_counts (per-batch combiner, ONE bucketed count shuffle), but
    counting DISTINCT docs per token — exact because every doc lives
    wholly inside one row/batch."""
    import zlib

    def partial(batch: pa.Table) -> pa.Table:
        tune_allocator()
        codes, tok_doc, vocab, _ = _split_codes(batch, column)
        if codes.size == 0:
            return _EMPTY_COUNTS
        # distinct (doc, token) pairs, then count pairs per token
        key = tok_doc * np.int64(len(vocab)) + codes
        uniq = np.unique(key)
        uc = (uniq % len(vocab)).astype(np.int64)
        cnt = np.bincount(uc, minlength=len(vocab)).astype(np.int64)
        nz = cnt > 0
        return pa.table({"tok": vocab.filter(pa.array(nz)),
                         "n": pa.array(cnt[nz])})

    def add_bucket(t: pa.Table) -> pa.Table:
        toks = t.column("tok")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        b = np.fromiter((zlib.crc32(v.encode()) % n_buckets
                         for v in toks.to_pylist()),
                        np.int32, count=len(toks))
        return t.append_column("bucket", pa.array(b))

    def bucket_sum(df):
        tot = df.groupby("tok", sort=False)["n"].sum().reset_index()
        return tot[["tok", "n"]]

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_sum, batch_format="pandas"))


def tfidf_topk(ds, k: int = 3, column: str = "text",
               id_column: str = "doc_id"):
    """Per-document keyword extraction: top-k terms by
    ``tf * ln(N / df)`` → Dataset (doc_id, term, tfidf_q9, rnk).

    The doc-level complement of BM25 (corpus-level query ranking) and
    ngram_topk (corpus-level phrase stats). Scores ride the
    quantize-then-rank parity contract: tfidf_q9 = int64
    ``floor((tf * ln(N/df)) * 1e9 + 0.5)`` — rank = (score DESC, term
    ASC) compares integers/strings only, so the DuckDB twin matches
    bit-for-bit. Two passes: df stats (bucketed count shuffle, broadcast
    vocab-bounded table) then one scoring scan; no corpus shuffle."""
    import pandas as pd
    import ray

    # N (total docs) via a per-batch count combiner — no data shuffles
    def ndocs_partial(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    n_docs_total = sum(
        r["n"] for r in ds.map_batches(ndocs_partial, batch_format="pyarrow",
                                       batch_size=None).take_all())

    df_tab = doc_freqs(ds, column=column).to_pandas().sort_values("tok")
    model_ref = ray.put((df_tab["tok"].to_numpy(),
                         df_tab["n"].to_numpy().astype(np.int64),
                         int(n_docs_total)))

    def score(batch: pa.Table) -> pa.Table:
        tune_allocator()
        toks_sorted, dfs, N = ray.get(model_ref)
        codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if codes.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tfidf_q9": pa.array([], pa.int64()),
                             "rnk": pa.array([], pa.int64())})
        key = tok_doc * np.int64(len(vocab)) + codes
        uniq, tf = np.unique(key, return_counts=True)
        ud = (uniq // len(vocab)).astype(np.int64)
        uc = (uniq % len(vocab)).astype(np.int64)
        vtoks = vocab.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(toks_sorted, vtoks)
        pos_c = np.minimum(pos, max(len(toks_sorted) - 1, 0))
        hit = (toks_sorted[pos_c] == vtoks) if len(toks_sorted) else \
            np.zeros(len(vtoks), bool)
        dfv = np.where(hit, dfs[pos_c] if len(dfs) else 0, 0)
        # every scanned token is in the model when trained on the same
        # corpus; guard df=0 anyway (scores as df=N → 0)
        dfv = np.where(dfv == 0, N, dfv).astype(np.int64)
        lnidf = np.log(np.float64(N) / dfv.astype(np.float64))
        q = np.floor((tf.astype(np.float64) * lnidf[uc]) * QUANT + 0.5) \
            .astype(np.int64)
        frame = pd.DataFrame({"doc_id": ids[ud],
                              "term": pd.Series(vtoks[uc], dtype=object),
                              "tfidf_q9": q})
        frame = frame.sort_values(["doc_id", "tfidf_q9", "term"],
                                  ascending=[True, False, True],
                                  kind="stable")
        top = frame.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
        top["rnk"] = (top.groupby("doc_id", sort=False).cumcount() + 1) \
            .astype(np.int64)
        return pa.Table.from_pandas(top, preserve_index=False)

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def tfidf_topk_sql(k: int = 3, table: str = "documents",
                   column: str = "text", id_column: str = "doc_id") -> str:
    """DuckDB twin: same tokenizer, same int64-quantized score, same
    (score DESC, term ASC) rank."""
    return (
        f"WITH toks AS (SELECT doc_id, tok FROM (SELECT {id_column} AS doc_id, "
        f"unnest(regexp_split_to_array(trim({column}), '\\s+')) AS tok "
        f"FROM {table}) WHERE tok <> ''), "
        f"n AS (SELECT COUNT(*) AS nd FROM {table}), "
        "dfs AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1), "
        "dtf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM toks GROUP BY 1, 2), "
        "scored AS (SELECT d.doc_id, d.tok AS term, "
        "CAST(floor((CAST(d.tf AS DOUBLE) * "
        "ln(CAST(n.nd AS DOUBLE) / CAST(f.df AS DOUBLE))) * 1000000000.0 "
        "+ 0.5) AS BIGINT) AS tfidf_q9 "
        "FROM dtf d JOIN dfs f USING (tok) CROSS JOIN n) "
        "SELECT doc_id, term, tfidf_q9, CAST(row_number() OVER "
        "(PARTITION BY doc_id ORDER BY tfidf_q9 DESC, term) AS BIGINT) AS rnk "
        f"FROM scored QUALIFY rnk <= {k}"
    )


# ---------------------------------------------------------------------------
# perplexity quality gate — composed filter (scorer + histogram quantile)
# ---------------------------------------------------------------------------


def filter_by_perplexity(ds, p: float = 0.5, bucket_div: int = 1_000_000,
                         column: str = "text", id_column: str = "doc_id"):
    """CCNet's actual filtering step: drop the worst-perplexity tail.
    Keeps docs whose average-NLL bucket (``(nll_q9 // n_tokens) //
    bucket_div`` — millinat resolution by default, 0 for empty docs) is
    <= the corpus p-quantile bucket → Dataset (doc_id, ppl_bucket).

    Composition of doc_perplexity + the mergeable-histogram quantile
    (sketch.length_quantiles' quantile_disc rule: sorted v[ceil(p*n)-1]
    read off the cumulative histogram). The histogram is bounded by the
    bucket grid (~50k rows for 0-50 nats), never corpus size. The scored
    frame (3 int columns) is materialized once and consumed by both the
    histogram and the filter — at 100 TB persist it to parquet instead
    (the text-index pattern) so the filter pass is a pruned re-read."""
    import math

    scored = doc_perplexity(ds, column=column,
                            id_column=id_column).materialize()

    def bucketize(t: pa.Table) -> pa.Table:
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False)
        nll = t.column("nll_q9").to_numpy(zero_copy_only=False)
        b = np.where(nt > 0, (nll // np.maximum(nt, 1)) // bucket_div,
                     0).astype(np.int64)
        return pa.table({id_column: t.column(id_column),
                         "ppl_bucket": pa.array(b)})

    buck = scored.map_batches(bucketize, batch_format="pyarrow",
                              batch_size=None)

    def hist_partial(t: pa.Table) -> pa.Table:
        b = t.column("ppl_bucket").to_numpy(zero_copy_only=False)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(ub.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = buck.map_batches(hist_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    hist = parts.groupby("b", sort=True)["cnt"].sum()
    cum = hist.to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return buck
    idx = int(np.searchsorted(cum, max(math.ceil(p * n), 1)))
    cutoff = int(hist.index.to_numpy(np.int64)[idx])

    def keep(t: pa.Table) -> pa.Table:
        b = t.column("ppl_bucket").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(b <= cutoff))

    return buck.map_batches(keep, batch_format="pyarrow", batch_size=None)


def filter_by_perplexity_sql(p: float = 0.5, bucket_div: int = 1_000_000,
                             table: str = "documents",
                             column: str = "text",
                             id_column: str = "doc_id") -> str:
    """DuckDB twin: scored CTE = doc_perplexity_sql, same integer
    bucketing, quantile_disc cutoff (the length_quantiles-verified
    equivalence), same <= filter."""
    scored = doc_perplexity_sql(table=table, column=column,
                                id_column=id_column)
    return (
        f"WITH scored AS ({scored}), "
        "b AS (SELECT doc_id, CAST(CASE WHEN n_tokens = 0 THEN 0 "
        f"ELSE (nll_q9 // n_tokens) // {bucket_div} END AS BIGINT) "
        "AS ppl_bucket FROM scored), "
        f"cut AS (SELECT quantile_disc(ppl_bucket, {p}) AS c FROM b) "
        "SELECT doc_id, ppl_bucket FROM b, cut WHERE ppl_bucket <= cut.c"
    )


# ---------------------------------------------------------------------------
# Bigram LM perplexity — the model-as-TABLE scoring shape
# ---------------------------------------------------------------------------

def _batch_bigrams(batch: pa.Table, column: str):
    """(doc-local bigram arrays) — consecutive kept tokens within a doc
    (empties dropped first, mirroring the SQL re-ranked positions):
    returns (c1, c2, bdoc, vocab, n_docs, n_big_per_doc)."""
    codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
    if codes.size < 2:
        z = np.empty(0, np.int64)
        return z, z, z, vocab, n_docs, np.zeros(n_docs, np.int64)
    same = tok_doc[1:] == tok_doc[:-1]
    c1 = codes[:-1][same]
    c2 = codes[1:][same]
    bdoc = tok_doc[:-1][same]
    return c1, c2, bdoc, vocab, n_docs, \
        np.bincount(bdoc, minlength=n_docs).astype(np.int64)


def _pair_strings(vocab, c1, c2):
    t1 = vocab.take(pa.array(c1, pa.int64()))
    t2 = vocab.take(pa.array(c2, pa.int64()))
    return t1, t2


def _crc_np(strings: pa.Array, n_buckets: int) -> np.ndarray:
    import zlib

    return np.fromiter((zlib.crc32(v.encode()) % n_buckets
                        for v in strings.to_pylist()),
                       np.int32, count=len(strings))


def _bg_table(bucket, kind, doc_id, t1, t2, tf, cb, ctx):
    """Typed shared schema for every bigram-perplexity channel."""
    return pa.table({
        "bucket": pa.array(np.asarray(bucket, np.int32)),
        "kind": pa.array(np.asarray(kind, np.int8)),
        "doc_id": pa.array(np.asarray(doc_id, np.int64)),
        "t1": pa.array(list(t1), pa.string()),
        "t2": pa.array(list(t2), pa.string()),
        "tf": pa.array(np.asarray(tf, np.int64)),
        "cb": pa.array(np.asarray(cb, np.int64)),
        "ctx": pa.array(np.asarray(ctx, np.int64)),
    })


_EMPTY_BG = _bg_table([], [], [], [], [], [], [], [])


def bigram_perplexity(ds_factory, column: str = "text",
                      id_column: str = "doc_id", n_buckets: int = 64):
    """Per-doc add-1-smoothed BIGRAM NLL → Dataset (doc_id, n_bigrams,
    nll_q9), p(w2|w1) = (c(w1,w2)+1) / (ctx(w1)+V) with ctx(w1) = w1's
    occurrences as a bigram FIRST element and V = the full unigram
    vocabulary size.

    THE POINT vs doc_perplexity: a bigram model is vocabulary²-bounded —
    too big to broadcast at 100 TB — so scoring is a DISTRIBUTED JOIN:
    LM partial counts and doc-term rows bucket by the SAME crc32(t1)
    key and one tagged-union groupby joins them (ctx is summed in the
    bucket that owns ALL of t1's bigrams).

    SHAPE (the speculative-backoff recipe): ONE fused corpus scan emits
    every channel from a single tokenize — LM bigram partials + doc
    term rows (join zone, crc(t1)), per-batch DISTINCT tokens (vocab
    zone, crc(tok) — each token's distinct-ness is a local decision),
    and per-doc sentinels (doc zone) — into ONE zone-tagged composite
    groupby; V then rides to the doc merge as per-vocab-bucket stats
    rows replicated to every doc bucket, so the q quantization happens
    in the SECOND (doc) groupby with the identical float expression and
    NO driver-side V count. 1 scan + 2 shuffles total (was 4 scans + 4
    barriers); int64-quantized terms still make the per-doc reduction
    order-free. ``ds_factory()`` must return a FRESH reader per call."""
    import pandas as pd

    nb = n_buckets

    def combined(batch: pa.Table) -> pa.Table:
        tune_allocator()
        out = []
        c1, c2, bdoc, vocab, n_docs, nbig = _batch_bigrams(batch, column)
        ids = batch.column(id_column).to_numpy().astype(np.int64)
        if n_docs:
            nd = ids.shape[0]
            out.append(_bg_table(          # doc sentinels (zone 0)
                (ids % nb).astype(np.int32), np.full(nd, 3, np.int8),
                ids, [""] * nd, [""] * nd, nbig,
                np.zeros(nd), np.zeros(nd)))
        nv_tokens = len(vocab)
        # the split dictionary may hold the dropped "" token (codes filter
        # it, the dictionary keeps it) — V counts KEPT tokens only
        kept_vocab = vocab.filter(
            pc.greater(pc.utf8_length(vocab), 0)) if nv_tokens else vocab
        nk = len(kept_vocab)
        if nk:                              # vocab zone (2): batch-unique
            out.append(_bg_table(
                2 * nb + _crc_np(kept_vocab, nb),
                np.full(nk, 5, np.int8),
                np.full(nk, -1, np.int64),
                kept_vocab.to_pylist(), [""] * nk,
                np.zeros(nk), np.zeros(nk),
                np.zeros(nk)))
        if c1.size:
            nv = np.int64(nv_tokens)
            key = c1 * nv + c2              # LM partials (zone 1)
            uniq, cnt = np.unique(key, return_counts=True)
            v1, v2 = _pair_strings(vocab, uniq // nv, uniq % nv)
            n = len(cnt)
            out.append(_bg_table(
                1 * nb + _crc_np(v1, nb), np.full(n, 2, np.int8),
                np.full(n, -1, np.int64), v1.to_pylist(), v2.to_pylist(),
                np.zeros(n), cnt, np.zeros(n)))
            if np.int64(n_docs) * nv * nv < np.int64(1) << 62:
                k2 = (bdoc * nv + c1) * nv + c2
                uniq, tf = np.unique(k2, return_counts=True)
                ud = uniq // (nv * nv)
                uc1 = (uniq // nv) % nv
                uc2 = uniq % nv
            else:   # fused key would overflow — unique over stacked rows
                rows = np.stack([bdoc, c1, c2], axis=1)
                uniq_rows, tf = np.unique(rows, axis=0, return_counts=True)
                ud, uc1, uc2 = uniq_rows.T
            t1, t2 = _pair_strings(vocab, uc1, uc2)
            n = len(tf)
            out.append(_bg_table(           # doc term rows (zone 1)
                1 * nb + _crc_np(t1, nb), np.zeros(n, np.int8),
                ids[ud], t1.to_pylist(), t2.to_pylist(), tf,
                np.zeros(n), np.zeros(n)))
        return pa.concat_tables(out) if out else _EMPTY_BG

    def zone_join(df: "pd.DataFrame") -> pa.Table:
        tune_allocator()
        zone = int(df["bucket"].iloc[0]) // nb
        if zone == 0:                      # sentinels pass through
            n = len(df)
            return _bg_table(
                df["bucket"].to_numpy(np.int32),
                df["kind"].to_numpy(np.int8),
                df["doc_id"].to_numpy(np.int64), [""] * n, [""] * n,
                df["tf"].to_numpy(np.int64), df["cb"].to_numpy(np.int64),
                df["ctx"].to_numpy(np.int64))
        if zone == 2:                      # V partial → every doc bucket
            vb = int(df.loc[df["kind"] == 5, "t1"].nunique())
            return _bg_table(
                np.arange(nb, dtype=np.int32), np.full(nb, 4, np.int8),
                np.full(nb, -1, np.int64), [""] * nb, [""] * nb,
                np.zeros(nb), np.full(nb, vb, np.int64), np.zeros(nb))
        lmr = df[df["kind"] == 2]
        tr = df[df["kind"] == 0]
        if tr.empty:
            return _EMPTY_BG
        agg = lmr.groupby(["t1", "t2"], sort=False)["cb"].sum() \
            .reset_index()
        if len(agg):
            agg["ctx"] = agg.groupby("t1", sort=False)["cb"] \
                .transform("sum")
        else:
            agg["ctx"] = np.empty(0, np.int64)
        m = tr.merge(agg, on=["t1", "t2"], how="inner",
                     suffixes=("", "_lm"))
        n = len(m)
        doc = m["doc_id"].to_numpy(np.int64)
        return _bg_table(                  # resolved rows → doc buckets
            (doc % nb).astype(np.int32), np.ones(n, np.int8), doc,
            [""] * n, [""] * n, m["tf"].to_numpy(np.int64),
            m["cb_lm"].to_numpy(np.int64), m["ctx_lm"].to_numpy(np.int64))

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        tune_allocator()
        V = int(df.loc[df["kind"] == 4, "cb"].sum())
        s = df[df["kind"] == 3]
        tq = df[df["kind"] == 1]
        if len(tq):
            # the EXACT former join_q expression, with V from the shuffle
            lnp = np.log((tq["cb"].to_numpy(np.float64) + 1.0)
                         / (tq["ctx"].to_numpy(np.float64)
                            + np.float64(V)))
            q = np.floor((tq["tf"].to_numpy(np.float64) * lnp)
                         * QUANT + 0.5).astype(np.int64)
            nll = pd.Series(q).groupby(
                tq["doc_id"].to_numpy(np.int64)).sum()
        else:
            nll = pd.Series(np.empty(0, np.int64),
                            index=np.empty(0, np.int64))
        out = s[["doc_id", "tf"]].rename(columns={"tf": "n_bigrams"}) \
            .copy()
        out["nll_q9"] = -nll.reindex(out["doc_id"]).fillna(0) \
            .to_numpy(np.int64)
        out["n_bigrams"] = out["n_bigrams"].astype(np.int64)
        return out[["doc_id", "n_bigrams", "nll_q9"]]

    parts = ds_factory().map_batches(combined, batch_format="pyarrow",
                                     batch_size=None)
    joined = parts.groupby("bucket").map_groups(zone_join,
                                                batch_format="pandas")
    return joined.groupby("bucket").map_groups(finish,
                                               batch_format="pandas")


def bigram_perplexity_sql(table: str = "documents", column: str = "text",
                          id_column: str = "doc_id") -> str:
    """DuckDB twin: same tokenizer (kept-token re-rank — the
    dup_span_stats trim gotcha), same ctx/V definitions, same int64
    term quantization before the per-doc SUM."""
    return (
        f"WITH raw AS (SELECT {id_column} AS doc_id, "
        f"unnest(regexp_split_to_array(trim({column}), '\\s+')) AS tok, "
        f"generate_subscripts(regexp_split_to_array(trim({column}), "
        f"'\\s+'), 1) AS i FROM {table}), "
        "toks AS (SELECT doc_id, tok, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY i) AS p FROM raw WHERE tok <> ''), "
        "vs AS (SELECT COUNT(DISTINCT tok) AS v FROM toks), "
        "big AS (SELECT a.doc_id, a.tok AS t1, b.tok AS t2 FROM toks a "
        "JOIN toks b ON b.doc_id = a.doc_id AND b.p = a.p + 1), "
        "cb AS (SELECT t1, t2, COUNT(*) AS cb FROM big GROUP BY 1, 2), "
        "ctx AS (SELECT t1, SUM(cb) AS ctx FROM cb GROUP BY 1), "
        "dtf AS (SELECT doc_id, t1, t2, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM big GROUP BY 1, 2, 3), "
        "terms AS (SELECT d.doc_id, d.tf, CAST(floor((CAST(d.tf AS DOUBLE) "
        "* ln((CAST(cb.cb AS DOUBLE) + 1.0) / "
        "CAST(ctx.ctx + vs.v AS DOUBLE))) * 1000000000.0 + 0.5) AS BIGINT) "
        "AS q FROM dtf d JOIN cb USING (t1, t2) JOIN ctx USING (t1) "
        "CROSS JOIN vs) "
        f"SELECT doc.{id_column} AS doc_id, "
        "CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bigrams, "
        "CAST(COALESCE(-s.snll, 0) AS BIGINT) AS nll_q9 "
        f"FROM {table} doc LEFT JOIN (SELECT doc_id, SUM(tf) AS nb, "
        "SUM(q) AS snll FROM terms GROUP BY 1) s "
        f"ON s.doc_id = doc.{id_column}"
    )


# ---------------------------------------------------------------------------
# Trigram stupid-backoff LM — CASCADED backoff joins
# ---------------------------------------------------------------------------

def _batch_trigrams(batch: pa.Table, column: str):
    """(doc-local trigram arrays): consecutive kept-token triples within
    a doc → (a, b, c, tdoc, vocab, n_docs, n_tri_per_doc). tok_doc is
    nondecreasing, so tok_doc[i] == tok_doc[i+2] ⇒ all three tokens
    share a doc."""
    codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
    if codes.size < 3:
        z = np.empty(0, np.int64)
        return z, z, z, z, vocab, n_docs, np.zeros(n_docs, np.int64)
    same = tok_doc[2:] == tok_doc[:-2]
    a = codes[:-2][same]
    b = codes[1:-1][same]
    c = codes[2:][same]
    tdoc = tok_doc[:-2][same]
    return a, b, c, tdoc, vocab, n_docs, \
        np.bincount(tdoc, minlength=n_docs).astype(np.int64)


def _split_rows(batch: pa.Table, id_column: str, train_mod: int,
                want_train: bool) -> pa.Table:
    """Deterministic hash-free corpus split: train = doc_id % m != 0,
    score = doc_id % m == 0 (the nb_classify / dsir seed-split shape)."""
    ids = batch.column(id_column).to_numpy()
    m = (ids % train_mod) == 0
    return batch.filter(pa.array(~m if want_train else m))


_ALPHA = np.float64(0.4)  # Brants et al. 2007's fixed backoff penalty




def _tri_counts(a, b, c, vocab):
    """per-batch unique (a,b,c) triples + counts; fused int key with a
    stacked-rows fallback when base-V packing would overflow (the
    repetition_stats pattern)."""
    nv = np.int64(len(vocab))
    if nv ** 3 < np.int64(1) << 62:
        key = (a * nv + b) * nv + c
        uniq, cnt = np.unique(key, return_counts=True)
        return uniq // (nv * nv), (uniq // nv) % nv, uniq % nv, cnt
    rows = np.stack([a, b, c], axis=1)
    uniq_rows, cnt = np.unique(rows, axis=0, return_counts=True)
    return uniq_rows[:, 0], uniq_rows[:, 1], uniq_rows[:, 2], cnt


def _spec_table(bucket, kind, lvl, doc_id, t2, t3, k123, tf, cb, ctx, q):
    """The ONE typed schema every speculative-backoff channel shares
    (explicit pa types — pandas-inferred empty object columns would
    null-type and break the union)."""
    return pa.table({
        "bucket": pa.array(np.asarray(bucket, np.int32)),
        "kind": pa.array(np.asarray(kind, np.int8)),
        "lvl": pa.array(np.asarray(lvl, np.int8)),
        "doc_id": pa.array(np.asarray(doc_id, np.int64)),
        "t2": pa.array(list(t2), pa.string()),
        "t3": pa.array(list(t3), pa.string()),
        "k123": pa.array(list(k123), pa.string()),
        "tf": pa.array(np.asarray(tf, np.int64)),
        "cb": pa.array(np.asarray(cb, np.int64)),
        "ctx": pa.array(np.asarray(ctx, np.int64)),
        "q": pa.array(np.asarray(q, np.int64)),
    })


_EMPTY_SPEC = _spec_table([], [], [], [], [], [], [], [], [], [], [])


def backoff_trigram_perplexity(ds_factory, column: str = "text",
                               id_column: str = "doc_id",
                               train_mod: int = 3, n_buckets: int = 64):
    """Stupid-backoff TRIGRAM scoring (Brants et al. 2007) of the
    held-out split (doc_id % train_mod == 0) against an LM trained on
    the REST of the corpus → Dataset (doc_id, n_trigrams, nll_q9).

        S(w3|w1 w2) = c3(w1w2w3)/ctx12(w1w2)        if the trigram is
                                                     in the train split
                    = 0.4 · (c2(w2w3)/ctx2(w2))      else if the bigram is
                    = 0.4 · (0.4 · ((c1(w3)+1)/(N+V)))  else (add-1 floor
                                                     so unseen words stay
                                                     finite)

    ctx12/ctx2 are CONTEXT counts (occurrences as an n-gram prefix —
    summed in the bucket that owns all of the prefix's n-grams), so a
    level's hit ratio is always well-defined and ≤ 1.

    SHAPE — speculative parallel levels, NOT a sequential cascade: a
    sequential backoff (score level 3, ship misses to level 2, then to
    level 1) costs one all-to-all barrier PER LEVEL plus a final doc
    merge — wall-clock is barrier-count-bound on any cluster. Instead
    every held-out trigram emits term rows for ALL THREE levels at once
    (zone-tagged composite bucket = lvl·B + crc(level key) % B), ONE
    fused corpus scan also emits the three model-count partials, ONE
    composite groupby joins every level independently (hits score at
    their level; level 1 always resolves), and ONE doc-bucket merge
    picks the highest resolved level per (doc, trigram) — provably the
    cascade's choice — and integer-sums per-doc NLL. N and V ride the
    shuffle as per-bucket stats rows (kind 4, replicated to every doc
    bucket), so there is no driver-side sync at all: 1 scan + 2
    shuffles total, term-bounded rows only, and per-term scores are
    int64-quantized at their resolving level with the EXACT float
    expressions of the sequential formulation (measured 16→~6 s at
    sf0.1 from barrier elimination alone). ``ds_factory()`` must return
    a fresh reader per call (the lineage invariant)."""
    import pandas as pd

    nb = n_buckets

    def combined_partial(batch: pa.Table) -> pa.Table:
        tune_allocator()
        out = []
        # --- train-split model partials (levels 3, 2, 1) ---
        t = _split_rows(batch, id_column, train_mod, True)
        a, b, c, _, vocab, _, _ = _batch_trigrams(t, column)
        if a.size:
            ua, ub, uc, cnt = _tri_counts(a, b, c, vocab)
            va = vocab.take(pa.array(ua, pa.int64()))
            vb = vocab.take(pa.array(ub, pa.int64()))
            k12 = pc.binary_join_element_wise(va, vb, " ")
            n = len(cnt)
            out.append(_spec_table(
                3 * nb + _crc_np(k12, nb), np.full(n, 2, np.int8),
                np.full(n, 3, np.int8), np.full(n, -1, np.int64),
                k12.to_pylist(),
                vocab.take(pa.array(uc, pa.int64())).to_pylist(),
                [""] * n, np.zeros(n), cnt, np.zeros(n), np.zeros(n)))
        c1b, c2b, _, bvocab, _, _ = _batch_bigrams(t, column)
        if c1b.size:
            nv = np.int64(len(bvocab))
            key = c1b * nv + c2b
            uniq, cnt = np.unique(key, return_counts=True)
            v1, v2 = _pair_strings(bvocab, uniq // nv, uniq % nv)
            n = len(cnt)
            out.append(_spec_table(
                2 * nb + _crc_np(v1, nb), np.full(n, 2, np.int8),
                np.full(n, 2, np.int8), np.full(n, -1, np.int64),
                v1.to_pylist(), v2.to_pylist(), [""] * n,
                np.zeros(n), cnt, np.zeros(n), np.zeros(n)))
        codes, _, uvocab, _ = _split_codes(t, column)
        if codes.size:
            ucnt = np.bincount(codes, minlength=len(uvocab)).astype(np.int64)
            nz = ucnt > 0
            toks = uvocab.filter(pa.array(nz))
            n = len(toks)
            out.append(_spec_table(
                1 * nb + _crc_np(toks, nb), np.full(n, 2, np.int8),
                np.full(n, 1, np.int8), np.full(n, -1, np.int64),
                [""] * n, toks.to_pylist(), [""] * n,
                np.zeros(n), ucnt[nz], np.zeros(n), np.zeros(n)))

        # --- held-out term rows (all three levels) + doc sentinels ---
        sc = _split_rows(batch, id_column, train_mod, False)
        ids = sc.column(id_column).to_numpy().astype(np.int64)
        a, b, c, tdoc, vocab, n_docs, ntri = _batch_trigrams(sc, column)
        if n_docs:
            nd = ids.shape[0]
            out.append(_spec_table(
                (ids % nb).astype(np.int32), np.full(nd, 3, np.int8),
                np.zeros(nd, np.int8), ids, [""] * nd, [""] * nd,
                [""] * nd, ntri, np.zeros(nd), np.zeros(nd), np.zeros(nd)))
        if a.size:
            nv = np.int64(len(vocab))
            if np.int64(n_docs) * nv ** 3 < np.int64(1) << 62:
                key = ((tdoc * nv + a) * nv + b) * nv + c
                uniq, tf = np.unique(key, return_counts=True)
                ud = uniq // (nv ** 3)
                ua = (uniq // (nv * nv)) % nv
                ub = (uniq // nv) % nv
                uc = uniq % nv
            else:
                rows = np.stack([tdoc, a, b, c], axis=1)
                uniq_rows, tf = np.unique(rows, axis=0, return_counts=True)
                ud, ua, ub, uc = uniq_rows.T
            va = vocab.take(pa.array(ua, pa.int64()))
            vb = vocab.take(pa.array(ub, pa.int64()))
            vc = vocab.take(pa.array(uc, pa.int64()))
            k12 = pc.binary_join_element_wise(va, vb, " ")
            k123 = pc.binary_join_element_wise(k12, vc, " ")
            n = len(tf)
            docs = ids[ud]
            zeros = np.zeros(n)
            k123l = k123.to_pylist()
            vbl = vb.to_pylist()
            vcl = vc.to_pylist()
            out.append(_spec_table(          # level-3 term rows
                3 * nb + _crc_np(k12, nb), np.zeros(n, np.int8),
                np.full(n, 3, np.int8), docs, k12.to_pylist(), vcl,
                k123l, tf, zeros, zeros, zeros))
            out.append(_spec_table(          # level-2 term rows
                2 * nb + _crc_np(vb, nb), np.zeros(n, np.int8),
                np.full(n, 2, np.int8), docs, vbl, vcl,
                k123l, tf, zeros, zeros, zeros))
            out.append(_spec_table(          # level-1 term rows
                1 * nb + _crc_np(vc, nb), np.zeros(n, np.int8),
                np.full(n, 1, np.int8), docs, [""] * n, vcl,
                k123l, tf, zeros, zeros, zeros))
        return pa.concat_tables(out) if out else _EMPTY_SPEC

    def level_join(df: "pd.DataFrame") -> pa.Table:
        tune_allocator()
        zone = int(df["bucket"].iloc[0]) // nb
        if zone == 0:            # doc sentinels pass straight to stage C
            return _spec_table(
                df["bucket"].to_numpy(np.int32),
                df["kind"].to_numpy(np.int8), df["lvl"].to_numpy(np.int8),
                df["doc_id"].to_numpy(np.int64),
                [""] * len(df), [""] * len(df), [""] * len(df),
                df["tf"].to_numpy(np.int64), df["cb"].to_numpy(np.int64),
                df["ctx"].to_numpy(np.int64), df["q"].to_numpy(np.int64))
        lmr = df[df["kind"] == 2]
        tr = df[df["kind"] == 0]
        out = []
        if zone == 3:
            if not tr.empty:
                cb = lmr.groupby(["t2", "t3"], sort=False)["cb"].sum() \
                    .reset_index()
                if len(cb):
                    cb["ctx"] = cb.groupby("t2", sort=False)["cb"] \
                        .transform("sum")
                else:
                    cb["ctx"] = np.empty(0, np.int64)
                m = tr.merge(cb, on=["t2", "t3"], how="left",
                             suffixes=("", "_lm"))
                hit = m["cb_lm"].notna().to_numpy()
                if hit.any():
                    tfv = m["tf"].to_numpy(np.int64)
                    doc = m["doc_id"].to_numpy(np.int64)
                    r = np.log(m["cb_lm"].to_numpy(np.float64)[hit]
                               / m["ctx_lm"].to_numpy(np.float64)[hit])
                    q = np.floor((tfv[hit].astype(np.float64) * r)
                                 * QUANT + 0.5).astype(np.int64)
                    n = int(hit.sum())
                    out.append(_spec_table(
                        (doc[hit] % nb).astype(np.int32),
                        np.ones(n, np.int8), np.full(n, 3, np.int8),
                        doc[hit], [""] * n, [""] * n,
                        m["k123"].to_numpy()[hit].tolist(),
                        tfv[hit], np.zeros(n), np.zeros(n), q))
        elif zone == 2:
            if not tr.empty:
                cb = lmr.groupby(["t2", "t3"], sort=False)["cb"].sum() \
                    .reset_index()
                if len(cb):
                    cb["ctx"] = cb.groupby("t2", sort=False)["cb"] \
                        .transform("sum")
                else:
                    cb["ctx"] = np.empty(0, np.int64)
                m = tr.merge(cb, on=["t2", "t3"], how="left",
                             suffixes=("", "_lm"))
                hit = m["cb_lm"].notna().to_numpy()
                if hit.any():
                    tfv = m["tf"].to_numpy(np.int64)
                    doc = m["doc_id"].to_numpy(np.int64)
                    r = np.log(_ALPHA
                               * (m["cb_lm"].to_numpy(np.float64)[hit]
                                  / m["ctx_lm"].to_numpy(np.float64)[hit]))
                    q = np.floor((tfv[hit].astype(np.float64) * r)
                                 * QUANT + 0.5).astype(np.int64)
                    n = int(hit.sum())
                    out.append(_spec_table(
                        (doc[hit] % nb).astype(np.int32),
                        np.ones(n, np.int8), np.full(n, 2, np.int8),
                        doc[hit], [""] * n, [""] * n,
                        m["k123"].to_numpy()[hit].tolist(),
                        tfv[hit], np.zeros(n), np.zeros(n), q))
        else:                    # zone 1: always resolves; also N/V stats
            cb = lmr.groupby("t3", sort=False)["cb"].sum().reset_index()
            if not tr.empty:
                m = tr.merge(cb, on="t3", how="left", suffixes=("", "_lm"))
                c1 = m["cb_lm"].fillna(0).to_numpy(np.int64)
                doc = m["doc_id"].to_numpy(np.int64)
                n = len(m)
                out.append(_spec_table(
                    (doc % nb).astype(np.int32), np.ones(n, np.int8),
                    np.full(n, 1, np.int8), doc, [""] * n, [""] * n,
                    m["k123"].to_numpy().tolist(),
                    m["tf"].to_numpy(np.int64), c1,
                    np.zeros(n), np.zeros(n)))
            # this bucket's (N, V) partial, replicated to every doc bucket
            bn = int(cb["cb"].sum()) if len(cb) else 0
            bv = int(len(cb))
            out.append(_spec_table(
                np.arange(nb, dtype=np.int32), np.full(nb, 4, np.int8),
                np.zeros(nb, np.int8), np.full(nb, -1, np.int64),
                [""] * nb, [""] * nb, [""] * nb, np.zeros(nb),
                np.full(nb, bn, np.int64), np.full(nb, bv, np.int64),
                np.zeros(nb)))
        return pa.concat_tables(out) if out else _EMPTY_SPEC

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        tune_allocator()
        stats = df[df["kind"] == 4]
        denom = np.float64(int(stats["cb"].sum()) + int(stats["ctx"].sum()))
        s = df[df["kind"] == 3]
        tq = df[df["kind"] == 1].copy()
        if len(tq):
            l1 = tq["lvl"].to_numpy(np.int8) == 1
            if l1.any():
                c1 = tq["cb"].to_numpy(np.int64).astype(np.float64)[l1]
                tfv = tq["tf"].to_numpy(np.int64)[l1]
                r = np.log(_ALPHA * (_ALPHA * ((c1 + 1.0) / denom)))
                q1 = np.floor((tfv.astype(np.float64) * r)
                              * QUANT + 0.5).astype(np.int64)
                qcol = tq["q"].to_numpy(np.int64).copy()
                qcol[l1] = q1
                tq["q"] = qcol
            # the cascade's choice: highest resolved level per (doc, k123)
            tq = tq.sort_values(["doc_id", "k123", "lvl"],
                                ascending=[True, True, False],
                                kind="stable") \
                .drop_duplicates(["doc_id", "k123"], keep="first")
        nll = tq.groupby("doc_id", sort=False)["q"].sum()
        out = s[["doc_id", "tf"]].rename(columns={"tf": "n_trigrams"}) \
            .copy()
        out["nll_q9"] = -nll.reindex(out["doc_id"]).fillna(0) \
            .to_numpy(np.int64)
        out["n_trigrams"] = out["n_trigrams"].astype(np.int64)
        return out[["doc_id", "n_trigrams", "nll_q9"]]

    parts = ds_factory().map_batches(combined_partial,
                                     batch_format="pyarrow",
                                     batch_size=None)
    joined = parts.groupby("bucket").map_groups(level_join,
                                                batch_format="pandas")
    return joined.groupby("bucket").map_groups(finish,
                                               batch_format="pandas")


def backoff_trigram_sql(table: str = "documents", column: str = "text",
                        id_column: str = "doc_id",
                        train_mod: int = 3) -> str:
    """DuckDB twin: same tokenizer/split, same context-count
    definitions, the SAME three-branch CASE with exact parenthesization
    (CAST(0.4 AS DOUBLE) mirrors np.float64(0.4)), int64 quantization
    before the per-doc SUM."""
    case = (
        "CASE WHEN t.c3 IS NOT NULL THEN "
        "CAST(t.c3 AS DOUBLE) / CAST(x12.ctx12 AS DOUBLE) "
        "WHEN b.c2 IS NOT NULL THEN CAST(0.4 AS DOUBLE) * "
        "(CAST(b.c2 AS DOUBLE) / CAST(x2.ctx2 AS DOUBLE)) "
        "ELSE CAST(0.4 AS DOUBLE) * (CAST(0.4 AS DOUBLE) * "
        "((CAST(COALESCE(u.c1, 0) AS DOUBLE) + 1.0) / "
        "CAST(nv.n + nv.v AS DOUBLE))) END")
    return (
        f"WITH raw AS (SELECT {id_column} AS doc_id, "
        f"unnest(regexp_split_to_array(trim({column}), '\\s+')) AS tok, "
        f"generate_subscripts(regexp_split_to_array(trim({column}), "
        f"'\\s+'), 1) AS i FROM {table}), "
        "toks AS (SELECT doc_id, tok, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY i) AS p FROM raw WHERE tok <> ''), "
        f"trn AS (SELECT * FROM toks WHERE doc_id % {train_mod} <> 0), "
        f"sct AS (SELECT * FROM toks WHERE doc_id % {train_mod} = 0), "
        "tri AS (SELECT a.tok AS t1, b.tok AS t2, c.tok AS t3, "
        "COUNT(*) AS c3 FROM trn a JOIN trn b ON b.doc_id = a.doc_id "
        "AND b.p = a.p + 1 JOIN trn c ON c.doc_id = a.doc_id "
        "AND c.p = a.p + 2 GROUP BY 1, 2, 3), "
        "ctx12 AS (SELECT t1, t2, SUM(c3) AS ctx12 FROM tri GROUP BY 1, 2), "
        "big AS (SELECT a.tok AS b1, b.tok AS b2, COUNT(*) AS c2 "
        "FROM trn a JOIN trn b ON b.doc_id = a.doc_id AND b.p = a.p + 1 "
        "GROUP BY 1, 2), "
        "ctx2 AS (SELECT b1, SUM(c2) AS ctx2 FROM big GROUP BY 1), "
        "uni AS (SELECT tok, COUNT(*) AS c1 FROM trn GROUP BY 1), "
        "nv AS (SELECT COUNT(*) AS v, COALESCE(SUM(c1), 0) AS n FROM uni), "
        "dtf AS (SELECT a.doc_id, a.tok AS t1, b.tok AS t2, c.tok AS t3, "
        "CAST(COUNT(*) AS BIGINT) AS tf FROM sct a "
        "JOIN sct b ON b.doc_id = a.doc_id AND b.p = a.p + 1 "
        "JOIN sct c ON c.doc_id = a.doc_id AND c.p = a.p + 2 "
        "GROUP BY 1, 2, 3, 4), "
        "terms AS (SELECT d.doc_id, d.tf, "
        "CAST(floor((CAST(d.tf AS DOUBLE) * "
        f"ln({case})) * 1000000000.0 + 0.5) AS BIGINT) AS q "
        "FROM dtf d "
        "LEFT JOIN tri t ON t.t1 = d.t1 AND t.t2 = d.t2 AND t.t3 = d.t3 "
        "LEFT JOIN ctx12 x12 ON x12.t1 = d.t1 AND x12.t2 = d.t2 "
        "LEFT JOIN big b ON b.b1 = d.t2 AND b.b2 = d.t3 "
        "LEFT JOIN ctx2 x2 ON x2.b1 = d.t2 "
        "LEFT JOIN uni u ON u.tok = d.t3 CROSS JOIN nv) "
        f"SELECT doc.{id_column} AS doc_id, "
        "CAST(COALESCE(s.nt, 0) AS BIGINT) AS n_trigrams, "
        "CAST(COALESCE(-s.snll, 0) AS BIGINT) AS nll_q9 "
        f"FROM {table} doc LEFT JOIN (SELECT doc_id, SUM(tf) AS nt, "
        "SUM(q) AS snll FROM terms GROUP BY 1) s "
        f"ON s.doc_id = doc.{id_column} "
        f"WHERE doc.{id_column} % {train_mod} = 0"
    )


# ---------------------------------------------------------------------------
# CCNet head/middle/tail tiers — per-language perplexity tertiles
# ---------------------------------------------------------------------------

def ccnet_tiers(ds, qs: tuple[float, float] = (1.0 / 3, 2.0 / 3),
                bucket_div: int = 1_000_000, column: str = "text",
                id_column: str = "doc_id", lang_column: str = "lang"):
    """CCNet's published corpus split (Wenzek et al. 2020): per
    LANGUAGE, rank documents by LM perplexity and cut the corpus into
    head / middle / tail tiers at the ``qs`` quantiles → Dataset
    (doc_id, lang, ppl_bucket, tier) with tier 0 = head (best).

    Composition: doc_perplexity with the lang column riding along →
    integer millinat buckets (the filter_by_perplexity grid) →
    per-(lang, bucket) histogram partials (grid × languages bounded,
    NEVER corpus-sized) → driver-side per-lang quantile_disc cutoffs
    (sorted v[ceil(q*n)-1], the length_quantiles-verified rule) →
    one labeling scan against the broadcast cutoff table. The scored
    frame is materialized once (two consumers — at 100 TB persist it
    to parquet, the text-index pattern)."""
    import math

    scored = doc_perplexity(ds, column=column, id_column=id_column,
                            keep_columns=(lang_column,)).materialize()

    def bucketize(t: pa.Table) -> pa.Table:
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False)
        nll = t.column("nll_q9").to_numpy(zero_copy_only=False)
        b = np.where(nt > 0, (nll // np.maximum(nt, 1)) // bucket_div,
                     0).astype(np.int64)
        return pa.table({id_column: t.column(id_column),
                         lang_column: t.column(lang_column),
                         "ppl_bucket": pa.array(b)})

    buck = scored.map_batches(bucketize, batch_format="pyarrow",
                              batch_size=None)

    def hist_partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "lang": t.column(lang_column).to_pandas(),
            "b": t.column("ppl_bucket").to_numpy(zero_copy_only=False)})
        g = df.groupby(["lang", "b"], sort=False).size() \
            .reset_index(name="cnt")
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "b": pa.array(g["b"].to_numpy(np.int64)),
                         "cnt": pa.array(g["cnt"].to_numpy(np.int64))})

    parts = buck.map_batches(hist_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    cuts: dict[str, tuple[int, int]] = {}
    for lang, g in parts.groupby("lang", sort=False):
        hist = g.groupby("b", sort=True)["cnt"].sum()
        vals = hist.index.to_numpy(np.int64)
        cum = hist.to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        idx = [int(np.searchsorted(cum, max(math.ceil(q * n), 1)))
               for q in qs]
        cuts[lang] = (int(vals[idx[0]]), int(vals[idx[1]]))

    def label(t: pa.Table) -> pa.Table:
        langs = t.column(lang_column).to_pylist()
        b = t.column("ppl_bucket").to_numpy(zero_copy_only=False)
        c1 = np.array([cuts[v][0] for v in langs], np.int64)
        c2 = np.array([cuts[v][1] for v in langs], np.int64)
        tier = np.where(b <= c1, 0, np.where(b <= c2, 1, 2)) \
            .astype(np.int64)
        return t.append_column("tier", pa.array(tier))

    return buck.map_batches(label, batch_format="pyarrow",
                            batch_size=None)


def ccnet_tiers_sql(qs: tuple[float, float] = (1.0 / 3, 2.0 / 3),
                    bucket_div: int = 1_000_000,
                    table: str = "documents", column: str = "text",
                    id_column: str = "doc_id",
                    lang_column: str = "lang") -> str:
    """DuckDB twin: scored CTE = doc_perplexity_sql, same bucketing,
    per-lang quantile_disc cutoffs, same <=-chain labeling."""
    scored = doc_perplexity_sql(table=table, column=column,
                                id_column=id_column)
    return (
        f"WITH scored AS ({scored}), "
        "b AS (SELECT s.doc_id, d.lang, "
        "CAST(CASE WHEN s.n_tokens = 0 THEN 0 "
        f"ELSE (s.nll_q9 // s.n_tokens) // {bucket_div} END AS BIGINT) "
        f"AS ppl_bucket FROM scored s JOIN {table} d "
        f"ON d.{id_column} = s.doc_id), "
        f"c AS (SELECT lang, quantile_disc(ppl_bucket, {qs[0]!r}) AS c1, "
        f"quantile_disc(ppl_bucket, {qs[1]!r}) AS c2 FROM b GROUP BY 1) "
        "SELECT b.doc_id, b.lang, b.ppl_bucket, "
        "CAST(CASE WHEN b.ppl_bucket <= c.c1 THEN 0 "
        "WHEN b.ppl_bucket <= c.c2 THEN 1 ELSE 2 END AS BIGINT) AS tier "
        "FROM b JOIN c USING (lang)"
    )
