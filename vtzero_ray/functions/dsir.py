"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The standard model-free data-selection op: score every raw-corpus doc by
how target-like its hashed n-gram distribution is, then keep the
top-weighted slice. Features are hashed word BIGRAMS (the paper's
hashed n-gram features); the importance weight of doc d is

    log w(d) = sum_f  tf_d[f] * ( ln p_target[f] - ln q_raw[f] )

with add-1-smoothed feature unigram models fit on a small target split
and on the raw corpus.

Exactness contract (the doc_perplexity precedent): the per-FEATURE
log-ratio is quantized to int64 ONCE (floor(x * 1e9 + 0.5) over
integer-derived ln arguments — libm ln agrees bit-for-bit across
engines), then per-doc scores are pure integer multiply-adds, so any
block scheduling and the DuckDB twin land on identical integers.

Scale shape:
- fit = ONE corpus scan emitting per-batch (feature, n_target, n_raw)
  int64 partials (n_dims-bounded, vocab-independent) → ONE output-sized
  repartition(1) merge → a tiny n_dims-row model broadcast via ray.put;
- score = ONE corpus scan; a doc's features are local, so every score
  is a per-batch decision. Nothing shuffles.

Hash parity: feature index = DuckDB md5_number_lower(bigram) % n_dims
(the hash_embed / shuffle_epoch md5 contract); per-batch md5 cost is
bounded by the batch's DISTINCT bigrams (composite-code np.unique, not
per occurrence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vtzero_ray.functions.lm import _split_codes
from vtzero_ray.functions.sketch import CMS
from vtzero_ray.runtime import tune_allocator

QUANT = 1_000_000_000.0  # the repo's 1e-9 quantum


def _batch_bigram_features(batch: pa.Table, n_dims: int, column: str):
    """→ (doc_of, f) int64 arrays: one row per bigram OCCURRENCE, with
    md5 hashed once per distinct bigram."""
    codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
    if codes.size < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64), n_docs
    adj = tok_doc[:-1] == tok_doc[1:]
    a, b = codes[:-1][adj], codes[1:][adj]
    doc_of = tok_doc[:-1][adj]
    if a.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), n_docs
    key = a * np.int64(len(vocab)) + b
    uniq, inv = np.unique(key, return_inverse=True)
    va = vocab.take(pa.array(uniq // len(vocab))).to_pylist()
    vb = vocab.take(pa.array(uniq % len(vocab))).to_pylist()
    h = CMS.hash64([f"{x} {y}" for x, y in zip(va, vb)])
    f = (h % np.uint64(n_dims)).astype(np.int64)
    return doc_of, f[inv], n_docs


def _fit_counts(ds, n_dims: int, target_mod: int, column: str):
    """ONE scan → (n_target, n_raw) int64 vectors of length n_dims."""

    def partial(batch: pa.Table) -> pa.Table:
        tune_allocator()
        doc_of, f, _ = _batch_bigram_features(batch, n_dims, column)
        ids = batch.column("doc_id").to_numpy()
        nt = np.zeros(n_dims, np.int64)
        nr = np.zeros(n_dims, np.int64)
        if f.size:
            is_t = (ids[doc_of] % target_mod) == 0
            nt = np.bincount(f[is_t], minlength=n_dims).astype(np.int64)
            nr = np.bincount(f[~is_t], minlength=n_dims).astype(np.int64)
        return pa.table({"f": pa.array(np.arange(n_dims, dtype=np.int64)),
                         "n_target": pa.array(nt), "n_raw": pa.array(nr)})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(t: pa.Table) -> pa.Table:
        f = t.column("f").to_numpy()
        nt = np.bincount(f, weights=t.column("n_target").to_numpy(),
                         minlength=n_dims).astype(np.int64)
        nr = np.bincount(f, weights=t.column("n_raw").to_numpy(),
                         minlength=n_dims).astype(np.int64)
        return pa.table({"f": pa.array(np.arange(n_dims, dtype=np.int64)),
                         "n_target": pa.array(nt), "n_raw": pa.array(nr)})

    # integer partials are order-independent → ONE output-sized merge task
    tab = parts.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None).take_all()
    nt = np.zeros(n_dims, np.int64)
    nr = np.zeros(n_dims, np.int64)
    for r in tab:
        nt[r["f"]] = r["n_target"]
        nr[r["f"]] = r["n_raw"]
    return nt, nr


def _lambda_table(nt: np.ndarray, nr: np.ndarray) -> np.ndarray:
    """Quantized per-feature log-ratio — int64, integer-derived args."""
    D = nt.shape[0]
    Tt = float(nt.sum() + D)
    Tr = float(nr.sum() + D)
    x = (np.log((nt.astype(np.float64) + 1.0) / Tt)
         - np.log((nr.astype(np.float64) + 1.0) / Tr))
    return np.floor(x * QUANT + 0.5).astype(np.int64)


def dsir_weights(docs_factory, n_dims: int = 256, target_mod: int = 20,
                 column: str = "text"):
    """→ Dataset (doc_id, n_bigrams, dsir_q9) for EVERY document:
    dsir_q9 = sum over distinct features of tf * lambda_q9[f] (pure
    int64), the importance log-weight on the 1e-9 grid. The target
    split is doc_id % target_mod == 0 (the decontaminate convention);
    raw = everything else. ``docs_factory`` returns a fresh Dataset per
    call (fit and score are independent consumers — lineage invariant).
    """
    import ray

    nt, nr = _fit_counts(docs_factory(), n_dims, target_mod, column)
    lam_ref = ray.put(_lambda_table(nt, nr))

    def score(batch: pa.Table) -> pa.Table:
        tune_allocator()
        lam = ray.get(lam_ref)
        doc_of, f, n_docs = _batch_bigram_features(batch, n_dims, column)
        ids = batch.column("doc_id")
        nbig = np.bincount(doc_of, minlength=n_docs).astype(np.int64) \
            if f.size else np.zeros(n_docs, np.int64)
        w = np.zeros(n_docs, np.int64)
        if f.size:
            key = doc_of * np.int64(n_dims) + f
            uniq, tf = np.unique(key, return_counts=True)
            np.add.at(w, uniq // n_dims, tf.astype(np.int64) * lam[uniq % n_dims])
        return pa.table({"doc_id": ids, "n_bigrams": pa.array(nbig),
                         "dsir_q9": pa.array(w)})

    return docs_factory().map_batches(score, batch_format="pyarrow",
                                      batch_size=None)


def dsir_select(docs_factory, p: float = 0.25, bucket_div: int = 1_000_000,
                n_dims: int = 256, target_mod: int = 20,
                column: str = "text"):
    """DSIR's SELECTION step: keep the top-``p`` fraction of the corpus
    by bucketized importance weight → Dataset (doc_id, wbucket).

    Deterministic stand-in for the paper's Gumbel resampling (the
    engine's exactness bar forbids per-row randomness): rank by the
    milli-log-weight bucket and keep buckets >= the (1-p) corpus
    quantile — the filter_by_perplexity histogram composition, with the
    inequality flipped (HIGH weight = target-like = keep).

    GOTCHA mirrored in SQL: dsir_q9 is signed and DuckDB's integer ``//``
    TRUNCATES toward zero while NumPy floor-divides — the bucket uses
    explicit truncating division in both engines. The histogram is
    bucket-grid-bounded, never corpus-sized; the scored frame is
    materialized once and consumed by histogram + filter (at 100 TB
    persist it to parquet instead — the text-index pattern)."""
    import math

    scored = dsir_weights(docs_factory, n_dims=n_dims,
                          target_mod=target_mod, column=column).materialize()

    def bucketize(t: pa.Table) -> pa.Table:
        w = t.column("dsir_q9").to_numpy()
        q = w // bucket_div  # numpy floor division…
        b = q + ((w % bucket_div != 0) & (w < 0))  # …corrected to trunc
        return pa.table({"doc_id": t.column("doc_id"),
                         "wbucket": pa.array(b.astype(np.int64))})

    buck = scored.map_batches(bucketize, batch_format="pyarrow",
                              batch_size=None)

    def hist_partial(t: pa.Table) -> pa.Table:
        ub, cnt = np.unique(t.column("wbucket").to_numpy(),
                            return_counts=True)
        return pa.table({"b": pa.array(ub.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = buck.map_batches(hist_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    hist = parts.groupby("b", sort=True)["cnt"].sum()
    cum = hist.to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return buck
    # quantile_disc rule: sorted v[ceil(q*n)-1] off the cumulative
    # histogram (the length_quantiles-verified equivalence)
    idx = int(np.searchsorted(cum, max(math.ceil((1.0 - p) * n), 1)))
    cutoff = int(hist.index.to_numpy(np.int64)[idx])

    def keep(t: pa.Table) -> pa.Table:
        b = t.column("wbucket").to_numpy()
        return t.filter(pa.array(b >= cutoff))

    return buck.map_batches(keep, batch_format="pyarrow", batch_size=None)


def dsir_select_sql(p: float = 0.25, bucket_div: int = 1_000_000,
                    n_dims: int = 256, target_mod: int = 20,
                    table: str = "documents", column: str = "text") -> str:
    """DuckDB twin: scored CTE = dsir_weights_sql, DuckDB's native
    truncating ``//`` bucket, quantile_disc cutoff, same >= filter."""
    scored = dsir_weights_sql(n_dims=n_dims, target_mod=target_mod,
                              table=table, column=column)
    return (
        f"WITH scored AS ({scored}), "
        f"b AS (SELECT doc_id, CAST(dsir_q9 // {bucket_div} AS BIGINT) "
        "AS wbucket FROM scored), "
        f"cut AS (SELECT quantile_disc(wbucket, {1.0 - p}) AS c FROM b) "
        "SELECT doc_id, wbucket FROM b, cut WHERE wbucket >= cut.c"
    )


def dsir_weights_sql(n_dims: int = 256, target_mod: int = 20,
                     table: str = "documents", column: str = "text") -> str:
    """DuckDB twin: same tokenizer (kept tokens, re-ranked positions —
    the dup_span_stats contract), same md5 feature hash, same quantized
    per-feature log-ratio, same integer per-doc sums."""
    return (
        "WITH toks AS (SELECT doc_id, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY idx) AS rn, tok FROM "
        "(SELECT doc_id, unnest(range(1, len(arr) + 1)) AS idx, "
        "unnest(arr) AS tok FROM (SELECT doc_id, "
        f"regexp_split_to_array(trim({column}), '\\s+') AS arr "
        f"FROM {table})) WHERE tok <> ''), "
        "big AS (SELECT doc_id, tok || ' ' || "
        "lead(tok) OVER (PARTITION BY doc_id ORDER BY rn) AS g "
        "FROM toks), "
        f"feat AS (SELECT doc_id, CAST(md5_number_lower(g)::UBIGINT "
        f"% {n_dims} AS BIGINT) AS f FROM big WHERE g IS NOT NULL), "
        f"ct AS (SELECT f, COUNT(*) AS n FROM feat "
        f"WHERE doc_id % {target_mod} = 0 GROUP BY 1), "
        f"cr AS (SELECT f, COUNT(*) AS n FROM feat "
        f"WHERE doc_id % {target_mod} <> 0 GROUP BY 1), "
        "tots AS (SELECT (SELECT COALESCE(SUM(n), 0) FROM ct) "
        f"+ {n_dims} AS tt, (SELECT COALESCE(SUM(n), 0) FROM cr) "
        f"+ {n_dims} AS tr), "
        f"lam AS (SELECT d.range AS f, CAST(floor((ln((COALESCE(ct.n, 0) "
        "+ 1.0) / CAST(tots.tt AS DOUBLE)) - ln((COALESCE(cr.n, 0) + 1.0) "
        "/ CAST(tots.tr AS DOUBLE))) * 1000000000.0 + 0.5) AS BIGINT) AS l "
        f"FROM range({n_dims}) d CROSS JOIN tots "
        "LEFT JOIN ct ON ct.f = d.range LEFT JOIN cr ON cr.f = d.range), "
        "dtf AS (SELECT doc_id, f, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM feat GROUP BY 1, 2), "
        "sc AS (SELECT dtf.doc_id, SUM(dtf.tf) AS nb, "
        "SUM(dtf.tf * lam.l) AS w FROM dtf JOIN lam ON lam.f = dtf.f "
        "GROUP BY 1) "
        f"SELECT d.doc_id, CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams, "
        f"CAST(COALESCE(sc.w, 0) AS BIGINT) AS dsir_q9 FROM {table} d "
        "LEFT JOIN sc ON sc.doc_id = d.doc_id"
    )
