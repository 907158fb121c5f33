"""Naive-Bayes text classification — the fastText-style classifier
step of web-corpus pipelines (CCNet's language/quality filter, GPT-3's
WebText-vs-CommonCrawl quality model), expressed Ray-Data-first.

Shape = the two-pass model/score split of functions/lm.py (its
docstring argues why that is the only shape that scales):

1. TRAIN (seed split only): ONE corpus pass emits per-batch
   (class, token, count) partials — bounded by batch vocabulary x
   classes, never corpus size — plus per-class doc-count sentinel rows
   riding the same output (the search.py build_text_index precedent),
   then ONE crc32(token)-bucket shuffle sums them. The collected model
   is vocabulary-bounded; at 100 TB prune to top-V tokens per class
   before broadcasting (``max_vocab``), exactly like lm.doc_perplexity.
2. PREDICT: broadcast (ray.put once) the count matrix; one vectorized
   scan scores every document against every class and takes the argmax
   (score DESC, class ASC — np.argmax's first-max == the SQL
   row_number tie-break because classes are sorted ascending).

Float parity contract (identical to doc_perplexity's): every
per-(doc, token, class) log-likelihood term is quantized to int64
BEFORE summation — ``q = floor((tf * ln((c+1)/(T_c+V))) * 1e9 + 0.5)``
— and the add-1-smoothed class prior ``floor(ln((n_c+1)/(n+K)) * 1e9 +
0.5)`` is one more integer term, so per-(doc, class) scores are pure
integer sums: order-independent under any block scheduling and
bit-equal to the DuckDB twin (ln is libm in both engines, every ln
argument derives from exact integers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()

from .lm import QUANT, _split_codes

# sentinel token for per-class doc-count rows riding the counts output;
# "\x01" never survives whitespace tokenization of the corpus text
# (the bpe.py END-sentinel precedent)
_DOCS_SENTINEL = "\x01"


def nb_counts(seed_ds, label_column: str = "lang", column: str = "text",
              n_buckets: int = 64):
    """Per-class token counts over the labeled seed set → Dataset
    (label, tok, n). Rows with tok == "\\x01" carry the per-class
    document counts (priors) so ONE pass and ONE bounded bucket
    shuffle produce the whole model."""
    import zlib

    def partial(batch: pa.Table) -> pa.Table:
        tune_allocator()
        codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
        labs = batch.column(label_column)
        if isinstance(labs, pa.ChunkedArray):
            labs = labs.combine_chunks()
        ld = labs.dictionary_encode() if not pa.types.is_dictionary(
            labs.type) else labs
        lab_codes = ld.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lab_vocab = ld.dictionary
        out_lab, out_tok, out_n = [], [], []
        nv = max(len(vocab), 1)
        if codes.size:
            cls = lab_codes[tok_doc]
            key = cls * np.int64(nv) + codes
            uniq, cnt = np.unique(key, return_counts=True)
            uc = (uniq // nv).astype(np.int64)
            ut = (uniq % nv).astype(np.int64)
            out_lab.append(lab_vocab.take(pa.array(uc)))
            out_tok.append(vocab.take(pa.array(ut)))
            out_n.append(pa.array(cnt.astype(np.int64)))
        # per-class doc-count sentinel rows
        dcnt = np.bincount(lab_codes, minlength=len(lab_vocab)) \
            .astype(np.int64)
        out_lab.append(lab_vocab)
        out_tok.append(pa.array([_DOCS_SENTINEL] * len(lab_vocab),
                                pa.string()))
        out_n.append(pa.array(dcnt))
        return pa.table({"label": pa.concat_arrays(
                             [a.cast(pa.string()) for a in out_lab]),
                         "tok": pa.concat_arrays(out_tok),
                         "n": pa.concat_arrays(out_n)})

    def add_bucket(t: pa.Table) -> pa.Table:
        toks = t.column("tok")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        b = np.fromiter((zlib.crc32(v.encode()) % n_buckets
                         for v in toks.to_pylist()),
                        np.int32, count=len(toks))
        return t.append_column("bucket", pa.array(b))

    def bucket_sum(df):
        tot = df.groupby(["label", "tok"], sort=False)["n"].sum() \
            .reset_index()
        return tot[["label", "tok", "n"]]

    parts = seed_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_sum,
                                          batch_format="pandas"))


def nb_classify(ds, seed_ds, label_column: str = "lang",
                column: str = "text", id_column: str = "doc_id",
                max_vocab: int | None = None):
    """Train multinomial NB on ``seed_ds`` (labeled), predict on ``ds``
    → Dataset (doc_id, pred, score_q9) where ``pred`` is the argmax
    class (ties → class ASC) and ``score_q9`` its integer-quantized
    joint log-likelihood (prior + per-token terms, each quantized to
    the 1e-9 grid before the integer sum).

    ``ds`` and ``seed_ds`` must be independently constructed datasets
    (two readers), never two branches of one Dataset — the lineage
    re-execution invariant. ``max_vocab`` truncates the broadcast
    model to the most frequent tokens (count desc, tok asc) for huge
    vocabularies; truncated tokens score as unseen (c=0) while V keeps
    the full-vocabulary smoothing denominator. The driver query leaves
    it None (exact twin).
    """
    import ray

    model = nb_counts(seed_ds, label_column=label_column,
                      column=column).to_pandas()
    pri = model[model["tok"] == _DOCS_SENTINEL]
    cnts = model[model["tok"] != _DOCS_SENTINEL]
    classes = np.sort(pri["label"].to_numpy())
    K = len(classes)
    n_seed = int(pri["n"].sum())
    nd = pri.set_index("label")["n"].reindex(classes).fillna(0) \
        .to_numpy(np.int64)
    # global training vocabulary (smoothing denominator V) + per-class
    # token totals T_c are computed BEFORE any max_vocab truncation
    vocab_all = np.sort(cnts["tok"].unique())
    V = int(len(vocab_all))
    T = cnts.groupby("label")["n"].sum().reindex(classes).fillna(0) \
        .to_numpy(np.int64)
    if max_vocab is not None and V > max_vocab:
        keep_rank = cnts.groupby("tok")["n"].sum().reset_index() \
            .sort_values(["n", "tok"], ascending=[False, True],
                         kind="stable").head(max_vocab)
        cnts = cnts[cnts["tok"].isin(set(keep_rank["tok"]))]
        vocab_bc = np.sort(cnts["tok"].unique())
    else:
        vocab_bc = vocab_all
    cmat = np.zeros((K, len(vocab_bc)), np.int64)
    ci = {c: i for i, c in enumerate(classes)}
    rows = np.fromiter((ci[c] for c in cnts["label"]), np.int64,
                       count=len(cnts))
    cols = np.searchsorted(vocab_bc, cnts["tok"].to_numpy())
    cmat[rows, cols] = cnts["n"].to_numpy(np.int64)
    # add-1-smoothed prior, quantized — one integer term per class
    prior_q = np.floor(np.log((nd.astype(np.float64) + 1.0)
                              / np.float64(n_seed + K)) * QUANT + 0.5) \
        .astype(np.int64)
    model_ref = ray.put((classes, vocab_bc, cmat, T, V, prior_q))

    def score(batch: pa.Table) -> pa.Table:
        tune_allocator()
        classes_, toks_sorted, cmat_, T_, V_, prior_q_ = ray.get(model_ref)
        codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
        ids = batch.column(id_column)
        K_ = len(classes_)
        scores = np.tile(prior_q_, (n_docs, 1))
        if codes.size and K_:
            key = tok_doc * np.int64(len(vocab)) + codes
            uniq, tf = np.unique(key, return_counts=True)
            ud = (uniq // len(vocab)).astype(np.int64)
            uc = (uniq % len(vocab)).astype(np.int64)
            vtoks = vocab.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(toks_sorted, vtoks)
            pos_c = np.minimum(pos, max(len(toks_sorted) - 1, 0))
            hit = (toks_sorted[pos_c] == vtoks) if len(toks_sorted) \
                else np.zeros(len(vtoks), bool)
            cum_starts = np.searchsorted(ud, np.arange(n_docs + 1))
            tfd = tf.astype(np.float64)
            for k in range(K_):
                c = np.where(hit, cmat_[k][pos_c] if len(toks_sorted)
                             else 0, 0).astype(np.int64)
                lnp = np.log((c.astype(np.float64) + 1.0)
                             / np.float64(T_[k] + V_))
                q = np.floor((tfd * lnp[uc]) * QUANT + 0.5) \
                    .astype(np.int64)
                cum = np.concatenate([[0], np.cumsum(q)])
                scores[:, k] += cum[cum_starts[1:]] - cum[cum_starts[:-1]]
        best = np.argmax(scores, axis=1) if K_ else \
            np.zeros(n_docs, np.int64)
        pred = classes_[best] if K_ else np.array([""] * n_docs)
        return pa.table({id_column: ids,
                         "pred": pa.array(pred.astype(object),
                                          pa.string()),
                         "score_q9": pa.array(
                             scores[np.arange(n_docs), best]
                             if K_ else np.zeros(n_docs, np.int64))})

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def nb_classify_sql(train_mod: int = 3, table: str = "documents",
                    label_column: str = "lang", column: str = "text",
                    id_column: str = "doc_id") -> str:
    """DuckDB twin of nb_classify with the seed split
    ``doc_id % train_mod == 0``: same tokenizer, same add-1 smoothing,
    same int64 quantization before every sum, same (score DESC, class
    ASC) argmax."""
    return (
        f"WITH seed AS (SELECT * FROM {table} "
        f"WHERE {id_column} % {train_mod} = 0), "
        "stoks AS (SELECT lab, tok FROM (SELECT "
        f"{label_column} AS lab, "
        f"unnest(regexp_split_to_array(trim({column}), '\\s+')) AS tok "
        "FROM seed) WHERE tok <> ''), "
        "v AS (SELECT COUNT(DISTINCT tok) AS nv FROM stoks), "
        "tc AS (SELECT lab, COUNT(*) AS t FROM stoks GROUP BY 1), "
        "cnt AS (SELECT lab, tok, COUNT(*) AS c FROM stoks GROUP BY 1, 2), "
        f"pri AS (SELECT {label_column} AS lab, COUNT(*) AS nd "
        "FROM seed GROUP BY 1), "
        "ns AS (SELECT COUNT(*) AS n, COUNT(DISTINCT lab) AS k FROM pri), "
        # ns.n would be wrong: it counts classes; recompute n from seed
        "nseed AS (SELECT COUNT(*) AS n FROM seed), "
        "priq AS (SELECT p.lab, CAST(floor(ln((CAST(p.nd AS DOUBLE) + 1.0)"
        " / CAST(ns2.n + ns.k AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)"
        " AS pq FROM pri p CROSS JOIN ns CROSS JOIN nseed ns2), "
        "dtf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf "
        f"FROM (SELECT {id_column} AS doc_id, "
        f"unnest(regexp_split_to_array(trim({column}), '\\s+')) AS tok "
        f"FROM {table}) WHERE tok <> '' GROUP BY 1, 2), "
        "terms AS (SELECT d.doc_id, tc.lab, "
        "CAST(floor((CAST(d.tf AS DOUBLE) * "
        "ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0) / "
        "CAST(tc.t + v.nv AS DOUBLE))) * 1000000000.0 + 0.5) AS BIGINT) "
        "AS q FROM dtf d CROSS JOIN tc CROSS JOIN v "
        "LEFT JOIN cnt c ON c.lab = tc.lab AND c.tok = d.tok), "
        f"base AS (SELECT doc.{id_column} AS doc_id, pr.lab, pr.pq "
        f"FROM {table} doc CROSS JOIN priq pr), "
        "scores AS (SELECT b.doc_id, b.lab, "
        "b.pq + COALESCE(s.sq, 0) AS score_q9 FROM base b "
        "LEFT JOIN (SELECT doc_id, lab, SUM(q) AS sq FROM terms "
        "GROUP BY 1, 2) s ON s.doc_id = b.doc_id AND s.lab = b.lab), "
        "ranked AS (SELECT doc_id, lab, score_q9, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score_q9 DESC, lab) AS rn "
        "FROM scores) "
        "SELECT doc_id, lab AS pred, CAST(score_q9 AS BIGINT) AS score_q9 "
        "FROM ranked WHERE rn = 1"
    )
