"""EXACT set-similarity self-join with prefix filtering — the
no-false-negatives complement of the MinHash-LSH pipeline (Bayardo et
al. 2007 "Scaling Up All Pairs Similarity Search" / Vernica et al. 2010
for the distributed shape): every document pair whose k-shingle Jaccard
meets the threshold, guaranteed, without all-pairs comparison.

Candidate generation (ONE shuffle):
- A global shingle order (document frequency ASC, hash ASC) ranks each
  doc's shingles rarest-first; the df table is shingle-universe-bounded
  and broadcast once via ray.put (the vocab-broadcast class — at larger
  universes swap in the bucketed-join variant, the nb_classify
  precedent).
- Each doc emits INDEX rows for its prefix (the first
  m − ⌈t·m⌉ + 1 shingles: J(a,b) ≥ t ⟹ |a∩b| ≥ ⌈t·m⌉, and a's
  non-prefix tail holds only ⌈t·m⌉ − 1 elements, so some shared shingle
  must sit in a's prefix — the pigeonhole that makes the filter exact)
  and PROBE rows for ALL its shingles, keyed by the shingle hash.
- Each shingle's bucket pairs its index rows against its probe rows
  (candidate = probe hits a prefix; both orientations normalize to
  a < b), with the size filter min ≥ ⌈t·max⌉ (an exact consequence of
  J ≥ t) and a loud max_posting star guard.

Verification reuses functions/dedup.jaccard_verify verbatim — the
distributed hash-join + exact integer threshold compare the LSH
pipeline already trusts — so exact and approximate paths share one
verify codepath and differ ONLY in candidate generation.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator
from .dedup import _shingle_hashes, jaccard_verify


def shingle_df(ds, k: int = 5, column: str = "text",
               id_column: str = "doc_id", n_buckets: int = 64):
    """→ Dataset (g, df): DISTINCT-document frequency per shingle hash.
    Per-batch distinct (doc, g) partials → ONE crc-bucket shuffle."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        gs, cnts = [], []
        for txt in t.column(column).to_pylist():
            h = np.unique(_shingle_hashes(txt, k))
            gs.append(h)
        if not gs:
            return pa.table({"g": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        flat = np.concatenate(gs)
        ug, n = np.unique(flat, return_counts=True)
        return pa.table({"g": pa.array(ug),
                         "n": pa.array(n.astype(np.int64)),
                         "bucket": pa.array((ug % np.uint64(n_buckets))
                                            .astype(np.int32))})

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        out = df.groupby("g", sort=False)["n"].sum().reset_index()
        out.columns = ["g", "df"]
        out["df"] = out["df"].astype(np.int64)
        return out

    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("bucket").map_groups(merge, batch_format="pandas")


def set_join_exact(ds_factory, threshold: float = 0.5, k: int = 5,
                   column: str = "text", id_column: str = "doc_id",
                   n_buckets: int = 64, max_posting: int = 4096):
    """→ Dataset (doc_a, doc_b, n_inter, n_union): EVERY pair with
    k-shingle Jaccard ≥ threshold — exact, no false negatives.
    ``ds_factory()`` must return a fresh reader (three consumers: df
    pass, prefix pass, verify join — the lineage invariant)."""
    import logging

    import ray
    import ray.data as rd

    thr = Fraction(threshold).limit_denominator(10**6)
    dfs = shingle_df(ds_factory(), k=k, column=column,
                     id_column=id_column).to_pandas()
    order_g = dfs["g"].to_numpy(np.uint64)
    order_df = dfs["df"].to_numpy(np.int64)
    # global rarest-first rank: (df ASC, hash ASC)
    srt = np.lexsort((order_g, order_df))
    rank = np.empty(srt.shape[0], np.int64)
    rank[srt] = np.arange(srt.shape[0])
    gref = ray.put((np.sort(order_g), rank[np.argsort(order_g)]))

    def prefix_rows(t: pa.Table) -> pa.Table:
        tune_allocator()
        gsorted, grank = ray.get(gref)
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_g, out_doc, out_size, out_kind = [], [], [], []
        for i, txt in enumerate(t.column(column).to_pylist()):
            h = np.unique(_shingle_hashes(txt, k))
            m = h.shape[0]
            if m == 0:
                continue
            pos = np.searchsorted(gsorted, h)
            r = grank[pos]
            o = np.argsort(r)                      # rarest-first
            L = m - int(-(-thr.numerator * m // thr.denominator)) + 1
            pref = h[o[:max(1, L)]]
            out_g.append(pref)
            out_doc.append(np.full(pref.shape[0], ids[i], np.int64))
            out_size.append(np.full(pref.shape[0], m, np.int64))
            out_kind.append(np.zeros(pref.shape[0], np.int8))  # index
            out_g.append(h)
            out_doc.append(np.full(m, ids[i], np.int64))
            out_size.append(np.full(m, m, np.int64))
            out_kind.append(np.ones(m, np.int8))               # probe
        if not out_g:
            return pa.table({"g": pa.array([], pa.uint64()),
                             "doc": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "bucket": pa.array([], pa.int32())})
        g = np.concatenate(out_g)
        return pa.table({
            "g": pa.array(g),
            "doc": pa.array(np.concatenate(out_doc)),
            "size": pa.array(np.concatenate(out_size)),
            "kind": pa.array(np.concatenate(out_kind)),
            "bucket": pa.array((g % np.uint64(n_buckets))
                               .astype(np.int32)),
        })

    log = logging.getLogger(__name__)

    def candidates(df) -> pa.Table:
        tune_allocator()
        counts = df["g"].value_counts()
        hot = counts[counts > max_posting]
        if len(hot):
            # star guard: cap degenerate postings LOUDLY — the
            # exactness contract is void for those shingles
            log.warning("set_join_exact: %d shingle postings capped at "
                        "%d (largest %d)", len(hot), max_posting,
                        int(hot.iloc[0]))
            df = df.groupby("g", sort=False).head(max_posting)
        idx = df[df["kind"] == 0][["g", "doc", "size"]]
        prb = df[df["kind"] == 1][["g", "doc", "size"]]
        # ONE vectorized index×probe merge per bucket (no per-shingle
        # Python loop): candidate = a probe shingle hitting a prefix
        m = idx.merge(prb, on="g", suffixes=("_a", "_b"))
        if m.empty:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        A = m["doc_a"].to_numpy(np.int64)
        B = m["doc_b"].to_numpy(np.int64)
        SA = m["size_a"].to_numpy(np.int64)
        SB = m["size_b"].to_numpy(np.int64)
        keep = A != B
        # exact size filter: J >= t  ⟹  min >= ceil(t * max)
        mn = np.minimum(SA, SB)
        mx = np.maximum(SA, SB)
        keep &= mn * thr.denominator >= thr.numerator * mx
        lo = np.minimum(A[keep], B[keep])
        hi = np.maximum(A[keep], B[keep])
        if lo.size and int(hi.max()) < 1 << 32:
            key = np.unique((lo.astype(np.uint64) << np.uint64(32))
                            | hi.astype(np.uint64))
            lo = (key >> np.uint64(32)).astype(np.int64)
            hi = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:  # ids beyond 32 bits: unique over rows (repetition_stats
            u = np.unique(np.stack([lo, hi], axis=1), axis=0)  # fallback)
            lo, hi = (u[:, 0], u[:, 1]) if u.size else (lo, hi)
        return pa.table({"doc_a": pa.array(lo), "doc_b": pa.array(hi)})

    cands = ds_factory().map_batches(prefix_rows, batch_format="pyarrow",
                                     batch_size=None) \
        .groupby("bucket").map_groups(candidates, batch_format="pandas")
    verified = jaccard_verify(ds_factory(), cands, k=k,
                              threshold=threshold, n_buckets=n_buckets)
    return verified.select_columns(["doc_a", "doc_b", "n_inter",
                                    "n_union"])


def set_join_exact_sql(k: int = 5, thr_num: int = 1,
                       thr_den: int = 2) -> str:
    """Brute-force twin: every pair sharing >= 1 shingle, exact integer
    Jaccard threshold — any J >= t pair shares a shingle, so the inner
    self-join is complete."""
    from .dedup_sql import _grams_ctes

    return (
        f"WITH {_grams_ctes(k)}"
        f"gcount AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1), "
        f"inter AS (SELECT ga.doc_id AS doc_a, gb.doc_id AS doc_b,"
        f" COUNT(*) AS n_inter FROM grams ga"
        f" JOIN grams gb ON gb.g = ga.g AND ga.doc_id < gb.doc_id"
        f" GROUP BY 1, 2) "
        f"SELECT i.doc_a, i.doc_b, i.n_inter,"
        f" ca.n + cb.n - i.n_inter AS n_union FROM inter i"
        f" JOIN gcount ca ON ca.doc_id = i.doc_a"
        f" JOIN gcount cb ON cb.doc_id = i.doc_b"
        f" WHERE i.n_inter * {thr_den} >="
        f" {thr_num} * (ca.n + cb.n - i.n_inter)"
    )
