"""EXACT set-similarity self-join with prefix filtering — the
no-false-negatives complement of the MinHash-LSH pipeline (Bayardo et
al. 2007 "Scaling Up All Pairs Similarity Search" / Vernica et al. 2010
for the distributed shape / Xiao et al. 2008 PPJoin for the positional
filter): every document pair whose k-shingle Jaccard meets the
threshold, guaranteed, without all-pairs comparison.

Fully distributed — NOTHING corpus-growing touches the driver:

1. ONE fused corpus scan emits a zone-tagged composite stream keyed by
   shingle bucket: kind-0 per-batch distinct-doc df partials and kind-1
   (doc, shingle, set-size) rows. Each shingle lives in exactly one
   bucket, so its GLOBAL document frequency is a local decision there;
   the bucket attaches df to every doc-shingle row (the
   nb_classify/build_text_index pattern — the old implementation
   collected the df table to the driver and ray.put-broadcast rank
   arrays, which OOMs at corpus-scale shingle universes).
2. ONE doc-bucket shuffle re-groups each document's shingle rows and
   sorts them rarest-first under the global (df ASC, hash ASC) total
   order — per-doc positions fall out of one lexsort. The first
   m − ⌈t·m⌉ + 1 shingles are the prefix (J(a,b) ≥ t ⟹ |a∩b| ≥ ⌈t·m⌉,
   and a's non-prefix tail holds only ⌈t·m⌉ − 1 elements, so some
   shared shingle must sit in a's prefix — the pigeonhole that makes
   the filter exact). INDEX rows (prefix) and PROBE rows (all) go back
   out keyed by shingle bucket, carrying their in-doc positions.
3. Each shingle's bucket pairs index rows against probe rows
   (candidate = probe hits a prefix; both orientations normalize to
   lo < hi) with two exact filters: size (min ≥ ⌈t·max⌉) and PPJoin's
   positional bound — the minimal-rank shared shingle g* of any pair
   is always an observed match (anything rarer shared would sit even
   earlier in a prefix), no shingle is shared before it, so
   |a∩b| ≤ 1 + min(m_a−1−i*, m_b−1−j*); pairs whose bound misses the
   required overlap ⌈t·(m_a+m_b)/(1+t)⌉ drop before verification.
   A loud max_posting star guard caps degenerate postings.

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
    Per-batch distinct (doc, g) partials → ONE crc-bucket shuffle.
    (Standalone analysis surface; set_join_exact fuses this pass.)"""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        gs = []
        for txt in t.column(column).to_pylist():
            gs.append(np.unique(_shingle_hashes(txt, k)))
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


_EMPTY_RANKED = pa.table({
    "g": pa.array([], pa.uint64()), "doc": pa.array([], pa.int64()),
    "size": pa.array([], pa.int64()), "df": pa.array([], pa.int64()),
    "bucket": pa.array([], pa.int32()),
})

_EMPTY_PREFIX = pa.table({
    "g": pa.array([], pa.uint64()), "doc": pa.array([], pa.int64()),
    "size": pa.array([], pa.int64()), "pos": pa.array([], pa.int64()),
    "kind": pa.array([], pa.int8()), "bucket": pa.array([], pa.int32()),
})


def set_join_exact(ds_factory, threshold: float = 0.5, k: int = 5,
                   column: str = "text", id_column: str = "doc_id",
                   n_buckets: int = 64, max_posting: int = 4096,
                   positional: bool = True,
                   _candidates_only: bool = False):
    """→ Dataset (doc_a, doc_b, n_inter, n_union): EVERY pair with
    k-shingle Jaccard ≥ threshold — exact, no false negatives.
    ``ds_factory()`` must return a fresh reader (two consumers: the
    fused df+shingle pass and the verify join — the lineage
    invariant). ``positional=False`` disables the PPJoin positional
    filter (testing hook — output is identical, candidates are a
    superset); ``_candidates_only`` returns the unverified candidate
    pairs instead (the filter's pruning is asserted on it)."""
    import logging

    import ray.data as rd  # noqa: F401  (documents the surface)

    thr = Fraction(threshold).limit_denominator(10**6)
    num, den = thr.numerator, thr.denominator
    B = n_buckets

    def fused_rows(t: pa.Table) -> pa.Table:
        """Zone 0: per-batch distinct-doc df partials (doc = -1, size
        carries the partial count). Zone 1: (doc, g, size) rows for
        every distinct shingle of every doc. One corpus read."""
        tune_allocator()
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        gs, owners, sizes = [], [], []
        for i, txt in enumerate(t.column(column).to_pylist()):
            h = np.unique(_shingle_hashes(txt, k))
            m = h.shape[0]
            if m == 0:
                continue
            gs.append(h)
            owners.append(np.full(m, ids[i], np.int64))
            sizes.append(np.full(m, m, np.int64))
        if not gs:
            return pa.table({"g": pa.array([], pa.uint64()),
                             "doc": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "bucket": pa.array([], pa.int32())})
        flat = np.concatenate(gs)
        ug, cnt = np.unique(flat, return_counts=True)
        g = np.concatenate([ug, flat])
        doc = np.concatenate([np.full(ug.shape[0], -1, np.int64),
                              np.concatenate(owners)])
        size = np.concatenate([np.zeros(ug.shape[0], np.int64),
                               np.concatenate(sizes)])
        n = np.concatenate([cnt.astype(np.int64),
                            np.zeros(flat.shape[0], np.int64)])
        kind = np.concatenate([np.zeros(ug.shape[0], np.int8),
                               np.ones(flat.shape[0], np.int8)])
        return pa.table({
            "g": pa.array(g), "doc": pa.array(doc),
            "size": pa.array(size), "n": pa.array(n),
            "kind": pa.array(kind),
            "bucket": pa.array((g % np.uint64(B)).astype(np.int32)),
        })

    def attach_df(df) -> pa.Table:
        """Per shingle-bucket: global df is local here (every partial
        for a shingle lands in its one bucket); join df onto the doc
        rows and re-key by doc bucket."""
        tune_allocator()
        part = df[df["kind"] == 0]
        docs = df[df["kind"] == 1]
        if docs.empty:
            return _EMPTY_RANKED
        pg = part["g"].to_numpy(np.uint64)
        pn = part["n"].to_numpy(np.int64)
        ug = np.unique(pg)
        tot = np.zeros(ug.shape[0], np.int64)
        np.add.at(tot, np.searchsorted(ug, pg), pn)
        g = docs["g"].to_numpy(np.uint64)
        doc = docs["doc"].to_numpy(np.int64)
        return pa.table({
            "g": pa.array(g), "doc": pa.array(doc),
            "size": pa.array(docs["size"].to_numpy(np.int64)),
            "df": pa.array(tot[np.searchsorted(ug, g)]),
            "bucket": pa.array((doc.astype(np.uint64) % np.uint64(B))
                               .astype(np.int32)),
        })

    def prefix_rows(df) -> pa.Table:
        """Per doc-bucket: one lexsort puts every doc's shingles in the
        global rarest-first (df ASC, g ASC) order; positions and prefix
        membership fall out vectorized."""
        tune_allocator()
        if df.empty:
            return _EMPTY_PREFIX
        g = df["g"].to_numpy(np.uint64)
        doc = df["doc"].to_numpy(np.int64)
        size = df["size"].to_numpy(np.int64)
        dfreq = df["df"].to_numpy(np.int64)
        order = np.lexsort((g, dfreq, doc))
        g, doc, size = g[order], doc[order], size[order]
        new_doc = np.r_[True, doc[1:] != doc[:-1]]
        starts = np.flatnonzero(new_doc)
        seq = np.arange(doc.shape[0], dtype=np.int64)
        pos = seq - np.repeat(starts, np.diff(np.r_[starts, doc.shape[0]]))
        # prefix length: m − ⌈t·m⌉ + 1, at least 1
        L = np.maximum(1, size - (-(-num * size) // den) + 1)
        is_pref = pos < L
        out_g = np.concatenate([g[is_pref], g])
        out_doc = np.concatenate([doc[is_pref], doc])
        out_size = np.concatenate([size[is_pref], size])
        out_pos = np.concatenate([pos[is_pref], pos])
        out_kind = np.concatenate(
            [np.zeros(int(is_pref.sum()), np.int8),
             np.ones(doc.shape[0], np.int8)])
        return pa.table({
            "g": pa.array(out_g), "doc": pa.array(out_doc),
            "size": pa.array(out_size), "pos": pa.array(out_pos),
            "kind": pa.array(out_kind),
            "bucket": pa.array((out_g % np.uint64(B)).astype(np.int32)),
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
        idx = df[df["kind"] == 0][["g", "doc", "size", "pos"]]
        prb = df[df["kind"] == 1][["g", "doc", "size", "pos"]]
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        # ONE vectorized index×probe merge per bucket (no per-shingle
        # Python loop): candidate = a probe shingle hitting a prefix
        m = idx.merge(prb, on="g", suffixes=("_a", "_b"))
        if m.empty:
            return empty
        A = m["doc_a"].to_numpy(np.int64)
        B_ = m["doc_b"].to_numpy(np.int64)
        SA = m["size_a"].to_numpy(np.int64)
        SB = m["size_b"].to_numpy(np.int64)
        PA = m["pos_a"].to_numpy(np.int64)
        PB = m["pos_b"].to_numpy(np.int64)
        keep = A != B_
        # exact size filter: J >= t  ⟹  min >= ceil(t * max)
        mn = np.minimum(SA, SB)
        mx = np.maximum(SA, SB)
        keep &= mn * den >= num * mx
        if not keep.any():
            return empty
        A, B_, SA, SB, PA, PB = (v[keep] for v in (A, B_, SA, SB, PA, PB))
        # orientation-normalize so both match directions line up
        swap = A > B_
        lo = np.where(swap, B_, A)
        hi = np.where(swap, A, B_)
        s_lo = np.where(swap, SB, SA)
        s_hi = np.where(swap, SA, SB)
        p_lo = np.where(swap, PB, PA)
        p_hi = np.where(swap, PA, PB)
        # PPJoin positional filter at the pair's MINIMAL-rank match
        # (provably its minimal shared shingle): pick each pair's
        # first row under pos_lo via one lexsort, bound the overlap
        order = np.lexsort((p_lo, hi, lo))
        lo, hi = lo[order], hi[order]
        s_lo, s_hi = s_lo[order], s_hi[order]
        p_lo, p_hi = p_lo[order], p_hi[order]
        first = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        lo, hi = lo[first], hi[first]
        s_lo, s_hi = s_lo[first], s_hi[first]
        p_lo, p_hi = p_lo[first], p_hi[first]
        if positional:
            ub = 1 + np.minimum(s_lo - 1 - p_lo, s_hi - 1 - p_hi)
            # required overlap: inter ≥ ⌈num·(m_a+m_b) / (den+num)⌉
            keep2 = ub * (den + num) >= num * (s_lo + s_hi)
            lo, hi = lo[keep2], hi[keep2]
        return pa.table({"doc_a": pa.array(lo), "doc_b": pa.array(hi)})

    ranked = ds_factory().map_batches(fused_rows, batch_format="pyarrow",
                                      batch_size=None) \
        .groupby("bucket").map_groups(attach_df, batch_format="pandas")
    cands = ranked.groupby("bucket").map_groups(
        prefix_rows, batch_format="pandas") \
        .groupby("bucket").map_groups(candidates, batch_format="pandas")
    if _candidates_only:
        return cands
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
