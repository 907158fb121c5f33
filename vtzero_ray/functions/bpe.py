"""Byte-pair-encoding tokenizer: deterministic distributed training +
vectorized-where-it-matters encoding.

Shape (the train_centroids precedent — iterative/stateful ops that SQL
cannot express are pytest-anchored, not oracle rows):

- TRAIN: the corpus-scale work is ONE distributed word-count pass
  (lm.unigram_counts — per-batch combiner, bucketed count shuffle). The
  merge loop then runs over the UNIQUE-WORD table, which is bounded by
  vocabulary, not corpus size — at 100 TB the word table is millions of
  rows where the corpus is trillions of tokens, so driver-side training
  is the honest scale shape (the same argument as the IVF centroid
  table). Determinism: merge picked by (pair count DESC, pair ASC);
  greedy leftmost-nonoverlapping application.
- ENCODE: per batch, merges apply only to the batch's DICTIONARY (its
  unique words — bounded by batch vocabulary), with a per-actor
  word→length cache (a genuinely stateful map_batches stage: the
  merge ranks load once per actor in __init__, the cache persists
  across batches); per-doc token counts then reduce by vectorized code
  lookup + bincount.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator
from .lm import _split_codes

tune_allocator()

END = ""  # end-of-word sentinel (never appears in corpus text)


def _apply_merge(sym: tuple, a: str, b: str) -> tuple:
    """Greedy leftmost-nonoverlapping merge of adjacent (a, b) → a+b."""
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _encode_word(word: str, ranks: dict) -> tuple:
    """Encode one word with trained merge ranks: repeatedly merge the
    lowest-rank adjacent pair (the standard BPE inference rule, which
    reproduces training segmentation exactly)."""
    sym = tuple(word) + (END,)
    while len(sym) > 1:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, sym[i], sym[i + 1])
        if best is None:
            break
        sym = _apply_merge(sym, best[1], best[2])
    return sym


def train_bpe(ds, n_merges: int = 50, column: str = "text"):
    """→ ordered merge list [(a, b), ...]. Corpus pass = distributed
    word counts; merge loop over the vocab-bounded word table."""
    from .lm import unigram_counts

    wc = unigram_counts(ds, column=column).to_pandas()
    # deterministic iteration order regardless of block scheduling
    wc = wc.sort_values("tok", kind="stable")
    words = {tuple(w) + (END,): int(n)
             for w, n in zip(wc["tok"], wc["n"])}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {_apply_merge(sym, *best): n for sym, n in words.items()}
    return merges


class BPEEncode:
    """Stateful map_batches stage: merge ranks load once per actor;
    encoded word lengths cache across batches (webtext word frequency is
    Zipfian — the cache hit rate approaches 1). Emits per-doc BPE token
    counts; ``emit_tokens=True`` adds the space-joined segmentation."""

    def __init__(self, merges_ref, emit_tokens: bool = False) -> None:
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.emit_tokens = emit_tokens
        self._cache: dict = {}

    def _word(self, w: str) -> tuple:
        got = self._cache.get(w)
        if got is None:
            got = _encode_word(w, self.ranks)
            self._cache[w] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        tune_allocator()
        codes, tok_doc, vocab, n_docs = _split_codes(batch, "text")
        ids = batch.column("doc_id")
        # encode only the batch's unique words (its dictionary)
        vwords = vocab.to_pylist()
        enc = [self._word(w) if w else (END,) for w in vwords]
        # token count = symbols that are not the bare END sentinel (an
        # unmerged sentinel is a word-boundary marker, not a token; a
        # merged one like 'est<END>' is a real word-final token)
        lens = np.fromiter((sum(1 for s in e if s != END) for e in enc),
                           np.int64,
                           count=len(enc)) if enc else np.empty(0, np.int64)
        n_bpe = np.bincount(
            tok_doc, weights=lens[codes] if codes.size else None,
            minlength=n_docs).astype(np.int64) if codes.size else \
            np.zeros(n_docs, np.int64)
        cols = {"doc_id": ids, "n_bpe_tokens": pa.array(n_bpe)}
        if self.emit_tokens:
            joined = np.array(
                [" ".join(s.replace(END, "") for s in e if s != END)
                 for e in enc], dtype=object)
            # tok_doc is already doc-ordered (built by np.repeat, filtered
            # order-preserving) → split the per-token strings at doc bounds
            tok_words = joined[codes] if codes.size else \
                np.empty(0, dtype=object)
            bounds = np.cumsum(np.bincount(
                tok_doc, minlength=n_docs).astype(np.int64))[:-1]
            parts = np.split(tok_words, bounds) if n_docs else []
            cols["bpe_tokens"] = pa.array(
                [" ".join(p) for p in parts], pa.string())
        return pa.table(cols)


def bpe_token_counts(ds, merges, emit_tokens: bool = False):
    """Per-doc BPE token counts under a trained merge list → Dataset
    (doc_id, n_bpe_tokens[, bpe_tokens]). Actor pool: merge ranks +
    word cache are per-actor state (SURVEY §2.3 stateful-stage shape)."""
    import ray

    ref = ray.put(list(merges))
    return ds.map_batches(BPEEncode, batch_format="pyarrow",
                          batch_size=None, concurrency=(1, 4),
                          fn_constructor_args=(ref,),
                          fn_constructor_kwargs={"emit_tokens": emit_tokens})
