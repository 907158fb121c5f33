"""Text analysis operators for large-scale training-data pipelines.

All are vectorized ``map_batches`` stages over the ``documents`` table:
language-ID (stopword-hit heuristic), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (md5 content hash + winnowing rolling-hash sketch).

Where DuckDB can express the same computation, the SQL lives in
__ray_entry__.oracle_sql(); the winnowing sketch is rows-only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword marker sets (deterministic heuristic)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("的", "是", "了", "在", "我"),
}
STOPWORDS = frozenset(LANG_MARKERS["en"])

TOKEN_RE = re.compile(r"\s+")
# BPE-ish word/number/punct splitter (GPT-2-style shape, simplified)
BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


class TokenStats:
    """Adds n_tokens (whitespace), n_bpe_tokens (regex), n_chars columns."""

    def __init__(self) -> None:
        self.token_re = TOKEN_RE
        self.bpe_re = BPE_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        n_tokens = texts.map(lambda t: len(self.token_re.split(t.strip())) if t.strip() else 0)
        n_bpe = texts.map(lambda t: len(self.bpe_re.findall(t)))
        n_chars = pc.utf8_length(batch.column("text"))
        return (
            batch.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
            .append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64()))
            .append_column("n_chars", pc.cast(n_chars, pa.int64()))
        )


class QualityScore:
    """Adds stop_ratio / alpha_ratio / mean_token_len and a quality score.

    score = stop_ratio in [0.01,0.6] (0.4 weight) + mean token len in [3,10]
    (0.3) + alpha ratio >= 0.7 (0.3) — a C4/Gopher-style rule-based filter
    shape, deterministic and integer/float-arithmetic reproducible in SQL.
    """

    def __init__(self, stopwords=STOPWORDS) -> None:
        self.stop = frozenset(stopwords)
        self.token_re = TOKEN_RE
        self.non_alpha_re = re.compile(r"[^A-Za-z ]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        toks = texts.map(lambda t: self.token_re.split(t.strip()) if t.strip() else [])
        n = toks.map(len).astype("int64")
        stop_hits = toks.map(lambda ws: sum(1 for w in ws if w in self.stop)).astype("int64")
        # chars matching [A-Za-z ] (ASCII rule — mirrors the SQL oracle)
        alpha = texts.map(lambda t: len(self.non_alpha_re.sub("", t))).astype("int64")
        total_chars = texts.map(len).astype("int64")
        stop_ratio = (stop_hits / n.clip(lower=1)).round(9)
        mean_tok = ((total_chars - (n - 1).clip(lower=0)) / n.clip(lower=1)).round(9)
        alpha_ratio = (alpha / total_chars.clip(lower=1)).round(9)
        score = (
            0.4 * ((stop_ratio >= 0.01) & (stop_ratio <= 0.6)).astype(float)
            + 0.3 * ((mean_tok >= 3.0) & (mean_tok <= 10.0)).astype(float)
            + 0.3 * (alpha_ratio >= 0.7).astype(float)
        ).round(9)
        out = batch
        for name, vals in (
            ("stop_ratio", stop_ratio),
            ("mean_token_len", mean_tok),
            ("alpha_ratio", alpha_ratio),
            ("quality_score", score),
        ):
            out = out.append_column(name, pa.array(vals, pa.float64()))
        return out


class LangId:
    """Language scores by marker-stopword hits; prediction = argmax with
    deterministic tie-break (hit count desc, language code asc)."""

    def __init__(self, markers=LANG_MARKERS) -> None:
        self.markers = {k: frozenset(v) for k, v in sorted(markers.items())}
        self.token_re = TOKEN_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        toks = texts.map(lambda t: self.token_re.split(t.strip().lower()) if t.strip() else [])
        out = batch
        scores = {}
        for lang, words in self.markers.items():
            hits = toks.map(lambda ws, w=words: sum(1 for x in ws if x in w)).astype("int64")
            scores[lang] = hits
            out = out.append_column(f"hits_{lang}", pa.array(hits, pa.int64()))
        df = pd.DataFrame(scores)
        pred = df.idxmax(axis=1)  # ties → first column = asc lang code
        out = out.append_column("lang_pred", pa.array(pred, pa.string()))
        return out


class Fingerprint:
    """md5 content hash + winnowing sketch (rolling hash, window-min sampled).

    The md5 column is the exact-dedup key (SQL-checkable via DuckDB md5());
    the winnowing sketch is the near-dup document fingerprint (rows-only).
    """

    def __init__(self, k: int = 8, window: int = 4) -> None:
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        md5 = texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        sketches = texts.map(self._winnow)
        return (
            batch.append_column("md5", pa.array(md5, pa.string()))
            .append_column("fingerprint", pa.array(sketches, pa.list_(pa.uint64())))
        )

    def _winnow(self, text: str) -> list[int]:
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        k, w = self.k, self.window
        if data.shape[0] < k:
            return []
        # polynomial rolling hash of k-grams, vectorized
        weights = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64)[::-1])
        n = data.shape[0] - k + 1
        grams = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        hashes = (grams * weights).sum(axis=1)  # uint64 wraparound ok
        if n <= w:
            return [int(hashes.min())]
        wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
        mins = wins.min(axis=1)
        return sorted(set(int(v) for v in np.unique(mins)))
