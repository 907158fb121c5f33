"""Text analysis operators for large-scale training-data pipelines.

All are vectorized ``map_batches`` stages over the ``documents`` table:
language-ID (stopword-hit heuristic), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (md5 content hash + winnowing rolling-hash sketch).

The hot path is pure Arrow compute (RE2 kernels) + NumPy segment sums —
no per-row Python in token counting, quality scoring, or language-ID; the
only remaining per-row work is the md5 digest (hashlib has no batch API).
Tokenization semantics are RE2 ``\\s+`` splits of the trimmed text, the
same expressions DuckDB evaluates in __ray_entry__.oracle_sql(), so Ray
and oracle agree bit-for-bit. The winnowing sketch is rows-only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()
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
TOKEN_PATTERN = r"\s+"
# BPE-ish word/number/punct splitter (GPT-2-style shape, simplified)
BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
BPE_PATTERN = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def _as_array(col) -> pa.Array:
    """ChunkedArray → single contiguous Array (zero-copy when 1 chunk)."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        if col.num_chunks == 0:
            return pa.array([], type=col.type)
        return col.combine_chunks()
    return col


def _np(arr, dtype=None) -> np.ndarray:
    out = arr.to_numpy(zero_copy_only=False)
    return out.astype(dtype) if dtype is not None else out


def _token_counts(stripped: pa.Array) -> np.ndarray:
    """len(split(strip(t))) with empty → 0; vectorized as ws-run count + 1."""
    runs = _np(pc.count_substring_regex(stripped, TOKEN_PATTERN), np.int64)
    nonempty = _np(pc.not_equal(stripped, ""))
    return np.where(nonempty, runs + 1, 0)


def _split_tokens(stripped: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Split on ``\\s+`` → (flat token values, absolute row offsets)."""
    parts = _as_array(pc.split_pattern_regex(stripped, TOKEN_PATTERN))
    return parts.values, np.asarray(parts.offsets, dtype=np.int64)


def _segment_sums(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat boolean/int array given list offsets
    (cumsum-diff: safe for empty segments, unlike np.add.reduceat)."""
    cum = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
    return cum[offsets[1:]] - cum[offsets[:-1]]


class TokenStats:
    """Adds n_tokens (whitespace), n_bpe_tokens (regex), n_chars columns."""

    def __init__(self) -> None:
        self.token_re = TOKEN_RE
        self.bpe_re = BPE_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _as_array(batch.column("text"))
        stripped = pc.utf8_trim_whitespace(txt)
        n_tokens = _token_counts(stripped)
        n_bpe = _np(pc.count_substring_regex(txt, BPE_PATTERN), np.int64)
        n_chars = pc.utf8_length(txt)
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
        self._stop_set = pa.array(sorted(self.stop))

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _as_array(batch.column("text"))
        stripped = pc.utf8_trim_whitespace(txt)
        n = _token_counts(stripped)
        flat, offsets = _split_tokens(stripped)
        is_stop = _np(pc.is_in(flat, value_set=self._stop_set))
        stop_hits = _segment_sums(is_stop, offsets)
        # chars matching [A-Za-z ] (ASCII rule — mirrors the SQL oracle)
        alpha = _np(pc.count_substring_regex(txt, "[A-Za-z ]"), np.int64)
        total_chars = _np(pc.utf8_length(txt), np.int64)
        n1 = np.maximum(n, 1)
        stop_ratio = np.round(stop_hits / n1, 9)
        mean_tok = np.round((total_chars - np.maximum(n - 1, 0)) / n1, 9)
        alpha_ratio = np.round(alpha / np.maximum(total_chars, 1), 9)
        score = np.round(
            0.4 * ((stop_ratio >= 0.01) & (stop_ratio <= 0.6)).astype(np.float64)
            + 0.3 * ((mean_tok >= 3.0) & (mean_tok <= 10.0)).astype(np.float64)
            + 0.3 * (alpha_ratio >= 0.7).astype(np.float64),
            9,
        )
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
        self._marker_sets = {
            k: pa.array(sorted(v)) for k, v in self.markers.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = _as_array(batch.column("text"))
        lowered = pc.utf8_lower(pc.utf8_trim_whitespace(txt))
        flat, offsets = _split_tokens(lowered)
        out = batch
        langs = list(self.markers)  # asc lang code (sorted in __init__)
        hit_rows = []
        for lang in langs:
            hits = _segment_sums(
                _np(pc.is_in(flat, value_set=self._marker_sets[lang])), offsets
            )
            hit_rows.append(hits)
            out = out.append_column(f"hits_{lang}", pa.array(hits, pa.int64()))
        # argmax over rows stacked in asc-lang order → first max wins the tie
        pred_idx = np.argmax(np.stack(hit_rows, axis=0), axis=0) if len(txt) \
            else np.zeros(0, np.int64)
        pred = np.asarray(langs, dtype=object)[pred_idx]
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
        texts = _as_array(batch.column("text")).to_pylist()
        md5 = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        sketches = [self._winnow(t) for t in texts]
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


# ---------------------------------------------------------------------------
# top-k n-grams per language (corpus analytics, combiner pattern)
# ---------------------------------------------------------------------------


_EMPTY_BIGRAMS = pa.table({"lang": pa.array([], pa.string()),
                           "ngram": pa.array([], pa.string()),
                           "n": pa.array([], pa.int64())})


def _bigram_partial(batch: pa.Table) -> pa.Table:
    """Per-batch bigram combiner: the corpus text NEVER shuffles — only
    distinct (lang, ngram, n) partial-count rows leave the task, bounded
    by the batch vocabulary², not the batch token count.

    Fully vectorized: Arrow whitespace split (empty tokens dropped —
    byte-equal to Python str.split semantics), dictionary-encoded tokens,
    integer (lang, tok1, tok2) keys counted with ONE np.unique pass;
    strings are assembled only for the UNIQUE pairs that leave the task.
    """
    tune_allocator()
    pc = pa.compute
    texts = _as_array(batch.column("text"))
    langs = _as_array(batch.column("lang"))
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offs = np.asarray(toks.offsets, dtype=np.int64)
    n_docs = len(toks)
    if len(flat) == 0:
        return _EMPTY_BIGRAMS
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary
    vlen = pc.binary_length(vocab).to_numpy().astype(np.int64)
    # drop empty tokens (Arrow emits them at run boundaries; Python
    # strip().split() — which the oracle's regexp mirrors — never does)
    tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64), offs[1:] - offs[:-1])
    keep = vlen[codes] > 0
    codes = codes[keep]
    tok_doc = tok_doc[keep]
    if codes.shape[0] < 2:
        return _EMPTY_BIGRAMS
    ld = pc.dictionary_encode(langs)
    if isinstance(ld, pa.ChunkedArray):
        ld = ld.combine_chunks()
    lcodes = ld.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    m = tok_doc[:-1] == tok_doc[1:]          # within-doc adjacency
    if not m.any():
        return _EMPTY_BIGRAMS
    c1 = codes[:-1][m]
    c2 = codes[1:][m]
    lg = lcodes[tok_doc[:-1][m]]
    V = np.int64(len(vocab))
    key = (lg * V + c1) * V + c2
    uniq, cnt = np.unique(key, return_counts=True)
    u2 = uniq % V
    u1 = (uniq // V) % V
    ul = uniq // (V * V)
    grams = pc.binary_join_element_wise(
        vocab.take(pa.array(u1)), vocab.take(pa.array(u2)), " ")
    return pa.table({
        "lang": ld.dictionary.take(pa.array(ul)),
        "ngram": grams,
        "n": pa.array(cnt.astype(np.int64)),
    })


def _local_topk(batch: pa.Table, k: int) -> pa.Table:
    """Per-block candidate pruning: global top-k ⊆ union of per-block
    top-k after the global sum, so only ≤ k rows per (block, lang) reach
    the final merge."""
    import pandas as pd

    df = batch.to_pandas()
    df = df.sort_values(["lang", "n", "ngram"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("lang", sort=False).head(k)
    return pa.Table.from_pandas(df, preserve_index=False)


def ngram_topk(ds, k: int = 10, n_buckets: int = 64):
    """Top-k word bigrams per language: (lang, ngram, n, rnk).

    Shape: per-batch combiner (no text shuffle) → ONE bounded shuffle on
    a crc32(ngram) bucket (n_buckets groups — NOT the O(vocab²)-cardinality
    raw (lang, ngram) key, per the repo's bucketed-shuffle invariant) →
    in-bucket sum + per-lang top-k prune (each ngram lives in exactly one
    bucket, so global top-k ⊆ union of bucket top-k) → tiny per-lang
    merge. Deterministic rank: (n DESC, ngram ASC).
    """
    import zlib

    import pandas as pd

    partials = ds.map_batches(_bigram_partial, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        pc = pa.compute
        g = t.column("ngram")
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        d = pc.dictionary_encode(g)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        # crc32 over the (small) batch vocabulary only, mapped via codes
        vh = np.fromiter((zlib.crc32(v.encode()) for v in d.dictionary.to_pylist()),
                         np.int64, count=len(d.dictionary))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        b = (vh[codes] % n_buckets).astype(np.int32) if len(t) else \
            np.empty(0, np.int32)
        return t.append_column("bucket", pa.array(b))

    bucketed = partials.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_sum_topk(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby(["lang", "ngram"], sort=False)["n"].sum().reset_index()
        tot = tot.sort_values(["lang", "n", "ngram"],
                              ascending=[True, False, True], kind="stable")
        return tot.groupby("lang", sort=False).head(k)

    cands = bucketed.groupby("bucket").map_groups(bucket_sum_topk,
                                                  batch_format="pandas")

    # final merge is OUTPUT-sized (<= n_buckets * n_langs * k rows): one
    # task, not a second distributed sort barrier
    def merge_all(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["lang", "n", "ngram"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("lang", sort=False).head(k).reset_index(drop=True)
        df["rnk"] = (df.groupby("lang", sort=False).cumcount() + 1).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return cands.repartition(1).map_batches(merge_all, batch_format="pyarrow",
                                            batch_size=None)


# ---------------------------------------------------------------------------
# repetition statistics — Gopher-style repetition filter signals
# ---------------------------------------------------------------------------


def _group_count(parts: list, V: int):
    """Composite-key counting: np.unique over base-V packed int64 keys when
    the packed range fits (fast 1-D path), unique-rows otherwise (webtext
    vocabularies can push V**n past int64). Returns (cols, counts) with
    cols[i] = i-th key column of each unique row."""
    hi = int(parts[0].max()) + 1 if parts[0].size else 1
    maxkey = hi
    for _ in range(len(parts) - 1):
        maxkey *= max(V, 1)
    if maxkey < 2 ** 62:
        key = parts[0].astype(np.int64)
        for p in parts[1:]:
            key = key * V + p
        uniq, cnt = np.unique(key, return_counts=True)
        cols = []
        for _ in range(len(parts) - 1):
            cols.append(uniq % V)
            uniq = uniq // V
        cols.append(uniq)
        return cols[::-1], cnt
    rows = np.column_stack(parts)
    uniq, cnt = np.unique(rows, axis=0, return_counts=True)
    return [uniq[:, i] for i in range(len(parts))], cnt


def repetition_stats(ds, dup_n: int = 5, column: str = "text",
                     id_column: str = "doc_id"):
    """Per-document repetition signals (the Gopher repetition filters:
    "fraction of characters in the most common 2-gram" and "fraction of
    characters in duplicated n-grams"):

    - ``n_tokens``      whitespace tokens (trim + split, empties dropped)
    - ``top2_gram``     most frequent word bigram (ties → lexicographically
                        smallest), '' when the doc has < 2 tokens
    - ``top2_cnt``      its occurrence count (0 when none)
    - ``top2_chars``    top2_cnt * length(top2_gram) — the Gopher char mass
    - ``dup{n}_distinct / dup{n}_occ / dup{n}_chars``  distinct duplicated
      (count >= 2) word n-grams, their total occurrences and char mass

    Every output is an integer (the oracle-exactness invariant), and each
    row is a whole document, so the operator is ONE map_batches — no
    shuffle at any corpus size. Vectorized like ngram_topk's combiner:
    dictionary-coded tokens, composite-int np.unique gram counting;
    strings materialize only for the per-doc top candidates."""
    import pandas as pd

    def rep(batch: pa.Table) -> pa.Table:
        tune_allocator()
        texts = _as_array(batch.column(column))
        ids = batch.column(id_column)
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
        vlen = pc.utf8_length(vocab).to_numpy().astype(np.int64) \
            if len(vocab) else np.empty(0, np.int64)
        tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64),
                            offs[1:] - offs[:-1])
        keep = vlen[codes] > 0 if codes.size else np.empty(0, bool)
        codes = codes[keep]
        tok_doc = tok_doc[keep]
        V = len(vocab)
        n_tokens = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)

        top_cnt = np.zeros(n_docs, np.int64)
        top_chars = np.zeros(n_docs, np.int64)
        top_gram = np.full(n_docs, "", dtype=object)
        if codes.size >= 2:
            m = tok_doc[:-1] == tok_doc[1:]
            if m.any():
                (ud, u1, u2), cnt = _group_count(
                    [tok_doc[:-1][m], codes[:-1][m], codes[1:][m]], V)
                grams = pc.binary_join_element_wise(
                    vocab.take(pa.array(u1)), vocab.take(pa.array(u2)), " ")
                df = pd.DataFrame({"d": ud, "cnt": cnt.astype(np.int64),
                                   "gram": grams.to_pandas()})
                df = df.sort_values(["d", "cnt", "gram"],
                                    ascending=[True, False, True],
                                    kind="stable")
                first = df.groupby("d", sort=False).head(1)
                di = first["d"].to_numpy()
                top_cnt[di] = first["cnt"].to_numpy()
                top_gram[di] = first["gram"].to_numpy()
                top_chars[di] = top_cnt[di] * \
                    first["gram"].str.len().to_numpy().astype(np.int64)

        dup_distinct = np.zeros(n_docs, np.int64)
        dup_occ = np.zeros(n_docs, np.int64)
        dup_chars = np.zeros(n_docs, np.int64)
        w = dup_n
        if codes.size >= w:
            same = tok_doc[: -(w - 1)] == tok_doc[w - 1:]
            if same.any():
                parts = [tok_doc[: -(w - 1)][same]]
                parts += [codes[i: codes.size - (w - 1) + i][same]
                          for i in range(w)]
                cols, cnt = _group_count(parts, V)
                dmask = cnt >= 2
                if dmask.any():
                    docs_of = cols[0][dmask].astype(np.int64)
                    gram_chars = sum(vlen[c[dmask]] for c in cols[1:]) \
                        + np.int64(w - 1)
                    dup_distinct = np.bincount(
                        docs_of, minlength=n_docs).astype(np.int64)
                    dup_occ = np.bincount(
                        docs_of, weights=cnt[dmask],
                        minlength=n_docs).astype(np.int64)
                    dup_chars = np.bincount(
                        docs_of, weights=cnt[dmask] * gram_chars,
                        minlength=n_docs).astype(np.int64)

        return pa.table({
            id_column: ids,
            "n_tokens": pa.array(n_tokens),
            "top2_gram": pa.array(top_gram, pa.string()),
            "top2_cnt": pa.array(top_cnt),
            "top2_chars": pa.array(top_chars),
            f"dup{w}_distinct": pa.array(dup_distinct),
            f"dup{w}_occ": pa.array(dup_occ),
            f"dup{w}_chars": pa.array(dup_chars),
        })

    return ds.map_batches(rep, batch_format="pyarrow", batch_size=None)


def repetition_sql(table: str = "documents", dup_n: int = 5,
                   column: str = "text", id_column: str = "doc_id") -> str:
    """DuckDB twin of repetition_stats: same trim+split tokenizer (the
    ngram_topk expression), same tie-break (count DESC, gram ASC), same
    integer char-mass definitions."""
    w = dup_n
    gram5 = " || ' ' || ".join(f"ws[i + {j}]" if j else "ws[i]"
                               for j in range(w))
    return (
        f"WITH t AS (SELECT {id_column} AS doc_id, "
        f"regexp_split_to_array(trim({column}), '\\s+') AS ws FROM {table}), "
        "nt AS (SELECT doc_id, CASE WHEN len(ws) = 1 AND ws[1] = '' "
        "THEN 0 ELSE len(ws) END AS n_tokens FROM t), "
        "big AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i + 1] "
        "for i in generate_series(1, len(ws) - 1)]) AS gram "
        "FROM t WHERE len(ws) >= 2), "
        "bc AS (SELECT doc_id, gram, COUNT(*) AS c FROM big GROUP BY 1, 2), "
        "btop AS (SELECT doc_id, gram, c FROM ("
        "SELECT doc_id, gram, c, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY c DESC, gram) AS rn FROM bc) WHERE rn = 1), "
        f"five AS (SELECT doc_id, unnest([{gram5} "
        f"for i in generate_series(1, len(ws) - {w - 1})]) AS gram "
        f"FROM t WHERE len(ws) >= {w}), "
        "fc AS (SELECT doc_id, gram, COUNT(*) AS c FROM five GROUP BY 1, 2), "
        "fdup AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dd, "
        "CAST(SUM(c) AS BIGINT) AS docc, "
        "CAST(SUM(c * length(gram)) AS BIGINT) AS dch "
        "FROM fc WHERE c >= 2 GROUP BY 1) "
        "SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens, "
        "COALESCE(b.gram, '') AS top2_gram, "
        "CAST(COALESCE(b.c, 0) AS BIGINT) AS top2_cnt, "
        "CAST(COALESCE(b.c * length(b.gram), 0) AS BIGINT) AS top2_chars, "
        f"CAST(COALESCE(f.dd, 0) AS BIGINT) AS dup{w}_distinct, "
        f"CAST(COALESCE(f.docc, 0) AS BIGINT) AS dup{w}_occ, "
        f"CAST(COALESCE(f.dch, 0) AS BIGINT) AS dup{w}_chars "
        "FROM nt n LEFT JOIN btop b USING (doc_id) "
        "LEFT JOIN fdup f USING (doc_id)"
    )


# ---------------------------------------------------------------------------
# PII redaction — webtext cleaning stage
# ---------------------------------------------------------------------------

# RE2 patterns, evaluated by Arrow AND DuckDB (both embed RE2, so the
# same pattern strings match identically — the langid/token precedent)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9 -]{6,}[0-9]"


def redact_pii(ds, column: str = "text", id_column: str = "doc_id"):
    """Scrub emails then phone numbers from ``column`` → Dataset
    (doc_id, clean_text, n_emails, n_phones).

    Stateless vectorized RE2 kernels in a task-pool map_batches (no
    setup to amortize → no actor pool, the media-stats lesson). Counts
    are taken BEFORE each replacement and the two replacements run
    sequentially (phones counted on the email-redacted text) — the SQL
    twin mirrors that order exactly."""

    def scrub(t: pa.Table) -> pa.Table:
        txt = _as_array(t.column(column))
        n_email = pc.cast(pc.count_substring_regex(txt, EMAIL_PATTERN),
                          pa.int64())
        no_email = pc.replace_substring_regex(txt, EMAIL_PATTERN, "<EMAIL>")
        n_phone = pc.cast(pc.count_substring_regex(no_email, PHONE_PATTERN),
                          pa.int64())
        clean = pc.replace_substring_regex(no_email, PHONE_PATTERN,
                                           "<PHONE>")
        return pa.table({id_column: t.column(id_column),
                         "clean_text": clean,
                         "n_emails": n_email,
                         "n_phones": n_phone})

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=None)


def synth_contacts(ds, column: str = "text", id_column: str = "doc_id"):
    """Deterministic PII-bearing corpus from the documents table (the
    read_pages / media-corpus synthesis precedent — no external data):
    doc_id % 3 == 0 → no contact suffix, 1 → an email, 2 → email +
    phone. Reproduced verbatim by synth_contacts_sql_expr()."""

    def _imod(arr, n: int):  # pyarrow.compute has no mod kernel
        return pc.subtract(arr, pc.multiply(pc.divide(arr, n), n))

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column)
        id_s = pc.cast(ids, pa.string())
        dom = pc.cast(_imod(ids, 7), pa.string())
        last4 = pc.utf8_lpad(pc.cast(_imod(ids, 10000), pa.string()),
                             4, "0")
        email = pc.binary_join_element_wise(
            " mail user", id_s, "@ex", dom, ".org", "")
        phone = pc.binary_join_element_wise(
            " call +1 555-", last4, " now", "")
        m = _imod(ids, 3)
        suffix = pc.if_else(
            pc.equal(m, 0), "",
            pc.if_else(pc.equal(m, 1), email,
                       pc.binary_join_element_wise(email, phone, "")))
        txt = pc.binary_join_element_wise(
            _as_array(t.column(column)), suffix, "")
        return pa.table({id_column: ids, column: txt})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


def synth_contacts_sql_expr(column: str = "text",
                            id_column: str = "doc_id") -> str:
    """SQL expression producing exactly synth_contacts()' text column."""
    email = (f"(' mail user' || {id_column} || '@ex' || "
             f"({id_column} % 7) || '.org')")
    phone = (f"(' call +1 555-' || "
             f"lpad(CAST({id_column} % 10000 AS VARCHAR), 4, '0') || ' now')")
    return (f"({column} || CASE WHEN {id_column} % 3 = 0 THEN '' "
            f"WHEN {id_column} % 3 = 1 THEN {email} "
            f"ELSE {email} || {phone} END)")


def redact_pii_sql(table: str = "documents", column: str = "text",
                   id_column: str = "doc_id", synth: bool = True) -> str:
    """DuckDB twin of synth_contacts |> redact_pii: same RE2 patterns,
    same email-then-phone order, counts before each replacement."""
    src = synth_contacts_sql_expr(column, id_column) if synth else column
    return (
        f"WITH s AS (SELECT {id_column} AS doc_id, {src} AS t FROM {table}), "
        f"e AS (SELECT doc_id, "
        f"CAST(length(regexp_extract_all(t, '{EMAIL_PATTERN}')) AS BIGINT)"
        f" AS n_emails, "
        f"regexp_replace(t, '{EMAIL_PATTERN}', '<EMAIL>', 'g') AS t2 "
        f"FROM s) "
        f"SELECT doc_id, "
        f"regexp_replace(t2, '{PHONE_PATTERN}', '<PHONE>', 'g')"
        f" AS clean_text, n_emails, "
        f"CAST(length(regexp_extract_all(t2, '{PHONE_PATTERN}')) AS BIGINT)"
        f" AS n_phones FROM e"
    )


# ---------------------------------------------------------------------------
# compression-ratio quality signal (RefinedWeb/Gopher-family heuristic)
# ---------------------------------------------------------------------------


def compression_stats(ds, level: int = 6, column: str = "text",
                      id_column: str = "doc_id"):
    """Per-doc DEFLATE compressibility → Dataset (doc_id, raw_len,
    deflate_len, ratio_q9). Highly compressible text (ratio << typical
    prose ~0.4-0.6) is boilerplate/repetition; near-incompressible text
    (ratio ~1) is binary junk — the RefinedWeb-family cheap quality
    signal that needs no model.

    One stateless map_batches scan, no shuffle. The per-row
    zlib.compress loop is C-bound (the fingerprint-md5 precedent);
    raw_len counts UTF-8 BYTES. ratio_q9 = floor(deflate_len /
    max(raw_len, 1) * 1e9 + 0.5) keeps the output pure-int (the repo's
    oracle-exactness invariant); zlib has no SQL twin, so this op is
    pytest-gated against a direct reference (the BPE/bloom precedent).
    """
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column(column)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        raw = [v.encode("utf-8") for v in txt.to_pylist()]
        raw_len = np.fromiter((len(b) for b in raw), np.int64,
                              count=len(raw))
        dlen = np.fromiter((len(zlib.compress(b, level)) for b in raw),
                           np.int64, count=len(raw))
        # empty docs: ratio 0 (zlib emits an 8-byte header even for b"")
        ratio = np.where(
            raw_len > 0,
            np.floor(dlen / np.maximum(raw_len, 1) * 1e9 + 0.5), 0) \
            .astype(np.int64)
        return pa.table({id_column: t.column(id_column),
                         "raw_len": pa.array(raw_len),
                         "deflate_len": pa.array(dlen),
                         "ratio_q9": pa.array(ratio)})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Gopher document-quality rules (Rae et al. 2021, Table A1)
# ---------------------------------------------------------------------------

GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLET_RE = r"^(•|- |\* )"
_ELLIPSIS_RE = r"(\.\.\.|…)$"


def synth_gopher_docs(ds, column: str = "text", id_column: str = "doc_id"):
    """Three-line corpus exercising every Gopher rule branch: doc_id%7
    bullets line 1, doc_id%11 ends line 2 with an ellipsis, doc_id%13
    injects '#' symbols. Reproduced verbatim by
    synth_gopher_sql_expr() (the synth_multiline precedent)."""

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column)
        txt = t.column(column)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()

        def mod(m):
            return pc.subtract(ids, pc.multiply(pc.divide(ids, m), m))

        l1 = pc.binary_join_element_wise(
            pc.if_else(pc.equal(mod(7), 0), "• ", ""),
            pc.utf8_slice_codeunits(txt, 0, 60), ".", "")
        l2 = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(txt, 60, 120),
            pc.if_else(pc.equal(mod(11), 0), "...", "!"), "")
        l3 = pc.binary_join_element_wise(
            pc.if_else(pc.equal(mod(13), 0), "# tag # ", ""),
            pc.utf8_slice_codeunits(txt, 120, 280), "")
        out = pc.binary_join_element_wise(l1, l2, l3, "\n")
        return pa.table({id_column: ids, column: out})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


def synth_gopher_sql_expr(column: str = "text",
                          id_column: str = "doc_id") -> str:
    """SQL expression producing exactly synth_gopher_docs()'s text."""
    return (
        f"((CASE WHEN {id_column} % 7 = 0 THEN '• ' ELSE '' END) || "
        f"substr({column}, 1, 60) || '.' || chr(10) || "
        f"substr({column}, 61, 60) || "
        f"(CASE WHEN {id_column} % 11 = 0 THEN '...' ELSE '!' END) || "
        f"chr(10) || "
        f"(CASE WHEN {id_column} % 13 = 0 THEN '# tag # ' ELSE '' END) || "
        f"substr({column}, 121, 160))"
    )


def gopher_rules(ds, min_words: int = 30, max_words: int = 100000,
                 stops: tuple = GOPHER_STOPS, column: str = "text",
                 id_column: str = "doc_id"):
    """Gopher's document-level quality rules → Dataset (doc_id, counts
    per rule ingredient + keep flag), ALL integers (rule thresholds are
    rational, so every compare is exact integer arithmetic — no float
    crosses an engine boundary):

    - word count in [min_words, max_words];
    - mean word length in [3, 10]  (3*n <= chars <= 10*n);
    - symbol-to-word ratio ('#' + non-overlapping '...') <= 0.1
      (10*sym <= n);
    - < 90% of lines bullet-started, <= 30% ellipsis-ended
      (10*bullet < 9*lines, 10*ell <= 3*lines);
    - >= 80% of words contain an alphabetic char (5*alpha >= 4*n);
    - >= 2 distinct stop words present (``stops`` is a corpus knob —
      Gopher's fixed English list by default; the driver row uses the
      engine's en marker set because the synth vocabulary contains
      those).

    One vectorized map_batches scan (Arrow RE2 on the flat token/line
    arrays), no shuffle — the quality_score/repetition_stats shape;
    repetition_stats carries Gopher's other (repetition) half."""

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        ids = t.column(id_column)
        txt = t.column(column)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = len(txt)
        # tokens
        toks = pc.utf8_split_whitespace(txt)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        offs = np.asarray(toks.offsets, dtype=np.int64)
        tok_doc = np.repeat(np.arange(n, dtype=np.int64),
                            offs[1:] - offs[:-1])
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64) if len(flat) else np.empty(0, np.int64)
        nonempty = tok_len > 0
        n_words = np.bincount(tok_doc[nonempty], minlength=n) \
            .astype(np.int64)
        tok_chars = np.zeros(n, np.int64)
        np.add.at(tok_chars, tok_doc, tok_len)
        alpha = pc.match_substring_regex(flat, "[a-zA-Z]") \
            .to_numpy(zero_copy_only=False) if len(flat) else \
            np.empty(0, bool)
        n_alpha = np.bincount(tok_doc[np.asarray(alpha, bool)],
                              minlength=n).astype(np.int64)
        n_stop = np.zeros(n, np.int64)
        for w in stops:
            hit = pc.equal(flat, w).to_numpy(zero_copy_only=False) \
                if len(flat) else np.empty(0, bool)
            has = np.bincount(tok_doc[np.asarray(hit, bool)],
                              minlength=n) > 0
            n_stop += has.astype(np.int64)
        # lines
        lines = pc.split_pattern(txt, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        lflat = lines.values
        loffs = np.asarray(lines.offsets, dtype=np.int64)
        line_doc = np.repeat(np.arange(n, dtype=np.int64),
                             loffs[1:] - loffs[:-1])
        n_lines = (loffs[1:] - loffs[:-1]).astype(np.int64)
        bullet = pc.match_substring_regex(lflat, _BULLET_RE) \
            .to_numpy(zero_copy_only=False) if len(lflat) else \
            np.empty(0, bool)
        ell = pc.match_substring_regex(lflat, _ELLIPSIS_RE) \
            .to_numpy(zero_copy_only=False) if len(lflat) else \
            np.empty(0, bool)
        n_bullet = np.bincount(line_doc[np.asarray(bullet, bool)],
                               minlength=n).astype(np.int64)
        n_ell = np.bincount(line_doc[np.asarray(ell, bool)],
                            minlength=n).astype(np.int64)
        # symbols: '#' + non-overlapping '...'
        n_sym = (pc.count_substring(txt, "#").to_numpy(
                     zero_copy_only=False).astype(np.int64)
                 + pc.count_substring(txt, "...").to_numpy(
                     zero_copy_only=False).astype(np.int64))
        keep = ((n_words >= min_words) & (n_words <= max_words)
                & (3 * n_words <= tok_chars) & (tok_chars <= 10 * n_words)
                & (10 * n_sym <= n_words)
                & (10 * n_bullet < 9 * n_lines)
                & (10 * n_ell <= 3 * n_lines)
                & (5 * n_alpha >= 4 * n_words)
                & (n_stop >= 2))
        return pa.table({id_column: ids,
                         "n_words": pa.array(n_words),
                         "tok_chars": pa.array(tok_chars),
                         "n_sym": pa.array(n_sym),
                         "n_lines": pa.array(n_lines),
                         "n_bullet": pa.array(n_bullet),
                         "n_ellipsis": pa.array(n_ell),
                         "n_alpha_words": pa.array(n_alpha),
                         "n_stops": pa.array(n_stop),
                         "keep": pa.array(keep.astype(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def gopher_rules_sql(min_words: int = 30, max_words: int = 100000,
                     stops: tuple = GOPHER_STOPS, table: str = "documents",
                     column: str = "text", id_column: str = "doc_id",
                     synth: bool = True) -> str:
    """DuckDB twin: same tokenizer/line split, same RE2 patterns, same
    integer rule arithmetic."""
    src = synth_gopher_sql_expr(column, id_column) if synth else column
    stops_sql = ", ".join(f"'{w}'" for w in stops)
    return (
        f"WITH src AS (SELECT {id_column} AS doc_id, {src} AS text "
        f"FROM {table}), "
        "tk AS (SELECT doc_id, tok FROM (SELECT doc_id, "
        "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        "FROM src) WHERE tok <> ''), "
        "tw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(length(tok)) AS BIGINT) AS tok_chars, "
        "CAST(SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_words, "
        f"CAST(COUNT(DISTINCT CASE WHEN tok IN ({stops_sql}) THEN tok END) "
        "AS BIGINT) AS n_stops FROM tk GROUP BY 1), "
        "ln AS (SELECT doc_id, l FROM (SELECT doc_id, "
        "unnest(string_split(text, chr(10))) AS l FROM src)), "
        "lw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines, "
        "CAST(SUM(CASE WHEN regexp_matches(l, '^(•|- |\\* )') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet, "
        "CAST(SUM(CASE WHEN regexp_matches(l, '(\\.\\.\\.|…)$') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis FROM ln GROUP BY 1), "
        "sy AS (SELECT doc_id, CAST("
        "(length(text) - length(replace(text, '#', ''))) + "
        "(length(text) - length(replace(text, '...', ''))) // 3 "
        "AS BIGINT) AS n_sym FROM src) "
        "SELECT s.doc_id, COALESCE(tw.n_words, 0) AS n_words, "
        "COALESCE(tw.tok_chars, 0) AS tok_chars, sy.n_sym, "
        "lw.n_lines, lw.n_bullet, lw.n_ellipsis, "
        "COALESCE(tw.n_alpha_words, 0) AS n_alpha_words, "
        "COALESCE(tw.n_stops, 0) AS n_stops, "
        f"CAST(CASE WHEN COALESCE(tw.n_words, 0) >= {min_words} "
        f"AND COALESCE(tw.n_words, 0) <= {max_words} "
        "AND 3 * COALESCE(tw.n_words, 0) <= COALESCE(tw.tok_chars, 0) "
        "AND COALESCE(tw.tok_chars, 0) <= 10 * COALESCE(tw.n_words, 0) "
        "AND 10 * sy.n_sym <= COALESCE(tw.n_words, 0) "
        "AND 10 * lw.n_bullet < 9 * lw.n_lines "
        "AND 10 * lw.n_ellipsis <= 3 * lw.n_lines "
        "AND 5 * COALESCE(tw.n_alpha_words, 0) >= "
        "4 * COALESCE(tw.n_words, 0) "
        "AND COALESCE(tw.n_stops, 0) >= 2 "
        "THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM src s LEFT JOIN tw ON tw.doc_id = s.doc_id "
        "JOIN lw ON lw.doc_id = s.doc_id "
        "JOIN sy ON sy.doc_id = s.doc_id"
    )


# ---------------------------------------------------------------------------
# sentence segmentation
# ---------------------------------------------------------------------------

# split AFTER terminal punctuation followed by whitespace. RE2 (both
# engines) has NO lookbehind, so the split is a two-step identical in
# Arrow and DuckDB: replace '([.!?])\s+' with '\1' + a \x01 sentinel
# (never in corpus text — the bpe.py precedent), then split on \x01.
_SENT_BOUNDARY_RE = r"([.!?])\s+"
_SENT_SENTINEL = "\x01"


def split_sentences(ds, column: str = "text", id_column: str = "doc_id",
                    min_chars: int = 1):
    """Rule-based sentence segmentation → Dataset (doc_id, sent_idx,
    sentence, n_chars): split after terminal-punctuation runs followed
    by whitespace, 1-based index in document order, segments shorter
    than ``min_chars`` dropped (index still counts kept sentences
    only). One vectorized RE2 split + numpy offset explode, no
    shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = _as_array(t.column(column))
        marked = pc.replace_substring_regex(
            pc.utf8_trim_whitespace(txt), _SENT_BOUNDARY_RE,
            replacement="\\1" + _SENT_SENTINEL)
        parts = _as_array(pc.split_pattern(marked, _SENT_SENTINEL))
        flat = parts.values
        offs = np.asarray(parts.offsets, dtype=np.int64)
        doc = np.repeat(ids, offs[1:] - offs[:-1])
        nch = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64) if len(flat) else np.empty(0, np.int64)
        keep = nch >= min_chars
        doc = doc[keep]
        flat = flat.filter(pa.array(keep))
        nch = nch[keep]
        # 1-based rank among KEPT sentences per doc (docs are contiguous)
        if len(doc):
            new_doc = np.concatenate([[True], doc[1:] != doc[:-1]])
            grp_start = np.maximum.accumulate(
                np.where(new_doc, np.arange(len(doc)), 0))
            idx = np.arange(len(doc)) - grp_start + 1
        else:
            idx = np.empty(0, np.int64)
        return pa.table({id_column: pa.array(doc),
                         "sent_idx": pa.array(idx.astype(np.int64)),
                         "sentence": flat,
                         "n_chars": pa.array(nch)})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def split_sentences_sql(table: str = "documents", column: str = "text",
                        id_column: str = "doc_id",
                        min_chars: int = 1) -> str:
    """DuckDB twin: same sentinel-replace + split, row_number over
    kept sentences in original order."""
    return (
        f"WITH s AS (SELECT {id_column} AS doc_id, "
        f"unnest(range(1, len(arr) + 1)) AS raw_idx, unnest(arr) AS sent "
        f"FROM (SELECT {id_column}, string_split(regexp_replace("
        # DuckDB trim() strips SPACES only (the dup_span_stats gotcha);
        # name the full whitespace set to mirror utf8_trim_whitespace
        f"trim({column}, ' ' || chr(9) || chr(10) || chr(11) || chr(12)"
        f" || chr(13)), '([.!?])\\s+', '\\1' || chr(1), 'g'), "
        f"chr(1)) AS arr FROM {table})), "
        f"k AS (SELECT doc_id, raw_idx, sent, length(sent) AS n FROM s "
        f"WHERE length(sent) >= {min_chars}) "
        "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id "
        "ORDER BY raw_idx) AS BIGINT) AS sent_idx, sent AS sentence, "
        "CAST(n AS BIGINT) AS n_chars FROM k"
    )


# ---------------------------------------------------------------------------
# PMI collocations — top-k bigrams by pointwise mutual information
# ---------------------------------------------------------------------------


def pmi_topk(ds, k: int = 20, min_count: int = 3, column: str = "text",
             id_column: str = "doc_id", n_buckets: int = 64):
    """Collocation extraction: top-k within-doc bigrams by
    ``pmi_q9 = floor(ln(c_xy * N_uni^2 / (N_big * c_x * c_y)) * 1e9
    + 0.5)`` over bigrams with ``c_xy >= min_count``; rank = (pmi DESC,
    bigram ASC). Every ln argument is an exact integer product, so the
    DuckDB twin is bit-equal (the doc_perplexity contract).

    Shape: ONE bucketed bigram-count shuffle (per-batch combiner — the
    unigram_counts pattern; bigrams never cross docs) + the corpus
    unigram table collected (vocab-bounded) and broadcast; scoring is
    a vectorized scan over the counted bigrams with per-batch top-k
    prune → one output-sized merge task."""
    import zlib

    import pandas as pd
    import ray

    from .lm import _split_codes, unigram_counts

    uni = unigram_counts(ds, column=column).to_pandas() \
        .sort_values("tok", kind="stable")
    n_uni = int(uni["n"].sum())
    uni_ref = ray.put((uni["tok"].to_numpy(), uni["n"].to_numpy(np.int64)))

    def bigram_partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        codes, tok_doc, vocab, _ = _split_codes(t, column)
        if codes.size < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "nbig": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        same = tok_doc[:-1] == tok_doc[1:]
        a = codes[:-1][same]
        b = codes[1:][same]
        key = a * np.int64(len(vocab)) + b
        uq, cnt = np.unique(key, return_counts=True)
        w1 = vocab.take(pa.array((uq // len(vocab)).astype(np.int64)))
        w2 = vocab.take(pa.array((uq % len(vocab)).astype(np.int64)))
        gram = pc.binary_join_element_wise(w1, w2, " ")
        if isinstance(gram, pa.ChunkedArray):
            gram = gram.combine_chunks()
        bk = np.fromiter((zlib.crc32(v.encode()) % n_buckets
                          for v in gram.to_pylist()),
                         np.int32, count=len(gram))
        nbig = np.zeros(len(uq), np.int64)
        nbig[0] = int(same.sum())       # batch bigram total rides row 0
        return pa.table({"w1": w1, "w2": w2,
                         "n": pa.array(cnt.astype(np.int64)),
                         "nbig": pa.array(nbig),
                         "bucket": pa.array(bk)})

    parts = ds.map_batches(bigram_partial, batch_format="pyarrow",
                           batch_size=None).materialize()
    n_big = sum(r["nbig"] for r in
                parts.select_columns(["nbig"]).take_all())

    def bucket_score(df: pd.DataFrame) -> pd.DataFrame:
        toks_sorted, cnts = ray.get(uni_ref)
        g = df.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
        g = g[g["n"] >= min_count]
        if not len(g):
            return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "pmi_q9": pd.Series([], dtype="int64")})
        cx = cnts[np.searchsorted(toks_sorted, g["w1"].to_numpy())]
        cy = cnts[np.searchsorted(toks_sorted, g["w2"].to_numpy())]
        num = g["n"].to_numpy(np.int64).astype(np.float64) \
            * np.float64(n_uni) * np.float64(n_uni)
        den = np.float64(n_big) * cx.astype(np.float64) \
            * cy.astype(np.float64)
        q = np.floor(np.log(num / den) * 1e9 + 0.5).astype(np.int64)
        out = pd.DataFrame({"bigram": g["w1"] + " " + g["w2"],
                            "n": g["n"].to_numpy(np.int64),
                            "pmi_q9": q})
        return out.sort_values(["pmi_q9", "bigram"],
                               ascending=[False, True],
                               kind="stable").head(k)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["pmi_q9", "bigram"],
                                       ascending=[False, True],
                                       kind="stable").head(k) \
            .reset_index(drop=True)
        df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    scored = parts.groupby("bucket").map_groups(bucket_score,
                                                batch_format="pandas")
    return scored.map_batches(lambda t: t, batch_format="pyarrow") \
        .repartition(1).map_batches(merge, batch_format="pyarrow",
                                    batch_size=None)


def pmi_topk_sql(k: int = 20, min_count: int = 3,
                 table: str = "documents", column: str = "text",
                 id_column: str = "doc_id") -> str:
    """DuckDB twin: same tokenizer, lead() bigrams within docs, same
    integer-argument ln quantization, same (pmi DESC, bigram ASC)
    rank."""
    return (
        f"WITH t AS (SELECT doc_id, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY idx) AS idx, tok FROM "
        "(SELECT doc_id, unnest(range(1, len(arr) + 1)) AS idx, "
        f"unnest(arr) AS tok FROM (SELECT {id_column} AS doc_id, "
        f"regexp_split_to_array(trim({column}), '\\s+') AS arr "
        f"FROM {table})) WHERE tok <> ''), "
        "nu AS (SELECT COUNT(*) AS n FROM t), "
        "ug AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY 1), "
        "bg0 AS (SELECT doc_id, tok AS w1, lead(tok, 1) OVER "
        "(PARTITION BY doc_id ORDER BY idx) AS w2 FROM t), "
        "bg AS (SELECT w1, w2, COUNT(*) AS n FROM bg0 "
        "WHERE w2 IS NOT NULL GROUP BY 1, 2), "
        "nb AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM bg), "
        "scored AS (SELECT bg.w1 || ' ' || bg.w2 AS bigram, bg.n, "
        "CAST(floor(ln((CAST(bg.n AS DOUBLE) * CAST(nu.n AS DOUBLE) * "
        "CAST(nu.n AS DOUBLE)) / (CAST(nb.n AS DOUBLE) * "
        "CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE))) * 1000000000.0 "
        "+ 0.5) AS BIGINT) AS pmi_q9 "
        "FROM bg JOIN ug ux ON ux.tok = bg.w1 "
        "JOIN ug uy ON uy.tok = bg.w2 CROSS JOIN nu CROSS JOIN nb "
        f"WHERE bg.n >= {min_count}) "
        "SELECT bigram, CAST(n AS BIGINT) AS n, pmi_q9, "
        "CAST(row_number() OVER (ORDER BY pmi_q9 DESC, bigram) "
        "AS BIGINT) AS rnk "
        f"FROM scored QUALIFY rnk <= {k}"
    )
