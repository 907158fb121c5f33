"""Web-corpus cleaning operators: C4-style line-level filtering and
URL canonicalization dedup (RefinedWeb/CCNet's URL pass).

Both are single-scan map_batches stages with exact DuckDB twins:

- ``clean_lines`` implements the line rules of C4 (Raffel et al. 2020,
  "Exploring the Limits of Transfer Learning", §2.2): keep only lines
  that end in terminal punctuation AND have >= ``min_words`` words AND
  contain no boilerplate blocklist phrase; then drop documents with
  fewer than ``min_kept`` surviving lines or containing '{'. All
  predicates are RE2/contains kernels evaluated identically by Arrow
  and DuckDB; line order is preserved (Arrow list filter ==
  DuckDB list_filter), so the joined clean_text matches byte-for-byte.
  The per-doc work never shuffles — lines explode and re-join INSIDE
  one batch.
- ``canonical_url_dedup`` canonicalizes URLs (lowercase scheme+host,
  strip query string / fragment / trailing slash — the standard crawl
  canonicalization) and keeps the first (min doc_id) document per
  canonical URL. Shape = dedup_exact: per-batch partial (url, min_id,
  cnt) combiner → ONE crc32-bucketed shuffle → in-bucket merge; only
  the canonical-url/id/count triple ever leaves a task, never text.

The synthetic corpora (``synth_multiline`` / ``synth_url_variants``)
derive deterministically from the documents table — the
synth_contacts/media-corpus precedent: the raw synth text has no
newlines and the derived URLs no variants, so the driver rows
synthesize them and the SQL twin reproduces the synthesis verbatim.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator
from .lm import _split_codes

tune_allocator()
import pyarrow.compute as pc

BLOCKLIST = ("click here", "javascript", "cookie policy")
TERMINAL_RE = r"[.!?]$"
WORD_RE = "[^ ]+"


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# ---------------------------------------------------------------------------
# deterministic synthetic corpora (SQL-reproducible, no external data)
# ---------------------------------------------------------------------------


def synth_multiline(ds, column: str = "text", id_column: str = "doc_id"):
    """Multiline corpus from the documents table: three lines per doc —
    a well-formed sentence, a boilerplate line on every 5th doc (else a
    second sentence), and an unterminated tail. Reproduced verbatim by
    synth_multiline_sql_expr()."""

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column)
        txt = _arr(t.column(column))
        l1 = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(txt, 0, 80), ".", "")
        m5 = pc.subtract(ids, pc.multiply(pc.divide(ids, 5), 5))
        l2 = pc.if_else(
            pc.equal(m5, 0),
            pa.scalar("click here to read more now"),
            pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(txt, 80, 160), "!", ""))
        l3 = pc.utf8_slice_codeunits(txt, 160, 360)
        out = pc.binary_join_element_wise(l1, l2, l3, "\n")
        return pa.table({id_column: ids, column: out})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


def synth_multiline_sql_expr(column: str = "text",
                             id_column: str = "doc_id") -> str:
    """SQL expression producing exactly synth_multiline()'s text."""
    return (
        f"(substr({column}, 1, 80) || '.' || chr(10) || "
        f"CASE WHEN {id_column} % 5 = 0 THEN 'click here to read more now' "
        f"ELSE substr({column}, 81, 80) || '!' END || chr(10) || "
        f"substr({column}, 161, 200))"
    )


def synth_url_variants(ds, id_column: str = "doc_id"):
    """URL corpus with duplicates-after-canonicalization: every 3
    consecutive doc_ids share a page (doc_id // 3); variants cycle
    doc_id % 3 → plain / tracking query string / fragment, and odd ids
    uppercase the host. Reproduced verbatim by
    synth_url_variants_sql_expr()."""

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column)
        page = pc.divide(ids, 3)
        hostn = pc.cast(pc.subtract(page, pc.multiply(
            pc.divide(page, 97), 97)), pa.string())
        m2 = pc.subtract(ids, pc.multiply(pc.divide(ids, 2), 2))
        host = pc.if_else(pc.equal(m2, 1),
                          pc.binary_join_element_wise(
                              pa.scalar("SITE"), hostn, ".EXAMPLE", ""),
                          pc.binary_join_element_wise(
                              pa.scalar("site"), hostn, ".example", ""))
        m3 = pc.subtract(ids, pc.multiply(pc.divide(ids, 3), 3))
        suffix = pc.if_else(
            pc.equal(m3, 0), "/",
            pc.if_else(pc.equal(m3, 1), "?utm_source=feed&ref=rss",
                       "#comments"))
        url = pc.binary_join_element_wise(
            "https://", host, "/p/", pc.cast(page, pa.string()), suffix, "")
        return pa.table({id_column: ids, "url": url})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


def synth_url_variants_sql_expr(id_column: str = "doc_id") -> str:
    """SQL expression producing exactly synth_url_variants()'s url."""
    host = (f"(CASE WHEN {id_column} % 2 = 1 "
            f"THEN 'SITE' || (({id_column} // 3) % 97) || '.EXAMPLE' "
            f"ELSE 'site' || (({id_column} // 3) % 97) || '.example' END)")
    suffix = (f"(CASE WHEN {id_column} % 3 = 0 THEN '/' "
              f"WHEN {id_column} % 3 = 1 THEN '?utm_source=feed&ref=rss' "
              f"ELSE '#comments' END)")
    return (f"('https://' || {host} || '/p/' || ({id_column} // 3) "
            f"|| {suffix})")


# ---------------------------------------------------------------------------
# C4 line-level cleaning
# ---------------------------------------------------------------------------


def clean_lines(ds, min_words: int = 5, min_kept: int = 2,
                blocklist: tuple = BLOCKLIST, column: str = "text",
                id_column: str = "doc_id"):
    """C4's line filter → Dataset (doc_id, n_lines, n_kept, clean_text)
    with only surviving documents. One vectorized scan: split each doc
    on newlines (Arrow list), evaluate the line predicates on the FLAT
    line array (RE2 terminal-punctuation match, [^ ]+ word-run count,
    blocklist contains), rebuild the kept-lines list from numpy offsets
    and re-join with ``pc.binary_join`` — no Python loop over lines, no
    shuffle (each doc lives wholly inside its batch)."""

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        ids = t.column(id_column)
        txt = _arr(t.column(column))
        n = len(txt)
        lines = pc.split_pattern(txt, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.values
        offs = np.asarray(lines.offsets, dtype=np.int64)
        keep = pc.and_(
            pc.match_substring_regex(flat, TERMINAL_RE),
            pc.greater_equal(
                pc.count_substring_regex(flat, WORD_RE),
                pa.scalar(min_words, pa.int32())))
        for phrase in blocklist:
            keep = pc.and_(keep, pc.invert(pc.match_substring(flat, phrase)))
        keep_np = keep.to_numpy(zero_copy_only=False)
        n_lines = offs[1:] - offs[:-1]
        line_doc = np.repeat(np.arange(n, dtype=np.int64), n_lines)
        n_kept = np.bincount(line_doc[keep_np], minlength=n).astype(np.int64) \
            if keep_np.size else np.zeros(n, np.int64)
        kept_flat = flat.filter(keep)
        kept_offs = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
        kept_list = pa.ListArray.from_arrays(pa.array(kept_offs, pa.int32()),
                                             kept_flat)
        clean = pc.binary_join(kept_list, "\n")
        doc_ok = pc.and_(
            pa.array(n_kept >= min_kept),
            pc.invert(pc.match_substring(txt, "{")))
        return pa.table({id_column: ids,
                         "n_lines": pa.array(n_lines),
                         "n_kept": pa.array(n_kept),
                         "clean_text": clean}).filter(doc_ok)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def clean_lines_sql(min_words: int = 5, min_kept: int = 2,
                    blocklist: tuple = BLOCKLIST, table: str = "documents",
                    column: str = "text", id_column: str = "doc_id",
                    synth: bool = True) -> str:
    """DuckDB twin: same split, same RE2 predicates, order-preserving
    list_filter, same join — byte-identical clean_text."""
    src = synth_multiline_sql_expr(column, id_column) if synth else column
    block = " AND ".join(
        f"NOT contains(l, '{p}')" for p in blocklist)
    return (
        f"WITH src AS (SELECT {id_column} AS doc_id, {src} AS text "
        f"FROM {table}), "
        f"f AS (SELECT doc_id, text, "
        f"list_filter(string_split(text, chr(10)), l -> "
        f"regexp_matches(l, '{TERMINAL_RE}') AND "
        f"length(regexp_extract_all(l, '{WORD_RE}')) >= {min_words} AND "
        f"{block}) AS kept FROM src) "
        f"SELECT doc_id, "
        f"CAST(length(string_split(text, chr(10))) AS BIGINT) AS n_lines, "
        f"CAST(length(kept) AS BIGINT) AS n_kept, "
        f"array_to_string(kept, chr(10)) AS clean_text "
        f"FROM f WHERE length(kept) >= {min_kept} "
        f"AND NOT contains(text, '{{')"
    )


# ---------------------------------------------------------------------------
# corpus-wide duplicate-line removal (C4's span dedup, line granularity)
# ---------------------------------------------------------------------------


def dedup_lines(ds, column: str = "text", id_column: str = "doc_id",
                n_buckets: int = 64):
    """C4's other cleaning half (§2.2: "discard all but one of any
    occurrence of a span repeated in the dataset"), at line granularity:
    every line keeps only its GLOBALLY FIRST occurrence (min
    (doc_id, idx)); later copies are removed from their documents →
    Dataset (doc_id, n_kept, clean_text) for docs with >= 1 surviving
    line.

    Two bounded shuffles, text lines shuffle once each way:
    1. explode (doc_id, idx, line) → crc32(line)-bucket shuffle → each
       bucket locally picks the first occurrence per line (every copy of
       a line lands in the same bucket, so the winner is decided in one
       task — no global sort);
    2. winner rows → doc-bucket shuffle → per-doc idx-ordered re-join.
    """
    import zlib

    import pandas as pd

    def explode(t: pa.Table) -> pa.Table:
        tune_allocator()
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = _arr(t.column(column))
        lines = pc.split_pattern(txt, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.values
        offs = np.asarray(lines.offsets, dtype=np.int64)
        nl = offs[1:] - offs[:-1]
        doc = np.repeat(ids, nl)
        idx = np.concatenate([np.arange(1, n + 1) for n in nl]) \
            if len(nl) else np.empty(0, np.int64)
        b = np.fromiter((zlib.crc32(v.encode()) % n_buckets
                         for v in flat.to_pylist()),
                        np.int32, count=len(flat))
        return pa.table({id_column: pa.array(doc),
                         "idx": pa.array(idx.astype(np.int64)),
                         "line": flat,
                         "bucket": pa.array(b)})

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["line", id_column, "idx"], kind="stable") \
            .drop_duplicates("line", keep="first")
        w = w[[id_column, "idx", "line"]].copy()
        w["dbucket"] = (w[id_column] % n_buckets).astype(np.int32)
        return w

    def rejoin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_column, "idx"], kind="stable")
        out = df.groupby(id_column, sort=False).agg(
            n_kept=("line", "size"),
            clean_text=("line", lambda s: "\n".join(s)))
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out.reset_index()[[id_column, "n_kept", "clean_text"]]

    lines = ds.map_batches(explode, batch_format="pyarrow",
                           batch_size=None)
    winners = lines.groupby("bucket").map_groups(keep_first,
                                                 batch_format="pandas")
    return winners.groupby("dbucket").map_groups(rejoin,
                                                 batch_format="pandas")


def dedup_lines_sql(table: str = "documents", column: str = "text",
                    id_column: str = "doc_id", synth: bool = True) -> str:
    """DuckDB twin: zipped unnest for (idx, line), row_number over the
    line ordered by (doc_id, idx) — rank 1 is exactly the Ray side's
    bucket-local first occurrence (every copy shares a bucket)."""
    src = synth_multiline_sql_expr(column, id_column) if synth else column
    return (
        f"WITH src AS (SELECT {id_column} AS doc_id, {src} AS text "
        f"FROM {table}), "
        "l AS (SELECT doc_id, "
        "unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx, "
        "unnest(string_split(text, chr(10))) AS line FROM src), "
        "w AS (SELECT doc_id, idx, line, row_number() OVER "
        "(PARTITION BY line ORDER BY doc_id, idx) AS rn FROM l) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
        "string_agg(line, chr(10) ORDER BY idx) AS clean_text "
        "FROM w WHERE rn = 1 GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# corpus-global duplicated n-gram spans (exact-substring-dedup signals)
# ---------------------------------------------------------------------------

# per-doc total-rows sentinel riding the gram shuffle (the bpe.py /
# classify.py "\x01 never survives whitespace tokenization" precedent)
_TOTAL_SENTINEL = "\x01"


def dup_span_stats(ds, w: int = 5, column: str = "text",
                   id_column: str = "doc_id", n_buckets: int = 64):
    """Corpus-global duplicated-span signals — the hash analogue of
    suffix-array exact substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), at fixed word-window
    granularity: a doc's window of ``w`` consecutive tokens is a DUP
    span iff that exact token sequence occurs >= 2 times anywhere in
    the corpus (including elsewhere in the same doc). Output per doc
    (every doc present): (doc_id, n_windows, n_dup_windows,
    dup_pos_mass) where dup_pos_mass is the interval-UNION token
    coverage of all dup windows — the mass substring dedup would cut.

    ONE corpus scan + TWO bounded shuffles (the dedup_lines shape):
    1. explode windows vectorized (w zero-copy Arrow slices of the flat
       token array joined element-wise; windows never cross docs) →
       crc32(gram)-bucket shuffle — every copy of a gram lands in one
       bucket, so its GLOBAL count is a single local decision. Per-doc
       (n_tokens) sentinel rows ride the same output.
    2. dup-window starts → doc-bucket shuffle → per-doc merged-interval
       coverage (vectorized cummax sweep, no Python loop over rows).

    At 100 TB shuffle 64-bit gram HASHES instead of gram strings
    (collision-negligible, ~10x less traffic); strings keep the oracle
    exact here.
    """
    import zlib

    import pandas as pd

    def explode(t: pa.Table) -> pa.Table:
        tune_allocator()

        codes, tok_doc, vocab, n_docs = _split_codes(t, column)
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = vocab.take(pa.array(codes)) if codes.size else \
            pa.array([], pa.string())
        L = len(flat)
        n_tok = np.bincount(tok_doc, minlength=n_docs).astype(np.int64) \
            if codes.size else np.zeros(n_docs, np.int64)
        out_doc = [pa.array(ids)]
        out_start = [pa.array(n_tok)]
        out_gram = [pa.array([_TOTAL_SENTINEL] * n_docs, pa.string())]
        if L >= w:
            nwin = L - w + 1
            gram = pc.binary_join_element_wise(
                *(flat.slice(j, nwin) for j in range(w)), " ")
            valid = tok_doc[:nwin] == tok_doc[w - 1:]
            first = np.searchsorted(tok_doc, np.arange(n_docs))
            gi = np.flatnonzero(valid)
            doc = tok_doc[gi]
            start = gi - first[doc] + 1
            out_doc.append(pa.array(ids[doc]))
            out_start.append(pa.array(start.astype(np.int64)))
            out_gram.append(gram.filter(pa.array(valid)))
        gram_all = pa.concat_arrays(
            [g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
             for g in out_gram])
        b = np.fromiter((zlib.crc32(v.encode()) % n_buckets
                         for v in gram_all.to_pylist()),
                        np.int32, count=len(gram_all))
        return pa.table({id_column: pa.concat_arrays(out_doc),
                         "start": pa.concat_arrays(out_start),
                         "gram": gram_all,
                         "bucket": pa.array(b)})

    def pick_dups(df: pd.DataFrame) -> pd.DataFrame:
        sent = df["gram"] == _TOTAL_SENTINEL
        tot = df[sent]
        rest = df[~sent]
        n = rest.groupby("gram", sort=False)["gram"].transform("size")
        dup = rest[n >= 2]
        out = pd.concat([
            pd.DataFrame({id_column: dup[id_column], "pos": dup["start"],
                          "kind": np.int8(0)}),
            pd.DataFrame({id_column: tot[id_column], "pos": tot["start"],
                          "kind": np.int8(1)})])
        out["dbucket"] = (out[id_column] % n_buckets).astype(np.int32)
        return out

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        tot = df[df["kind"] == 1].set_index(id_column)["pos"].sort_index()
        d0 = df[df["kind"] == 0].sort_values([id_column, "pos"],
                                             kind="stable")
        docs = tot.index.to_numpy(np.int64)
        nt = tot.to_numpy(np.int64)
        ndw = np.zeros(len(docs), np.int64)
        mass = np.zeros(len(docs), np.int64)
        if len(d0):
            s = d0["pos"].to_numpy(np.int64)
            e = s + w - 1
            # merged-interval coverage: running cummax of end within doc
            prev = d0.groupby(id_column, sort=False)["pos"].transform(
                lambda x: pd.Series(np.maximum.accumulate(
                    x.to_numpy(np.int64) + w - 1), index=x.index)
                .shift(1, fill_value=0)).to_numpy(np.int64)
            contrib = np.maximum(e - np.maximum(s - 1, prev), 0)
            agg = pd.DataFrame({id_column: d0[id_column].to_numpy(np.int64),
                                "c": contrib}) \
                .groupby(id_column, sort=False)["c"].agg(["sum", "size"])
            pos_in = np.searchsorted(docs, agg.index.to_numpy(np.int64))
            mass[pos_in] = agg["sum"].to_numpy(np.int64)
            ndw[pos_in] = agg["size"].to_numpy(np.int64)
        return pd.DataFrame({id_column: docs,
                             "n_windows": np.maximum(nt - w + 1, 0),
                             "n_dup_windows": ndw,
                             "dup_pos_mass": mass})

    rows = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
    flagged = rows.groupby("bucket").map_groups(pick_dups,
                                                batch_format="pandas")
    return flagged.groupby("dbucket").map_groups(per_doc,
                                                 batch_format="pandas")


def dup_span_stats_sql(w: int = 5, table: str = "documents",
                       column: str = "text", id_column: str = "doc_id",
                       synth: bool = True) -> str:
    """DuckDB twin: same tokenizer, lead()-built grams, global count >=
    2, COUNT(DISTINCT pos) over unnested ranges == the merged-interval
    coverage."""
    src = synth_multiline_sql_expr(column, id_column) if synth else column
    leads = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {j}) OVER wd" for j in range(1, w)])
    return (
        f"WITH src AS (SELECT {id_column} AS doc_id, {src} AS text "
        f"FROM {table}), "
        # row_number over kept (non-empty) tokens — DuckDB trim()
        # strips spaces only, so a trailing newline leaves an empty
        # token; Ray's position is among KEPT tokens in original order
        "t AS (SELECT doc_id, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY idx) AS idx, tok FROM "
        "(SELECT doc_id, unnest(range(1, len(arr) + 1)) AS idx, "
        "unnest(arr) AS tok FROM (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS arr FROM src)) "
        "WHERE tok <> ''), "
        f"g0 AS (SELECT doc_id, idx AS start, {leads} AS gram, "
        f"lead(tok, {w - 1}) OVER wd IS NOT NULL AS ok FROM t "
        "WINDOW wd AS (PARTITION BY doc_id ORDER BY idx)), "
        "g AS (SELECT doc_id, start, gram FROM g0 WHERE ok), "
        "cnts AS (SELECT gram, COUNT(*) AS n FROM g GROUP BY 1), "
        "dw AS (SELECT doc_id, start FROM g JOIN cnts USING (gram) "
        "WHERE n >= 2), "
        "cov AS (SELECT doc_id, CAST(COUNT(DISTINCT pos) AS BIGINT) AS m "
        f"FROM (SELECT doc_id, unnest(range(start, start + {w})) AS pos "
        "FROM dw) GROUP BY 1), "
        "ndwt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ndw "
        "FROM dw GROUP BY 1), "
        "tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM t "
        "GROUP BY 1) "
        f"SELECT s.doc_id, "
        f"CAST(greatest(COALESCE(tot.nt, 0) - {w} + 1, 0) AS BIGINT) "
        "AS n_windows, "
        "CAST(COALESCE(ndwt.ndw, 0) AS BIGINT) AS n_dup_windows, "
        "CAST(COALESCE(cov.m, 0) AS BIGINT) AS dup_pos_mass "
        "FROM src s LEFT JOIN tot ON tot.doc_id = s.doc_id "
        "LEFT JOIN ndwt ON ndwt.doc_id = s.doc_id "
        "LEFT JOIN cov ON cov.doc_id = s.doc_id"
    )


# ---------------------------------------------------------------------------
# composed C4 pipeline: line rules, then global span dedup
# ---------------------------------------------------------------------------


def c4_pipeline(ds, min_words: int = 5, min_kept: int = 2,
                blocklist: tuple = BLOCKLIST, column: str = "text",
                id_column: str = "doc_id"):
    """C4's cleaning order end-to-end: line heuristics (clean_lines)
    THEN corpus-global duplicate-line removal over the surviving text →
    Dataset (doc_id, n_kept, clean_text). One streaming composition —
    the cleaned corpus flows straight into the dedup shuffles, nothing
    materializes in between."""
    cleaned = clean_lines(ds, min_words=min_words, min_kept=min_kept,
                          blocklist=blocklist, column=column,
                          id_column=id_column)
    return dedup_lines(cleaned.select_columns([id_column, "clean_text"]),
                       column="clean_text", id_column=id_column)


def c4_pipeline_sql(min_words: int = 5, min_kept: int = 2,
                    blocklist: tuple = BLOCKLIST, table: str = "documents",
                    column: str = "text", id_column: str = "doc_id",
                    synth: bool = True) -> str:
    """DuckDB twin: the clean_lines twin as a CTE feeding the
    dedup_lines twin (exact composition of two exact twins)."""
    inner = clean_lines_sql(min_words=min_words, min_kept=min_kept,
                            blocklist=blocklist, table=table,
                            column=column, id_column=id_column,
                            synth=synth)
    outer = dedup_lines_sql(table="cleaned", column="clean_text",
                            id_column="doc_id", synth=False)
    assert outer.startswith("WITH ")
    return f"WITH cleaned AS ({inner}), {outer[len('WITH '):]}"


# ---------------------------------------------------------------------------
# URL canonicalization dedup
# ---------------------------------------------------------------------------

_CANON_HEAD = r"^([^/]*//[^/?#]*)"


def canonicalize_urls(ds, url_column: str = "url",
                      id_column: str = "doc_id"):
    """→ Dataset (doc_id, canon_url): lowercase scheme+host, strip
    query/fragment, strip one trailing slash. RE2 in both engines."""

    def fn(t: pa.Table) -> pa.Table:
        urls = _arr(t.column(url_column))
        stripped = pc.replace_substring_regex(urls, r"[?#].*$", "")
        # head = scheme://host (up to the first path slash); rest = path
        m = pc.extract_regex(stripped,
                             r"(?P<head>^[^/]*//[^/]*)(?P<rest>.*)")
        head = pc.utf8_lower(pc.struct_field(m, "head"))
        rest = pc.replace_substring_regex(
            pc.struct_field(m, "rest"), r"/$", "")
        canon = pc.binary_join_element_wise(head, rest, "")
        return pa.table({id_column: t.column(id_column), "canon_url": canon})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def canonical_url_dedup(ds, url_column: str = "url",
                        id_column: str = "doc_id", n_buckets: int = 64):
    """Keep the first (min doc_id) document per canonical URL →
    Dataset (canon_url, keep_id, n_dups). dedup_exact shape: per-batch
    partial (canon, min_id, cnt) → ONE crc32(canon)-bucketed shuffle →
    in-bucket merge. Only the triple shuffles, never document text."""
    import zlib

    canon = canonicalize_urls(ds, url_column=url_column,
                              id_column=id_column)

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        urls = _arr(t.column("canon_url"))
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pc.dictionary_encode(urls)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(d.dictionary)
        min_id = np.full(nv, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(min_id, codes, ids)
        cnt = np.bincount(codes, minlength=nv).astype(np.int64)
        b = np.fromiter((zlib.crc32(u.encode()) % n_buckets
                         for u in d.dictionary.to_pylist()),
                        np.int32, count=nv)
        return pa.table({"canon_url": d.dictionary,
                         "keep_id": pa.array(min_id),
                         "n_dups": pa.array(cnt),
                         "bucket": pa.array(b)})

    def merge(df):
        out = df.groupby("canon_url", sort=False).agg(
            keep_id=("keep_id", "min"), n_dups=("n_dups", "sum"))
        return out.reset_index()[["canon_url", "keep_id", "n_dups"]]

    return (canon.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("bucket").map_groups(merge, batch_format="pandas"))


def canonical_url_dedup_sql(table: str = "documents",
                            id_column: str = "doc_id",
                            synth: bool = True,
                            url_expr: str | None = None) -> str:
    """DuckDB twin: same synthesis, same canonicalization regexes,
    min/count per canonical URL."""
    src = url_expr or (synth_url_variants_sql_expr(id_column) if synth
                       else "url")
    return (
        f"WITH u AS (SELECT {id_column} AS doc_id, {src} AS url "
        f"FROM {table}), "
        "c AS (SELECT doc_id, lower(regexp_extract(s, '^[^/]*//[^/]*')) || "
        "regexp_replace(regexp_extract(s, '^[^/]*//[^/]*(.*)$', 1), "
        "'/$', '') AS canon_url FROM "
        "(SELECT doc_id, regexp_replace(url, '[?#].*$', '') AS s FROM u)) "
        "SELECT canon_url, CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "CAST(count(*) AS BIGINT) AS n_dups FROM c GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (the WARC→WET step of crawl pipelines)
# ---------------------------------------------------------------------------

_SCRIPT_RE = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_TAG_RE = r"<[^>]*>"
_WS_RE = r"[ \t]+"
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def synth_html(ds, column: str = "text", id_column: str = "doc_id"):
    """HTML-wrapped corpus from the documents table: title from the
    first 40 chars, two paragraphs, a script block on every 4th doc and
    entity-escaped ampersands on every 6th. Reproduced verbatim by
    synth_html_sql_expr()."""

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column)
        txt = _arr(t.column(column))

        def mod(m):
            return pc.subtract(ids, pc.multiply(pc.divide(ids, m), m))

        body1 = pc.utf8_slice_codeunits(txt, 0, 90)
        body2 = pc.utf8_slice_codeunits(txt, 90, 220)
        script = pc.if_else(
            pc.equal(mod(4), 0),
            pa.scalar("<script>var x = 1 < 2;</script>"), pa.scalar(""))
        amp = pc.if_else(pc.equal(mod(6), 0),
                         pa.scalar("Q &amp; A &lt;beta&gt;"),
                         pa.scalar("plain tail"))
        out = pc.binary_join_element_wise(
            "<html><head><title>", pc.utf8_slice_codeunits(txt, 0, 40),
            "</title>", script, "</head><body><p class=\"a\">", body1,
            "</p>\n<p>", body2, "</p><div>", amp, "</div></body></html>",
            "")
        return pa.table({id_column: ids, "html": out})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


def synth_html_sql_expr(column: str = "text",
                        id_column: str = "doc_id") -> str:
    """SQL expression producing exactly synth_html()'s html."""
    return (
        f"('<html><head><title>' || substr({column}, 1, 40) || "
        f"'</title>' || (CASE WHEN {id_column} % 4 = 0 THEN "
        f"'<script>var x = 1 < 2;</script>' ELSE '' END) || "
        f"'</head><body><p class=\"a\">' || substr({column}, 1, 90) || "
        f"'</p>' || chr(10) || '<p>' || substr({column}, 91, 130) || "
        f"'</p><div>' || (CASE WHEN {id_column} % 6 = 0 THEN "
        f"'Q &amp; A &lt;beta&gt;' ELSE 'plain tail' END) || "
        f"'</div></body></html>')"
    )


def strip_html(ds, html_column: str = "html", id_column: str = "doc_id"):
    """WET-style text extraction → Dataset (doc_id, text, n_tags):
    script/style blocks removed WITH their content, all other tags
    removed, the five standard entities decoded (&amp; LAST so
    double-escapes don't re-expand), horizontal whitespace collapsed
    and edges trimmed. One vectorized RE2 scan (Arrow and DuckDB embed
    the same RE2 → byte-identical output), no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        h = _arr(t.column(html_column))
        n_tags = pc.count_substring_regex(h, _TAG_RE)
        s = pc.replace_substring_regex(h, _SCRIPT_RE, "")
        s = pc.replace_substring_regex(s, _TAG_RE, " ")
        for ent, rep in _ENTITIES:
            s = pc.replace_substring(s, ent, rep)
        s = pc.replace_substring_regex(s, _WS_RE, " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({id_column: t.column(id_column),
                         "text": s,
                         "n_tags": pc.cast(n_tags, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def strip_html_sql(table: str = "documents", column: str = "text",
                   id_column: str = "doc_id", synth: bool = True,
                   html_expr: str | None = None) -> str:
    """DuckDB twin: same RE2 patterns in the same order."""
    src = html_expr or (synth_html_sql_expr(column, id_column) if synth
                        else column)
    ents = ""
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        ents = (f"replace({ents or 's2'}, '{ent}', '{rep_sql}')")
    return (
        f"WITH h AS (SELECT {id_column} AS doc_id, {src} AS html "
        f"FROM {table}), "
        "t1 AS (SELECT doc_id, "
        f"CAST(length(regexp_extract_all(html, '{_TAG_RE}')) AS BIGINT) "
        "AS n_tags, "
        f"regexp_replace(regexp_replace(html, '{_SCRIPT_RE}', '', 'g'), "
        f"'{_TAG_RE}', ' ', 'g') AS s2 FROM h) "
        f"SELECT doc_id, trim(regexp_replace({ents}, '{_WS_RE}', ' ', "
        "'g')) AS text, n_tags FROM t1"
    )


def dedup_spans(ds, token_ds, w: int = 5, column: str = "text",
                id_column: str = "doc_id", n_buckets: int = 64):
    """The ACTUAL substring-dedup transform (dup_span_stats reports the
    signals; this performs the cut): every duplicated w-token window
    keeps only its GLOBALLY FIRST occurrence (min (doc_id, start));
    every other occurrence's token span is removed from its document →
    Dataset (doc_id, n_tokens, n_kept, clean_text) for ALL docs, with
    clean_text = surviving tokens in order joined by single spaces
    (token-level reconstruction — original whitespace is not preserved,
    identically in both engines).

    ``ds`` and ``token_ds`` must be independently constructed readers
    of the same corpus (the lineage invariant): windows explode from
    one, token rows from the other. Three bounded shuffles total —
    gram-bucket (global first-occurrence is a local decision),
    then marked spans + token rows meet in a doc-bucket union shuffle
    where merged-interval coverage masks the cut (vectorized composite-
    key searchsorted, no Python loop over tokens).
    """
    import zlib

    import pandas as pd

    from .lm import _split_codes

    BIG = np.int64(1) << 32

    def explode_windows(t: pa.Table) -> pa.Table:
        tune_allocator()
        codes, tok_doc, vocab, n_docs = _split_codes(t, column)
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = vocab.take(pa.array(codes)) if codes.size else \
            pa.array([], pa.string())
        L = len(flat)
        if L < w:
            return pa.table({id_column: pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        nwin = L - w + 1
        gram = pc.binary_join_element_wise(
            *(flat.slice(j, nwin) for j in range(w)), " ")
        valid = tok_doc[:nwin] == tok_doc[w - 1:]
        first = np.searchsorted(tok_doc, np.arange(n_docs))
        gi = np.flatnonzero(valid)
        doc = tok_doc[gi]
        start = gi - first[doc] + 1
        gram_v = gram.filter(pa.array(valid))
        if isinstance(gram_v, pa.ChunkedArray):
            gram_v = gram_v.combine_chunks()
        b = np.fromiter((zlib.crc32(v.encode()) % n_buckets
                         for v in gram_v.to_pylist()),
                        np.int32, count=len(gram_v))
        return pa.table({id_column: pa.array(ids[doc]),
                         "start": pa.array(start.astype(np.int64)),
                         "gram": gram_v,
                         "bucket": pa.array(b)})

    def mark_later(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby("gram", sort=False)["gram"].transform("size")
        d = df[n >= 2].sort_values(["gram", id_column, "start"],
                                   kind="stable")
        marked = d[d.duplicated("gram", keep="first")]
        out = pd.DataFrame({id_column: marked[id_column],
                            "a": marked["start"],
                            "b": "",
                            "kind": np.int8(0)})
        out["dbucket"] = (out[id_column] % n_buckets).astype(np.int32)
        return out

    def explode_tokens(t: pa.Table) -> pa.Table:
        tune_allocator()
        codes, tok_doc, vocab, n_docs = _split_codes(t, column)
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        first = np.searchsorted(tok_doc, np.arange(n_docs))
        idx = np.arange(len(codes), dtype=np.int64) - first[tok_doc] + 1
        toks = vocab.take(pa.array(codes)) if codes.size else \
            pa.array([], pa.string())
        # one sentinel row per doc (kind=1, a=0) keeps empty docs present
        out_doc = np.concatenate([ids[tok_doc], ids])
        out_a = np.concatenate([idx, np.zeros(n_docs, np.int64)])
        out_b = pa.concat_arrays([
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
            else toks,
            pa.array([""] * n_docs, pa.string())])
        return pa.table({id_column: pa.array(out_doc),
                         "a": pa.array(out_a),
                         "b": out_b,
                         "kind": pa.array(
                             np.ones(len(out_doc), np.int8)),
                         "dbucket": pa.array(
                             (out_doc % n_buckets).astype(np.int32))})

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[(df["kind"] == 1) & (df["a"] > 0)] \
            .sort_values([id_column, "a"], kind="stable")
        docs = np.unique(df[df["kind"] == 1][id_column].to_numpy(np.int64))
        marked = df[df["kind"] == 0].sort_values([id_column, "a"],
                                                 kind="stable")
        td = toks[id_column].to_numpy(np.int64)
        ti = toks["a"].to_numpy(np.int64)
        covered = np.zeros(len(toks), bool)
        if len(marked):
            md = marked[id_column].to_numpy(np.int64)
            ms = marked["a"].to_numpy(np.int64)
            me = ms + w - 1
            # merge intervals per doc (cummax sweep)
            prev_e = pd.Series(me).groupby(md).transform(
                lambda x: x.cummax().shift(1, fill_value=-1)) \
                .to_numpy(np.int64)
            is_new = ms > prev_e
            iid = np.cumsum(is_new) - 1
            istart = ms[is_new]
            iend = np.maximum.reduceat(me, np.flatnonzero(is_new))
            idoc = md[is_new]
            # composite-key coverage probe
            kstart = idoc * BIG + istart
            kend = idoc * BIG + iend
            kt = td * BIG + ti
            pos = np.searchsorted(kstart, kt, side="right") - 1
            ok = pos >= 0
            covered[ok] = kt[ok] <= kend[pos[ok]]
        kept = toks[~covered]
        agg = kept.groupby(id_column, sort=True)["b"].agg(
            n_kept="size", clean_text=lambda s: " ".join(s))
        nt = toks.groupby(id_column, sort=True)["a"].size()
        out = pd.DataFrame({id_column: docs}).set_index(id_column)
        out["n_tokens"] = nt.reindex(out.index).fillna(0).astype(np.int64)
        out["n_kept"] = agg["n_kept"].reindex(out.index).fillna(0) \
            .astype(np.int64)
        out["clean_text"] = agg["clean_text"].reindex(out.index) \
            .fillna("")
        return out.reset_index()

    windows = ds.map_batches(explode_windows, batch_format="pyarrow",
                             batch_size=None)
    marked = windows.groupby("bucket").map_groups(
        mark_later, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")
    tokens = token_ds.map_batches(explode_tokens, batch_format="pyarrow",
                                  batch_size=None)
    return marked.union(tokens).groupby("dbucket").map_groups(
        rebuild, batch_format="pandas")


def dedup_spans_sql(w: int = 5, table: str = "documents",
                    column: str = "text", id_column: str = "doc_id",
                    synth: bool = True) -> str:
    """DuckDB twin: same tokenizer (row_number over kept tokens), same
    lead()-grams, row_number-per-gram first-occurrence rule, DISTINCT
    coverage positions, string_agg rebuild."""
    src = synth_multiline_sql_expr(column, id_column) if synth else column
    leads = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {j}) OVER wd" for j in range(1, w)])
    return (
        f"WITH src AS (SELECT {id_column} AS doc_id, {src} AS text "
        f"FROM {table}), "
        "t AS (SELECT doc_id, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY idx) AS idx, tok FROM "
        "(SELECT doc_id, unnest(range(1, len(arr) + 1)) AS idx, "
        "unnest(arr) AS tok FROM (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS arr FROM src)) "
        "WHERE tok <> ''), "
        f"g0 AS (SELECT doc_id, idx AS start, {leads} AS gram, "
        f"lead(tok, {w - 1}) OVER wd IS NOT NULL AS ok FROM t "
        "WINDOW wd AS (PARTITION BY doc_id ORDER BY idx)), "
        "g AS (SELECT doc_id, start, gram FROM g0 WHERE ok), "
        "cnts AS (SELECT gram, COUNT(*) AS n FROM g GROUP BY 1), "
        "occ AS (SELECT doc_id, start, row_number() OVER "
        "(PARTITION BY gram ORDER BY doc_id, start) AS rn "
        "FROM g JOIN cnts USING (gram) WHERE n >= 2), "
        "cov AS (SELECT DISTINCT doc_id, pos FROM (SELECT doc_id, "
        f"unnest(range(start, start + {w})) AS pos FROM occ "
        "WHERE rn > 1)), "
        "kept AS (SELECT t.doc_id, t.idx, t.tok FROM t LEFT JOIN cov "
        "ON cov.doc_id = t.doc_id AND cov.pos = t.idx "
        "WHERE cov.pos IS NULL), "
        "ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept, "
        "string_agg(tok, ' ' ORDER BY idx) AS clean_text "
        "FROM kept GROUP BY 1), "
        "ta AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens "
        "FROM t GROUP BY 1) "
        "SELECT s.doc_id, COALESCE(ta.n_tokens, 0) AS n_tokens, "
        "COALESCE(ka.n_kept, 0) AS n_kept, "
        "COALESCE(ka.clean_text, '') AS clean_text "
        "FROM src s LEFT JOIN ta ON ta.doc_id = s.doc_id "
        "LEFT JOIN ka ON ka.doc_id = s.doc_id"
    )


# ---------------------------------------------------------------------------
# encoding repair (ftfy-style mojibake fix)
# ---------------------------------------------------------------------------

# lead bytes of a latin-1-misdecoded UTF-8 stream (U+00C2-U+00F4)
# followed by a continuation-range char (U+0080-U+00BF)
_MOJIBAKE_HINT_RE = "[\u00c2-\u00f4][\u0080-\u00bf]"


def fix_mojibake(ds, column: str = "text", id_column: str = "doc_id",
                 max_rounds: int = 2):
    """Repair UTF-8-decoded-as-Latin-1 mojibake (the classic crawl
    corruption: 'caf\u00c3\u00a9' for 'caf\u00e9') -> Dataset
    (doc_id, text, fixed_rounds). A row is re-decoded via
    ``s.encode('latin-1').decode('utf-8')`` only when (a) a vectorized
    RE2 pre-filter sees a mojibake byte pattern, (b) latin-1 encoding
    round-trips, and (c) the UTF-8 decode succeeds -- so clean text
    that is not valid double-encoded UTF-8 is NEVER altered. Up to
    ``max_rounds`` unwinds double corruption. The pre-filter keeps the
    per-row Python to flagged rows only; byte-level recode is not
    SQL-expressible (pytest-gated, the compression_stats precedent)."""

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        txt = _arr(t.column(column))
        suspect = pc.match_substring_regex(txt, _MOJIBAKE_HINT_RE) \
            .to_numpy(zero_copy_only=False)
        vals = txt.to_pylist()
        rounds = np.zeros(len(vals), np.int64)
        for i in np.flatnonzero(np.asarray(suspect, bool)):
            s = vals[i]
            for _ in range(max_rounds):
                try:
                    b = s.encode("latin-1")
                except UnicodeEncodeError:
                    break
                try:
                    s2 = b.decode("utf-8")
                except UnicodeDecodeError:
                    break
                if s2 == s:
                    break
                s = s2
                rounds[i] += 1
            vals[i] = s
        return pa.table({id_column: t.column(id_column),
                         "text": pa.array(vals, pa.string()),
                         "fixed_rounds": pa.array(rounds)})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# per-host boilerplate stripping (the WARC→WET template-removal step)
# ---------------------------------------------------------------------------


def synth_hosted_docs(ds, n_hosts: int = 23, column: str = "text",
                      id_column: str = "doc_id"):
    """Multihost corpus with PLANTED boilerplate: host = doc_id %
    n_hosts; line 1 is the host's copyright header (df ≈ docs/host —
    boilerplate), line 2 a unique sentence, line 3 a host newsletter
    footer on even ids (df ≈ docs/host/2) else a unique tail. Reproduced
    verbatim by synth_hosted_docs_sql_expr()."""

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column)
        txt = _arr(t.column(column))
        h = pc.subtract(ids, pc.multiply(pc.divide(ids, n_hosts), n_hosts))
        hs = pc.cast(h, pa.string())
        l1 = pc.binary_join_element_wise(
            pa.scalar("(c) host"), hs, " all rights reserved", "")
        l2 = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(txt, 0, 90), ".", "")
        m2 = pc.subtract(ids, pc.multiply(pc.divide(ids, 2), 2))
        l3 = pc.if_else(
            pc.equal(m2, 0),
            pc.binary_join_element_wise(
                pa.scalar("subscribe to host"), hs, " news", ""),
            pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(txt, 90, 180), "!", ""))
        out = pc.binary_join_element_wise(l1, l2, l3, "\n")
        return pa.table({id_column: ids, "host": pc.cast(h, pa.int64()),
                         column: out})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


def synth_hosted_docs_sql_expr(n_hosts: int = 23, column: str = "text",
                               id_column: str = "doc_id"):
    """(host_expr, text_expr) reproducing synth_hosted_docs()."""
    h = f"({id_column} % {n_hosts})"
    text = (
        f"('(c) host' || {h} || ' all rights reserved' || chr(10) || "
        f"substr({column}, 1, 90) || '.' || chr(10) || "
        f"CASE WHEN {id_column} % 2 = 0 "
        f"THEN 'subscribe to host' || {h} || ' news' "
        f"ELSE substr({column}, 91, 90) || '!' END)")
    return h, text


def strip_boilerplate(ds, min_df: int = 3, column: str = "text",
                      id_column: str = "doc_id", host_column: str = "host",
                      n_buckets: int = 64):
    """Template/boilerplate removal (the WARC→WET cleanup CCNet and
    RefinedWeb apply before dedup): a line appearing on ``min_df`` or
    more of a HOST's pages is site furniture (nav, copyright, cookie
    banners) and is removed from EVERY page of that host → Dataset
    (doc_id, n_kept, clean_text) for docs with ≥ 1 surviving line.

    The dedup_lines skeleton with a per-(host, line) document-frequency
    rule instead of keep-first: explode lines → crc32(host·line)-bucket
    shuffle (every copy of a host's line lands in one bucket, so its df
    is a LOCAL decision; distinct docs, not occurrences, drive df) →
    surviving occurrences re-join per doc in a doc-bucket shuffle.
    Cross-host identical lines are independent — a line can be
    boilerplate on one host and content on another."""
    import zlib

    import pandas as pd

    def explode(t: pa.Table) -> pa.Table:
        tune_allocator()
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hosts = t.column(host_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = _arr(t.column(column))
        lines = pc.split_pattern(txt, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.values
        offs = np.asarray(lines.offsets, dtype=np.int64)
        nl = offs[1:] - offs[:-1]
        doc = np.repeat(ids, nl)
        host = np.repeat(hosts, nl)
        idx = np.concatenate([np.arange(1, n + 1) for n in nl]) \
            if len(nl) else np.empty(0, np.int64)
        fl = flat.to_pylist()
        b = np.fromiter(
            (zlib.crc32(f"{h}\x01{v}".encode()) % n_buckets
             for h, v in zip(host, fl)), np.int32, count=len(fl))
        return pa.table({id_column: pa.array(doc),
                         "host": pa.array(host),
                         "idx": pa.array(idx.astype(np.int64)),
                         "line": flat,
                         "bucket": pa.array(b)})

    def keep_rare(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # df = DISTINCT documents per (host, line) — a line repeated
        # inside one page is not site furniture
        key = df.groupby(["host", "line"], sort=False)[id_column]
        df["df"] = key.transform("nunique")
        w = df[df["df"] < min_df][[id_column, "idx", "line"]].copy()
        w["dbucket"] = (w[id_column] % n_buckets).astype(np.int32)
        return w

    def rejoin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_column, "idx"], kind="stable")
        out = df.groupby(id_column, sort=False).agg(
            n_kept=("line", "size"),
            clean_text=("line", lambda s: "\n".join(s)))
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out.reset_index()[[id_column, "n_kept", "clean_text"]]

    lines = ds.map_batches(explode, batch_format="pyarrow",
                           batch_size=None)
    kept = lines.groupby("bucket").map_groups(keep_rare,
                                              batch_format="pandas")
    return kept.groupby("dbucket").map_groups(rejoin,
                                              batch_format="pandas")


def strip_boilerplate_sql(table: str = "documents", min_df: int = 3,
                          column: str = "text",
                          id_column: str = "doc_id",
                          n_hosts: int = 23) -> str:
    """DuckDB twin over the synth_hosted_docs corpus: df = COUNT(DISTINCT
    doc) per (host, line) window, keep df < min_df, per-doc idx-ordered
    re-join."""
    h, text = synth_hosted_docs_sql_expr(n_hosts, column, id_column)
    return (
        f"WITH src AS (SELECT {id_column} AS doc_id, {h} AS host, "
        f"{text} AS text FROM {table}), "
        "l AS (SELECT doc_id, host, "
        "unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx, "
        "unnest(string_split(text, chr(10))) AS line FROM src), "
        "w AS (SELECT doc_id, idx, line, COUNT(DISTINCT doc_id) OVER "
        "(PARTITION BY host, line) AS df FROM l) "
        f"SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
        "string_agg(line, chr(10) ORDER BY idx) AS clean_text "
        f"FROM w WHERE df < {min_df} GROUP BY 1"
    )
