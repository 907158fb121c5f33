"""Crawl-management ops: CDX-style latest-capture selection and
RefinedWeb-style per-domain document caps.

Common Crawl's index (CDX) records many captures of the same URL across
crawls; corpus builds keep ONE snapshot per URL — normally the latest.
RefinedWeb (Penedo et al. 2023) additionally caps how many documents any
single registrable domain may contribute, so boilerplate-heavy hosts
don't dominate the corpus.

Both ops are the dedup_exact shape: a per-batch combiner bounds what
leaves each task (per-batch winners / per-batch top-N per domain — the
global answer is provably inside the union of per-batch partials), then
ONE crc32-bucketed shuffle resolves each key locally. Page text shuffles
only for per-batch winners (latest_snapshot) or never (domain_cap emits
(domain, doc_id) pairs).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vtzero_ray.runtime import tune_allocator

_DOMAIN_RE = r"^[a-z][a-z0-9+.\-]*://([^/]+)"

# Deterministic multi-capture corpus from documents (the synth_contacts
# precedent — the raw docs table has one row per URL, so the CDX shape
# must be synthesized; the SAME integer derivation runs in both engines):
# each doc gets k = doc_id % 3 + 1 captures rev r in [0, k); capture
# timestamps are a per-doc permutation (r + doc_id) % k of 0..k-1 seconds
# on top of doc_id*10, so WHICH rev is latest varies with doc_id.
SNAPS_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def synth_snapshots_batch(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id, text) → snapshot rows (url, warc_ts, text,
    doc_id, rev); mirrors snapshots_sql_cte exactly."""
    d = batch.column("doc_id").to_numpy()
    txt = batch.column("text").to_numpy(zero_copy_only=False)
    k = d % 3 + 1
    idx = np.repeat(np.arange(len(batch)), k)
    r = np.arange(idx.size) - np.repeat(np.cumsum(k) - k, k)
    di = d[idx]
    off = di * 10 + ((r + di) % k[idx])
    ts = SNAPS_EPOCH + (off * 1_000_000).astype("timedelta64[us]")
    url = np.char.add(
        np.char.add(np.char.add("https://site", (di % 1000).astype(str)),
                    ".example/p/"), di.astype(str))
    t2 = np.char.add(np.char.add(txt[idx].astype(str), " rev:"),
                     r.astype(str))
    return pa.table({"url": pa.array(url, pa.string()),
                     "warc_ts": pa.array(ts, pa.timestamp("us")),
                     "text": pa.array(t2, pa.string()),
                     "doc_id": pa.array(di, pa.int64()),
                     "rev": pa.array(r, pa.int64())})


def snapshots_sql_cte(url_expr: str, table: str = "documents") -> str:
    """DuckDB expression mirroring synth_snapshots_batch (pass the pages
    SQL_URL fragment as ``url_expr``)."""
    return (
        f"(SELECT {url_expr} AS url, TIMESTAMP '2024-01-01' + "
        "(d.doc_id * 10 + ((r.range + d.doc_id) % (d.doc_id % 3 + 1))) "
        "* INTERVAL 1 SECOND AS warc_ts, "
        "d.text || ' rev:' || r.range AS text, d.doc_id AS doc_id, "
        f"r.range AS rev FROM {table} d, range(3) r "
        "WHERE r.range < d.doc_id % 3 + 1)"
    )


def _dict_codes(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, pa.Array]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = (d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
             if len(arr) else np.empty(0, np.int64))
    return codes, d.dictionary


def _crc_bucket(strings: pa.Array, n_buckets: int) -> pa.Array:
    return pa.array(
        np.fromiter((zlib.crc32(s.encode()) % n_buckets
                     for s in strings.to_pylist()),
                    np.int32, count=len(strings)))


def latest_snapshot(ds, url_column: str = "url", ts_column: str = "warc_ts",
                    text_column: str = "text", n_buckets: int = 64):
    """Keep, per URL, the capture with the greatest (warc_ts, text) pair
    (text is the deterministic tiebreak for equal timestamps — both
    engines compare by codepoint). Returns (url, warc_ts, text).

    Per-batch winner pick → ONE crc32(url)-bucket shuffle of the winners
    → per-bucket final pick; the corpus itself never shuffles."""
    cols = [url_column, ts_column, text_column]

    def winners(batch: pa.Table) -> pa.Table:
        tune_allocator()
        if len(batch) == 0:
            return batch.select(cols)
        codes, _ = _dict_codes(batch.column(url_column))
        ts = batch.column(ts_column)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        ts_i = ts.cast(pa.int64()).to_numpy()
        txt = batch.column(text_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((txt, ts_i, codes))
        # last row of each url run = max (ts, text) for that url
        last = order[np.flatnonzero(
            np.diff(codes[order], append=codes[order[-1]] + 1) != 0)]
        return batch.select(cols).take(pa.array(np.sort(last)))

    def add_bucket(t: pa.Table) -> pa.Table:
        urls = t.column(url_column)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        return t.append_column("bucket", _crc_bucket(urls, n_buckets))

    def final(df):
        df = df.sort_values([url_column, ts_column, text_column],
                            kind="stable")
        return df.groupby(url_column, sort=False).tail(1)[cols]

    parts = ds.map_batches(winners, batch_format="pyarrow", batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(final, batch_format="pandas"))


def latest_snapshot_sql(snaps_cte: str, url_column: str = "url",
                        ts_column: str = "warc_ts",
                        text_column: str = "text") -> str:
    """DuckDB twin over a snapshots CTE/table expression."""
    return (
        f"SELECT {url_column}, {ts_column}, {text_column} FROM {snaps_cte} "
        f"QUALIFY row_number() OVER (PARTITION BY {url_column} "
        f"ORDER BY {ts_column} DESC, {text_column} DESC) = 1"
    )


def domain_cap(ds, max_per_domain: int, url_column: str = "url",
               id_column: str = "doc_id", n_buckets: int = 64):
    """Keep at most ``max_per_domain`` documents per URL host, preferring
    the smallest ids (deterministic; ids are crawl order). Returns the
    kept (domain, doc_id) pairs — output-sized; join back for payloads.

    Per-batch partial top-N per domain (global top-N ⊆ union of batch
    top-Ns) → ONE crc32(domain)-bucket shuffle → per-bucket final top-N.
    Rows whose URL has no scheme://host prefix are dropped (both engines).
    """
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    empty = pa.table({"domain": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64())})

    def _topn(dom_codes: np.ndarray, ids: np.ndarray) -> np.ndarray:
        order = np.lexsort((ids, dom_codes))
        dc = dom_codes[order]
        starts = np.flatnonzero(np.diff(dc, prepend=dc[0] - 1) != 0)
        rank = np.arange(len(order)) - np.repeat(
            starts, np.diff(starts, append=len(order)))
        return order[rank < max_per_domain]

    def partial(batch: pa.Table) -> pa.Table:
        tune_allocator()
        if len(batch) == 0:
            return empty
        ex = pc.extract_regex(batch.column(url_column),
                              _DOMAIN_RE.replace("([^/]+)", "(?P<d>[^/]+)"))
        dom = pc.struct_field(ex, "d")
        ids = batch.column(id_column).to_numpy()
        ok = pc.is_valid(dom).to_numpy(zero_copy_only=False)
        if not ok.any():
            return empty
        codes, vocab = _dict_codes(dom.drop_null())
        keep = _topn(codes, ids[ok])
        return pa.table({
            "domain": pa.DictionaryArray.from_arrays(
                pa.array(codes[keep], pa.int32()), vocab
            ).cast(pa.string()),
            "doc_id": pa.array(ids[ok][keep], pa.int64()),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        doms = t.column("domain")
        if isinstance(doms, pa.ChunkedArray):
            doms = doms.combine_chunks()
        return t.append_column("bucket", _crc_bucket(doms, n_buckets))

    def final(df):
        df = df.sort_values(["domain", "doc_id"], kind="stable")
        return df.groupby("domain", sort=False).head(max_per_domain)[
            ["domain", "doc_id"]]

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(final, batch_format="pandas"))


def domain_cap_sql(pages_cte: str, max_per_domain: int,
                   url_column: str = "url",
                   id_column: str = "doc_id") -> str:
    """DuckDB twin: same RE2 host extraction, same (domain, id) cap."""
    return (
        f"WITH dc AS (SELECT regexp_extract({url_column}, "
        f"'{_DOMAIN_RE}', 1) AS domain, {id_column} AS doc_id "
        f"FROM {pages_cte}) "
        "SELECT domain, doc_id FROM dc "
        "WHERE domain IS NOT NULL AND domain <> '' "
        "QUALIFY row_number() OVER (PARTITION BY domain "
        f"ORDER BY doc_id) <= {max_per_domain}"
    )
