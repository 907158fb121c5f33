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


# ---------------------------------------------------------------------------
# Outlink extraction (the crawl-graph builder: WARC/WET HTML -> edges)

_HREF_SPLIT = 'href="'
_HREF_RE = r'href="([^"]*)"'


def synth_linked_html(ds, id_column: str = "doc_id"):
    """Deterministic anchor-bearing HTML from documents: doc_id % 4
    outlinks per doc, targets hop hosts ((doc_id * 7 + j) % 1000) so the
    link graph isn't self-loops. Mirrored by linked_html_sql_expr."""

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy()
        k = ids % 4
        out = np.full(len(ids), "<html><body>", dtype=object)
        for j in range(3):
            tgt = (ids * 7 + j) % 1000
            txt = (ids * 3 + j) % 5  # varied anchor text a0..a4
            a = np.char.add(
                np.char.add('<a href="https://site', tgt.astype(str)),
                np.char.add(np.char.add(".example/p/", ids.astype(str)),
                            np.char.add(f'-{j}">a', np.char.add(
                                txt.astype(str), "</a>"))))
            out = np.where(k > j, np.char.add(out.astype(str), a), out)
        out = np.char.add(out.astype(str), "</body></html>")
        return pa.table({id_column: t.column(id_column),
                         "html": pa.array(out, pa.string())})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None)


def linked_html_sql_expr(id_column: str = "doc_id") -> str:
    """SQL expression producing exactly synth_linked_html()'s html."""
    anchors = "".join(
        f"|| (CASE WHEN {id_column} % 4 > {j} THEN "
        f"'<a href=\"https://site' || (({id_column} * 7 + {j}) % 1000) || "
        f"'.example/p/' || {id_column} || '-{j}\">a' || "
        f"(({id_column} * 3 + {j}) % 5) || '</a>' ELSE '' END) "
        for j in range(3))
    return f"('<html><body>' {anchors}|| '</body></html>')"


def extract_links(ds, html_column: str = "html", id_column: str = "doc_id"):
    """HTML -> (doc_id, link_idx, dst) outlink edges, the input to the
    crawl graph (functions/graph.pagerank consumes edge tables).

    Vectorized without a per-row regex loop: split on 'href="' (Arrow
    list kernels), drop each row's preamble element, keep only elements
    that still contain a closing quote (== the RE2 semantics of
    href="([^"]*)" — the [^"]* group cannot cross a quote), then cut at
    the first quote. ONE scan, no shuffle; output is edge-sized."""

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        h = t.column(html_column)
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        ids = t.column(id_column).to_numpy()
        parts = pc.split_pattern(h, _HREF_SPLIT)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts)
        n = len(flat)
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "link_idx": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.string())})
        row = np.repeat(np.arange(len(ids)), counts)
        starts = np.cumsum(counts) - counts
        pos = np.arange(n) - np.repeat(starts, counts)
        cand = pos > 0  # element 0 is the pre-href preamble
        closed = pc.greater(
            pc.count_substring(flat, '"'), 0).to_numpy(zero_copy_only=False)
        keep = cand & closed
        url = pc.list_element(
            pc.split_pattern(flat.filter(pa.array(keep)), '"',
                             max_splits=1), 0)
        kr = row[keep]
        # kept elements are already in (row, pos) order, so link_idx is
        # a grouped arange over the kr run starts
        runs = np.flatnonzero(np.diff(kr, prepend=kr[0] - 1) != 0) \
            if kr.size else np.empty(0, np.int64)
        link_idx = (np.arange(kr.size)
                    - np.repeat(runs, np.diff(runs, append=kr.size)))
        return pa.table({"doc_id": pa.array(ids[kr], pa.int64()),
                         "link_idx": pa.array(link_idx, pa.int64()),
                         "dst": url})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def extract_links_sql(html_expr: str, table: str = "documents",
                      id_column: str = "doc_id") -> str:
    """DuckDB twin: regexp_extract_all + unnest with subscripts."""
    return (
        f"WITH h AS (SELECT {id_column} AS doc_id, {html_expr} AS html "
        f"FROM {table}), "
        f"arr AS (SELECT doc_id, regexp_extract_all(html, '{_HREF_RE}', 1) "
        "AS a FROM h) "
        "SELECT doc_id, CAST(generate_subscripts(a, 1) - 1 AS BIGINT) "
        "AS link_idx, unnest(a) AS dst FROM arr"
    )


# ---------------------------------------------------------------------------
# Anchor-text extraction + per-target aggregation (anchor text is the
# classic query-like supervision signal for the TARGET page — the
# ORCAS / MS-MARCO anchor-corpus shape; at 100 TB the aggregate is the
# "anchor index" joined onto pages before training)

# Anchor text is restricted to [^"<]* ON PURPOSE: because neither the
# URL group nor the anchor group may contain '"', no match can span a
# later 'href="' occurrence, so the vectorized split-at-'href="'
# decomposition below finds EXACTLY the global RE2 non-overlapping
# matches (the extract_links argument, extended to two groups).
_ANCHOR_RE = r'href="([^"]*)">([^"<]*)</a>'
_ANCHOR_ELEM_RE = r'^(?P<u>[^"]*)">(?P<a>[^"<]*)</a>'


def extract_anchors(ds, html_column: str = "html",
                    id_column: str = "doc_id"):
    """HTML -> (doc_id, link_idx, dst, anchor) edges with anchor text.

    Same one-scan split decomposition as extract_links; each candidate
    element is tested with ONE anchored two-group extract_regex kernel
    (both engines run RE2, so the pattern semantics are identical)."""

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        h = t.column(html_column)
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        ids = t.column(id_column).to_numpy()
        parts = pc.split_pattern(h, _HREF_SPLIT)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "link_idx": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.string()),
                          "anchor": pa.array([], pa.string())})
        if len(flat) == 0:
            return empty
        row = np.repeat(np.arange(len(ids)), counts)
        starts = np.cumsum(counts) - counts
        pos = np.arange(len(flat)) - np.repeat(starts, counts)
        ex = pc.extract_regex(flat, _ANCHOR_ELEM_RE)
        ok = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        keep = (pos > 0) & ok
        if not keep.any():
            return empty
        hit = ex.filter(pa.array(keep))
        kr = row[keep]
        runs = np.flatnonzero(np.diff(kr, prepend=kr[0] - 1) != 0)
        link_idx = (np.arange(kr.size)
                    - np.repeat(runs, np.diff(runs, append=kr.size)))
        return pa.table({"doc_id": pa.array(ids[kr], pa.int64()),
                         "link_idx": pa.array(link_idx, pa.int64()),
                         "dst": pc.struct_field(hit, "u"),
                         "anchor": pc.struct_field(hit, "a")})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def anchor_topk(edges, k: int = 3, n_buckets: int = 64,
                dst_column: str = "dst", anchor_column: str = "anchor"):
    """Per-target-HOST top-k anchor texts by frequency -> Dataset
    (host, anchor, n), ties broken anchor-ascending.

    The ngram_topk shape: per-batch (host, anchor) partial counts via
    fused dictionary codes (anchor vocab is tiny vs edges) -> ONE
    crc32(host)-bucket shuffle of the partials -> per-bucket final sum
    + top-k (each host lives in exactly one bucket, so the global
    top-k is a local decision). Output is host-vocab-bounded."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    empty = pa.table({"host": pa.array([], pa.string()),
                      "anchor": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        if len(t) == 0:
            return empty
        dst = t.column(dst_column)
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        ex = pc.extract_regex(dst, _DOMAIN_RE.replace("([^/]+)",
                                                      "(?P<d>[^/]+)"))
        host = pc.struct_field(ex, "d")
        ok = pc.is_valid(host)
        if not pc.any(ok).as_py():
            return empty
        hcodes, hvocab = _dict_codes(host.drop_null())
        acodes, avocab = _dict_codes(
            t.column(anchor_column).filter(ok))
        fused = hcodes * len(avocab) + acodes
        uniq, cnt = np.unique(fused, return_counts=True)
        return pa.table({
            "host": pa.DictionaryArray.from_arrays(
                pa.array((uniq // len(avocab)).astype(np.int32)),
                hvocab).cast(pa.string()),
            "anchor": pa.DictionaryArray.from_arrays(
                pa.array((uniq % len(avocab)).astype(np.int32)),
                avocab).cast(pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        hosts = t.column("host")
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        return t.append_column("bucket", _crc_bucket(hosts, n_buckets))

    def final(df):
        agg = df.groupby(["host", "anchor"], sort=False)["n"] \
            .sum().reset_index()
        agg["n"] = agg["n"].astype(np.int64)
        agg = agg.sort_values(["host", "n", "anchor"],
                              ascending=[True, False, True],
                              kind="stable")
        return agg.groupby("host", sort=False).head(k)[
            ["host", "anchor", "n"]]

    parts = edges.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(final, batch_format="pandas"))


def anchor_topk_sql(html_expr: str, k: int = 3, table: str = "documents",
                    id_column: str = "doc_id") -> str:
    """DuckDB twin: lockstep unnest of both capture groups, same host
    RE2, COUNT cast to BIGINT, same (n DESC, anchor ASC) top-k."""
    return (
        f"WITH h AS (SELECT {id_column} AS doc_id, {html_expr} AS html "
        f"FROM {table}), "
        f"e AS (SELECT unnest(regexp_extract_all(html, '{_ANCHOR_RE}', 1)) "
        "AS dst, "
        f"unnest(regexp_extract_all(html, '{_ANCHOR_RE}', 2)) AS anchor "
        "FROM h), "
        f"he AS (SELECT regexp_extract(dst, '{_DOMAIN_RE}', 1) AS host, "
        "anchor FROM e), "
        "c AS (SELECT host, anchor, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM he WHERE host <> '' GROUP BY 1, 2) "
        "SELECT host, anchor, n FROM c "
        "QUALIFY row_number() OVER (PARTITION BY host "
        f"ORDER BY n DESC, anchor) <= {k}"
    )


# ---------------------------------------------------------------------------
# robots.txt disallow filtering (crawl politeness pass)

_HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/]+)"
_PATH_RE = r"^[a-z][a-z0-9+.\-]*://[^/]+(/.*)"


def synth_robots_rules(n_hosts: int = 37) -> list[tuple[str, str]]:
    """Deterministic disallow rules over the hostN.example synth host
    set: every 3rd host disallows /p/1*, every 5th also /p/2*."""
    rules = []
    for i in range(n_hosts):
        if i % 3 == 0:
            rules.append((f"host{i}.example", "/p/1"))
        if i % 5 == 0:
            rules.append((f"host{i}.example", "/p/2"))
    return rules


def robots_filter(ds, rules: list[tuple[str, str]],
                  url_column: str = "url", id_column: str = "doc_id"):
    """Drop pages whose URL path starts with a disallowed prefix for
    their host (the crawl politeness pass). Returns kept (doc_id, url).

    The rule list is the small broadcast side (robots tables are
    host-bounded): shipped once into the task closure, applied as one
    vectorized (host ==, starts_with) pass per rule — O(R) Arrow kernel
    sweeps, no shuffle, no per-row Python. Pages without a scheme://host
    prefix match no rule and are kept (both engines)."""
    rules = list(rules)

    def fn(t: pa.Table) -> pa.Table:
        tune_allocator()
        urls = t.column(url_column)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        host = pc.struct_field(
            pc.extract_regex(urls, _HOST_RE.replace("([^/]+)",
                                                    "(?P<h>[^/]+)")), "h")
        path = pc.struct_field(
            pc.extract_regex(urls, _PATH_RE.replace("(/.*)",
                                                    "(?P<p>/.*)")), "p")
        host = pc.fill_null(host, "")
        path = pc.fill_null(path, "")
        banned = np.zeros(len(t), dtype=bool)
        for rh, rp in rules:
            m = pc.and_(pc.equal(host, rh), pc.starts_with(path, pattern=rp))
            banned |= m.to_numpy(zero_copy_only=False)
        keep = pa.array(~banned)
        return pa.table({"doc_id": t.column(id_column).filter(keep),
                         "url": urls.filter(keep)})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def robots_filter_sql(pages_cte: str, rules: list[tuple[str, str]],
                      url_column: str = "url",
                      id_column: str = "doc_id") -> str:
    """DuckDB twin: same RE2 host/path extraction ('' on no match, like
    fill_null), NOT EXISTS anti-join against the same rule rows."""
    vals = ", ".join(f"('{h}', '{p}')" for h, p in rules)
    return (
        f"WITH pages AS (SELECT {id_column} AS doc_id, {url_column} AS url "
        f"FROM {pages_cte}), "
        f"rules(host, prefix) AS (VALUES {vals}), "
        "px AS (SELECT doc_id, url, "
        f"regexp_extract(url, '{_HOST_RE}', 1) AS host, "
        f"regexp_extract(url, '{_PATH_RE}', 1) AS path FROM pages) "
        "SELECT doc_id, url FROM px WHERE NOT EXISTS ("
        "SELECT 1 FROM rules r WHERE r.host = px.host "
        "AND starts_with(px.path, r.prefix))"
    )


# ---------------------------------------------------------------------------
# snapshot diff — the continuous-crawl delta between two corpus versions
# ---------------------------------------------------------------------------

STATUS_UNCHANGED, STATUS_CHANGED, STATUS_ADDED, STATUS_REMOVED = 0, 1, 2, 3


def snapshot_diff(ds_old, ds_new, id_column: str = "doc_id",
                  column: str = "text", n_buckets: int = 64):
    """Delta between two crawl snapshots → Dataset (doc_id, status):
    0 unchanged, 1 changed (same key, different content), 2 added
    (new only), 3 removed (old only).

    The continuous-crawl shape dedup_incremental's index serves from
    the membership side, answered here as a one-shot diff: per-batch
    (key, md5(content), side) partials — content itself NEVER shuffles,
    32 hex bytes per doc do — meet in ONE bucketed (doc_id % n_buckets)
    tagged-union shuffle where each key's verdict is a local decision.
    Duplicate keys within a side keep their lexicographically-least
    md5 (deterministic under any batching)."""
    import hashlib

    def partial(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column(id_column).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            txt = t.column(column).to_pylist()
            md5 = [hashlib.md5(v.encode()).hexdigest() for v in txt]
            return pa.table({
                "bucket": pa.array((ids % n_buckets).astype(np.int32)),
                "doc_id": pa.array(ids),
                "md5": pa.array(md5, pa.string()),
                "side": pa.array(np.full(len(ids), side, np.int8))})
        return fn

    import pandas as pd

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["doc_id", "side", "md5"], kind="stable") \
            .drop_duplicates(["doc_id", "side"])
        o = g[g["side"] == 0][["doc_id", "md5"]]
        n = g[g["side"] == 1][["doc_id", "md5"]]
        m = o.merge(n, on="doc_id", how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "left_only", STATUS_REMOVED,
            np.where(m["_merge"] == "right_only", STATUS_ADDED,
                     np.where(m["md5_o"] == m["md5_n"],
                              STATUS_UNCHANGED, STATUS_CHANGED))) \
            .astype(np.int64)
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(np.int64),
                             "status": status})

    both = ds_old.map_batches(partial(0), batch_format="pyarrow",
                              batch_size=None) \
        .union(ds_new.map_batches(partial(1), batch_format="pyarrow",
                                  batch_size=None))
    return both.groupby("bucket").map_groups(verdict,
                                             batch_format="pandas")


def synth_snapshot_sides(ds_factory):
    """Deterministic two-version corpus from documents: version 1 drops
    doc_id % 7 == 1, version 2 drops doc_id % 7 == 2 and rewrites the
    text of doc_id % 5 == 0 — so all four statuses occur. Returns
    (ds_old, ds_new) from INDEPENDENT readers (the lineage
    invariant)."""

    def old_side(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(ids % 7 != 1))

    def new_side(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        t = t.filter(pa.array(ids % 7 != 2))
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text")
        import pyarrow.compute as pc
        changed = pc.binary_join_element_wise(
            txt, pa.array([" v2"] * len(t), pa.string()), "")
        out = np.where(ids % 5 == 0,
                       changed.to_numpy(zero_copy_only=False),
                       txt.to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    return (ds_factory().map_batches(old_side, batch_format="pyarrow",
                                     batch_size=None),
            ds_factory().map_batches(new_side, batch_format="pyarrow",
                                     batch_size=None))


def snapshot_diff_sql(table: str = "documents") -> str:
    """DuckDB twin of snapshot_diff over synth_snapshot_sides: FULL
    OUTER JOIN on the key, md5 comparison (identical digests both
    engines), the same status codes."""
    return (
        f"WITH o AS (SELECT doc_id, md5(text) AS m FROM {table} "
        "WHERE doc_id % 7 <> 1), "
        "nn AS (SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 "
        f"THEN text || ' v2' ELSE text END) AS m FROM {table} "
        "WHERE doc_id % 7 <> 2) "
        "SELECT COALESCE(o.doc_id, nn.doc_id) AS doc_id, "
        "CAST(CASE WHEN nn.doc_id IS NULL THEN 3 "
        "WHEN o.doc_id IS NULL THEN 2 "
        "WHEN o.m = nn.m THEN 0 ELSE 1 END AS BIGINT) AS status "
        "FROM o FULL OUTER JOIN nn ON nn.doc_id = o.doc_id"
    )
