"""Link-graph analysis — PageRank, the web-corpus quality signal
(Common-Crawl-style pipelines rank hosts/pages by link authority before
sampling). Expressed in the engine's distributed-join vocabulary.

Shape per power iteration (the honest 100-TB layout — ranks are
corpus-sized, so nothing broadcasts):
1. ranks ⋈ edges on src — ONE src-bucket shuffle (tagged-union groupby,
   the repo's bucketed-join pattern); each bucket computes its edges'
   contribution terms locally;
2. terms → dst-bucket shuffle → per-node integer sum (+ the base mass;
   zero-rows for every node ride the same union so rank-sink nodes
   keep rows).
Edges, degrees and the node list are materialized ONCE (bounded: E =
n_out * N) and re-read each iteration; each iteration's rank table is
materialized before feeding the next (breaking lineage chains — the
train_centroids precedent).

Float parity (the doc_perplexity contract): every per-edge contribution
is quantized to int64 BEFORE summation —
``tq = floor(0.85 * rq_u / deg_u + 0.5)`` with rq_u int64 — so per-node
reductions are order-free integer adds and DuckDB reproduces every
iteration bit-for-bit (all doubles derive from exact integers; the
damping literals are written ``0.85::DOUBLE`` in SQL because bare
decimal literals are DECIMAL, not DOUBLE, in DuckDB).

The synthesized deterministic link graph (``n_out`` out-links per doc,
``dst = (src^2 * 7 + j * 13) % N`` — quadratic so in-degree is genuinely
skewed into hubs and rank-sinks; per-src duplicates collapsed locally)
follows the synth-corpus precedent: a real link column plugs into
``pagerank`` unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()

QUANT = 1_000_000_000.0


def synth_edges(ds, n_nodes: int, n_out: int = 3):
    """documents → Dataset (src, dst, deg): n_out candidate out-links
    per doc, per-src duplicates collapsed INSIDE the batch (dedup and
    out-degree are per-src facts, so no shuffle)."""

    def gen(t: pa.Table) -> pa.Table:
        src = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        j = np.arange(1, n_out + 1, dtype=np.int64)
        # quadratic in src: a linear formula is a permutation mod N
        # (uniform in-degree -> uniform, useless ranks); squares mod N
        # are skewed, giving real hubs and rank-sink nodes
        dst = (src[:, None] * src[:, None] * 7
               + j[None, :] * 13) % n_nodes
        # per-row dedup: sort each row, drop equal neighbors
        dst = np.sort(dst, axis=1)
        keep = np.ones_like(dst, dtype=bool)
        keep[:, 1:] = dst[:, 1:] != dst[:, :-1]
        deg = keep.sum(axis=1).astype(np.int64)
        src_rep = np.repeat(src, deg)
        deg_rep = np.repeat(deg, deg)
        return pa.table({"src": pa.array(src_rep),
                         "dst": pa.array(dst[keep]),
                         "deg": pa.array(deg_rep)})

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


def synth_weighted_edges(ds, n_nodes: int, n_out: int = 3):
    """synth_edges + deterministic integer edge weights
    w = 1 + (src + dst) % 3 and per-src total out-weight wsum —
    computed in-batch (a src's edges are consecutive rows of its own
    batch, so reduceat segment sums need no shuffle). A real weight
    column (e.g. anchor multiplicity) plugs in unchanged — the
    synth-corpus precedent."""
    base = synth_edges(ds, n_nodes, n_out=n_out)

    def add_w(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dst = t.column("dst").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = 1 + (src + dst) % 3
        if src.size:
            starts = np.flatnonzero(np.diff(src, prepend=src[0] - 1) != 0)
            wsum = np.repeat(np.add.reduceat(w, starts),
                             np.diff(starts, append=src.size))
        else:
            wsum = np.empty(0, np.int64)
        return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                         "w": pa.array(w), "wsum": pa.array(wsum)})

    return base.map_batches(add_w, batch_format="pyarrow",
                            batch_size=None)


def pagerank_weighted_mod(ds, n_nodes: int, n_iters: int = 3,
                          damping: float = 0.85, n_out: int = 3):
    """Weighted-PageRank driver shape: rank mass splits w/wsum per
    edge instead of 1/deg. Dense path (contiguous doc_id universe)."""
    edges = synth_weighted_edges(ds, n_nodes, n_out=n_out)
    return pagerank_dense(edges, n_nodes, n_iters=n_iters,
                          damping=damping)


def pagerank_weighted_sql(n_iters: int = 3, damping: float = 0.85,
                          n_out: int = 3,
                          table: str = "documents") -> str:
    """DuckDB twin of pagerank_weighted_mod: same edges + weight
    formula, tq = floor(d * rq * w / wsum + 0.5) — the multiply
    order mirrors the NumPy expression exactly."""
    d = repr(damping)
    parts = [
        f"WITH n AS (SELECT COUNT(*) AS c FROM {table}), ",
        f"e0 AS (SELECT DISTINCT doc_id AS src, "
        f"(doc_id * doc_id * 7 + j.range * 13) % n.c AS dst "
        f"FROM {table}, n, range(1, {n_out + 1}) j), ",
        "e AS (SELECT src, dst, CAST(1 + (src + dst) % 3 AS BIGINT) "
        "AS w FROM e0), ",
        "ws AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wsum "
        "FROM e GROUP BY 1), ",
        "base AS (SELECT CAST(floor((1.0::DOUBLE - " + d + "::DOUBLE) * "
        "1000000000.0 / CAST(n.c AS DOUBLE) + 0.5) AS BIGINT) AS b, "
        "CAST(floor(1000000000.0 / CAST(n.c AS DOUBLE) + 0.5) AS BIGINT) "
        "AS r0 FROM n), ",
        f"r0 AS (SELECT doc_id AS v, base.r0 AS rq FROM {table}, base), ",
    ]
    for i in range(max(0, n_iters)):
        parts.append(
            f"t{i} AS (SELECT e.dst AS v, CAST(floor({d}::DOUBLE * "
            f"CAST(r{i}.rq AS DOUBLE) * CAST(e.w AS DOUBLE) / "
            "CAST(ws.wsum AS DOUBLE) + 0.5) "
            "AS BIGINT) AS tq FROM e JOIN ws USING (src) "
            f"JOIN r{i} ON r{i}.v = e.src), "
            f"r{i + 1} AS (SELECT d0.doc_id AS v, "
            f"base.b + COALESCE(s.sq, 0) AS rq FROM {table} d0 "
            "CROSS JOIN base LEFT JOIN (SELECT v, SUM(tq) AS sq "
            f"FROM t{i} GROUP BY 1) s ON s.v = d0.doc_id), ")
    body = "".join(parts).rstrip().rstrip(",")
    return (body + f" SELECT v, CAST(rq AS BIGINT) AS rank_q9 "
                   f"FROM r{max(0, n_iters)}")


def pagerank(ds_nodes, edges, n_iters: int = 3, damping: float = 0.85,
             n_buckets: int = 32):
    """Power-iteration PageRank → Dataset (v, rank_q9). ``ds_nodes`` is
    a Dataset with a ``doc_id`` column (one row per node); ``edges`` a
    Dataset (src, dst, deg). Both are materialized here and re-read per
    iteration. rank_q9 starts at floor(1e9/N + 0.5) and every
    iteration's update is base + integer sum of quantized edge terms."""
    nodes = ds_nodes.select_columns(["doc_id"]).materialize()
    edges = edges.materialize()
    # Over-blocked edge tables (e.g. a bucketed-groupby upstream emits
    # ~64 small blocks for a 1500-row graph) multiply EVERY iteration's
    # task count: re-blocking once here cut host_pagerank 9.3 s -> 2.9 s
    # at sf0.1. Only fires when blocks >> buckets, so a genuinely large
    # edge table keeps its natural block count.
    if edges.num_blocks() > 4 * n_buckets:
        edges = edges.repartition(n_buckets).materialize()
    n = nodes.count()
    r0 = int(np.floor(QUANT / n + 0.5))
    base = int(np.floor((1.0 - damping) * QUANT / n + 0.5))

    def init_ranks(t: pa.Table) -> pa.Table:
        v = t.column("doc_id")
        return pa.table({"v": v, "rq": pa.array(
            np.full(len(t), r0, np.int64))})

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow",
                              batch_size=None).materialize()

    def tag_ranks(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bucket": pa.array((v % n_buckets)
                                            .astype(np.int32)),
                         "src": t.column("v"),
                         "dst": pa.array(np.full(len(t), -1, np.int64)),
                         "val": t.column("rq"),
                         "w": pa.array(np.ones(len(t), np.int64))})

    # optional edge weights: an edges table with (w, wsum) columns
    # distributes rank mass w/wsum per edge (wsum = src's total
    # out-weight); without them w = 1, wsum = deg — and multiplying by
    # an exact 1.0 is an IEEE no-op, so unweighted results (and the
    # registered oracle) are bit-unchanged by this generalization
    weighted = "w" in edges.schema().names

    def tag_edges(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        w = (t.column("w") if weighted
             else pa.array(np.ones(len(t), np.int64)))
        return pa.table({"bucket": pa.array((s % n_buckets)
                                            .astype(np.int32)),
                         "src": t.column("src"),
                         "dst": t.column("dst"),
                         "val": t.column("wsum" if weighted else "deg"),
                         "w": w})

    def join_terms(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["dst"] < 0]
        e = df[df["dst"] >= 0]
        m = e.merge(r[["src", "val"]].rename(columns={"val": "rq"}),
                    on="src", how="inner")
        tq = np.floor(damping * m["rq"].to_numpy(np.float64)
                      * m["w"].to_numpy(np.float64)
                      / m["val"].to_numpy(np.float64) + 0.5) \
            .astype(np.int64)
        out = pd.DataFrame({"v": m["dst"].to_numpy(np.int64), "tq": tq})
        out["bucket2"] = (out["v"] % n_buckets).astype(np.int32)
        return out

    def zero_rows(t: pa.Table) -> pa.Table:
        v = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"v": pa.array(v),
                         "tq": pa.array(np.zeros(len(v), np.int64)),
                         "bucket2": pa.array((v % n_buckets)
                                             .astype(np.int32))})

    def sum_node(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("v", sort=False)["tq"].sum().reset_index()
        agg["rq"] = (agg["tq"] + base).astype(np.int64)
        return agg[["v", "rq"]]

    for _ in range(max(0, n_iters)):
        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow",
                                   batch_size=None) \
            .union(edges.map_batches(tag_edges, batch_format="pyarrow",
                                     batch_size=None))
        terms = tagged.groupby("bucket").map_groups(
            join_terms, batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow")  # arrow
        # blocks so the union below is homogeneous (the near-dups-lsh
        # precedent)
        allv = terms.union(nodes.map_batches(zero_rows,
                                             batch_format="pyarrow",
                                             batch_size=None))
        ranks = allv.groupby("bucket2").map_groups(
            sum_node, batch_format="pandas").materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("v"),
                         "rank_q9": t.column("rq")})

    return ranks.map_batches(finish, batch_format="pyarrow",
                             batch_size=None)


def pagerank_mod(ds, n_nodes: int, n_iters: int = 3,
                 damping: float = 0.85, n_out: int = 3):
    """Driver-query shape: synthesized link graph over the documents
    table, 3 exact power iterations. doc_ids are contiguous 0..N-1
    (verified across every sf), so this rides the dense bounded-universe
    path — bit-identical to `pagerank(ds, edges)` (TestDenseIdentity)."""
    edges = synth_edges(ds, n_nodes, n_out=n_out)
    return pagerank_dense(edges, n_nodes, n_iters=n_iters,
                          damping=damping)


_SITE_RE = r"://site([0-9]+)\."


def host_edges(edges, n_hosts: int = 1000, n_buckets: int = 32,
               id_column: str = "doc_id", dst_column: str = "dst"):
    """(doc_id, dst-URL) outlink rows -> DISTINCT host-graph edges
    (src, dst, deg) ready for pagerank: src = the page's own host id
    (doc_id % n_hosts — the synth site(N) URL convention used by the
    snapshots/robots corpora), dst = the integer parsed from the target
    host, deg = src's distinct out-degree.

    Per-batch distinct combiner (duplicate (src, dst) pairs collapse
    before anything moves) -> ONE src-bucket shuffle where global
    dedup and out-degree are local decisions."""

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        d = t.column(dst_column)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        import pyarrow.compute as pc
        ex = pc.extract_regex(d, _SITE_RE.replace("([0-9]+)",
                                                  "(?P<n>[0-9]+)"))
        host = pc.struct_field(ex, "n")
        ok = pc.is_valid(host).to_numpy(zero_copy_only=False)
        if not ok.any():
            return empty
        src = (t.column(id_column).to_numpy()[ok] % n_hosts) \
            .astype(np.int64)
        dst = host.drop_null().cast(pa.int64()).to_numpy()
        pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0]),
                         "dst": pa.array(pairs[:, 1])})

    def add_bucket(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket", pa.array((s % n_buckets).astype(np.int32)))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["src", "dst"])
        deg = df.groupby("src", sort=False)["dst"].transform("size")
        return pd.DataFrame({"src": df["src"].to_numpy(np.int64),
                             "dst": df["dst"].to_numpy(np.int64),
                             "deg": deg.to_numpy(np.int64)})

    parts = edges.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return (parts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(final, batch_format="pandas"))


def host_pagerank(ds_docs, n_hosts: int = 1000, n_iters: int = 3,
                  damping: float = 0.85):
    """The CC-style host-rank composition: synth HTML -> extract_links
    -> host edge table -> pagerank over the FIXED host universe
    0..n_hosts-1 (linkless hosts are rank sinks and keep rows).

    Unlike pagerank_mod's formula-synthesized graph, the edges here
    travel the real extraction path (split-decomposition href scan +
    host parse), so the twin proves the whole chain."""
    from vtzero_ray.functions.crawl import extract_links, synth_linked_html

    # the host universe 0..n_hosts-1 is a declared parameter -> dense
    # bounded-universe path (one edge pass per iteration, no groupby
    # barriers); bit-identical to the bucketed pagerank over
    # rd.range(n_hosts) nodes (TestDenseIdentity)
    edges = host_edges(extract_links(synth_linked_html(ds_docs)),
                       n_hosts=n_hosts, n_buckets=8)
    return pagerank_dense(edges, n_hosts, n_iters=n_iters,
                          damping=damping)


def pagerank_sql_over(edges_sql: str, nodes_sql: str, n_iters: int = 3,
                      damping: float = 0.85) -> str:
    """Unrolled-iteration twin over ARBITRARY (src, dst)-distinct edges
    and (v) nodes CTEs — the generalization pagerank_sql specializes."""
    d = repr(damping)
    parts = [
        f"WITH nodes AS ({nodes_sql}), ",
        "n AS (SELECT COUNT(*) AS c FROM nodes), ",
        f"e AS ({edges_sql}), ",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM e GROUP BY 1), ",
        "base AS (SELECT CAST(floor((1.0::DOUBLE - " + d + "::DOUBLE) * "
        "1000000000.0 / CAST(n.c AS DOUBLE) + 0.5) AS BIGINT) AS b, "
        "CAST(floor(1000000000.0 / CAST(n.c AS DOUBLE) + 0.5) AS BIGINT) "
        "AS r0 FROM n), ",
        "r0 AS (SELECT nodes.v, base.r0 AS rq FROM nodes, base), ",
    ]
    for i in range(max(0, n_iters)):
        parts.append(
            f"t{i} AS (SELECT e.dst AS v, CAST(floor({d}::DOUBLE * "
            f"CAST(r{i}.rq AS DOUBLE) / CAST(deg.deg AS DOUBLE) + 0.5) "
            "AS BIGINT) AS tq FROM e JOIN deg USING (src) "
            f"JOIN r{i} ON r{i}.v = e.src), "
            f"r{i + 1} AS (SELECT d0.v, "
            "base.b + COALESCE(s.sq, 0) AS rq FROM nodes d0 "
            "CROSS JOIN base LEFT JOIN (SELECT v, SUM(tq) AS sq "
            f"FROM t{i} GROUP BY 1) s ON s.v = d0.v), ")
    body = "".join(parts).rstrip().rstrip(",")
    return (body + f" SELECT v, CAST(rq AS BIGINT) AS rank_q9 "
                   f"FROM r{max(0, n_iters)}")


def ppr_sql_over(edges_sql: str, nodes_sql: str, seed_pred: str,
                 n_iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled PERSONALIZED-PageRank twin: identical to
    pagerank_sql_over except the r0/base mass concentrates on the seed
    set (``seed_pred`` is a boolean over nodes.v) — the per-edge term is
    untouched."""
    d = repr(damping)
    parts = [
        f"WITH nodes AS ({nodes_sql}), ",
        f"seeds AS (SELECT v FROM nodes WHERE {seed_pred}), ",
        "ns AS (SELECT COUNT(*) AS c FROM seeds), ",
        f"e AS ({edges_sql}), ",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM e GROUP BY 1), ",
        "base AS (SELECT CAST(floor((1.0::DOUBLE - " + d + "::DOUBLE) * "
        "1000000000.0 / CAST(ns.c AS DOUBLE) + 0.5) AS BIGINT) AS b, "
        "CAST(floor(1000000000.0 / CAST(ns.c AS DOUBLE) + 0.5) AS BIGINT) "
        "AS r0 FROM ns), ",
        "r0 AS (SELECT nodes.v, CASE WHEN nodes.v IN "
        "(SELECT v FROM seeds) THEN base.r0 ELSE 0 END AS rq "
        "FROM nodes, base), ",
    ]
    for i in range(max(0, n_iters)):
        parts.append(
            f"t{i} AS (SELECT e.dst AS v, CAST(floor({d}::DOUBLE * "
            f"CAST(r{i}.rq AS DOUBLE) / CAST(deg.deg AS DOUBLE) + 0.5) "
            "AS BIGINT) AS tq FROM e JOIN deg USING (src) "
            f"JOIN r{i} ON r{i}.v = e.src), "
            f"r{i + 1} AS (SELECT d0.v, "
            "(CASE WHEN d0.v IN (SELECT v FROM seeds) THEN base.b "
            "ELSE 0 END) + COALESCE(s.sq, 0) AS rq FROM nodes d0 "
            "CROSS JOIN base LEFT JOIN (SELECT v, SUM(tq) AS sq "
            f"FROM t{i} GROUP BY 1) s ON s.v = d0.v), ")
    body = "".join(parts).rstrip().rstrip(",")
    return (body + f" SELECT v, CAST(rq AS BIGINT) AS rank_q9 "
                   f"FROM r{max(0, n_iters)}")


def host_ppr(ds_docs, n_hosts: int = 1000, n_iters: int = 3,
             seed_mod: int = 17):
    """Personalized PageRank over the really-extracted host graph:
    teleport mass concentrated on the deterministic seed set
    v % seed_mod == 0 (topic-sensitive rank around a host cohort)."""
    from vtzero_ray.functions.crawl import extract_links, synth_linked_html

    edges = host_edges(extract_links(synth_linked_html(ds_docs)),
                       n_hosts=n_hosts)
    seeds = np.arange(0, n_hosts, seed_mod, dtype=np.int64)
    return pagerank_dense(edges, n_hosts, n_iters=n_iters, seeds=seeds)


def _host_edges_sql(html_expr: str, n_hosts: int = 1000,
                    table: str = "documents") -> str:
    """SQL producing exactly host_edges' DISTINCT (src, dst) pairs —
    the twin re-runs the href regex + host parse on the synth HTML."""
    return (
        f"SELECT DISTINCT src, CAST(regexp_extract(u, '{_SITE_RE}', 1) "
        "AS BIGINT) AS dst FROM ("
        f"SELECT doc_id % {n_hosts} AS src, "
        "unnest(regexp_extract_all(html, 'href=\"([^\"]*)\"', 1)) AS u "
        f"FROM (SELECT doc_id, {html_expr} AS html FROM {table})) "
        f"WHERE regexp_extract(u, '{_SITE_RE}', 1) <> ''"
    )


def host_pagerank_sql(html_expr: str, n_hosts: int = 1000,
                      n_iters: int = 3, damping: float = 0.85,
                      table: str = "documents") -> str:
    """DuckDB twin of host_pagerank: the SAME href regex + host parse
    over the SAME synth HTML, distinct (src, dst), fixed node range."""
    nodes = f"SELECT range AS v FROM range({n_hosts})"
    return pagerank_sql_over(_host_edges_sql(html_expr, n_hosts, table),
                             nodes, n_iters=n_iters, damping=damping)


def random_walks(ds_nodes, edges, n_steps: int = 3, seed: str = "walk",
                 n_buckets: int = 32):
    """Deterministic hash-walk corpus — the DeepWalk/node2vec INPUT
    (Perozzi et al. 2014): one walk starts at every node; at step t
    from node u the next hop is the out-neighbor w minimizing
    (md5_number_lower('{seed}:{t}:{u}:{w}'), w) — a per-step keyed
    pseudo-random choice both engines compute bit-identically (the
    shuffle_epoch hash contract). Walks reaching a node with no
    out-edges stop. Returns (walk, step, node), <= N*(n_steps+1) rows.

    Shape: per step ONE src-bucket tagged-union join shuffle (the
    pagerank vocabulary); the frontier is node-bounded and each step
    materializes before feeding the next (lineage break). Candidate
    hashing costs one md5 per (walk-position, out-edge) pair —
    frontier-bounded, never corpus-bounded."""
    from vtzero_ray.functions.sketch import CMS

    if n_steps < 0:
        raise ValueError(f"n_steps must be >= 0, got {n_steps}")
    nodes = ds_nodes.select_columns(["doc_id"]).materialize()
    edges = edges.select_columns(["src", "dst"]).materialize()
    # same over-blocking guard as pagerank: every step re-maps edges
    if edges.num_blocks() > 4 * n_buckets:
        edges = edges.repartition(n_buckets).materialize()

    def init(t: pa.Table) -> pa.Table:
        v = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"walk": pa.array(v), "cur": pa.array(v)})

    frontier = nodes.map_batches(init, batch_format="pyarrow",
                                 batch_size=None).materialize()

    def emit(step: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "walk": t.column("walk"),
                "step": pa.array(np.full(len(t), step, np.int64)),
                "node": t.column("cur"),
            })
        return fn

    out = frontier.map_batches(emit(0), batch_format="pyarrow",
                               batch_size=None)

    def tag_frontier(t: pa.Table) -> pa.Table:
        c = t.column("cur").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bucket": pa.array((c % n_buckets)
                                            .astype(np.int32)),
                         "walk": t.column("walk"),
                         "key": t.column("cur"),
                         "dst": pa.array(np.full(len(t), -1, np.int64))})

    def tag_edges(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bucket": pa.array((s % n_buckets)
                                            .astype(np.int32)),
                         "walk": pa.array(np.full(len(t), -1, np.int64)),
                         "key": t.column("src"),
                         "dst": t.column("dst")})

    for step in range(1, n_steps + 1):
        prefix = f"{seed}:{step}:"

        def pick(df: pd.DataFrame, _p=prefix) -> pd.DataFrame:
            f = df[df["dst"] < 0]
            e = df[df["dst"] >= 0]
            m = f[["walk", "key"]].merge(e[["key", "dst"]], on="key")
            if m.empty:
                return pd.DataFrame({"walk": np.empty(0, np.int64),
                                     "cur": np.empty(0, np.int64)})
            u = m["key"].to_numpy(np.int64)
            w = m["dst"].to_numpy(np.int64)
            keys = [_p + f"{a}:{b}" for a, b in zip(u, w)]
            h = CMS.hash64(keys)
            walk = m["walk"].to_numpy(np.int64)
            order = np.lexsort((w, h, walk))
            ws = walk[order]
            first = order[np.flatnonzero(
                np.diff(ws, prepend=ws[0] - 1) != 0)]
            return pd.DataFrame({"walk": walk[first],
                                 "cur": w[first]})

        tagged = frontier.map_batches(tag_frontier,
                                      batch_format="pyarrow",
                                      batch_size=None) \
            .union(edges.map_batches(tag_edges, batch_format="pyarrow",
                                     batch_size=None))
        frontier = tagged.groupby("bucket").map_groups(
            pick, batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow") \
            .materialize()
        out = out.union(frontier.map_batches(emit(step),
                                             batch_format="pyarrow",
                                             batch_size=None))
    return out


def host_walks(ds_docs, n_hosts: int = 1000, n_steps: int = 3,
               seed: str = "walk"):
    """The composed graph→sequence corpus: synth HTML → extract_links
    → host edges → deterministic hash walks from every host."""
    import ray.data as rd

    from vtzero_ray.functions.crawl import extract_links, synth_linked_html

    edges = host_edges(extract_links(synth_linked_html(ds_docs)),
                       n_hosts=n_hosts)
    # declared bounded universe -> dense next-hop path (bit-identical
    # to the bucketed random_walks, asserted in TestDenseIdentity)
    return random_walks_dense(edges, n_hosts, n_steps=n_steps, seed=seed)


def host_walks_sql(html_expr: str, n_hosts: int = 1000,
                   n_steps: int = 3, seed: str = "walk",
                   table: str = "documents") -> str:
    """DuckDB twin of host_walks: same edges, walk steps unrolled —
    each picks min (md5_number_lower, dst) per walk via QUALIFY."""
    parts = [
        f"WITH e AS ({_host_edges_sql(html_expr, n_hosts, table)}), ",
        f"w0 AS (SELECT range AS walk, range AS cur "
        f"FROM range({n_hosts})), ",
    ]
    sel = ["SELECT walk, CAST(0 AS BIGINT) AS step, cur AS node FROM w0"]
    for t in range(1, n_steps + 1):
        parts.append(
            f"w{t} AS (SELECT walk, e.dst AS cur FROM w{t-1} "
            f"JOIN e ON e.src = w{t-1}.cur "
            "QUALIFY row_number() OVER (PARTITION BY walk ORDER BY "
            f"md5_number_lower('{seed}:{t}:' || w{t-1}.cur || ':' || "
            "e.dst)::UBIGINT, e.dst) = 1), ")
        sel.append(f"SELECT walk, CAST({t} AS BIGINT) AS step, "
                   f"cur AS node FROM w{t}")
    body = "".join(parts).rstrip().rstrip(",")
    return body + " " + " UNION ALL ".join(sel)


def pagerank_sql(n_iters: int = 3, damping: float = 0.85, n_out: int = 3,
                 table: str = "documents") -> str:
    """DuckDB twin: same synthesized edges, same quantized per-edge
    terms, same base/init rounding, iterations unrolled as CTEs."""
    d = repr(damping)
    parts = [
        f"WITH n AS (SELECT COUNT(*) AS c FROM {table}), ",
        f"e AS (SELECT DISTINCT doc_id AS src, "
        f"(doc_id * doc_id * 7 + j.range * 13) % n.c AS dst "
        f"FROM {table}, n, range(1, {n_out + 1}) j), ",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM e GROUP BY 1), ",
        "base AS (SELECT CAST(floor((1.0::DOUBLE - " + d + "::DOUBLE) * "
        "1000000000.0 / CAST(n.c AS DOUBLE) + 0.5) AS BIGINT) AS b, "
        "CAST(floor(1000000000.0 / CAST(n.c AS DOUBLE) + 0.5) AS BIGINT) "
        "AS r0 FROM n), ",
        f"r0 AS (SELECT doc_id AS v, base.r0 AS rq FROM {table}, base), ",
    ]
    for i in range(max(0, n_iters)):
        parts.append(
            f"t{i} AS (SELECT e.dst AS v, CAST(floor({d}::DOUBLE * "
            f"CAST(r{i}.rq AS DOUBLE) / CAST(deg.deg AS DOUBLE) + 0.5) "
            "AS BIGINT) AS tq FROM e JOIN deg USING (src) "
            f"JOIN r{i} ON r{i}.v = e.src), "
            f"r{i + 1} AS (SELECT d0.doc_id AS v, "
            f"base.b + COALESCE(s.sq, 0) AS rq FROM {table} d0 "
            "CROSS JOIN base LEFT JOIN (SELECT v, SUM(tq) AS sq "
            f"FROM t{i} GROUP BY 1) s ON s.v = d0.doc_id), ")
    body = "".join(parts).rstrip().rstrip(",")
    return (body + f" SELECT v, CAST(rq AS BIGINT) AS rank_q9 "
                   f"FROM r{max(0, n_iters)}")


def cocitation(edges, min_shared: int = 1, max_fanout: int = 4096,
               n_buckets: int = 32):
    """Co-citation similarity (Small 1973, the classic related-items
    signal): → Dataset (u, v, n_shared) — unordered target pairs u < v
    co-linked by >= min_shared common sources.

    TWO bounded shuffles: (1) src-bucket colocates each source's
    out-set; pairs explode per src (cost C(out-degree, 2), so a source
    with > max_fanout targets raises LOUDLY — the ADVICE star-guard
    lesson: diverge loudly, never silently vs the oracle); (2)
    pair-bucket shuffle sums counts (each unordered pair hashes to one
    bucket, so the count and the min_shared filter are local)."""

    def tag_src(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"bucket": pa.array((s % n_buckets)
                                            .astype(np.int32)),
                         "src": pa.array(s),
                         "dst": t.column("dst").cast(pa.int64())})

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out_u, out_v = [], []
        for src, g in df.groupby("src", sort=False):
            d = np.unique(g["dst"].to_numpy(np.int64))
            if d.size > max_fanout:
                raise ValueError(f"src {src} fan-out {d.size} exceeds "
                                 f"max_fanout={max_fanout}")
            if d.size < 2:
                continue
            iu, iv = np.triu_indices(d.size, k=1)
            out_u.append(d[iu])
            out_v.append(d[iv])
        if not out_u:
            return pd.DataFrame({"u": np.empty(0, np.int64),
                                 "v": np.empty(0, np.int64),
                                 "pb": np.empty(0, np.int32)})
        u = np.concatenate(out_u)
        v = np.concatenate(out_v)
        return pd.DataFrame({"u": u, "v": v,
                             "pb": ((u * 31 + v) % n_buckets)
                             .astype(np.int32)})

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["u", "v"], sort=False).size() \
            .reset_index(name="n_shared")
        agg = agg[agg["n_shared"] >= min_shared]
        agg["n_shared"] = agg["n_shared"].astype(np.int64)
        return agg[["u", "v", "n_shared"]]

    pairs = edges.map_batches(tag_src, batch_format="pyarrow",
                              batch_size=None) \
        .groupby("bucket").map_groups(explode, batch_format="pandas")
    return pairs.groupby("pb").map_groups(count_pairs,
                                          batch_format="pandas")


def host_cocitation(ds_docs, n_hosts: int = 1000, min_shared: int = 1):
    """Related hosts over the really-extracted link graph."""
    from vtzero_ray.functions.crawl import extract_links, synth_linked_html

    return cocitation(host_edges(
        extract_links(synth_linked_html(ds_docs)), n_hosts=n_hosts),
        min_shared=min_shared)


def host_cocitation_sql(html_expr: str, n_hosts: int = 1000,
                        min_shared: int = 1,
                        table: str = "documents") -> str:
    """DuckDB twin: the same extracted edges, self-joined on src."""
    return (
        f"WITH e AS ({_host_edges_sql(html_expr, n_hosts, table)}) "
        "SELECT a.dst AS u, b.dst AS v, CAST(COUNT(*) AS BIGINT) "
        "AS n_shared FROM e a JOIN e b "
        "ON a.src = b.src AND a.dst < b.dst "
        f"GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}"
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999)
# ---------------------------------------------------------------------------

def hits(ds_nodes, edges, n_iters: int = 2, n_buckets: int = 32):
    """→ Dataset (v, auth_q9, hub_q9): L1-normalized hub/authority
    scores after ``n_iters`` rounds (h starts uniform; per round
    a(v) = Σ h(u) over in-edges then normalize, h(u) = Σ a(v) over
    out-edges then normalize).

    Exactness: every half-step sum is an INTEGER sum of q9 scores
    (order-free); normalization is ONE IEEE expression over exact ints
    — floor(S * 1e9 / max(T, 1) + 0.5) — identical in DuckDB. Each
    half-step is one tagged-union join shuffle + one key-bucket sum
    shuffle + a node-sized aggregate for T (the pagerank vocabulary);
    rank tables materialize per half-step (lineage break)."""
    nodes = ds_nodes.select_columns(["doc_id"]).materialize()
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.num_blocks() > 4 * n_buckets:
        edges = edges.repartition(n_buckets).materialize()

    def init_h(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("doc_id"),
                         "q": pa.array(np.ones(len(t), np.int64))})

    def tag_ranks(key: str):
        def fn(t: pa.Table) -> pa.Table:
            v = t.column("v").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({"bucket": pa.array((v % n_buckets)
                                                .astype(np.int32)),
                             "k": t.column("v"),
                             "o": pa.array(np.full(len(t), -1,
                                                   np.int64)),
                             "q": t.column("q")})
        return fn

    def tag_edges(key: str, other: str):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({"bucket": pa.array((k % n_buckets)
                                                .astype(np.int32)),
                             "k": pa.array(k),
                             "o": t.column(other),
                             "q": pa.array(np.zeros(len(t), np.int64))})
        return fn

    def join_terms(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["o"] < 0]
        e = df[df["o"] >= 0]
        m = e[["k", "o"]].merge(r[["k", "q"]], on="k", how="inner")
        out = pd.DataFrame({"v": m["o"].to_numpy(np.int64),
                            "tq": m["q"].to_numpy(np.int64)})
        out["b2"] = (out["v"] % n_buckets).astype(np.int32)
        return out

    def zero_rows(t: pa.Table) -> pa.Table:
        v = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"v": pa.array(v),
                         "tq": pa.array(np.zeros(len(v), np.int64)),
                         "b2": pa.array((v % n_buckets)
                                        .astype(np.int32))})

    def sum_node(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("v", sort=False)["tq"].sum().reset_index()
        agg["s"] = agg["tq"].astype(np.int64)
        return agg[["v", "s"]]

    def half_step(ranks, key: str, other: str):
        """ranks (v, q) keyed on ``key``-side of edges → normalized
        (v, q) on the ``other`` side."""
        tagged = ranks.map_batches(tag_ranks(key),
                                   batch_format="pyarrow",
                                   batch_size=None) \
            .union(edges.map_batches(tag_edges(key, other),
                                     batch_format="pyarrow",
                                     batch_size=None))
        sums = tagged.groupby("bucket").map_groups(
            join_terms, batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow") \
            .union(nodes.map_batches(zero_rows, batch_format="pyarrow",
                                     batch_size=None)) \
            .groupby("b2").map_groups(sum_node, batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow") \
            .materialize()
        T = max(int(sums.sum("s") or 0), 1)

        def norm(t: pa.Table) -> pa.Table:
            sv = t.column("s").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            q = np.floor(sv.astype(np.float64) * QUANT
                         / np.float64(T) + 0.5).astype(np.int64)
            return pa.table({"v": t.column("v"), "q": pa.array(q)})

        return sums.map_batches(norm, batch_format="pyarrow",
                                batch_size=None).materialize()

    h = nodes.map_batches(init_h, batch_format="pyarrow",
                          batch_size=None).materialize()
    a = None
    for _ in range(max(1, n_iters)):
        a = half_step(h, "src", "dst")   # authorities from hubs
        h = half_step(a, "dst", "src")   # hubs from authorities

    def tag_a(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": t.column("v"), "aq": t.column("q"),
                         "hq": pa.array(np.full(len(t), -1, np.int64)),
                         "b": pa.array((v % n_buckets).astype(np.int32))})

    def tag_h(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": t.column("v"),
                         "aq": pa.array(np.full(len(t), -1, np.int64)),
                         "hq": t.column("q"),
                         "b": pa.array((v % n_buckets).astype(np.int32))})

    def zip_ranks(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("v", sort=False)[["aq", "hq"]].max() \
            .reset_index()
        return pd.DataFrame({"v": agg["v"].to_numpy(np.int64),
                             "auth_q9": agg["aq"].to_numpy(np.int64),
                             "hub_q9": agg["hq"].to_numpy(np.int64)})

    return a.map_batches(tag_a, batch_format="pyarrow",
                         batch_size=None) \
        .union(h.map_batches(tag_h, batch_format="pyarrow",
                             batch_size=None)) \
        .groupby("b").map_groups(zip_ranks, batch_format="pandas")


def host_hits(ds_docs, n_hosts: int = 1000, n_iters: int = 2):
    """HITS over the really-extracted host graph — dense
    bounded-universe path (bit-identical to the bucketed ``hits``
    over rd.range(n_hosts) nodes, TestDenseIdentity)."""
    from vtzero_ray.functions.crawl import extract_links, synth_linked_html

    edges = host_edges(extract_links(synth_linked_html(ds_docs)),
                       n_hosts=n_hosts, n_buckets=8)
    return hits_dense(edges, n_hosts, n_iters=n_iters)


def host_hits_sql(html_expr: str, n_hosts: int = 1000, n_iters: int = 2,
                  table: str = "documents") -> str:
    """DuckDB twin: same edges, half-steps unrolled; normalization is
    the identical floor(S * 1e9 / GREATEST(T, 1) + 0.5) expression."""
    parts = [
        f"WITH e AS ({_host_edges_sql(html_expr, n_hosts, table)}), ",
        f"nodes AS (SELECT range AS v FROM range({n_hosts})), ",
        "h0 AS (SELECT v, CAST(1 AS BIGINT) AS q FROM nodes), ",
    ]

    def norm(src_cte: str, join_key: str, out_key: str, out: str) -> str:
        s = (f"(SELECT nodes.v, COALESCE(s.s, 0) AS s FROM nodes "
             f"LEFT JOIN (SELECT e.{out_key} AS v, SUM(r.q) AS s "
             f"FROM e JOIN {src_cte} r ON r.v = e.{join_key} "
             f"GROUP BY 1) s ON s.v = nodes.v)")
        return (f"{out} AS (SELECT v, CAST(floor(CAST(s AS DOUBLE) * "
                "1000000000.0 / CAST(GREATEST(t, 1) AS DOUBLE) + 0.5) "
                f"AS BIGINT) AS q FROM {s} sa CROSS JOIN "
                f"(SELECT SUM(s) AS t FROM {s}) ta), ")

    hi = "h0"
    for i in range(max(1, n_iters)):
        parts.append(norm(hi, "src", "dst", f"a{i + 1}"))
        parts.append(norm(f"a{i + 1}", "dst", "src", f"h{i + 1}"))
        hi = f"h{i + 1}"
    n = max(1, n_iters)
    body = "".join(parts).rstrip().rstrip(",")
    return (body + f" SELECT nodes.v, a{n}.q AS auth_q9, "
            f"h{n}.q AS hub_q9 FROM nodes "
            f"JOIN a{n} ON a{n}.v = nodes.v "
            f"JOIN h{n} ON h{n}.v = nodes.v")


# ---------------------------------------------------------------------------
# Triangle counting (per-edge support — the k-truss ingredient)
# ---------------------------------------------------------------------------

def triangle_support(edges, n_buckets: int = 32, max_degree: int = 4096):
    """→ Dataset (u, v, n_tri): for every canonical undirected edge
    u < v (self-loops dropped, duplicates collapsed), the number of
    triangles containing it (= common neighbors of u and v). The total
    triangle count is Σ n_tri / 3.

    Three bounded shuffles: (1) (u,v)-bucket canonical dedup; (2)
    node-bucket adjacency — each node's sorted neighbor set explodes to
    C(deg, 2) wedge rows (a node past ``max_degree`` raises LOUDLY, the
    star-guard contract); (3) pair-bucket tagged-union join of wedges
    against the edge set — every wedge and its closing edge share a
    bucket, so the per-edge count is a local decision; edges with zero
    wedge hits keep an n_tri = 0 row."""

    def canon_partial(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = s != d
        u = np.minimum(s[ok], d[ok])
        v = np.maximum(s[ok], d[ok])
        if u.size:
            pairs = np.unique(np.stack([u, v], axis=1), axis=0)
        else:
            pairs = np.empty((0, 2), np.int64)
        return pa.table({"u": pa.array(pairs[:, 0]),
                         "v": pa.array(pairs[:, 1]),
                         "b": pa.array(((pairs[:, 0] * 31 + pairs[:, 1])
                                        % n_buckets).astype(np.int32))})

    def canon_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["u", "v"])[["u", "v"]]

    E = edges.map_batches(canon_partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("b").map_groups(canon_final, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow").materialize()

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.concatenate([u, v])
        n = np.concatenate([v, u])
        return pa.table({"x": pa.array(x), "n": pa.array(n),
                         "b": pa.array((x % n_buckets).astype(np.int32))})

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        out_y, out_z = [], []
        for x, g in df.groupby("x", sort=False):
            nb = np.unique(g["n"].to_numpy(np.int64))
            if nb.size > max_degree:
                raise ValueError(f"node {x} degree {nb.size} exceeds "
                                 f"max_degree={max_degree}")
            if nb.size < 2:
                continue
            iy, iz = np.triu_indices(nb.size, k=1)
            out_y.append(nb[iy])
            out_z.append(nb[iz])
        if not out_y:
            return pd.DataFrame({"y": np.empty(0, np.int64),
                                 "z": np.empty(0, np.int64),
                                 "pb": np.empty(0, np.int32)})
        y = np.concatenate(out_y)
        z = np.concatenate(out_z)
        return pd.DataFrame({"y": y, "z": z,
                             "pb": ((y * 31 + z) % n_buckets)
                             .astype(np.int32)})

    W = E.map_batches(adj, batch_format="pyarrow", batch_size=None) \
        .groupby("b").map_groups(wedges, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")

    def tag_edge(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"y": pa.array(u), "z": pa.array(v),
                         "is_edge": pa.array(np.ones(len(t), np.bool_)),
                         "pb": pa.array(((u * 31 + v) % n_buckets)
                                        .astype(np.int32))})

    def tag_wedge(t: pa.Table) -> pa.Table:
        return pa.table({"y": t.column("y"), "z": t.column("z"),
                         "is_edge": pa.array(np.zeros(len(t), np.bool_)),
                         "pb": t.column("pb")})

    def close(df: pd.DataFrame) -> pd.DataFrame:
        ed = df[df["is_edge"]]
        wg = df[~df["is_edge"]]
        cnt = wg.groupby(["y", "z"], sort=False).size()
        key = list(zip(ed["y"].to_numpy(np.int64),
                       ed["z"].to_numpy(np.int64)))
        n = np.array([int(cnt.get(k2, 0)) for k2 in key], np.int64)
        return pd.DataFrame({"u": ed["y"].to_numpy(np.int64),
                             "v": ed["z"].to_numpy(np.int64),
                             "n_tri": n})

    return E.map_batches(tag_edge, batch_format="pyarrow",
                         batch_size=None) \
        .union(W.map_batches(tag_wedge, batch_format="pyarrow",
                             batch_size=None)) \
        .groupby("pb").map_groups(close, batch_format="pandas")


def triangles_mod(ds, n_nodes: int, n_out: int = 3):
    """Driver shape: per-edge triangle support over the quadratic synth
    link graph (the pagerank_mod graph — its hub structure actually
    closes triangles; the extracted host graph's linear 7·id+j targets
    are triangle-free, verified)."""
    return triangle_support(synth_edges(ds, n_nodes, n_out=n_out))


def triangles_sql(n_out: int = 3, table: str = "documents") -> str:
    """DuckDB twin: same synth edges, canonical undirected dedup,
    adjacency self-join wedges, LEFT-join closing count (0 rows kept)."""
    return (
        f"WITH n AS (SELECT COUNT(*) AS c FROM {table}), "
        f"e0 AS (SELECT DISTINCT doc_id AS src, "
        f"(doc_id * doc_id * 7 + j.range * 13) % n.c AS dst "
        f"FROM {table}, n, range(1, {n_out + 1}) j), "
        "ed AS (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM e0 WHERE src != dst), "
        "adj AS (SELECT u AS x, v AS n FROM ed "
        "UNION ALL SELECT v AS x, u AS n FROM ed), "
        "wedge AS (SELECT a.n AS y, b.n AS z FROM adj a "
        "JOIN adj b ON b.x = a.x AND a.n < b.n) "
        "SELECT ed.u, ed.v, CAST(COUNT(w.y) AS BIGINT) AS n_tri "
        "FROM ed LEFT JOIN wedge w ON w.y = ed.u AND w.z = ed.v "
        "GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# label propagation — community detection (Raghavan et al. 2007), made
# deterministic: synchronous updates, winner = (count DESC, label ASC)
# ---------------------------------------------------------------------------


def symmetrize_edges(edges, n_buckets: int = 8):
    """DISTINCT undirected closure of a directed (src, dst) edge table,
    materialized: self-loops dropped, reversed duplicates collapsed via
    ONE canonical (lo, hi)-bucket dedup shuffle, then both directions
    emitted (so per-node degree = outgoing count in the symmetric
    representation). Shared by label_prop and kcore_peel."""

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        lo = np.minimum(s[keep], d[keep])
        hi = np.maximum(s[keep], d[keep])
        pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"bucket": pa.array((pairs[:, 0] % n_buckets)
                                            .astype(np.int32)),
                         "lo": pa.array(pairs[:, 0]),
                         "hi": pa.array(pairs[:, 1])})

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["lo", "hi"])
        lo = df["lo"].to_numpy(np.int64)
        hi = df["hi"].to_numpy(np.int64)
        src = np.concatenate([lo, hi])
        dst = np.concatenate([hi, lo])
        return pd.DataFrame({"src": src, "dst": dst})

    sym = edges.map_batches(canon, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("bucket").map_groups(expand, batch_format="pandas") \
        .materialize()
    if sym.num_blocks() > 4 * n_buckets:
        sym = sym.repartition(n_buckets).materialize()
    return sym



def label_prop(ds_nodes, edges, n_iters: int = 3, n_buckets: int = 8):
    """Deterministic synchronous label propagation over the UNDIRECTED
    closure of ``edges`` → Dataset (v, community).

    Every node starts labeled with itself; each iteration every node
    adopts the most frequent label among its neighbors (ties → smaller
    label; isolated nodes keep their own). The classic paper breaks
    ties randomly and updates asynchronously — both are replaced by
    deterministic rules here so iterations are bit-exact under any
    block scheduling and the unrolled SQL twin reproduces them.

    Distributed shape (the pagerank vocabulary — labels are node-sized,
    so nothing broadcasts): symmetrize once via a canonical
    (lo, hi)-bucket dedup shuffle (the triangle_support move — a
    directed pair present BOTH ways must not vote twice); then per
    iteration ONE src-bucket tagged-union join ships each node's label
    to its neighbors and ONE dst-bucket shuffle counts votes and picks
    the winner (old-label zero-rows ride the same union so isolated
    nodes keep rows). Edges and each iteration's labels are
    materialized (the lineage-break contract)."""
    nodes = ds_nodes.select_columns(["doc_id"]).materialize()
    sym = symmetrize_edges(edges, n_buckets)

    def init_labels(t: pa.Table) -> pa.Table:
        v = t.column("doc_id")
        return pa.table({"v": v, "lbl": v})

    labels = nodes.map_batches(init_labels, batch_format="pyarrow",
                               batch_size=None).materialize()

    def tag_labels(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bucket": pa.array((v % n_buckets)
                                            .astype(np.int32)),
                         "src": t.column("v"),
                         "dst": pa.array(np.full(len(t), -1, np.int64)),
                         "lbl": t.column("lbl")})

    def tag_edges(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bucket": pa.array((s % n_buckets)
                                            .astype(np.int32)),
                         "src": t.column("src"),
                         "dst": t.column("dst"),
                         "lbl": pa.array(np.zeros(len(t), np.int64))})

    def join_votes(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["dst"] < 0]
        e = df[df["dst"] >= 0]
        m = e.merge(r[["src", "lbl"]], on="src", how="inner",
                    suffixes=("_e", ""))
        out = pd.DataFrame({"v": m["dst"].to_numpy(np.int64),
                            "lbl": m["lbl"].to_numpy(np.int64),
                            "old": np.zeros(len(m), np.int64),
                            "kind": np.zeros(len(m), np.int8)})
        out["bucket2"] = (out["v"] % n_buckets).astype(np.int32)
        return out

    def old_rows(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(v), "lbl": t.column("lbl"),
                         "old": pa.array(np.ones(len(v), np.int64)),
                         "kind": pa.array(np.ones(len(v), np.int8)),
                         "bucket2": pa.array((v % n_buckets)
                                             .astype(np.int32))})

    def pick_winner(df: pd.DataFrame) -> pd.DataFrame:
        olds = df[df["kind"] == 1]
        votes = df[df["kind"] == 0]
        if votes.empty:
            w = olds[["v", "lbl"]]
            return pd.DataFrame({"v": w["v"].to_numpy(np.int64),
                                 "lbl": w["lbl"].to_numpy(np.int64)})
        cnt = votes.groupby(["v", "lbl"], sort=False).size() \
            .reset_index(name="n")
        cnt = cnt.sort_values(["v", "n", "lbl"],
                              ascending=[True, False, True],
                              kind="stable")
        win = cnt.drop_duplicates("v")[["v", "lbl"]]
        out = olds[["v"]].merge(win, on="v", how="left")
        keep_old = out["lbl"].isna().to_numpy()
        lbl = out["lbl"].to_numpy()
        lbl[keep_old] = olds["lbl"].to_numpy(np.int64)[keep_old]
        return pd.DataFrame({"v": out["v"].to_numpy(np.int64),
                             "lbl": lbl.astype(np.int64)})

    for _ in range(max(0, n_iters)):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow",
                                    batch_size=None) \
            .union(sym.map_batches(tag_edges, batch_format="pyarrow",
                                   batch_size=None))
        votes = tagged.groupby("bucket").map_groups(
            join_votes, batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow")
        allv = votes.union(labels.map_batches(old_rows,
                                              batch_format="pyarrow",
                                              batch_size=None))
        labels = allv.groupby("bucket2").map_groups(
            pick_winner, batch_format="pandas").materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("v"),
                         "community": t.column("lbl")})

    return labels.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def host_communities(ds_docs, n_hosts: int = 1000, n_iters: int = 3):
    """Communities of the really-extracted host graph: synth HTML →
    extract_links → host edge table → deterministic label propagation
    over the fixed host universe (linkless hosts stay their own
    singleton community)."""
    import ray.data as rd

    from vtzero_ray.functions.crawl import extract_links, synth_linked_html

    edges = host_edges(extract_links(synth_linked_html(ds_docs)),
                       n_hosts=n_hosts, n_buckets=8)
    # the host universe 0..n_hosts-1 is a declared parameter -> dense
    # bounded-universe path (bit-identical to the bucketed label_prop,
    # asserted in TestDenseIdentity)
    return label_prop_dense(edges, n_hosts, n_iters=n_iters)


def label_prop_sql_over(edges_sql: str, nodes_sql: str,
                        n_iters: int = 3) -> str:
    """Unrolled twin over arbitrary DISTINCT-(src, dst) edges + (v)
    nodes CTEs: same symmetrization, same (count DESC, label ASC)
    winner, same keep-own-label fallback."""
    parts = [
        f"WITH nodes AS ({nodes_sql}), ",
        f"e AS ({edges_sql}), ",
        "und AS (SELECT DISTINCT least(src, dst) AS lo, "
        "greatest(src, dst) AS hi FROM e WHERE src <> dst), ",
        "sym AS (SELECT lo AS src, hi AS dst FROM und "
        "UNION ALL SELECT hi, lo FROM und), ",
        "l0 AS (SELECT v, v AS lbl FROM nodes), ",
    ]
    for i in range(max(0, n_iters)):
        parts.append(
            f"c{i} AS (SELECT s.dst AS v, l.lbl, COUNT(*) AS n "
            f"FROM sym s JOIN l{i} l ON l.v = s.src GROUP BY 1, 2), "
            f"w{i} AS (SELECT v, lbl FROM c{i} QUALIFY row_number() "
            "OVER (PARTITION BY v ORDER BY n DESC, lbl ASC) = 1), "
            f"l{i + 1} AS (SELECT l{i}.v, COALESCE(w{i}.lbl, l{i}.lbl) "
            f"AS lbl FROM l{i} LEFT JOIN w{i} USING (v)), ")
    body = "".join(parts).rstrip().rstrip(",")
    return (body + f" SELECT v, CAST(lbl AS BIGINT) AS community "
                   f"FROM l{max(0, n_iters)}")


def host_communities_sql(html_expr: str, n_hosts: int = 1000,
                         n_iters: int = 3,
                         table: str = "documents") -> str:
    nodes = f"SELECT range AS v FROM range({n_hosts})"
    return label_prop_sql_over(
        _host_edges_sql(html_expr, n_hosts, table), nodes,
        n_iters=n_iters)


# ---------------------------------------------------------------------------
# k-core — bulk-synchronous peel (fixed rounds, SQL-unrollable)
# ---------------------------------------------------------------------------

def kcore_peel(ds_nodes, edges, k: int = 2, rounds: int = 3,
               n_buckets: int = 8):
    """Bulk-synchronous k-core peel over the undirected closure of
    ``edges`` → Dataset (v, deg): the nodes still alive after
    ``rounds`` simultaneous peel rounds (each round removes EVERY node
    whose current degree < k at once) and their residual degree, so
    every output row has deg >= k among output rows once the peel has
    converged. Peel depth is graph-dependent; ``rounds`` is the
    deterministic unroll bound BOTH engines execute, making results
    exact by construction even pre-convergence (the HITS fixed-iters
    precedent — tests assert rounds and rounds+1 agree at test scale).

    Per round: ONE src-bucket degree count over the alive symmetric
    edge table, then ONE bucketed anti-join drops edges touching dying
    nodes (dying set rides the union as tagged rows on BOTH endpoint
    buckets); the edge table is materialized per round (lineage
    break). Nothing is ever node-broadcast."""
    alive = symmetrize_edges(edges, n_buckets)

    def deg_partial(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        us, cnt = np.unique(s, return_counts=True)
        return pa.table({"bucket": pa.array((us % n_buckets)
                                            .astype(np.int32)),
                         "v": pa.array(us),
                         "d": pa.array(cnt.astype(np.int64))})

    def deg_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", sort=False)["d"].sum().reset_index()
        return g[["v", "d"]]

    for _ in range(max(0, rounds)):
        degs = alive.map_batches(deg_partial, batch_format="pyarrow",
                                 batch_size=None) \
            .groupby("bucket").map_groups(deg_sum,
                                          batch_format="pandas") \
            .materialize()

        def dying_rows(t: pa.Table) -> pa.Table:
            v = t.column("v").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = t.column("d").to_numpy(zero_copy_only=False)
            die = v[d < k]
            n = len(die)
            return pa.table({"bucket": pa.array((die % n_buckets)
                                                .astype(np.int32)),
                             "src": pa.array(die),
                             "dst": pa.array(np.full(n, -1, np.int64))})

        def edge_rows(t: pa.Table) -> pa.Table:
            s = t.column("src").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({"bucket": pa.array((s % n_buckets)
                                                .astype(np.int32)),
                             "src": t.column("src"),
                             "dst": t.column("dst")})

        def drop_dying(df: pd.DataFrame) -> pd.DataFrame:
            dead = set(df.loc[df["dst"] < 0, "src"].to_numpy(np.int64))
            e = df[df["dst"] >= 0]
            if dead:
                keep = ~(e["src"].isin(dead) | e["dst"].isin(dead))
                e = e[keep]
            return pd.DataFrame({"src": e["src"].to_numpy(np.int64),
                                 "dst": e["dst"].to_numpy(np.int64)})

        # one anti-join pass per ENDPOINT bucket would miss edges whose
        # dst dies in another bucket — replicate dying rows onto both
        # endpoint buckets instead: an edge (u, v) lives in u's bucket,
        # and v's death must reach it there. Emit dying rows keyed by
        # EVERY bucket (dying sets are output-sized; n_buckets copies
        # of a small set beat a second shuffle).
        def dying_all_buckets(t: pa.Table) -> pa.Table:
            v = t.column("v").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = t.column("d").to_numpy(zero_copy_only=False)
            die = v[d < k]
            n = len(die)
            b = np.repeat(np.arange(n_buckets, dtype=np.int32), n)
            return pa.table({"bucket": pa.array(b),
                             "src": pa.array(np.tile(die, n_buckets)),
                             "dst": pa.array(np.full(n * n_buckets, -1,
                                                     np.int64))})

        tagged = alive.map_batches(edge_rows, batch_format="pyarrow",
                                   batch_size=None) \
            .union(degs.map_batches(dying_all_buckets,
                                    batch_format="pyarrow",
                                    batch_size=None))
        alive = tagged.groupby("bucket").map_groups(
            drop_dying, batch_format="pandas").materialize()

    final = alive.map_batches(deg_partial, batch_format="pyarrow",
                              batch_size=None) \
        .groupby("bucket").map_groups(deg_sum, batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("v"),
                         "deg": t.column("d")})

    return final.map_batches(finish, batch_format="pyarrow",
                             batch_size=None)


def kcore_mod(ds, n_nodes: int, k: int = 3, rounds: int = 3,
              n_out: int = 3):
    """Driver shape: the quadratic synth graph (real hubs + sinks, so
    peeling genuinely cascades) — two independent readers (lineage)."""
    edges = synth_edges(ds, n_nodes, n_out=n_out)
    # doc ids are 0..n_nodes-1 by construction -> dense alive-vector
    # path (bit-identical to the bucketed kcore_peel, asserted in
    # TestDenseIdentity)
    return kcore_dense(edges, n_nodes, k=k, rounds=rounds)


def kcore_sql_over(edges_sql: str, nodes_sql: str, k: int = 2,
                   rounds: int = 3) -> str:
    """Unrolled twin: same symmetrization, same simultaneous-peel
    rounds (dead = deg < k on the CURRENT edge set), same residual
    degree output."""
    parts = [
        f"WITH nodes AS ({nodes_sql}), ",
        f"ed AS ({edges_sql}), ",
        "und AS (SELECT DISTINCT least(src, dst) AS lo, "
        "greatest(src, dst) AS hi FROM ed WHERE src <> dst), ",
        "e0 AS (SELECT lo AS src, hi AS dst FROM und "
        "UNION ALL SELECT hi, lo FROM und), ",
    ]
    for i in range(max(0, rounds)):
        parts.append(
            f"d{i} AS (SELECT src AS v, COUNT(*) AS d FROM e{i} "
            "GROUP BY 1), "
            f"x{i} AS (SELECT v FROM d{i} WHERE d < {k}), "
            f"e{i + 1} AS (SELECT src, dst FROM e{i} "
            f"WHERE src NOT IN (SELECT v FROM x{i}) "
            f"AND dst NOT IN (SELECT v FROM x{i})), ")
    r = max(0, rounds)
    body = "".join(parts).rstrip().rstrip(",")
    return (body + f" SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg "
                   f"FROM e{r} GROUP BY 1")


def kcore_sql(k: int = 3, rounds: int = 3, n_out: int = 3,
              table: str = "documents") -> str:
    """Twin over the quadratic synth graph (the triangles_sql edge
    CTE: n = COUNT(*) of the table)."""
    edges = (f"SELECT DISTINCT doc_id AS src, "
             f"(doc_id * doc_id * 7 + j.range * 13) % "
             f"(SELECT COUNT(*) FROM {table}) AS dst "
             f"FROM {table}, range(1, {n_out + 1}) j")
    nodes = f"SELECT doc_id AS v FROM {table}"
    return kcore_sql_over(edges, nodes, k=k, rounds=rounds)


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (Adamic & Adar 2003): score non-adjacent
# node pairs by Σ over common neighbors x of 1/ln(deg(x)) — rare shared
# neighbors predict links, hubs barely count.
# ---------------------------------------------------------------------------


def adamic_adar(edges, k: int = 20, n_buckets: int = 32,
                max_degree: int = 4096):
    """→ Dataset (y, z, aa_q): the top-``k`` NON-adjacent undirected
    node pairs by Adamic-Adar affinity, ties broken (aa_q DESC, y, z).

    Cross-engine exactness: each center node's contribution is quantized
    ONCE as floor(1e9 / ln(deg)) — one libm ``ln`` plus one IEEE division
    over exact ints (the doc_perplexity contract) — so per-pair scores
    are order-free int64 sums and both engines land on identical values.
    deg >= 2 is structural (a center needs two neighbors to form a wedge),
    so ln never sees 1.

    Shape = triangle_support's machinery with the closing join INVERTED:
    canonical dedup via :func:`symmetrize_edges` (materialized — the
    symmetric table feeds both the wedge explode and the edge tag, and a
    lazy Dataset would re-execute lineage per consumer) → node-bucket
    wedge explode where every wedge row carries its center's quantized
    term (a node's FULL neighbor set colocates in its bucket, so deg is
    a local decision; degrees past ``max_degree`` raise LOUDLY — the
    star-guard contract) → pair-bucket tagged union against the edge
    set keeps pairs with NO edge, sums terms, and prunes to per-bucket
    top-k under the merge's FULL (aa_q DESC, y, z) order (each pair
    lives in exactly one bucket, so the global top-k is inside the
    union of bucket top-k) → ONE output-sized repartition(1) merge."""
    import pandas as pd

    sym = symmetrize_edges(edges, n_buckets=n_buckets)

    def adj_bucket(t: pa.Table) -> pa.Table:
        x = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"x": pa.array(x), "n": pa.array(n),
                         "b": pa.array((x % n_buckets).astype(np.int32))})

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        out_y, out_z, out_q = [], [], []
        for x, g in df.groupby("x", sort=False):
            nb = np.unique(g["n"].to_numpy(np.int64))
            if nb.size > max_degree:
                raise ValueError(f"node {x} degree {nb.size} exceeds "
                                 f"max_degree={max_degree}")
            if nb.size < 2:
                continue
            q = np.int64(np.floor(1000000000.0 / np.log(float(nb.size))))
            iy, iz = np.triu_indices(nb.size, k=1)
            out_y.append(nb[iy])
            out_z.append(nb[iz])
            out_q.append(np.full(iy.size, q, np.int64))
        if not out_y:
            return pd.DataFrame({"y": np.empty(0, np.int64),
                                 "z": np.empty(0, np.int64),
                                 "q": np.empty(0, np.int64),
                                 "pb": np.empty(0, np.int32)})
        y = np.concatenate(out_y)
        z = np.concatenate(out_z)
        return pd.DataFrame({"y": y, "z": z, "q": np.concatenate(out_q),
                             "pb": ((y * 31 + z) % n_buckets)
                             .astype(np.int32)})

    W = sym.map_batches(adj_bucket, batch_format="pyarrow",
                        batch_size=None) \
        .groupby("b").map_groups(wedges, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")

    def tag_edge(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s < d  # the symmetric table holds both directions once
        u, v = s[keep], d[keep]
        return pa.table({"y": pa.array(u), "z": pa.array(v),
                         "q": pa.array(np.zeros(u.size, np.int64)),
                         "is_edge": pa.array(np.ones(u.size, np.bool_)),
                         "pb": pa.array(((u * 31 + v) % n_buckets)
                                        .astype(np.int32))})

    def tag_wedge(t: pa.Table) -> pa.Table:
        return pa.table({"y": t.column("y"), "z": t.column("z"),
                         "q": t.column("q"),
                         "is_edge": pa.array(np.zeros(len(t), np.bool_)),
                         "pb": t.column("pb")})

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        ed = df[df["is_edge"]]
        wg = df[~df["is_edge"]]
        if not len(wg):
            return pd.DataFrame({"y": np.empty(0, np.int64),
                                 "z": np.empty(0, np.int64),
                                 "aa_q": np.empty(0, np.int64)})
        sc = wg.groupby(["y", "z"], sort=False)["q"].sum().reset_index()
        edge_keys = set(zip(ed["y"].to_numpy(np.int64),
                            ed["z"].to_numpy(np.int64)))
        mask = [(yy, zz) not in edge_keys
                for yy, zz in zip(sc["y"].to_numpy(np.int64),
                                  sc["z"].to_numpy(np.int64))]
        sc = sc[np.asarray(mask, bool)]
        sc = sc.sort_values(["q", "y", "z"],
                            ascending=[False, True, True], kind="stable")
        return sc.head(k).rename(columns={"q": "aa_q"})

    cands = sym.map_batches(tag_edge, batch_format="pyarrow",
                            batch_size=None) \
        .union(W.map_batches(tag_wedge, batch_format="pyarrow",
                             batch_size=None)) \
        .groupby("pb").map_groups(score_topk, batch_format="pandas")

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811 (merge runs remotely)
        df = t.to_pandas().sort_values(["aa_q", "y", "z"],
                                       ascending=[False, True, True],
                                       kind="stable").head(k)
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)

    return cands.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


def adamic_adar_mod(ds, n_nodes: int, k: int = 20, n_out: int = 3):
    """Driver shape: top-k predicted links over the quadratic synth
    graph (the triangles_mod graph — its hub structure gives wedge-rich
    non-edges with distinct scores)."""
    return adamic_adar(synth_edges(ds, n_nodes, n_out=n_out), k=k)


def adamic_adar_sql(k: int = 20, n_out: int = 3,
                    table: str = "documents") -> str:
    """DuckDB twin: same synth edges, canonical undirected dedup,
    degree table, wedge self-join carrying the identical
    floor(1e9/ln(deg)) quantized term, NOT EXISTS edge filter, same
    (aa_q DESC, y, z) top-k order."""
    return (
        f"WITH n AS (SELECT COUNT(*) AS c FROM {table}), "
        f"e0 AS (SELECT DISTINCT doc_id AS src, "
        f"(doc_id * doc_id * 7 + j.range * 13) % n.c AS dst "
        f"FROM {table}, n, range(1, {n_out + 1}) j), "
        "ed AS (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM e0 WHERE src != dst), "
        "adj AS (SELECT u AS x, v AS nb FROM ed "
        "UNION ALL SELECT v AS x, u AS nb FROM ed), "
        "deg AS (SELECT x, COUNT(*) AS d FROM adj GROUP BY x), "
        "wedge AS (SELECT a.nb AS y, b.nb AS z, "
        "CAST(floor(1000000000.0 / ln(CAST(dg.d AS DOUBLE))) AS BIGINT) "
        "AS q FROM adj a JOIN adj b ON b.x = a.x AND a.nb < b.nb "
        "JOIN deg dg ON dg.x = a.x), "
        "sc AS (SELECT y, z, CAST(SUM(q) AS BIGINT) AS aa_q FROM wedge "
        "GROUP BY 1, 2), "
        "ne AS (SELECT sc.y, sc.z, sc.aa_q FROM sc WHERE NOT EXISTS "
        "(SELECT 1 FROM ed WHERE ed.u = sc.y AND ed.v = sc.z)) "
        f"SELECT y, z, aa_q FROM ne ORDER BY aa_q DESC, y, z LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# Dense bounded-universe fast paths
#
# The bucketed `pagerank` / `hits` above are the honest unbounded-graph
# layouts (ranks are corpus-sized, nothing broadcasts) — but every
# per-iteration message-passing step pays TWO groupby barriers, and on a
# node-bounded graph (host graphs: the universe 0..n_hosts-1 is a
# declared parameter) that orchestration dominates the wall by 5-10x.
# When the rank vector fits a worker heap (8 * n_nodes bytes — a
# 10^8-host graph is 800 MB, the same broadcast bound the kNN/segment
# joins document), the scale-correct layout is: ranks live in ONE int64
# vector broadcast per iteration via ray.put (read zero-copy in every
# task), each iteration is ONE streaming edge pass emitting per-block
# int64 partial vectors (order-free adds -> bit-identical to the
# bucketed sums), merged in a single output-sized repartition(1) task.
# Byte-identity with the bucketed twins is asserted in tests
# (TestDenseIdentity) — the per-edge term expressions are copied
# verbatim, so the registered SQL oracles hold unchanged.
# ---------------------------------------------------------------------------


def _check_ids(src: np.ndarray, dst: np.ndarray, n_nodes: int,
               who: str) -> None:
    if src.size and (src.min() < 0 or src.max() >= n_nodes
                     or dst.min() < 0 or dst.max() >= n_nodes):
        raise ValueError(
            f"{who}: node id outside [0, {n_nodes}) — the dense path "
            "requires a contiguous bounded universe; use the bucketed "
            "variant for arbitrary ids")


def _sum_parts(t: pa.Table) -> pa.Table:
    """Merge per-block partial vectors (one large_binary row each) into
    one row — the single output-sized merge task."""
    tot = None
    for buf in t.column("part").to_pylist():
        v = np.frombuffer(buf, np.int64)
        tot = v.copy() if tot is None else tot + v
    return pa.table({"part": pa.array([tot.tobytes()], pa.large_binary())})


def _dense_pass(edges, fn, n_nodes: int) -> np.ndarray:
    """ONE edge pass -> summed int64 vector on the driver (n_nodes
    ints — node-bounded traffic, never edge-bounded)."""
    parts = edges.map_batches(fn, batch_format="pyarrow",
                              batch_size=None)
    rows = parts.repartition(1).map_batches(
        _sum_parts, batch_format="pyarrow", batch_size=None).take_all()
    if not rows:   # every edge block empty (UDFs skip empty blocks)
        return np.zeros(n_nodes, np.int64)
    return np.frombuffer(rows[0]["part"], np.int64).copy()


def pagerank_dense(edges, n_nodes: int, n_iters: int = 3,
                   damping: float = 0.85, seeds=None):
    """Bounded-universe PageRank -> Dataset (v, rank_q9), bit-identical
    to ``pagerank`` over nodes 0..n_nodes-1 (same r0/base/term/floor
    expressions, integer sums are order-free). Handles the optional
    (w, wsum) weighted-edge columns exactly like ``pagerank``.
    ``seeds`` switches to PERSONALIZED PageRank: the teleport vector
    concentrates on the seed set (r0 and the per-iteration restart mass
    are floor(QUANT/|S|)-grid values on seeds, zero elsewhere); the
    per-edge term expression is unchanged, so the unrolled SQL twin
    differs only in its base/r0 CASE."""
    import ray

    edges = edges.materialize()
    if edges.num_blocks() > 8:
        edges = edges.repartition(8).materialize()
    weighted = "w" in edges.schema().names
    n = int(n_nodes)
    if seeds is None:
        r0v = np.full(n, int(np.floor(QUANT / n + 0.5)), np.int64)
        basev = np.full(n, int(np.floor((1.0 - damping) * QUANT / n
                                        + 0.5)), np.int64)
    else:
        # PERSONALIZED teleport: rank mass starts at (and returns to)
        # the seed set only — topic-sensitive PageRank (Haveliwala 2002)
        sd = np.asarray(sorted(set(int(v) for v in seeds)), np.int64)
        if sd.size == 0 or sd.min() < 0 or sd.max() >= n:
            raise ValueError("pagerank_dense: seeds must be a non-empty "
                             f"subset of [0, {n})")
        ns = int(sd.size)
        r0v = np.zeros(n, np.int64)
        r0v[sd] = int(np.floor(QUANT / ns + 0.5))
        basev = np.zeros(n, np.int64)
        basev[sd] = int(np.floor((1.0 - damping) * QUANT / ns + 0.5))

    def terms_fn(ref):
        def fn(t: pa.Table) -> pa.Table:
            tune_allocator()
            r = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dst = t.column("dst").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            _check_ids(src, dst, n, "pagerank_dense")
            val = t.column("wsum" if weighted else "deg") \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            w = (t.column("w").to_numpy(zero_copy_only=False)
                 .astype(np.float64) if weighted
                 else np.ones(src.size, np.float64))
            # the exact join_terms expression: ((d * rq) * w) / val
            tq = np.floor(damping * r[src].astype(np.float64) * w / val
                          + 0.5).astype(np.int64)
            part = np.zeros(n, np.int64)
            np.add.at(part, dst, tq)
            return pa.table({"part": pa.array([part.tobytes()],
                                              pa.large_binary())})
        return fn

    ranks = r0v.copy()
    for _ in range(max(0, n_iters)):
        ref = ray.put(ranks)
        ranks = _dense_pass(edges, terms_fn(ref), n) + basev

    import ray.data as rd
    return rd.from_arrow(pa.table({
        "v": pa.array(np.arange(n, dtype=np.int64)),
        "rank_q9": pa.array(ranks)}))


def random_walks_dense(edges, n_nodes: int, n_steps: int = 3,
                       seed: str = "walk", n_buckets: int = 32):
    """Bounded-universe deterministic hash walks → Dataset (walk, step,
    node), bit-identical to ``random_walks`` over nodes 0..n_nodes-1.

    The key observation: the next hop from node u at step t is a pure
    function next_t(u) = argmin over out-edges (u, w) of
    (md5('{seed}:{t}:{u}:{w}'), w) — INDEPENDENT of which walks sit at
    u. So each step is ONE streaming edge pass emitting per-block
    (min-hash, arg-w) composite partials for EVERY node (a superset of
    the occupied frontier — harmless), min-merged in a single task; the
    position vector advances on the driver (pos' = next_t[pos], sinks
    stop). n_steps edge passes total, zero per-step shuffles."""
    import ray
    import ray.data as rd

    from ._mdhash import hash_u64

    n = int(n_nodes)
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.num_blocks() > 8:
        edges = edges.repartition(8).materialize()
    INF = np.uint64(0xFFFFFFFFFFFFFFFF)

    def step_fn(t):
        def fn(tab: pa.Table) -> pa.Table:
            tune_allocator()
            src = tab.column("src").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dst = tab.column("dst").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            _check_ids(src, dst, n, "random_walks_dense")
            h = np.fromiter(
                (hash_u64(f"{seed}:{t}:{u}:{w}")
                 for u, w in zip(src, dst)), np.uint64, count=src.size)
            order = np.lexsort((dst, h, src))
            so = src[order]
            first = np.ones(so.shape[0], bool)
            first[1:] = so[1:] != so[:-1]
            hmin = np.full(n, INF, np.uint64)
            wmin = np.full(n, -1, np.int64)
            hmin[so[first]] = h[order][first]
            wmin[so[first]] = dst[order][first]
            blob = np.concatenate([hmin.view(np.int64), wmin]).tobytes()
            return pa.table({"part": pa.array([blob], pa.large_binary())})
        return fn

    def min_merge(tab: pa.Table) -> tuple:
        rows = tab.column("part").to_pylist()
        hm = np.full(n, INF, np.uint64)
        wm = np.full(n, -1, np.int64)
        for buf in rows:
            v = np.frombuffer(buf, np.int64)
            h2 = v[:n].view(np.uint64)
            w2 = v[n:]
            take = (h2 < hm) | ((h2 == hm) & (w2 >= 0) & (w2 < wm))
            hm = np.where(take, h2, hm)
            wm = np.where(take, w2, wm)
        return hm, wm

    out_walk = [np.arange(n, dtype=np.int64)]
    out_step = [np.zeros(n, np.int64)]
    out_node = [np.arange(n, dtype=np.int64)]
    pos = np.arange(n, dtype=np.int64)
    alive = np.ones(n, bool)
    for t in range(1, max(0, n_steps) + 1):
        if not alive.any():
            break
        parts = edges.map_batches(step_fn(t), batch_format="pyarrow",
                                  batch_size=None)
        rows = parts.repartition(1).map_batches(
            lambda tb: tb, batch_format="pyarrow").take_all()
        tab = pa.table({"part": pa.array([r["part"] for r in rows],
                                         pa.large_binary())})
        _, nxt = min_merge(tab)
        np_next = nxt[pos]
        step_alive = alive & (np_next >= 0)
        pos = np.where(step_alive, np_next, pos)
        alive = step_alive
        idx = np.flatnonzero(step_alive)
        out_walk.append(idx)
        out_step.append(np.full(idx.size, t, np.int64))
        out_node.append(pos[idx])

    return rd.from_arrow(pa.table({
        "walk": pa.array(np.concatenate(out_walk)),
        "step": pa.array(np.concatenate(out_step)),
        "node": pa.array(np.concatenate(out_node))}))


def label_prop_dense(edges, n_nodes: int, n_iters: int = 3,
                     n_buckets: int = 8):
    """Bounded-universe label propagation → Dataset (v, community),
    bit-identical to ``label_prop`` over nodes 0..n_nodes-1: labels live
    in ONE int64 vector broadcast per iteration (ray.put), each
    iteration is ONE streaming pass over the symmetrized edges emitting
    per-block dense (node × label) int64 vote-count matrices (order-free
    adds), merged in a single task; the winner rule (count DESC, label
    ASC) is np.argmax's first-max over ascending label columns, and
    zero-vote nodes keep their label. Guarded to universes where the
    dense matrix is small (n² ≤ 8M cells ≈ 64 MB) — beyond that, use
    the bucketed ``label_prop``."""
    import ray
    import ray.data as rd

    n = int(n_nodes)
    if n * n > 8_000_000:
        raise ValueError(
            f"label_prop_dense: {n}x{n} vote matrix too large — use the "
            "bucketed label_prop for unbounded universes")
    sym = symmetrize_edges(edges, n_buckets)
    if sym.num_blocks() > 8:
        sym = sym.repartition(8).materialize()

    def terms_fn(ref):
        def fn(t: pa.Table) -> pa.Table:
            tune_allocator()
            lbl = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dst = t.column("dst").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            _check_ids(src, dst, n, "label_prop_dense")
            part = np.zeros(n * n, np.int64)
            np.add.at(part, dst * n + lbl[src], 1)
            return pa.table({"part": pa.array([part.tobytes()],
                                              pa.large_binary())})
        return fn

    labels = np.arange(n, dtype=np.int64)
    for _ in range(max(0, n_iters)):
        votes = _dense_pass(sym, terms_fn(ray.put(labels)),
                            n * n).reshape(n, n)
        tot = votes.sum(axis=1)
        win = np.argmax(votes, axis=1).astype(np.int64)
        labels = np.where(tot > 0, win, labels)

    return rd.from_arrow(pa.table({
        "v": pa.array(np.arange(n, dtype=np.int64)),
        "community": pa.array(labels)}))


def kcore_dense(edges, n_nodes: int, k: int = 2, rounds: int = 3,
                n_buckets: int = 8):
    """Bounded-universe bulk-synchronous k-core peel → Dataset (v, deg),
    bit-identical to ``kcore_peel`` over nodes 0..n_nodes-1: the alive
    set lives in ONE uint8 vector broadcast per round; each round is
    ONE streaming edge pass summing per-block alive-degree vectors
    (an edge counts iff BOTH endpoints are alive — exactly the
    edge-dropping semantics, since dying is monotone), then the dying
    set updates on the driver. rounds+1 edge passes total, node-bounded
    traffic, no per-round shuffles."""
    import ray
    import ray.data as rd

    n = int(n_nodes)
    sym = symmetrize_edges(edges, n_buckets)
    if sym.num_blocks() > 8:
        sym = sym.repartition(8).materialize()

    def deg_fn(ref):
        def fn(t: pa.Table) -> pa.Table:
            tune_allocator()
            alive = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dst = t.column("dst").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            _check_ids(src, dst, n, "kcore_dense")
            m = (alive[src] != 0) & (alive[dst] != 0)
            part = np.zeros(n, np.int64)
            np.add.at(part, src[m], 1)
            return pa.table({"part": pa.array([part.tobytes()],
                                              pa.large_binary())})
        return fn

    alive = np.ones(n, np.uint8)
    for _ in range(max(0, rounds)):
        deg = _dense_pass(sym, deg_fn(ray.put(alive)), n)
        die = (alive != 0) & (deg < k)
        alive[die] = 0
    deg = _dense_pass(sym, deg_fn(ray.put(alive)), n)
    keep = deg >= 1   # == srcs of the surviving symmetric edge table
    return rd.from_arrow(pa.table({
        "v": pa.array(np.flatnonzero(keep).astype(np.int64)),
        "deg": pa.array(deg[keep])}))


def hits_dense(edges, n_nodes: int, n_iters: int = 2):
    """Bounded-universe HITS -> Dataset (v, auth_q9, hub_q9),
    bit-identical to ``hits`` over nodes 0..n_nodes-1: per half-step
    ONE edge pass sums the key-side rank into the other side
    (integer adds), T = vector sum on the driver, normalization is the
    identical floor(s * 1e9 / max(T, 1) + 0.5) IEEE expression."""
    import ray

    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.num_blocks() > 8:
        edges = edges.repartition(8).materialize()
    n = int(n_nodes)

    def terms_fn(ref, key: str):
        other = "dst" if key == "src" else "src"

        def fn(t: pa.Table) -> pa.Table:
            tune_allocator()
            r = ray.get(ref)
            k = t.column(key).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            o = t.column(other).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            _check_ids(k, o, n, "hits_dense")
            part = np.zeros(n, np.int64)
            np.add.at(part, o, r[k])
            return pa.table({"part": pa.array([part.tobytes()],
                                              pa.large_binary())})
        return fn

    def half(rvec: np.ndarray, key: str) -> np.ndarray:
        s = _dense_pass(edges, terms_fn(ray.put(rvec), key), n)
        T = max(int(s.sum()), 1)
        return np.floor(s.astype(np.float64) * QUANT / np.float64(T)
                        + 0.5).astype(np.int64)

    h = np.ones(n, np.int64)
    a = None
    for _ in range(max(1, n_iters)):
        a = half(h, "src")   # authorities from hubs
        h = half(a, "dst")   # hubs from authorities

    import ray.data as rd
    return rd.from_arrow(pa.table({
        "v": pa.array(np.arange(n, dtype=np.int64)),
        "auth_q9": pa.array(a), "hub_q9": pa.array(h)}))
