"""IVF-PQ — the composed FAISS-style ANN architecture (Jegou et al.
2011): a coarse IVF partition prunes WHICH vectors a query touches
(file-level skip of unprobed partitions, the build_ivf_index contract)
and product quantization prunes HOW MUCH is read per touched vector
(M int8-sized codes instead of the 4D-byte embedding). The persisted
index stores ONLY (vec_id, centroid_id, M code columns) — the
embedding column never leaves the build pass.

Exactness: coarse assignment is ann.assign_centroids' semantics
verbatim (plain-quantized grid, exact-int dot / float centroid norm,
ties → min cid); PQ codes are pq._encode_mat's semantics verbatim
(unit grid, int64 L2² argmin, ties → min code); ADC distances are
int64 sums of int64 LUT entries. The SQL twin concatenates the two
proven CTE families (renamed to coexist in one WITH) and reproduces
every stage bit-for-bit.

Scale shape: build = ONE corpus pass (assign + encode fused in one
map_batches) + the partitioned write; query = file-pruned read of the
probed partitions only, per-batch top-k prune under the FULL
(dist, vec_id) total order (the boundary-tie lesson), ONE output-sized
merge task."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vtzero_ray.runtime import tune_allocator

from .ann import (QSCALE, _merge_int_topk_single, _query_probes,
                  load_centroids, load_ivf_centroids,
                  load_queries_quantized, quantize)
from .pq import _encode_mat, load_pq_codebooks, load_queries_unit
from .pq import quantize_unit


def build_ivfpq_index(ds, out_dir: str, sf_dir: str,
                      n_centroids: int = 16, n_sub: int = 4,
                      n_codes: int = 16, train_iters: int = 0,
                      pq_train_iters: int = 0,
                      train_sample_mod: int = 1) -> str:
    """Build the persisted IVF-PQ index: one fused assign+encode corpus
    pass → parquet partitioned by coarse centroid, rows are
    (vec_id, centroid_id, code_0..code_{M-1}); centroids, codebooks and
    params land in meta files; atomic temp-dir + rename publish with
    centroids.parquet written LAST (presence implies completeness —
    the build_ivf_index contract).

    ``train_iters`` / ``pq_train_iters`` train the coarse centroids
    (ann.train_centroids) and the PQ codebooks (pq.train_pq_codebooks)
    before the build — queries read BOTH quantizers back from the index
    files, so topk_ivfpq serves trained indexes with no code change.
    Defaults stay first-N (the SQL-expressible driver twin)."""
    import os
    import shutil

    import ray
    import pyarrow.parquet as pq_

    from .ann import train_centroids
    from .pq import train_pq_codebooks

    if train_iters > 0:
        cids, cmat = train_centroids(
            ds, n_centroids, n_iters=train_iters,
            seed_centroids=load_centroids(sf_dir, n_centroids),
            sample_mod=train_sample_mod)
    else:
        cids, cmat = load_centroids(sf_dir, n_centroids)
    if pq_train_iters > 0:
        cb = train_pq_codebooks(ds, sf_dir, n_sub=n_sub, n_codes=n_codes,
                                n_iters=pq_train_iters,
                                sample_mod=train_sample_mod)
    else:
        cb = load_pq_codebooks(sf_dir, n_sub, n_codes)
    bref = ray.put((cids, cmat, cb))

    def assign_encode(batch: pa.Table) -> pa.Table:
        tune_allocator()
        cids_, cmat_, cb_ = ray.get(bref)
        ids = batch.column("vec_id").to_numpy()
        if len(batch) == 0:
            cols = {"vec_id": pa.array([], pa.int64()),
                    "centroid_id": pa.array([], pa.int64()),
                    "cpart": pa.array([], pa.int64())}
            for m in range(cb_.shape[1]):
                cols[f"code_{m}"] = pa.array([], pa.int64())
            return pa.table(cols)
        raw = np.stack(batch.column("embedding")
                       .to_numpy(zero_copy_only=False))
        # coarse assignment: assign_centroids semantics verbatim
        mat = quantize(raw)
        cnorm = np.sqrt((cmat_ * cmat_).sum(axis=1).astype(np.float64))
        sim = (cmat_ @ mat.T).astype(np.float64) / cnorm[:, None]
        cent = cids_[np.argmax(sim, axis=0)]
        # PQ codes: pq.pq_codes semantics verbatim (unit grid)
        codes = _encode_mat(quantize_unit(raw), cb_)
        cols = {"vec_id": pa.array(ids, pa.int64()),
                "centroid_id": pa.array(cent, pa.int64()),
                "cpart": pa.array(cent, pa.int64())}
        for m in range(cb_.shape[1]):
            cols[f"code_{m}"] = pa.array(codes[:, m].astype(np.int64))
        return pa.table(cols)

    indexed = ds.map_batches(assign_encode, batch_format="pyarrow",
                             batch_size=4096)
    out_dir = os.path.normpath(out_dir)
    tmp_dir = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    try:
        indexed.write_parquet(f"{tmp_dir}/corpus", partition_cols=["cpart"])
        pq_.write_table(pa.table({
            "code": pa.array(range(cb.shape[0]), pa.int64()),
            "codebook": pa.array([[int(v) for v in row.ravel()]
                                  for row in cb], pa.list_(pa.int64())),
        }), f"{tmp_dir}/codebooks.parquet")
        pq_.write_table(pa.table({
            "centroid_id": pa.array(cids, pa.int64()),
            "centroid": pa.array([[int(v) for v in row] for row in cmat],
                                 pa.list_(pa.int64())),
        }), f"{tmp_dir}/centroids.parquet")  # LAST: completeness marker
        try:
            os.rename(tmp_dir, out_dir)
        except OSError:
            if not os.path.isfile(f"{out_dir}/centroids.parquet"):
                raise
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def extend_ivfpq_index(index_dir: str, new_ds) -> str:
    """Incremental IVF-PQ extension (extend_ivf_index for the
    codes-only layout): the new shard assigns + encodes with the
    STORED quantizers (read back from the index files — trained or
    first-N alike), publishes as one atomic ``extend-N`` rename; reads
    union generations with the same partition pruning."""
    import os
    import shutil

    import ray

    from .ann import _extension_dirs, load_ivf_centroids

    cids, cmat = load_ivf_centroids(index_dir)
    flat_cb = _load_codebooks(index_dir)
    # recover (K, M, dsub) — n_sub from the base corpus schema
    import glob

    import pyarrow.parquet as pq_

    sample = sorted(glob.glob(f"{index_dir}/corpus/cpart=*/*.parquet"))[0]
    n_sub = sum(1 for c in pq_.read_schema(sample).names
                if c.startswith("code_"))
    cb = flat_cb.reshape(flat_cb.shape[0], n_sub, -1)
    bref = ray.put((cids, cmat, cb))

    def assign_encode(batch: pa.Table) -> pa.Table:
        tune_allocator()
        cids_, cmat_, cb_ = ray.get(bref)
        ids = batch.column("vec_id").to_numpy()
        cols = {"vec_id": pa.array([], pa.int64()),
                "centroid_id": pa.array([], pa.int64()),
                "cpart": pa.array([], pa.int64())}
        if len(batch) == 0:
            for m in range(cb_.shape[1]):
                cols[f"code_{m}"] = pa.array([], pa.int64())
            return pa.table(cols)
        raw = np.stack(batch.column("embedding")
                       .to_numpy(zero_copy_only=False))
        mat = quantize(raw)
        cnorm = np.sqrt((cmat_ * cmat_).sum(axis=1).astype(np.float64))
        sim = (cmat_ @ mat.T).astype(np.float64) / cnorm[:, None]
        cent = cids_[np.argmax(sim, axis=0)]
        codes = _encode_mat(quantize_unit(raw), cb_)
        cols = {"vec_id": pa.array(ids, pa.int64()),
                "centroid_id": pa.array(cent, pa.int64()),
                "cpart": pa.array(cent, pa.int64())}
        for m in range(cb_.shape[1]):
            cols[f"code_{m}"] = pa.array(codes[:, m].astype(np.int64))
        return pa.table(cols)

    indexed = new_ds.map_batches(assign_encode, batch_format="pyarrow",
                                 batch_size=4096)
    n = len(_extension_dirs(index_dir))
    tmp = os.path.join(index_dir, f".extend-{n}.building.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        indexed.write_parquet(tmp, partition_cols=["cpart"])
        final = os.path.join(index_dir, f"extend-{n}")
        os.rename(tmp, final)
        return final
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _load_codebooks(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{index_dir}/codebooks.parquet").to_pandas() \
        .sort_values("code")
    flat = np.stack(t["codebook"].to_numpy())
    # layout written as (n_sub, dsub) raveled per code
    n_codes = flat.shape[0]
    return flat.reshape(n_codes, -1)


def topk_ivfpq(index_dir: str, sf_dir: str, k: int = 5,
               n_queries: int = 10, nprobe: int = 4, n_sub: int = 4):
    """ADC search over the persisted IVF-PQ index: list ONLY probed
    partitions into read_parquet (unprobed buckets never leave
    storage), per-query int64 LUT over the stored codebooks, hit mask
    per query's own probe set, per-batch prune under the full
    (pq_dist, vec_id) order, single merge."""
    import glob

    import ray
    import ray.data as rd

    cids, cmat = load_ivf_centroids(index_dir)
    qids_plain, qmat_plain = load_queries_quantized(sf_dir, n_queries)
    probes = _query_probes(qmat_plain, qids_plain, cids, cmat, nprobe)
    probe_set = np.unique(probes)

    flat_cb = _load_codebooks(index_dir)
    n_codes = flat_cb.shape[0]
    dim = flat_cb.shape[1]
    dsub = dim // n_sub
    cb = flat_cb.reshape(n_codes, n_sub, dsub)
    qids, qmat_unit = load_queries_unit(sf_dir, n_queries)
    q_sub = qmat_unit.reshape(qmat_unit.shape[0], n_sub, dsub)
    lut = ((q_sub[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    qref = ray.put((qids, lut, probes))

    from .ann import _index_part_paths

    code_cols = [f"code_{m}" for m in range(n_sub)]
    paths = _index_part_paths(index_dir, probe_set)
    pruned = rd.read_parquet(paths, columns=["vec_id", "centroid_id",
                                             *code_cols])

    def search(batch: pa.Table) -> pa.Table:
        tune_allocator()
        q_ids, lut_, q_probes = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        cent = batch.column("centroid_id").to_numpy()
        codes = np.stack([batch.column(c).to_numpy()
                          for c in code_cols], axis=1)
        nq = q_ids.shape[0]
        dist = np.zeros((nq, ids.shape[0]), np.int64)
        for m in range(n_sub):
            dist += lut_[:, codes[:, m], m]
        hit = (q_probes[:, :, None] == cent[None, None, :]).any(axis=1)
        rows = []
        kk = min(k, ids.shape[0])
        for qi in range(nq):
            cand = np.flatnonzero(hit[qi])
            if cand.size == 0:
                continue
            # full (dist, vec_id) order — the boundary-tie lesson
            sel = cand[np.lexsort((ids[cand], dist[qi, cand]))[:kk]]
            rows.append((np.full(sel.size, q_ids[qi], np.int64),
                         ids[sel], dist[qi, sel]))
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "pq_dist": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate([r[0] for r in rows])),
            "vec_id": pa.array(np.concatenate([r[1] for r in rows])),
            "pq_dist": pa.array(np.concatenate([r[2] for r in rows])),
        })

    cand = pruned.map_batches(search, batch_format="pyarrow",
                              batch_size=4096)

    def merge_all(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        parts = []
        for _, g in df.groupby("query_id", sort=True):
            g = g.sort_values(["pq_dist", "vec_id"],
                              ascending=[True, True],
                              kind="stable").head(k).copy()
            g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
            parts.append(g)
        out = (pd.concat(parts, ignore_index=True) if parts
               else pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                  ("query_id", "vec_id", "pq_dist",
                                   "rank")}))
        return pa.Table.from_pandas(out, preserve_index=False)

    return cand.repartition(1).map_batches(merge_all,
                                           batch_format="pyarrow",
                                           batch_size=None)


def topk_ivfpq_refined(index_dir: str, sf_dir: str, k: int = 5,
                       n_queries: int = 10, nprobe: int = 4,
                       n_sub: int = 4, rerank: int = 20):
    """ADC-then-refine (the FAISS refine step): the PQ index proposes
    each query's top-``rerank`` candidates by compressed distance, then
    ONE pruned read of ONLY those vectors' full embeddings re-ranks
    them by the engine's exact integer cosine. Quality of exact search
    on the candidate pool at PQ's scan cost — the candidate read is
    vec_id-filtered inside the probed partitions... the embeddings live
    in the source parquet here (the codes-only index stores no
    vectors), so the refine read is a vec_id-pruned filter scan of the
    embedding table, candidate-pool-sized rows kept.

    Exactness: candidate pool = topk_ivfpq(k=rerank) (its oracle), and
    the re-rank is the exact-cosine expression every other vector op
    ranks by — so the SQL twin composes the two proven CTE families."""
    import ray
    import ray.data as rd

    from .ann import _merge_int_topk_single, _partial_topk_int

    pool = topk_ivfpq(index_dir, sf_dir, k=rerank, n_queries=n_queries,
                      nprobe=nprobe, n_sub=n_sub).to_pandas()
    # (query, candidate) pairs — output-sized (Q × rerank)
    qids, qmat = load_queries_quantized(sf_dir, n_queries)
    qpos = {int(v): i for i, v in enumerate(qids)}
    cand_ids = np.unique(pool["vec_id"].to_numpy(np.int64))
    # per-candidate query membership mask (Q × C) for the hit matrix
    pairs = pool[["query_id", "vec_id"]].to_numpy(np.int64)
    pref = ray.put((qids, qmat, np.sort(cand_ids), pairs))

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def rerank_batch(batch: pa.Table) -> pa.Table:
        tune_allocator()
        from .ann import _hit_pair_scores

        q_ids, q_mat, cids_sorted, prs = ray.get(pref)
        ids = batch.column("vec_id").to_numpy()
        pos = np.searchsorted(cids_sorted, ids)
        keep = (pos < cids_sorted.shape[0]) & (cids_sorted[np.minimum(
            pos, cids_sorted.shape[0] - 1)] == ids)
        batch = batch.filter(pa.array(keep))
        if len(batch) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "qdot": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column("vec_id").to_numpy()
        mat = quantize(np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False)))
        # hit[q, v] = (q, v) is in the PQ candidate pool
        hit = np.zeros((q_ids.shape[0], ids.shape[0]), bool)
        id_pos = {int(v): i for i, v in enumerate(ids)}
        for qv, vv in prs:
            j = id_pos.get(int(vv))
            if j is not None:
                hit[qpos[int(qv)], j] = True
        return _hit_pair_scores(ids, mat, q_ids, q_mat, hit)

    scored = emb.map_batches(rerank_batch, batch_format="pyarrow",
                             batch_size=4096)
    pruned = scored.map_batches(lambda t: _partial_topk_int(t, k),
                                batch_format="pyarrow", batch_size=None)
    return _merge_int_topk_single(pruned, k)


def topk_ivfpq_refined_sql(k: int = 5, n_queries: int = 10,
                           n_centroids: int = 16, nprobe: int = 4,
                           n_sub: int = 4, n_codes: int = 16,
                           dim: int = 64, rerank: int = 20) -> str:
    """DuckDB twin: the topk_ivfpq CTEs at k=rerank propose the pool;
    the exact-cosine expression (int dot / sqrt(int sumsq)) re-ranks."""
    base = topk_ivfpq_sql(k=rerank, n_queries=n_queries,
                          n_centroids=n_centroids, nprobe=nprobe,
                          n_sub=n_sub, n_codes=n_codes, dim=dim)
    tail = (f"SELECT query_id, vec_id, pq_dist, rank FROM ranked"
            f" WHERE rank <= {rerank} ORDER BY query_id, rank")
    assert base.endswith(tail)
    return base[:-len(tail)] + (
        f", pool AS (SELECT query_id, vec_id FROM ranked"
        f" WHERE rank <= {rerank}), "
        f"sumsq AS (SELECT vec_id, SUM(v * v) AS s2 FROM qp GROUP BY 1), "
        f"dots AS (SELECT p.query_id, p.vec_id,"
        f" CAST(SUM(qa.v * qb.v) AS BIGINT) AS qdot"
        f" FROM pool p JOIN qp qa ON qa.vec_id = p.query_id"
        f" JOIN qp qb ON qb.vec_id = p.vec_id AND qb.d = qa.d"
        f" GROUP BY 1, 2), "
        f"rranked AS (SELECT d.query_id, d.vec_id, d.qdot,"
        f" row_number() OVER (PARTITION BY d.query_id ORDER BY"
        f" (d.qdot::DOUBLE / sqrt(s.s2::DOUBLE)) DESC, d.vec_id) AS rank"
        f" FROM dots d JOIN sumsq s ON s.vec_id = d.vec_id) "
        f"SELECT query_id, vec_id, qdot, rank FROM rranked"
        f" WHERE rank <= {k} ORDER BY query_id, rank"
    )


def topk_ivfpq_sql(k: int = 5, n_queries: int = 10,
                   n_centroids: int = 16, nprobe: int = 4,
                   n_sub: int = 4, n_codes: int = 16,
                   dim: int = 64) -> str:
    """DuckDB oracle: the proven assignment CTEs (plain grid, renamed
    qp/…) + the proven PQ CTEs (unit grid) in one WITH; candidates =
    vectors whose centroid is in the query's nprobe set; ADC dist =
    int64 LUT sum; rank under (pq_dist, vec_id)."""
    dsub = dim // n_sub
    return (
        # --- plain-quantized components for coarse assignment ---
        f"WITH e AS (SELECT vec_id, embedding FROM embeddings), "
        f"comp0 AS (SELECT vec_id, unnest(embedding) AS x0,"
        f" unnest(generate_series(1, len(embedding))) AS d FROM e), "
        f"qp AS (SELECT vec_id, d,"
        f" CAST(floor(x0::DOUBLE * {QSCALE} + 0.5) AS BIGINT) AS v"
        f" FROM comp0), "
        f"cents AS (SELECT vec_id AS cid FROM e ORDER BY vec_id"
        f" LIMIT {n_centroids}), "
        f"cnorm AS (SELECT vec_id AS cid, sqrt(SUM(v * v)::DOUBLE) AS nrm"
        f" FROM qp WHERE vec_id IN (SELECT cid FROM cents) GROUP BY 1), "
        f"vdot AS (SELECT qv.vec_id, qc.vec_id AS cid,"
        f" SUM(qv.v * qc.v) AS dot FROM qp qv JOIN qp qc ON qc.d = qv.d"
        f" WHERE qc.vec_id IN (SELECT cid FROM cents) GROUP BY 1, 2), "
        f"assign AS (SELECT vec_id, cid FROM ("
        f"SELECT v.vec_id, v.cid, row_number() OVER (PARTITION BY v.vec_id"
        f" ORDER BY (v.dot::DOUBLE / n.nrm) DESC, v.cid) AS rn"
        f" FROM vdot v JOIN cnorm n ON n.cid = v.cid) WHERE rn = 1), "
        f"qv AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT {n_queries}), "
        f"probes AS (SELECT vec_id AS query_id, cid FROM ("
        f"SELECT v.vec_id, v.cid, row_number() OVER (PARTITION BY v.vec_id"
        f" ORDER BY (v.dot::DOUBLE / n.nrm) DESC, v.cid) AS rn"
        f" FROM vdot v JOIN cnorm n ON n.cid = v.cid"
        f" WHERE v.vec_id IN (SELECT vec_id FROM qv)) WHERE rn <= {nprobe}), "
        # --- unit-grid components + PQ codebooks/encode (pq.py CTEs) ---
        f"nrm AS (SELECT vec_id, SUM(v * v) AS s2 FROM qp GROUP BY 1), "
        f"q AS (SELECT qp.vec_id, d,"
        f" CAST((d - 1) // {dsub} AS BIGINT) AS sub,"
        f" CASE WHEN n.s2 = 0 THEN 0 ELSE"
        f" CAST(floor((qp.v * {QSCALE})::DOUBLE / sqrt(n.s2::DOUBLE)"
        f" + 0.5) AS BIGINT) END AS v"
        f" FROM qp JOIN nrm n ON n.vec_id = qp.vec_id), "
        f"cvecs AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1"
        f" AS code FROM (SELECT DISTINCT vec_id FROM e"
        f" ORDER BY vec_id LIMIT {n_codes})), "
        f"cb AS (SELECT c.code, qq.sub, qq.d, qq.v FROM q qq"
        f" JOIN cvecs c ON c.vec_id = qq.vec_id), "
        f"d2 AS (SELECT qv2.vec_id, cb.sub, cb.code,"
        f" SUM((qv2.v - cb.v) * (qv2.v - cb.v)) AS dd"
        f" FROM q qv2 JOIN cb ON cb.d = qv2.d GROUP BY 1, 2, 3), "
        f"enc AS (SELECT vec_id, sub, code FROM ("
        f"SELECT vec_id, sub, code, row_number() OVER ("
        f"PARTITION BY vec_id, sub ORDER BY dd ASC, code ASC) AS rn"
        f" FROM d2) WHERE rn = 1), "
        f"lut AS (SELECT qq.vec_id AS query_id, cb.sub, cb.code,"
        f" SUM((qq.v - cb.v) * (qq.v - cb.v)) AS ld"
        f" FROM q qq JOIN cb ON cb.d = qq.d"
        f" WHERE qq.vec_id IN (SELECT vec_id FROM qv) GROUP BY 1, 2, 3), "
        # --- probe-pruned candidates + ADC (BIGINT cast: dtype lesson) ---
        f"cand AS (SELECT p.query_id, a.vec_id FROM probes p"
        f" JOIN assign a ON a.cid = p.cid), "
        f"dist AS (SELECT c.query_id, c.vec_id,"
        f" CAST(SUM(l.ld) AS BIGINT) AS pq_dist FROM cand c"
        f" JOIN enc ON enc.vec_id = c.vec_id"
        f" JOIN lut l ON l.query_id = c.query_id AND l.sub = enc.sub"
        f" AND l.code = enc.code GROUP BY 1, 2), "
        f"ranked AS (SELECT query_id, vec_id, pq_dist, row_number() OVER ("
        f"PARTITION BY query_id ORDER BY pq_dist ASC, vec_id ASC) AS rank"
        f" FROM dist) "
        f"SELECT query_id, vec_id, pq_dist, rank FROM ranked"
        f" WHERE rank <= {k} ORDER BY query_id, rank"
    )
