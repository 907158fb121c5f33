"""Approximate-nearest-neighbor search over an embedding column.

- ``topk_bruteforce``: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix (ray.put once, read per actor), partial top-k
  per batch, merged in a tiny final reduce. The baseline every ANN variant
  is verified against.
- ``topk_lsh``: random-hyperplane LSH-bucketed variant — candidates only
  from matching buckets (the scale path: bucket groupby instead of full
  cross product), exact re-rank within candidates.

Determinism: similarities are computed in float64 and rounded to 6
decimals; ranking is (rounded sim DESC, vec_id ASC) so results compare
exactly against the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._mdhash import hash_u64  # shared md5 hash (leaf; no dedup cycle)


def _normalized(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)


def load_queries(sf_dir: str, n_queries: int = 10):
    """Deterministic query set: the first n embeddings by vec_id."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    qids = df["vec_id"].to_numpy()
    qmat = _normalized(np.stack(df["embedding"].to_numpy()))
    return qids, qmat


class BatchTopK:
    """map_batches stage: partial top-k of each query against one batch."""

    def __init__(self, query_ref, k: int) -> None:
        import ray

        self.qids, self.qmat = ray.get(query_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        mat = _normalized(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        sims = np.round(self.qmat @ mat.T, 6)  # (Q, B)
        k = min(self.k, ids.shape[0])
        out_q, out_id, out_sim = [], [], []
        # partial top-k per query under the FULL (cosine DESC, vec_id
        # ASC) total order the merge uses — an argpartition on cosine
        # alone keeps an arbitrary subset when the k-th score ties
        # across vec_ids and can drop the tied smaller id before the
        # merge (the topk_pq sf0.1 lesson; round-6 scores tie readily)
        for qi in range(self.qids.shape[0]):
            cols = np.lexsort((ids, -sims[qi]))[:k]
            out_q.append(np.full(cols.shape[0], self.qids[qi], np.int64))
            out_id.append(ids[cols])
            out_sim.append(sims[qi, cols])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "cosine": pa.array(np.concatenate(out_sim), pa.float64()),
        })


def _merge_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable")
    out = df.head(k).copy()
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def topk_bruteforce(ds, sf_dir: str, k: int = 5, n_queries: int = 10):
    """Exact cosine top-k: broadcast queries, partial per-batch top-k,
    final per-query merge (a k*Q-row groupby — tiny)."""
    import ray

    qref = ray.put(load_queries(sf_dir, n_queries))

    # function UDF over the shared warm worker pool: ray.get(qref) is a
    # zero-copy shared-memory read per task (no per-query actor startup)
    def batch_topk(batch: pa.Table) -> pa.Table:
        return BatchTopK(qref, k)(batch)

    partial = ds.map_batches(batch_topk, batch_format="pyarrow",
                             batch_size=4096)

    # output-sized final merge: ONE repartition(1)+map_batches task, not
    # a groupby sort barrier (k * n_queries rows)
    def merge_all(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        parts = [_merge_topk(g, k)
                 for _, g in df.groupby("query_id", sort=True)]
        out = (pd.concat(parts, ignore_index=True) if parts
               else pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                  "vec_id": pd.Series([], dtype="int64"),
                                  "cosine": pd.Series([], dtype="float64"),
                                  "rank": pd.Series([], dtype="int64")}))
        return pa.Table.from_pandas(out, preserve_index=False)

    return partial.repartition(1).map_batches(merge_all,
                                              batch_format="pyarrow",
                                              batch_size=None)


QSCALE = 4096  # 12-bit quantization: every downstream compare is exact-int


def quantize(mat: np.ndarray) -> np.ndarray:
    """Element-wise integer quantization (floor(x*4096 + 0.5)) — only
    element-wise float ops, so numpy and DuckDB produce IDENTICAL ints."""
    return np.floor(mat.astype(np.float64) * QSCALE + 0.5).astype(np.int64)


def sign_tensor(n_tables: int, n_bits: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes from md5 (same formula as the SQL
    oracle: 1 - 2*(md5_number_lower('t:j:d') % 2), d is 1-based)."""

    s = np.empty((n_tables, n_bits, dim), np.int64)
    for t in range(n_tables):
        for j in range(n_bits):
            for d in range(dim):
                s[t, j, d] = 1 - 2 * (hash_u64(f"{t}:{j}:{d + 1}") % 2)
    return s


def _int_buckets(qmat: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """(N, dim) int matrix → (n_tables, N) bucket keys via exact integer
    hyperplane sign bits (scaling by the norm cannot change a sign)."""
    n_tables, n_bits, _ = signs.shape
    out = np.empty((n_tables, qmat.shape[0]), np.int64)
    for t in range(n_tables):
        bits = (qmat @ signs[t].T) > 0  # (N, n_bits) — exact int dots
        out[t] = (bits.astype(np.int64) << np.arange(n_bits, dtype=np.int64)).sum(axis=1)
    return out


def _int_probe_buckets(qmat: np.ndarray, signs: np.ndarray,
                       n_probes: int) -> np.ndarray:
    """Multi-probe bucket keys (Lv et al. 2007): (n_tables, n_probes, Q).
    Probe 0 is the exact bucket; probes 1..P−1 flip the query's
    LOWEST-|margin| hyperplane bits first (margin = exact integer dot
    with the hyperplane — the bits most likely to be on the wrong side
    of a near neighbor), deterministic tie-break on bit index."""
    n_tables, n_bits, _ = signs.shape
    if n_probes > n_bits + 1:
        raise ValueError("n_probes exceeds n_bits + 1 Hamming-1 probes")
    Q = qmat.shape[0]
    out = np.empty((n_tables, n_probes, Q), np.int64)
    bitvals = 1 << np.arange(n_bits, dtype=np.int64)
    for t in range(n_tables):
        marg = qmat @ signs[t].T                     # (Q, n_bits) int64
        base = ((marg > 0).astype(np.int64) * bitvals).sum(axis=1)
        out[t, 0] = base
        if n_probes > 1:
            # per query: bits ordered by (|margin| ASC, bit ASC) —
            # lexsort over the last axis, bit index breaks ties
            jmat = np.broadcast_to(np.arange(n_bits), (Q, n_bits))
            order = np.lexsort((jmat, np.abs(marg)))  # (Q, n_bits)
            flips = order[:, :n_probes - 1]           # (Q, P-1)
            out[t, 1:] = (base[:, None] ^ bitvals[flips]).T
    return out


def load_queries_quantized(sf_dir: str, n_queries: int = 10):
    """First n embeddings by vec_id, integer-quantized."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    qids = df["vec_id"].to_numpy()
    qmat = quantize(np.stack(df["embedding"].to_numpy()))
    return qids, qmat


def topk_lsh(ds, sf_dir: str, k: int = 5, n_queries: int = 10, n_bits: int = 8,
             n_tables: int = 4, n_probes: int = 1):
    """LSH-bucketed ANN over INTEGER-QUANTIZED embeddings: candidates share
    a bucket with the query in any of n_tables hash tables; re-rank by
    exact integer dot over the quantized vectors (score = qdot/sqrt(sumsq),
    deterministic float from exact ints → identical in the SQL oracle).

    ``n_probes > 1`` turns on multi-probe (Lv et al. 2007): each query
    additionally probes the Hamming-1 buckets of its lowest-|margin|
    hyperplane bits — recall rises at FIXED table count (no extra index
    storage or shuffle width; only probe fan-out grows).

    The bucket keys partition the corpus — at scale this becomes a
    groupby(bucket) co-partitioning instead of a broadcast (documented
    partitioning assumption: each (table, bucket) group fits a worker).
    """
    import ray

    qids, qmat = load_queries_quantized(sf_dir, n_queries)
    dim = qmat.shape[1]
    signs = sign_tensor(n_tables, n_bits, dim)
    qbuckets = _int_probe_buckets(qmat, signs, n_probes)  # (T, P, Q)
    qref = ray.put((qids, qmat, signs, qbuckets))

    def candidates(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, sgn, q_b = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        mat = quantize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        scores = lsh_candidate_scores(ids, mat, q_ids, q_mat, sgn, q_b)
        return _partial_topk_int(scores, k)

    cand = ds.map_batches(candidates, batch_format="pyarrow", batch_size=4096)
    return _merge_int_topk_single(cand, k)


def _hit_pair_scores(ids, mat, q_ids, q_mat, hit) -> pa.Table:
    """(query, vector) scores for the True cells of ``hit``. The dot
    products are computed ONLY over columns that hit at least one query
    (gather then matmul) — candidate pruning prunes COMPUTE too, not just
    output rows (at 100 TB an unmasked Q x B matmul is a disguised full
    scan)."""
    qi, ci = np.nonzero(hit)
    cols = np.unique(ci)                           # hit columns only
    sub = mat[cols]                                # (C', dim)
    qdot_sub = q_mat @ sub.T                       # exact int64, (Q, C')
    sumsq_sub = (sub * sub).sum(axis=1)            # exact int64
    pos = np.searchsorted(cols, ci)
    qdot = qdot_sub[qi, pos]
    score = qdot.astype(np.float64) / np.sqrt(sumsq_sub[pos].astype(np.float64))
    return pa.table({
        "query_id": pa.array(q_ids[qi], pa.int64()),
        "vec_id": pa.array(ids[ci], pa.int64()),
        "qdot": pa.array(qdot, pa.int64()),
        "score": pa.array(score, pa.float64()),
    })


def lsh_candidate_scores(ids, mat, q_ids, q_mat, sgn, q_b) -> pa.Table:
    """Bucket-hit candidate scoring for one batch (compute-pruned).
    ``q_b`` is (n_tables, Q) single-probe or (n_tables, n_probes, Q)
    multi-probe — a vector is a candidate when ANY probe hits it."""
    v_b = _int_buckets(mat, sgn)  # (n_tables, B)
    if q_b.ndim == 2:
        q_b = q_b[:, None, :]
    hit = np.zeros((q_ids.shape[0], ids.shape[0]), dtype=bool)
    for t in range(v_b.shape[0]):
        for p in range(q_b.shape[1]):
            hit |= q_b[t, p][:, None] == v_b[t][None, :]
    return _hit_pair_scores(ids, mat, q_ids, q_mat, hit)


def _merge_int_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-query top-k by (score DESC, vec_id ASC). score is ONE IEEE
    float64 expression over exact ints (qdot / sqrt(sumsq)) — bit-identical
    between numpy and DuckDB, so rank matches the SQL row_number exactly."""
    df = df.sort_values(["score", "vec_id"], ascending=[False, True],
                        kind="stable").head(k)
    out = df[["query_id", "vec_id", "qdot"]].copy()
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def _partial_topk_int(t: pa.Table, k: int) -> pa.Table:
    """Per-batch per-query top-k prune on a candidate-score table
    (query_id, vec_id, qdot, score): any global top-k row is in its
    batch's top-k under the SAME (score desc, vec_id asc) criterion, so
    pruning here cannot change the merged result — it only bounds what
    ships to the single merge task (k rows per query per batch)."""
    if len(t) == 0:
        return t
    q = t.column("query_id").to_numpy()
    v = t.column("vec_id").to_numpy()
    s = t.column("score").to_numpy()
    order = np.lexsort((v, -s, q))  # q asc, then score desc, vec_id asc
    qs = q[order]
    starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    sizes = np.diff(np.r_[starts, qs.size])
    rank_in_group = np.arange(qs.size) - np.repeat(starts, sizes)
    keep = np.sort(order[rank_in_group < k])
    return t.take(pa.array(keep))


def _merge_int_topk_single(cand, k: int):
    """Output-sized final merge as ONE repartition(1)+map_batches task
    (CLAUDE invariant: never a groupby sort barrier for a k*Q-row
    output). Emits (query_id asc, rank asc) deterministically — the same
    order the old groupby+sort produced."""
    def merge_all(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        parts = [_merge_int_topk(g, k)
                 for _, g in df.groupby("query_id", sort=True)]
        out = (pd.concat(parts, ignore_index=True) if parts
               else pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                  "vec_id": pd.Series([], dtype="int64"),
                                  "qdot": pd.Series([], dtype="int64"),
                                  "rank": pd.Series([], dtype="int64")}))
        return pa.Table.from_pandas(out, preserve_index=False)

    return cand.repartition(1).map_batches(merge_all, batch_format="pyarrow",
                                           batch_size=None)


def load_centroids(sf_dir: str, n_centroids: int = 16):
    """Deterministic IVF coarse centroids: the first n corpus vectors by
    vec_id, integer-quantized (a k-means seed without the iterations —
    deterministic and SQL-expressible; swap in trained centroids at scale)."""
    return load_queries_quantized(sf_dir, n_centroids)


def _seed_first_n(ds, n: int):
    """First n vectors by vec_id WITHOUT a full sort shuffle: per-batch
    partial top-n-smallest inside map_batches, tiny driver merge."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        ids = batch.column("vec_id").to_numpy()
        keep = np.argsort(ids, kind="stable")[:n]
        return batch.take(pa.array(np.sort(keep)))

    small = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    small = small.sort_values("vec_id").head(n)
    cids = small["vec_id"].to_numpy().astype(np.int64)
    cmat = quantize(np.stack(small["embedding"].to_numpy()))
    return cids, cmat


def train_centroids(ds, n_centroids: int = 16, n_iters: int = 4,
                    seed_centroids=None, sample_mod: int = 1):
    """Deterministic Lloyd k-means over integer-quantized embeddings,
    expressed as ``n_iters`` streaming Ray passes. Feeds
    ``build_ivf_index(train_iters=...)`` — trained centroids concentrate
    probes where the data is, so recall at fixed nprobe beats the
    first-N seed on skewed corpora (asserted in tests).

    Determinism (bit-exact regardless of block scheduling):
    - assignment uses the SAME exact-int cosine as ``assign_centroids``
      (int64 dot / float64 centroid norm; ties → smaller centroid id);
    - the update step sums int64 vectors per batch inside map_batches and
      combines the per-batch partials on the driver — integer addition is
      order-independent, unlike float sums;
    - the new centroid is a round-half-up integer division
      ``(2*s + c) // (2*c)``, so centroids stay on the int64 QSCALE grid
      and every later compare is exact;
    - an empty cluster keeps its previous centroid.

    The driver-side combine holds n_centroids rows per input block (tiny).
    Partial sums fit int64 at any realistic scale: |q| <= ~QSCALE so even
    10^12 rows sum to ~4e15 << 2^63.

    ``sample_mod > 1`` is the mini-batch/100-TB path: train on the
    deterministic subsample ``vec_id % sample_mod == 0``, materialized
    ONCE (size it to fit the cluster), so the n_iters passes re-read
    cached blocks instead of recomputing the full-corpus lineage each
    iteration. The full corpus is only ever touched by build_ivf_index's
    single assignment pass.
    """
    import ray

    if sample_mod > 1:
        def samp(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            return batch.filter(pa.array(ids % sample_mod == 0))

        ds = ds.map_batches(samp, batch_format="pyarrow",
                            batch_size=None).materialize()

    if seed_centroids is None:
        _, cmat = _seed_first_n(ds, n_centroids)
    else:
        _, cmat = seed_centroids
    # trained centroids are synthetic points: ids are their rank 0..C-1
    # (ascending, so argmax tie-break still prefers the smaller id)
    cids = np.arange(cmat.shape[0], dtype=np.int64)

    for _ in range(max(0, n_iters)):
        cref = ray.put((cids, cmat))

        def partial_sums(batch: pa.Table) -> pa.Table:
            c_ids, c_mat = ray.get(cref)
            if len(batch) == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.int64())),
                                 "cnt": pa.array([], pa.int64())})
            mat = quantize(np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)))
            cnorm = np.sqrt((c_mat * c_mat).sum(axis=1).astype(np.float64))
            sim = (c_mat @ mat.T).astype(np.float64) / np.clip(
                cnorm[:, None], 1e-12, None)
            best = np.argmax(sim, axis=0)  # first max → smaller cid
            out_c, out_s, out_n = [], [], []
            for ci in np.unique(best):
                sel = mat[best == ci]
                out_c.append(int(c_ids[ci]))
                out_s.append(sel.sum(axis=0, dtype=np.int64).tolist())
                out_n.append(sel.shape[0])
            return pa.table({"cid": pa.array(out_c, pa.int64()),
                             "vsum": pa.array(out_s, pa.list_(pa.int64())),
                             "cnt": pa.array(out_n, pa.int64())})

        parts = ds.map_batches(partial_sums, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        new = cmat.copy()
        for ci in range(cmat.shape[0]):
            rows = parts[parts.cid == ci]
            if not len(rows):
                continue  # empty cluster keeps its centroid
            s = np.sum(np.stack([np.asarray(v, np.int64) for v in rows.vsum]),
                       axis=0, dtype=np.int64)
            c = int(rows.cnt.sum())
            new[ci] = (2 * s + c) // (2 * c)  # round-half-up, stays on grid
        cmat = new
    return cids, cmat


def assign_centroids(ds, cents_ref):
    """IVF index build: tag every vector with its nearest coarse centroid
    (exact-int dot / centroid norm; ties → smaller centroid id). At scale
    this dataset is written partitioned by ``centroid_id`` once and reused
    by every query batch — the bucketed corpus IS the index."""
    import ray

    def assign(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(cents_ref)
        mat = quantize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))) \
            if len(batch) else np.empty((0, 1), np.int64)
        if len(batch) == 0:
            return batch.append_column("centroid_id", pa.array([], pa.int64()))
        cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
        sim = (cmat @ mat.T).astype(np.float64) / cnorm[:, None]  # (C, B)
        # argmax with ties → smaller centroid id: cids ascending, argmax
        # returns the first maximum
        best = np.argmax(sim, axis=0)
        return batch.append_column("centroid_id", pa.array(cids[best], pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)


def topk_ivf(ds, sf_dir: str, k: int = 5, n_queries: int = 10,
             n_centroids: int = 16, nprobe: int = 4):
    """IVF ANN: corpus bucketed by nearest coarse centroid (the index);
    each query probes only its ``nprobe`` nearest centroids' buckets and
    exact-re-ranks inside them — a partition-pruned scan of nprobe/C of
    the corpus instead of a full pass (the genuine scale path vs the
    broadcast-filter LSH variant). All arithmetic is exact-int dots with
    one float divide, so DuckDB reproduces results bit-for-bit."""
    import ray

    qids, qmat = load_queries_quantized(sf_dir, n_queries)
    cids, cmat = load_centroids(sf_dir, n_centroids)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
    qsim = (qmat @ cmat.T).astype(np.float64) / cnorm[None, :]  # (Q, C)
    # nprobe nearest centroids per query (sim desc, centroid id asc)
    order = np.lexsort((cids[None, :].repeat(qids.shape[0], 0), -qsim), axis=1)
    probes = cids[order[:, :nprobe]]  # (Q, nprobe)
    probe_set = np.unique(probes)
    qref = ray.put((qids, qmat, probes))

    indexed = assign_centroids(ds, ray.put((cids, cmat)))

    # partition pruning: only probed buckets are scanned at all (with the
    # index written partitioned by centroid_id, this is a file-level skip)
    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("centroid_id"),
                                 value_set=pa.array(probe_set)))

    pruned = indexed.map_batches(prune, batch_format="pyarrow")

    def search(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_probes = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        cent = batch.column("centroid_id").to_numpy()
        mat = quantize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        # query q sees row v iff v's centroid is among q's probes;
        # gather hit columns BEFORE the matmul (same as topk_ivf_indexed)
        hit = (q_probes[:, :, None] == cent[None, None, :]).any(axis=1)  # (Q, B)
        return _partial_topk_int(
            _hit_pair_scores(ids, mat, q_ids, q_mat, hit), k)

    cand = pruned.map_batches(search, batch_format="pyarrow", batch_size=4096)
    return _merge_int_topk_single(cand, k)


def build_ivf_index(ds, out_dir: str, sf_dir: str, n_centroids: int = 16,
                    train_iters: int = 0, train_sample_mod: int = 1) -> str:
    """Persist the IVF index: the corpus written as parquet PARTITIONED BY
    centroid_id (one directory per coarse bucket) plus a tiny centroid
    metadata file. Built ONCE and reused by every query run — at 100 TB
    the index build is the only full pass; queries after that read only
    the nprobe probed partitions (file-level skip, see topk_ivf_indexed).

    Layout: ``{out_dir}/corpus/cpart={cid}/*.parquet`` (centroid_id kept
    as a data column too, so explicit partition-dir reads need no hive
    inference) and ``{out_dir}/centroids.parquet``.

    ATOMIC: the index is built into a process-private temp dir and
    os.rename()d into place, so a crashed/interrupted build never leaves
    a partial dir that a later run would silently reuse, and two
    concurrent builders race harmlessly (the loser discards its copy —
    rename onto an existing dir fails and the winner's index is used).
    """
    import os
    import shutil

    import ray
    import pyarrow.parquet as pq

    if train_iters > 0:
        # k-means-trained centroids (deterministic; see train_centroids).
        # The first-N seed stays the default because it is SQL-expressible
        # — the driver oracle twin depends on it.
        cids, cmat = train_centroids(
            ds, n_centroids, n_iters=train_iters,
            seed_centroids=load_centroids(sf_dir, n_centroids),
            sample_mod=train_sample_mod)
    else:
        cids, cmat = load_centroids(sf_dir, n_centroids)
    indexed = assign_centroids(ds, ray.put((cids, cmat)))

    def dup_part_col(t: pa.Table) -> pa.Table:
        return t.append_column("cpart", t.column("centroid_id"))

    indexed = indexed.map_batches(dup_part_col, batch_format="pyarrow",
                                  batch_size=None)
    out_dir = os.path.normpath(out_dir)
    tmp_dir = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    try:
        indexed.write_parquet(f"{tmp_dir}/corpus", partition_cols=["cpart"])
        pq.write_table(pa.table({
            "centroid_id": pa.array(cids, pa.int64()),
            "centroid": pa.array([[int(v) for v in row] for row in cmat],
                                 pa.list_(pa.int64())),
        }), f"{tmp_dir}/centroids.parquet")
        try:
            os.rename(tmp_dir, out_dir)  # atomic publish
        except OSError:
            # a concurrent builder won the race → its complete index
            # stands (centroids.parquet is written last, so presence
            # implies completeness); anything else is a real error
            if not os.path.isfile(f"{out_dir}/centroids.parquet"):
                raise
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def load_ivf_centroids(index_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{index_dir}/centroids.parquet")
    cids = t.column("centroid_id").to_numpy()
    cmat = np.stack([np.asarray(v, np.int64)
                     for v in t.column("centroid").to_pylist()])
    return cids, cmat


def _query_probes(qmat: np.ndarray, qids: np.ndarray, cids: np.ndarray,
                  cmat: np.ndarray, nprobe: int) -> np.ndarray:
    """(Q, nprobe) probed centroid ids: sim desc, centroid id asc."""
    cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
    qsim = (qmat @ cmat.T).astype(np.float64) / cnorm[None, :]
    order = np.lexsort((cids[None, :].repeat(qids.shape[0], 0), -qsim), axis=1)
    return cids[order[:, :nprobe]]


def _extension_dirs(index_dir: str) -> list:
    """Completed append-only extension generations, oldest first
    (extend-0, extend-1, …). ``.building`` dirs are invisible."""
    import os
    import re

    out = []
    for d in os.listdir(index_dir):
        m = re.fullmatch(r"extend-(\d+)", d)
        if m:
            out.append((int(m.group(1)), os.path.join(index_dir, d)))
    return [p for _i, p in sorted(out)]


def _index_part_paths(index_dir: str, probe_set) -> list:
    """Parquet files of the probed partitions across the base corpus and
    every completed extension — unprobed partitions are never listed in
    ANY generation."""
    import glob
    import os

    roots = [os.path.join(index_dir, "corpus")] + _extension_dirs(index_dir)
    return sorted(f for r in roots for c in probe_set
                  for f in glob.glob(f"{r}/cpart={int(c)}/*.parquet"))


def extend_ivf_index(index_dir: str, new_ds) -> str:
    """INCREMENTAL index extension — the extend_md5_index crawl loop for
    vectors: a new shard assigns to the STORED centroids (partitioning
    stays coherent with every earlier generation, so queries need no
    re-probe logic) and publishes as ONE atomic ``extend-N`` rename.
    Vectors are additive, so reads are a plain union of generations —
    no last-wins resolution. A crashed build leaves only an invisible
    ``.building`` dir (retry-safe); each shard extends ONCE (re-sending
    an already-published shard would duplicate rows — the caller's
    bookkeeping, as with the md5-index loop). Centroids never move on
    extend; retrain + rebuild when drift warrants (compaction)."""
    import os
    import shutil

    import ray

    cids, cmat = load_ivf_centroids(index_dir)
    indexed = assign_centroids(new_ds, ray.put((cids, cmat)))

    def dup_part_col(t: pa.Table) -> pa.Table:
        return t.append_column("cpart", t.column("centroid_id"))

    indexed = indexed.map_batches(dup_part_col, batch_format="pyarrow",
                                  batch_size=None)
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


def compact_index(index_dir: str, out_dir: str) -> str:
    """Fold an extended index's generation chain (corpus + extend-N)
    into a fresh single-generation index — the compaction step of the
    build → extend* → compact loop, shared by the IVF and IVF-PQ
    layouts (rows already carry their partition assignment, so
    compaction is a partition-preserving file merge: ONE distributed
    read of every generation re-written partitioned, quantizer meta
    files copied verbatim, centroids.parquet LAST — never a re-assign,
    never a decode). Atomic temp-dir + rename publish."""
    import glob
    import os
    import shutil

    import ray.data as rd

    roots = [os.path.join(index_dir, "corpus")] + _extension_dirs(index_dir)
    paths = sorted(f for r in roots
                   for f in glob.glob(os.path.join(r, "cpart=*",
                                                   "*.parquet")))
    if not paths:
        raise ValueError(f"no index partitions under {index_dir}")
    rows = rd.read_parquet(paths)

    def dup_part_col(t: pa.Table) -> pa.Table:
        # hive partition column is consumed by the read — restore it
        if "cpart" in t.column_names:
            return t
        return t.append_column("cpart", t.column("centroid_id"))

    rows = rows.map_batches(dup_part_col, batch_format="pyarrow",
                            batch_size=None)
    out_dir = os.path.normpath(out_dir)
    tmp = f"{out_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        rows.write_parquet(f"{tmp}/corpus", partition_cols=["cpart"])
        for meta in ("codebooks.parquet",):
            src = os.path.join(index_dir, meta)
            if os.path.isfile(src):
                shutil.copyfile(src, os.path.join(tmp, meta))
        shutil.copyfile(os.path.join(index_dir, "centroids.parquet"),
                        os.path.join(tmp, "centroids.parquet"))  # LAST
        os.rename(tmp, out_dir)
        return out_dir
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def topk_ivf_indexed(index_dir: str, sf_dir: str, k: int = 5,
                     n_queries: int = 10, nprobe: int = 4):
    """IVF search over a PERSISTED index (build_ivf_index): only the
    partitions of probed centroids are passed to read_parquet, so unprobed
    buckets never leave storage — genuine file-level pruning, no
    per-query corpus pass. Results are byte-equal to topk_ivf on the same
    corpus (asserted in tests)."""
    import os

    import ray
    import ray.data as rd

    cids, cmat = load_ivf_centroids(index_dir)
    qids, qmat = load_queries_quantized(sf_dir, n_queries)
    probes = _query_probes(qmat, qids, cids, cmat, nprobe)
    probe_set = np.unique(probes)
    qref = ray.put((qids, qmat, probes))

    # expand partition dirs to files (pyarrow rejects dirs in path lists);
    # unprobed partitions are never listed, let alone read — in the base
    # corpus OR any extend-N generation (extend_ivf_index)
    paths = _index_part_paths(index_dir, probe_set)
    pruned = rd.read_parquet(paths,
                             columns=["vec_id", "embedding", "centroid_id"])

    def search(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_probes = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        cent = batch.column("centroid_id").to_numpy()
        mat = quantize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        hit = (q_probes[:, :, None] == cent[None, None, :]).any(axis=1)
        return _partial_topk_int(
            _hit_pair_scores(ids, mat, q_ids, q_mat, hit), k)

    cand = pruned.map_batches(search, batch_format="pyarrow", batch_size=4096)
    return _merge_int_topk_single(cand, k)


def _assign_sql_prefix(n_centroids: int) -> str:
    """Shared WITH-prefix: quantized components + first-N centroids +
    the exact assignment CTE (dot/||c||, ties → min cid). Used verbatim
    by topk_ivf_sql and cluster_sizes_sql so both oracles stay one
    expression of the same assignment semantics."""
    return (
        f"WITH e AS (SELECT vec_id, embedding FROM embeddings), "
        f"comp0 AS (SELECT vec_id, unnest(embedding) AS x0,"
        f" unnest(generate_series(1, len(embedding))) AS d FROM e), "
        f"q AS (SELECT vec_id, d,"
        f" CAST(floor(x0::DOUBLE * {QSCALE} + 0.5) AS BIGINT) AS v FROM comp0), "
        f"cents AS (SELECT vec_id AS cid FROM e ORDER BY vec_id LIMIT {n_centroids}), "
        f"cnorm AS (SELECT vec_id AS cid, sqrt(SUM(v * v)::DOUBLE) AS nrm"
        f" FROM q WHERE vec_id IN (SELECT cid FROM cents) GROUP BY 1), "
        f"vdot AS (SELECT qv.vec_id, qc.vec_id AS cid, SUM(qv.v * qc.v) AS dot"
        f" FROM q qv JOIN q qc ON qc.d = qv.d"
        f" WHERE qc.vec_id IN (SELECT cid FROM cents) GROUP BY 1, 2), "
        f"assign AS (SELECT vec_id, cid FROM ("
        f"SELECT v.vec_id, v.cid, row_number() OVER (PARTITION BY v.vec_id"
        f" ORDER BY (v.dot::DOUBLE / n.nrm) DESC, v.cid) AS rn"
        f" FROM vdot v JOIN cnorm n ON n.cid = v.cid) WHERE rn = 1), "
    )


def topk_ivf_sql(k: int = 5, n_queries: int = 10, n_centroids: int = 16,
                 nprobe: int = 4) -> str:
    """DuckDB oracle for topk_ivf — same quantization, same centroid
    assignment (dot/||c||, ties → min cid), same probe routing, same
    exact-int re-rank."""
    return (
        _assign_sql_prefix(n_centroids) +
        f"qv AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT {n_queries}), "
        f"probes AS (SELECT vec_id AS query_id, cid FROM ("
        f"SELECT v.vec_id, v.cid, row_number() OVER (PARTITION BY v.vec_id"
        f" ORDER BY (v.dot::DOUBLE / n.nrm) DESC, v.cid) AS rn"
        f" FROM vdot v JOIN cnorm n ON n.cid = v.cid"
        f" WHERE v.vec_id IN (SELECT vec_id FROM qv)) WHERE rn <= {nprobe}), "
        f"cand AS (SELECT p.query_id, a.vec_id FROM probes p"
        f" JOIN assign a ON a.cid = p.cid), "
        f"sumsq AS (SELECT vec_id, SUM(v * v) AS s2 FROM q GROUP BY 1), "
        # CAST the HUGEINT sum to BIGINT: without it qdot reaches pandas as
        # float64 while the Ray side emits int64 — a driver hash mismatch
        # even though values are equal (round-2 red cell root cause)
        f"dots AS (SELECT c.query_id, c.vec_id,"
        f" CAST(SUM(qa.v * qb.v) AS BIGINT) AS qdot"
        f" FROM cand c JOIN q qa ON qa.vec_id = c.query_id"
        f" JOIN q qb ON qb.vec_id = c.vec_id AND qb.d = qa.d GROUP BY 1, 2), "
        f"ranked AS (SELECT d.query_id, d.vec_id, d.qdot,"
        f" row_number() OVER (PARTITION BY d.query_id ORDER BY"
        f" (d.qdot::DOUBLE / sqrt(s.s2::DOUBLE)) DESC, d.vec_id) AS rank"
        f" FROM dots d JOIN sumsq s ON s.vec_id = d.vec_id) "
        f"SELECT query_id, vec_id, qdot, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY query_id, rank"
    )


def topk_lsh_sql(k: int = 5, n_queries: int = 10, n_bits: int = 8,
                 n_tables: int = 4, n_probes: int = 1) -> str:
    """DuckDB oracle for topk_lsh — same quantization, same md5 signs,
    same exact-int dots, same score ordering. ``n_probes > 1`` probes
    the same lowest-|margin| Hamming-1 buckets (row_number over
    (abs(margin), bit), bucket XOR 2^bit) — the probed-bucket UNION."""
    if n_probes == 1:
        probe_cte = (
            "qprobes AS (SELECT vec_id, t, bucket FROM buckets"
            " WHERE vec_id IN (SELECT vec_id FROM qv)), "
        )
    else:
        probe_cte = (
            f"qmarg AS (SELECT q.vec_id, s.t, s.j,"
            f" CAST(SUM(q.v * s.s) AS BIGINT) AS marg"
            f" FROM q JOIN signs s ON s.d = q.d"
            f" WHERE q.vec_id IN (SELECT vec_id FROM qv)"
            f" GROUP BY 1, 2, 3), "
            f"flips AS (SELECT vec_id, t, j FROM ("
            f"SELECT vec_id, t, j, row_number() OVER ("
            f"PARTITION BY vec_id, t ORDER BY abs(marg), j) AS rn"
            f" FROM qmarg) WHERE rn <= {n_probes - 1}), "
            f"qprobes AS ("
            f"SELECT vec_id, t, bucket FROM buckets"
            f" WHERE vec_id IN (SELECT vec_id FROM qv)"
            f" UNION "
            f"SELECT f.vec_id, f.t,"
            f" xor(b.bucket, CAST(power(2, f.j) AS BIGINT)) AS bucket"
            f" FROM flips f JOIN buckets b"
            f" ON b.vec_id = f.vec_id AND b.t = f.t), "
        )
    return (
        f"WITH e AS (SELECT vec_id, embedding FROM embeddings), "
        f"comp0 AS (SELECT vec_id, unnest(embedding) AS x0,"
        f" unnest(generate_series(1, len(embedding))) AS d FROM e), "
        f"q AS (SELECT vec_id, d,"
        f" CAST(floor(x0::DOUBLE * {QSCALE} + 0.5) AS BIGINT) AS v FROM comp0), "
        f"dims AS (SELECT DISTINCT d FROM q), "
        f"signs AS (SELECT t.range AS t, j.range AS j, dims.d,"
        f" 1 - 2 * CAST(md5_number_lower(t.range::VARCHAR || ':' ||"
        f" j.range::VARCHAR || ':' || dims.d::VARCHAR) % 2 AS BIGINT) AS s"
        f" FROM range({n_tables}) t, range({n_bits}) j, dims), "
        f"bits AS (SELECT q.vec_id, s.t, s.j,"
        f" CASE WHEN SUM(q.v * s.s) > 0 THEN 1 ELSE 0 END AS bit"
        f" FROM q JOIN signs s ON s.d = q.d GROUP BY 1, 2, 3), "
        f"buckets AS (SELECT vec_id, t,"
        f" SUM(bit * CAST(power(2, j) AS BIGINT)) AS bucket"
        f" FROM bits GROUP BY 1, 2), "
        f"qv AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT {n_queries}), "
        f"{probe_cte}"
        f"cand AS (SELECT DISTINCT qp.vec_id AS query_id, bv.vec_id AS vec_id"
        f" FROM qprobes qp JOIN buckets bv"
        f" ON bv.t = qp.t AND bv.bucket = qp.bucket), "
        f"sumsq AS (SELECT vec_id, SUM(v * v) AS s2 FROM q GROUP BY 1), "
        # BIGINT cast: see topk_ivf_sql — int64 on both engines or the
        # driver's dtype-sensitive value hash disagrees
        f"dots AS (SELECT c.query_id, c.vec_id,"
        f" CAST(SUM(qa.v * qb.v) AS BIGINT) AS qdot"
        f" FROM cand c JOIN q qa ON qa.vec_id = c.query_id"
        f" JOIN q qb ON qb.vec_id = c.vec_id AND qb.d = qa.d GROUP BY 1, 2), "
        f"ranked AS (SELECT d.query_id, d.vec_id, d.qdot,"
        f" row_number() OVER (PARTITION BY d.query_id ORDER BY"
        f" (d.qdot::DOUBLE / sqrt(s.s2::DOUBLE)) DESC, d.vec_id) AS rank"
        f" FROM dots d JOIN sumsq s ON s.vec_id = d.vec_id) "
        f"SELECT query_id, vec_id, qdot, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY query_id, rank"
    )


# ---------------------------------------------------------------------------
# document clustering — per-cluster corpus statistics
# ---------------------------------------------------------------------------


def cluster_sizes(ds, sf_dir: str, n_centroids: int = 16):
    """Corpus clustering over the embedding column: every vector joins
    its nearest coarse centroid (``assign_centroids`` — the exact-int
    cosine the IVF index uses; first-N seed so the assignment is
    SQL-expressible; swap ``train_centroids`` output in at scale), then a
    per-cluster aggregate → (centroid_id, n_vecs, sum_vec_id).

    Shape: broadcast centroids (ray.put once) → assignment scan →
    per-batch combiner (≤ n_centroids rows leave each task) → ONE
    output-sized repartition(1) merge task (the repo's merge rule — no
    groupby barrier for an n_centroids-row output).
    """
    import ray

    cids, cmat = load_centroids(sf_dir, n_centroids)
    assigned = assign_centroids(ds, ray.put((cids, cmat)))

    def part(t: pa.Table) -> pa.Table:
        c = t.column("centroid_id").to_numpy(zero_copy_only=False)
        v = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(c, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, v)
        return pa.table({"centroid_id": pa.array(uniq.astype(np.int64)),
                         "n_vecs": pa.array(n),
                         "sum_vec_id": pa.array(s)})

    parts = assigned.map_batches(part, batch_format="pyarrow",
                                 batch_size=None)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = (df.groupby("centroid_id", sort=True)[["n_vecs", "sum_vec_id"]]
               .sum().reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


def cluster_sizes_sql(n_centroids: int = 16) -> str:
    """DuckDB twin of cluster_sizes — the SAME assignment prefix as
    topk_ivf_sql, aggregated per cluster."""
    return (
        _assign_sql_prefix(n_centroids) +
        "sizes AS (SELECT cid AS centroid_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_vecs, "
        "CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id "
        "FROM assign GROUP BY 1) "
        "SELECT centroid_id, n_vecs, sum_vec_id FROM sizes "
        "ORDER BY centroid_id"
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication via cluster-then-dedup
# ---------------------------------------------------------------------------


def semdedup(ds, sf_dir: str, n_centroids: int = 16,
             threshold: float = 0.35):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the corpus by
    nearest coarse centroid, then WITHIN each cluster drop vectors that
    are semantic duplicates of an earlier one → Dataset (vec_id,
    centroid_id, dup_of, kept) covering every vector. The greedy rule is
    deterministic: v is a duplicate iff some u < v in its cluster has
    round(cosine(u, v), 6) >= threshold; ``dup_of`` is the smallest such
    u (else -1), ``kept`` = 1 iff none exists.

    Shape — the reason SemDeDup scales where all-pairs cannot: ONE
    assignment scan (broadcast centroids, the exact-int IVF cosine) →
    ONE cluster-key shuffle → per-cluster all-pairs matmul bounded by
    cluster size ~ N/C (raise n_centroids to cap it; the paper uses 50k
    clusters at web scale). Embeddings shuffle once, unit-normed, and
    never leave their cluster task. Cosine parity with DuckDB rides the
    round-6 contract of embedding_near_dups.
    """
    import ray

    from .dedup import _normalize_block

    cids, cmat = load_centroids(sf_dir, n_centroids)
    assigned = assign_centroids(
        ds.select_columns(["vec_id", "embedding"]),
        ray.put((cids, cmat)))
    normed = assigned.map_batches(
        lambda t: _normalize_block(t.select(["vec_id", "embedding"]))
        .append_column("centroid_id", t.column("centroid_id")),
        batch_format="pyarrow", batch_size=None)

    def cluster_dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id", kind="stable")
        ids = df["vec_id"].to_numpy(np.int64)
        em = np.stack(df["embedding"].to_numpy())
        m = len(ids)
        dup_of = np.full(m, -1, np.int64)
        if m > 1:
            sims = np.round(em @ em.T, 6)
            hit = sims >= threshold
            # strictly-lower-triangle: candidates u < v (ids ascending)
            hit[np.triu_indices(m)] = False
            any_hit = hit.any(axis=1)
            dup_of[any_hit] = ids[hit.argmax(axis=1)[any_hit]]
        return pd.DataFrame({
            "vec_id": ids,
            "centroid_id": df["centroid_id"].to_numpy(np.int64),
            "dup_of": dup_of,
            "kept": (dup_of < 0).astype(np.int64)})

    return normed.groupby("centroid_id").map_groups(
        cluster_dedup, batch_format="pandas")


def semdedup_sql(n_centroids: int = 16, threshold: float = 0.35) -> str:
    """DuckDB twin of semdedup — the SAME assignment prefix as
    topk_ivf_sql/cluster_sizes_sql, all within-cluster pairs u < v,
    round-6 cosine threshold, MIN(u) as dup_of."""
    return (
        _assign_sql_prefix(n_centroids) +
        "pairs AS (SELECT a.vec_id AS u, b.vec_id AS v, a.cid "
        "FROM assign a JOIN assign b "
        "ON a.cid = b.cid AND a.vec_id < b.vec_id), "
        "sims AS (SELECT p.u, p.v FROM pairs p "
        "JOIN e ea ON ea.vec_id = p.u JOIN e eb ON eb.vec_id = p.v "
        "WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], "
        f"eb.embedding::DOUBLE[]), 6) >= {threshold}), "
        "dup AS (SELECT v AS vec_id, MIN(u) AS d FROM sims GROUP BY 1) "
        "SELECT a.vec_id, a.cid AS centroid_id, "
        "CAST(COALESCE(dup.d, -1) AS BIGINT) AS dup_of, "
        "CAST(CASE WHEN dup.d IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept "
        "FROM assign a LEFT JOIN dup ON dup.vec_id = a.vec_id"
    )
