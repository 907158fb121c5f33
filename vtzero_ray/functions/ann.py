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
        # partial top-k per query within this batch (vectorized argpartition)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k] if k < ids.shape[0] else \
            np.tile(np.arange(ids.shape[0]), (sims.shape[0], 1))
        for qi in range(self.qids.shape[0]):
            cols = part[qi]
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
    partial = ds.map_batches(
        BatchTopK, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8), fn_constructor_kwargs={"query_ref": qref, "k": k},
    )
    merged = partial.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )
    return merged


class HyperplaneLSH:
    """Random-hyperplane signatures: bucket = sign bits of W @ v."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal((n_bits, dim))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.w.T) > 0
        return (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)


def topk_lsh(ds, sf_dir: str, k: int = 5, n_queries: int = 10, n_bits: int = 8,
             n_tables: int = 4, seed: int = 7):
    """LSH-bucketed ANN: candidates share a bucket with the query in any of
    n_tables hash tables; exact rounded-cosine re-rank on candidates.

    The bucket keys partition the corpus — at scale this becomes a
    groupby(bucket) co-partitioning instead of a broadcast (documented
    partitioning assumption: each (table, bucket) group fits a worker).
    """
    import ray

    qids, qmat = load_queries(sf_dir, n_queries)
    dim = qmat.shape[1]
    tables = [HyperplaneLSH(dim, n_bits, seed + t) for t in range(n_tables)]
    qbuckets = [t.bucket(qmat) for t in tables]
    qref = ray.put((qids, qmat, [t.w for t in tables], qbuckets))

    def candidates(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, ws, q_buckets = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        mat = _normalized(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
        hit = np.zeros((q_ids.shape[0], ids.shape[0]), dtype=bool)
        for w, qb in zip(ws, q_buckets):
            bits = (mat @ w.T) > 0
            b = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
            hit |= qb[:, None] == b[None, :]
        sims = np.round(q_mat @ mat.T, 6)
        qi, ci = np.nonzero(hit)
        return pa.table({
            "query_id": pa.array(q_ids[qi], pa.int64()),
            "vec_id": pa.array(ids[ci], pa.int64()),
            "cosine": pa.array(sims[qi, ci], pa.float64()),
        })

    cand = ds.map_batches(candidates, batch_format="pyarrow", batch_size=4096)
    return cand.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )
