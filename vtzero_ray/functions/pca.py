"""PCA over the embedding column — the dimensionality-reduction step of
a vector pipeline (compress before ANN/clustering; whiten before
similarity). Two ops:

- ``embedding_moments``: the distributed statistic. Embeddings quantize
  to the QSCALE integer grid (functions/ann.quantize — one IEEE
  expression over exact ints, the engine's established cross-engine
  contract), then ONE corpus scan emits per-block int64 partials of the
  64×64 second-moment matrix, the component sums and the row count as
  single binary blobs (the graph _dense_pass layout: moment-bounded
  traffic, never row-bounded), merged in one output-sized task and
  exploded to (d, e, s) rows — EXACT integer output with a pairwise
  self-join SQL twin. Per-block products are ≤ QSCALE²·rows_per_block;
  at 10^12 rows the final adds approach int64 range — shard the merge
  (tree-reduce partial blobs) before that point, as the docstring of
  _sum_parts notes.
- ``pca_project``: driver-side eigendecomposition of the (tiny) d×d
  covariance assembled from the moments, deterministic component SIGN
  fix (largest-|coefficient| entry forced positive — eigenvectors are
  defined up to sign), then ONE broadcast-matmul scan projecting every
  embedding; outputs int64-quantized coordinates so results are
  batching-invariant bit-for-bit. Eigensolvers aren't SQL — pytest-gated
  against a local NumPy reimplementation (the BPE/k-means precedent);
  the moments feeding it ARE the oracle-checked surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator
from .ann import QSCALE, quantize


def _moment_partial(t: pa.Table) -> pa.Table:
    tune_allocator()
    if len(t) == 0:
        return pa.table({"part": pa.array([], pa.large_binary())})
    raw = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
    q = quantize(raw)
    s = q.T @ q                      # (d, d) int64 second moments
    sums = q.sum(axis=0)             # (d,) int64
    n = np.array([q.shape[0]], np.int64)
    blob = np.concatenate([s.ravel(), sums, n]).tobytes()
    return pa.table({"part": pa.array([blob], pa.large_binary())})


def embedding_moments(ds, dim: int = 64):
    """→ Dataset (d, e, s): the quantized second-moment matrix (upper
    triangle, 0-based d ≤ e), component sums as (d, -1, Σq_d), and the
    row count as (-1, -1, n) — everything pca_project needs, all exact
    integers."""
    parts = ds.select_columns(["embedding"]) \
        .map_batches(_moment_partial, batch_format="pyarrow",
                     batch_size=None)

    def merge(t: pa.Table) -> pa.Table:
        tot = None
        for buf in t.column("part").to_pylist():
            v = np.frombuffer(buf, np.int64)
            tot = v.copy() if tot is None else tot + v
        if tot is None:
            tot = np.zeros(dim * dim + dim + 1, np.int64)
        s = tot[:dim * dim].reshape(dim, dim)
        sums = tot[dim * dim:dim * dim + dim]
        n = int(tot[-1])
        iu, ju = np.triu_indices(dim)
        return pa.table({
            "d": pa.array(np.concatenate(
                [iu, np.arange(dim, dtype=np.int64), [-1]])),
            "e": pa.array(np.concatenate(
                [ju, np.full(dim, -1, np.int64), [-1]])),
            "s": pa.array(np.concatenate(
                [s[iu, ju], sums, [n]]).astype(np.int64)),
        })

    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


def embedding_moments_sql(table: str = "embeddings",
                          qscale: int = QSCALE) -> str:
    """Pairwise self-join twin (upper triangle) + sums + count; the
    quantization expression is the engine's established contract."""
    return (
        f"WITH e AS (SELECT vec_id, embedding FROM {table}), "
        f"comp0 AS (SELECT vec_id, unnest(embedding) AS x0,"
        f" unnest(generate_series(1, len(embedding))) AS d FROM e), "
        f"q AS (SELECT vec_id, d,"
        f" CAST(floor(x0::DOUBLE * {qscale} + 0.5) AS BIGINT) AS v"
        f" FROM comp0) "
        f"SELECT CAST(a.d - 1 AS BIGINT) AS d, CAST(b.d - 1 AS BIGINT) AS e, "
        f"CAST(SUM(a.v * b.v) AS BIGINT) AS s "
        f"FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.d <= b.d "
        f"GROUP BY 1, 2 "
        f"UNION ALL SELECT CAST(d - 1 AS BIGINT), CAST(-1 AS BIGINT), "
        f"CAST(SUM(v) AS BIGINT) FROM q GROUP BY 1 "
        f"UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), "
        f"CAST(COUNT(*) AS BIGINT) FROM e"
    )


def pca_components(moments_df, dim: int = 64, k: int = 8):
    """Driver-side: moments rows → (W, mean) with W (dim, k) the top-k
    eigenvectors of the covariance of the QUANTIZED data, eigenvalue-
    descending, sign-fixed (largest-|coeff| entry positive; ties → the
    earlier index, np.argmax's first-max)."""
    rows = {(int(r.d), int(r.e)): int(r.s)
            for r in moments_df.itertuples()}
    n = rows[(-1, -1)]
    if n < 2:
        raise ValueError("pca: need at least 2 rows")
    sums = np.array([rows[(d, -1)] for d in range(dim)], np.float64)
    S = np.zeros((dim, dim), np.float64)
    for d in range(dim):
        for e in range(d, dim):
            S[d, e] = S[e, d] = rows[(d, e)]
    mean = sums / n
    cov = S / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)           # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    W = v[:, order]
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    return W, mean


def pca_project(ds, k: int = 8, dim: int = 64, quant: float = 1e6):
    """→ Dataset (vec_id, c0..c{k-1}): every embedding's centered
    projection onto the top-k components, int64-quantized (floor(p·quant
    + 0.5)) so output is bit-stable under any batching."""
    import ray

    mom = embedding_moments(ds, dim=dim).to_pandas()
    W, mean = pca_components(mom, dim=dim, k=k)
    ref = ray.put((W, mean))

    def project(t: pa.Table) -> pa.Table:
        tune_allocator()
        Wm, mu = ray.get(ref)
        raw = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
        qm = quantize(raw).astype(np.float64) / QSCALE
        p = (qm - mu / QSCALE) @ Wm
        cols = {"vec_id": t.column("vec_id")}
        for j in range(Wm.shape[1]):
            cols[f"c{j}"] = pa.array(
                np.floor(p[:, j] * quant + 0.5).astype(np.int64))
        return pa.table(cols)

    return ds.select_columns(["vec_id", "embedding"]) \
        .map_batches(project, batch_format="pyarrow", batch_size=None)
