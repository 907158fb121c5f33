"""Product-quantization ANN (the PQ half of IVF-PQ, Jegou et al. 2011).

At 100 TB the embedding corpus cannot be rescanned per query at full
precision: PQ compresses each D-dim vector to M uint8 codes (one per
subspace) and answers queries with asymmetric distance computation
(ADC) — a per-query (M x K) lookup table of subspace distances, summed
per vector by code indexing. The corpus scan touches M bytes per vector
instead of 4D.

Exactness contract (the ann.py pattern): vectors quantize to the
QSCALE integer grid, then UNIT-NORMALIZE on that grid — v =
floor(v0*QSCALE / sqrt(sum(v0^2)) + 0.5), one IEEE expression over
exact ints (the clip/HLL precedent), so L2 order == cosine order (the
metric every other vector op here ranks by) and DuckDB reproduces the
grid bit-for-bit. Every subspace distance is an int64 L2^2, code
assignment is argmin with ties -> smallest code, ADC distances are
int64 sums of int64 LUT entries (order-independent) — so encode AND
search match the SQL twins exactly (`pq_codes_sql`, `topk_pq_sql`).

Codebooks are first-N seeded (codebook k of subspace m = subvector m of
the k-th vector by vec_id) — the SQL-expressible twin of a trained
codebook, the load_centroids/_seed_first_n precedent; train_centroids
(ann.py) shows the trained path.

Scale shape: codebooks broadcast once (ray.put), encode is one scan,
search is one scan with per-batch per-query top-k pruning (global
top-k under (dist ASC, vec_id ASC) is inside the union of batch
top-ks) and ONE output-sized merge task — no groupby barrier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vtzero_ray.runtime import tune_allocator

from .ann import QSCALE, quantize


def load_queries_unit(sf_dir: str, n_queries: int = 10):
    """First n embeddings by vec_id on the unit grid."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    return (df["vec_id"].to_numpy(),
            quantize_unit(np.stack(df["embedding"].to_numpy())))


def quantize_unit(mat: np.ndarray) -> np.ndarray:
    """Integer-grid unit normalization: quantize (exact), then
    v = floor(v0*QSCALE / sqrt(sum(v0^2)) + 0.5) — the int sum-of-squares
    is exact in both engines and the rest is ONE IEEE double expression,
    so DuckDB lands on identical ints. Zero vectors stay zero."""
    q0 = quantize(mat)
    s2 = (q0 * q0).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        v = np.floor((q0 * QSCALE).astype(np.float64)
                     / np.sqrt(s2.astype(np.float64))[:, None] + 0.5)
    return np.where(s2[:, None] == 0, 0, v).astype(np.int64)


def load_pq_codebooks(sf_dir: str, n_sub: int = 4,
                      n_codes: int = 16) -> np.ndarray:
    """(n_codes, n_sub, dsub) int64 codebooks from the first n_codes
    vectors by vec_id (code k == k-th smallest vec_id), unit-grid."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_codes)
    mat = quantize_unit(np.stack(df["embedding"].to_numpy()))
    dim = mat.shape[1]
    if dim % n_sub:
        raise ValueError(f"n_sub={n_sub} must divide dim={dim}")
    return mat.reshape(n_codes, n_sub, dim // n_sub)


def _encode_mat(qmat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(N, D) int64 -> (N, M) codes: per-subspace argmin int64 L2^2,
    first-min ties == smallest code."""
    n_codes, n_sub, dsub = cb.shape
    sub = qmat.reshape(qmat.shape[0], n_sub, dsub)
    # (N, K, M): exact int64 — |v| <= ~2*QSCALE, squared * dsub << 2^63
    d2 = ((sub[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    return d2.argmin(axis=1)


def train_pq_codebooks(ds, sf_dir: str, n_sub: int = 4, n_codes: int = 16,
                       n_iters: int = 4, sample_mod: int = 1) -> np.ndarray:
    """Per-subspace Lloyd k-means on the unit grid — the trained
    codebook beside the first-N SQL twin (the train_centroids
    precedent, applied independently to each of the M subspaces).

    Determinism (bit-exact under any block scheduling):
    - assignment is ``_encode_mat``'s exact int64 L2² argmin (ties →
      smallest code) — the SAME kernel encode and search use;
    - updates sum int64 subvectors per (sub, code) inside map_batches;
      integer addition is order-independent, so combining the per-batch
      partials on the driver is schedule-free;
    - new codewords are round-half-up integer divisions
      ``(2·s + c) // (2·c)`` — they stay ON the unit grid, so every
      later distance is exact int64;
    - an empty code keeps its previous codeword.

    ``sample_mod > 1`` trains on the deterministic ``vec_id %
    sample_mod == 0`` subsample, materialized once (the mini-batch /
    100-TB path: iterations re-read cached blocks, never full-corpus
    lineage). Driver state is (M·K) rows per input block — tiny."""
    import ray

    if sample_mod > 1:
        def samp(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            return batch.filter(pa.array(ids % sample_mod == 0))

        ds = ds.map_batches(samp, batch_format="pyarrow",
                            batch_size=None).materialize()

    cb = load_pq_codebooks(sf_dir, n_sub, n_codes)
    K, M, dsub = cb.shape

    for _ in range(max(0, n_iters)):
        ref = ray.put(cb)

        def partial_sums(batch: pa.Table) -> pa.Table:
            tune_allocator()
            cb_ = ray.get(ref)
            empty = pa.table({"sub": pa.array([], pa.int64()),
                              "code": pa.array([], pa.int64()),
                              "vsum": pa.array([], pa.list_(pa.int64())),
                              "cnt": pa.array([], pa.int64())})
            if len(batch) == 0:
                return empty
            mat = quantize_unit(np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)))
            codes = _encode_mat(mat, cb_)               # (N, M)
            sub = mat.reshape(mat.shape[0], M, dsub)
            out_m, out_k, out_s, out_n = [], [], [], []
            for m_ in range(M):
                sums = np.zeros((K, dsub), np.int64)
                cnts = np.zeros(K, np.int64)
                np.add.at(sums, codes[:, m_], sub[:, m_])
                np.add.at(cnts, codes[:, m_], 1)
                for k_ in np.flatnonzero(cnts):
                    out_m.append(m_)
                    out_k.append(int(k_))
                    out_s.append(sums[k_].tolist())
                    out_n.append(int(cnts[k_]))
            if not out_m:
                return empty
            return pa.table({"sub": pa.array(out_m, pa.int64()),
                             "code": pa.array(out_k, pa.int64()),
                             "vsum": pa.array(out_s, pa.list_(pa.int64())),
                             "cnt": pa.array(out_n, pa.int64())})

        parts = ds.map_batches(partial_sums, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        new = cb.copy()
        grp = parts.groupby(["sub", "code"], sort=False)
        for (m_, k_), rows in grp:
            s = np.sum(np.stack([np.asarray(v, np.int64)
                                 for v in rows.vsum]),
                       axis=0, dtype=np.int64)
            c = int(rows.cnt.sum())
            new[int(k_), int(m_)] = (2 * s + c) // (2 * c)
        cb = new
    return cb


def pq_codes(ds, sf_dir: str, n_sub: int = 4, n_codes: int = 16,
             codebooks: np.ndarray | None = None):
    """Encode the corpus -> Dataset (vec_id, sub, code), long form (one
    row per subspace) so the SQL twin compares row-for-row.
    ``codebooks`` swaps in a trained (K, M, dsub) codebook
    (train_pq_codebooks); default first-N stays the SQL twin."""
    import ray

    cb_ref = ray.put(load_pq_codebooks(sf_dir, n_sub, n_codes)
                     if codebooks is None else codebooks)

    def enc(batch: pa.Table) -> pa.Table:
        tune_allocator()
        cb = ray.get(cb_ref)
        ids = batch.column("vec_id").to_numpy()
        mat = quantize_unit(np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False)))
        codes = _encode_mat(mat, cb)
        m = cb.shape[1]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, m), pa.int64()),
            "sub": pa.array(np.tile(np.arange(m, dtype=np.int64),
                                    ids.shape[0]), pa.int64()),
            "code": pa.array(codes.ravel().astype(np.int64), pa.int64()),
        })

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=4096)


def topk_pq(ds, sf_dir: str, k: int = 5, n_queries: int = 10,
            n_sub: int = 4, n_codes: int = 16,
            codebooks: np.ndarray | None = None):
    """ADC top-k -> (query_id, vec_id, pq_dist, rank): per-query LUT of
    int64 subspace distances, corpus scanned once, per-batch pruning,
    single merge task. ``codebooks`` swaps in a trained codebook."""
    import ray

    cb = (load_pq_codebooks(sf_dir, n_sub, n_codes)
          if codebooks is None else codebooks)
    q_ids, q_mat = load_queries_unit(sf_dir, n_queries)
    n_codes_, n_sub_, dsub = cb.shape
    q_sub = q_mat.reshape(q_mat.shape[0], n_sub_, dsub)
    # LUT[q, k, m] = L2^2(query q's subvector m, codebook k of m)
    lut = ((q_sub[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    bref = ray.put((cb, q_ids, lut))

    def search(batch: pa.Table) -> pa.Table:
        tune_allocator()
        cb_, q_ids_, lut_ = ray.get(bref)
        ids = batch.column("vec_id").to_numpy()
        mat = quantize_unit(np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False)))
        codes = _encode_mat(mat, cb_)  # (N, M)
        nq = q_ids_.shape[0]
        dist = np.zeros((nq, ids.shape[0]), np.int64)
        for m in range(codes.shape[1]):
            dist += lut_[:, codes[:, m], m]
        # per-batch per-query top-k prune under the FULL (dist ASC,
        # vec_id ASC) total order — the merge's criterion. An
        # argpartition on dist alone keeps an ARBITRARY subset when the
        # k-th distance ties across several vec_ids, which can drop the
        # tied smaller vec_id before the merge ever sees it (caught by
        # the sf0.1 sweep: two rank-5 ties flipped vs the oracle).
        kk = min(k, ids.shape[0])
        rows = []
        for qi in range(nq):
            sel = np.lexsort((ids, dist[qi]))[:kk]
            rows.append((np.full(kk, q_ids_[qi], np.int64),
                         ids[sel], dist[qi, sel]))
        return pa.table({
            "query_id": pa.array(np.concatenate([r[0] for r in rows])),
            "vec_id": pa.array(np.concatenate([r[1] for r in rows])),
            "pq_dist": pa.array(np.concatenate([r[2] for r in rows])),
        })

    cand = ds.map_batches(search, batch_format="pyarrow", batch_size=4096)

    def merge_all(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        parts = []
        for _, g in df.groupby("query_id", sort=True):
            g = g.sort_values(["pq_dist", "vec_id"],
                              ascending=[True, True],
                              kind="stable").head(k)
            g = g.copy()
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


def _pq_sql_prefix(n_sub: int, n_codes: int, dim: int) -> str:
    """Shared WITH-prefix: quantized components, first-N codebooks with
    dense code ids, per-(vector, subspace) argmin assignment."""
    dsub = dim // n_sub
    return (
        f"WITH e AS (SELECT vec_id, embedding FROM embeddings), "
        f"comp0 AS (SELECT vec_id, unnest(embedding) AS x0,"
        f" unnest(generate_series(1, len(embedding))) AS d FROM e), "
        f"q0 AS (SELECT vec_id, d,"
        f" CAST(floor(x0::DOUBLE * {QSCALE} + 0.5) AS BIGINT) AS v0"
        f" FROM comp0), "
        f"nrm AS (SELECT vec_id, SUM(v0 * v0) AS s2 FROM q0 GROUP BY 1), "
        f"q AS (SELECT q0.vec_id, d,"
        f" CAST((d - 1) // {dsub} AS BIGINT) AS sub,"
        f" CASE WHEN n.s2 = 0 THEN 0 ELSE"
        f" CAST(floor((q0.v0 * {QSCALE})::DOUBLE / sqrt(n.s2::DOUBLE)"
        f" + 0.5) AS BIGINT) END AS v"
        f" FROM q0 JOIN nrm n ON n.vec_id = q0.vec_id), "
        f"cvecs AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1"
        f" AS code FROM (SELECT DISTINCT vec_id FROM e"
        f" ORDER BY vec_id LIMIT {n_codes})), "
        f"cb AS (SELECT c.code, qq.sub, qq.d, qq.v FROM q qq"
        f" JOIN cvecs c ON c.vec_id = qq.vec_id), "
        f"d2 AS (SELECT qv.vec_id, cb.sub, cb.code,"
        f" SUM((qv.v - cb.v) * (qv.v - cb.v)) AS dd"
        f" FROM q qv JOIN cb ON cb.d = qv.d GROUP BY 1, 2, 3), "
        f"enc AS (SELECT vec_id, sub, code FROM ("
        f"SELECT vec_id, sub, code, row_number() OVER ("
        f"PARTITION BY vec_id, sub ORDER BY dd ASC, code ASC) AS rn"
        f" FROM d2) WHERE rn = 1), "
    )


def pq_codes_sql(n_sub: int = 4, n_codes: int = 16, dim: int = 64) -> str:
    """DuckDB oracle for pq_codes — same grid, same argmin, same ties."""
    return (_pq_sql_prefix(n_sub, n_codes, dim) +
            "x AS (SELECT 1) SELECT vec_id, sub, code FROM enc "
            "ORDER BY vec_id, sub")


def topk_pq_sql(k: int = 5, n_queries: int = 10, n_sub: int = 4,
                n_codes: int = 16, dim: int = 64) -> str:
    """DuckDB oracle for topk_pq — same LUT distances, same int64 sums,
    same (pq_dist ASC, vec_id ASC) ranking."""
    return (
        _pq_sql_prefix(n_sub, n_codes, dim) +
        f"qv AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT {n_queries}), "
        f"lut AS (SELECT qq.vec_id AS query_id, cb.sub, cb.code,"
        f" SUM((qq.v - cb.v) * (qq.v - cb.v)) AS ld"
        f" FROM q qq JOIN cb ON cb.d = qq.d"
        f" WHERE qq.vec_id IN (SELECT vec_id FROM qv) GROUP BY 1, 2, 3), "
        # BIGINT cast: HUGEINT sums reach pandas as float64 otherwise
        # (the round-2 dtype-hash lesson)
        f"dist AS (SELECT l.query_id, enc.vec_id,"
        f" CAST(SUM(l.ld) AS BIGINT) AS pq_dist FROM enc"
        f" JOIN lut l ON l.sub = enc.sub AND l.code = enc.code"
        f" GROUP BY 1, 2), "
        f"ranked AS (SELECT query_id, vec_id, pq_dist, row_number() OVER ("
        f"PARTITION BY query_id ORDER BY pq_dist ASC, vec_id ASC) AS rank"
        f" FROM dist) "
        f"SELECT query_id, vec_id, pq_dist, rank FROM ranked"
        f" WHERE rank <= {k} ORDER BY query_id, rank"
    )
