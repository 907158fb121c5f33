"""Product-quantization ANN (functions/pq.py) — encode determinism,
batching independence, and ADC search vs an in-process NumPy oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_
import pytest


@pytest.fixture(scope="module")
def emb(sf_dir):
    df = (pq_.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
          .to_pandas().sort_values("vec_id").reset_index(drop=True))
    return df["vec_id"].to_numpy(), np.stack(df["embedding"].to_numpy())


def _ds(sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


class TestPQEncode:
    def test_codes_match_numpy(self, ray_session, sf_dir, emb):
        from vtzero_ray.functions.pq import (_encode_mat, load_pq_codebooks,
                                             pq_codes, quantize_unit)

        ids, mat = emb
        cb = load_pq_codebooks(sf_dir)
        want = _encode_mat(quantize_unit(mat), cb)

        out = (pq_codes(_ds(sf_dir), sf_dir).to_pandas()
               .sort_values(["vec_id", "sub"]).reset_index(drop=True))
        got = out["code"].to_numpy().reshape(ids.shape[0], cb.shape[1])
        order = np.argsort(ids)
        np.testing.assert_array_equal(got, want[order])

    def test_batching_independence(self, ray_session, sf_dir):
        """Per-row encode: 4096-row and 64-row batches agree exactly."""
        from vtzero_ray.functions import pq as pqmod

        a = (pqmod.pq_codes(_ds(sf_dir), sf_dir).to_pandas()
             .sort_values(["vec_id", "sub"]).reset_index(drop=True))
        b = (pqmod.pq_codes(_ds(sf_dir).repartition(7), sf_dir)
             .to_pandas()
             .sort_values(["vec_id", "sub"]).reset_index(drop=True))
        assert a.equals(b)


class TestPQSearch:
    def test_adc_matches_numpy(self, ray_session, sf_dir, emb):
        """topk_pq == full-matrix ADC argsort under (dist, vec_id)."""
        from vtzero_ray.functions.pq import (_encode_mat, load_pq_codebooks,
                                             load_queries_unit, quantize_unit,
                                             topk_pq)

        k, nq = 5, 6
        ids, mat = emb
        cb = load_pq_codebooks(sf_dir)
        q_ids, q_mat = load_queries_unit(sf_dir, nq)
        n_codes, n_sub, dsub = cb.shape
        codes = _encode_mat(quantize_unit(mat), cb)
        lut = ((q_mat.reshape(nq, n_sub, dsub)[:, None, :, :]
                - cb[None, :, :, :]) ** 2).sum(axis=3)
        dist = np.zeros((nq, ids.shape[0]), np.int64)
        for m in range(n_sub):
            dist += lut[:, codes[:, m], m]

        out = topk_pq(_ds(sf_dir), sf_dir, k=k, n_queries=nq).to_pandas()
        assert len(out) == k * nq
        for qi, qid in enumerate(q_ids):
            g = out[out["query_id"] == qid].sort_values("rank")
            order = np.lexsort((ids, dist[qi]))[:k]
            np.testing.assert_array_equal(g["vec_id"].to_numpy(), ids[order])
            np.testing.assert_array_equal(g["pq_dist"].to_numpy(),
                                          dist[qi, order])
            np.testing.assert_array_equal(g["rank"].to_numpy(),
                                          np.arange(1, k + 1))

    def test_compression_bound(self, sf_dir, emb):
        """PQ's reason to exist: M int8-range codes per vector."""
        from vtzero_ray.functions.pq import _encode_mat, load_pq_codebooks, \
            quantize_unit

        _, mat = emb
        cb = load_pq_codebooks(sf_dir)
        codes = _encode_mat(quantize_unit(mat), cb)
        assert codes.shape[1] == 4
        assert codes.min() >= 0 and codes.max() < cb.shape[0] <= 256


class TestBoundaryTies:
    """Regression for the sf0.1 sweep catch: a per-batch prune that
    argpartitions on distance ALONE keeps an arbitrary subset when the
    k-th distance ties across vec_ids, dropping the tied smaller id
    before the merge. Duplicating every vector under a shifted id makes
    EVERY distance a cross-partition tie — the winner set must be
    batching-independent and always the smaller (original) ids."""

    def _dup_corpus(self, sf_dir, parts):
        import pyarrow as pa
        import ray.data as rd

        def shift(t: pa.Table) -> pa.Table:
            return pa.table({
                "vec_id": pa.compute.add(t.column("vec_id"), 10000),
                "embedding": t.column("embedding"),
            })

        base = _ds(sf_dir)
        dup = _ds(sf_dir).map_batches(shift, batch_format="pyarrow")
        return base.union(dup).repartition(parts)

    def test_pq_tie_prune(self, ray_session, sf_dir):
        from vtzero_ray.functions.pq import topk_pq

        outs = []
        for parts in (1, 13):
            outs.append(topk_pq(self._dup_corpus(sf_dir, parts), sf_dir,
                                k=5, n_queries=6).to_pandas()
                        .sort_values(["query_id", "rank"])
                        .reset_index(drop=True))
        assert outs[0].equals(outs[1])
        self._assert_total_order(outs[1], "pq_dist", asc=True)

    @staticmethod
    def _assert_total_order(df, score_col, asc):
        """Within each query, ranks follow (score, vec_id) exactly —
        in particular tied scores list vec_ids strictly ascending, so
        the duplicate (id, id+10000) tie pairs sit adjacent in order."""
        saw_tie = False
        for _, g in df.groupby("query_id"):
            g = g.sort_values("rank")
            s = g[score_col].to_numpy()
            v = g["vec_id"].to_numpy()
            step_ok = (s[1:] >= s[:-1]) if asc else (s[1:] <= s[:-1])
            assert step_ok.all()
            tie = s[1:] == s[:-1]
            saw_tie |= bool(tie.any())
            assert (v[1:][tie] > v[:-1][tie]).all()
        assert saw_tie  # the dup corpus must actually produce ties

    def test_bruteforce_tie_prune(self, ray_session, sf_dir):
        from vtzero_ray.functions.ann import topk_bruteforce

        outs = []
        for parts in (1, 13):
            outs.append(topk_bruteforce(self._dup_corpus(sf_dir, parts),
                                        sf_dir, k=5, n_queries=6)
                        .to_pandas()
                        .sort_values(["query_id", "rank"])
                        .reset_index(drop=True))
        assert outs[0].equals(outs[1])
        self._assert_total_order(outs[1], "cosine", asc=False)


class TestIVFPQ:
    def test_matches_twin_and_prunes_files(self, ray_session, sf_dir,
                                           tmp_path):
        """Build once, query twice byte-equal; then DELETE every
        unprobed partition and re-query — identical result proves
        unprobed buckets are never read (the topk_ivf_indexed proof)."""
        import glob
        import shutil

        import duckdb
        import numpy as np_
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.ann import (_query_probes,
                                              load_ivf_centroids,
                                              load_queries_quantized)
        from vtzero_ray.functions.ivfpq import (build_ivfpq_index,
                                                topk_ivfpq,
                                                topk_ivfpq_sql)

        idx = str(tmp_path / "ivfpq")
        build_ivfpq_index(_ds(sf_dir), idx, sf_dir)
        a = topk_ivfpq(idx, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = topk_ivfpq(idx, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/embeddings.parquet')")
        exp = con.execute(topk_ivfpq_sql()).df() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, exp, check_dtype=False)
        # delete unprobed partitions; result must not change
        cids, cmat = load_ivf_centroids(idx)
        qids, qmat = load_queries_quantized(sf_dir, 10)
        probed = set(np_.unique(
            _query_probes(qmat, qids, cids, cmat, 4)).tolist())
        removed = 0
        for d in glob.glob(f"{idx}/corpus/cpart=*"):
            if int(d.rsplit("=", 1)[1]) not in probed:
                shutil.rmtree(d)
                removed += 1
        assert removed > 0   # the probe set must actually prune
        c = topk_ivfpq(idx, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(c)

    def test_index_stores_codes_only(self, ray_session, sf_dir,
                                     tmp_path):
        import glob

        import pyarrow.parquet as pq2

        from vtzero_ray.functions.ivfpq import build_ivfpq_index

        idx = str(tmp_path / "ivfpq2")
        build_ivfpq_index(_ds(sf_dir), idx, sf_dir)
        f0 = glob.glob(f"{idx}/corpus/cpart=*/*.parquet")[0]
        names = pq2.ParquetFile(f0).schema_arrow.names
        assert "embedding" not in names
        assert {"vec_id", "centroid_id", "code_0", "code_3"} <= set(names)

    def test_full_probe_equals_pq_and_recall_monotone(
            self, ray_session, sf_dir, tmp_path):
        """Structural quality guarantees (an absolute recall floor is
        corpus luck at 16 first-N codes): (1) probing ALL partitions
        removes the IVF loss entirely — IVF-PQ at nprobe=16 must equal
        plain topk_pq EXACTLY; (2) recall vs the exact bruteforce top-5
        is monotone in nprobe; (3) rank-1 is always the query itself
        at dist 0 (the self-hit survives both compressions)."""
        import pandas as pd

        from vtzero_ray.functions.ann import topk_bruteforce
        from vtzero_ray.functions.ivfpq import (build_ivfpq_index,
                                                topk_ivfpq)
        from vtzero_ray.functions.pq import topk_pq

        idx = str(tmp_path / "ivfpq3")
        build_ivfpq_index(_ds(sf_dir), idx, sf_dir)
        full = topk_ivfpq(idx, sf_dir, k=5, n_queries=10,
                          nprobe=16).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        plain = topk_pq(_ds(sf_dir), sf_dir, k=5,
                        n_queries=10).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            full[["query_id", "vec_id", "pq_dist", "rank"]],
            plain[["query_id", "vec_id", "pq_dist", "rank"]],
            check_dtype=False)

        exact = topk_bruteforce(_ds(sf_dir), sf_dir, k=5,
                                n_queries=10).to_pandas()

        def recall(df):
            hits = 0
            for q in exact.query_id.unique():
                hits += len(set(df[df.query_id == q].vec_id)
                            & set(exact[exact.query_id == q].vec_id))
            return hits / len(exact)

        # recall is NOT guaranteed monotone in nprobe (a far vector
        # with a small COARSE distance in a newly probed partition can
        # displace a true neighbor — a real IVFPQ artifact); what IS
        # guaranteed is distance dominance: the sorted top-k distances
        # over a probe SUPERSET are element-wise <=
        lo = topk_ivfpq(idx, sf_dir, k=5, n_queries=10,
                        nprobe=2).to_pandas()
        for q in full.query_id.unique():
            dl = lo[lo.query_id == q].sort_values("pq_dist")
            df_ = full[full.query_id == q].sort_values("pq_dist")
            m = min(len(dl), len(df_))
            assert (df_.pq_dist.to_numpy()[:m]
                    <= dl.pq_dist.to_numpy()[:m]).all()
        assert recall(full) > 0.3   # PQ-only loss leaves real signal
        r1 = full[full["rank"] == 1]
        assert (r1.vec_id.to_numpy() == r1.query_id.to_numpy()).all()
        assert (r1.pq_dist.to_numpy() == 0).all()


class TestTrainedPQ:
    """Trained (per-subspace Lloyd) codebooks vs the first-N seed on a
    SKEWED corpus: the seed vectors all sit in one cluster, so first-N
    codebooks cannot represent the other — training must cut
    reconstruction error by a wide margin without hurting recall."""

    @pytest.fixture(scope="class")
    def skew_sf(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pqw

        rng = np.random.default_rng(11)
        N, dim, K = 240, 8, 16
        rows = []
        for i in range(N):
            if i < K or i % 3 == 0:
                v = rng.normal(1.0, 0.05, dim)     # cluster A (seed ids)
            else:
                v = rng.normal(-1.0, 0.1, dim)     # cluster B + spike
                v[i % dim] += (-1.5 if i % 2 else 1.5)
            rows.append(v)
        mat = np.stack(rows)
        d = tmp_path_factory.mktemp("pqskew")
        pqw.write_table(pa.table({
            "vec_id": pa.array(np.arange(N), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float64())),
        }), f"{d}/embeddings.parquet")
        return str(d), mat

    def test_trained_beats_first_n(self, ray_session, skew_sf):
        import ray.data as rd

        from vtzero_ray.functions.pq import (_encode_mat,
                                             load_pq_codebooks,
                                             quantize_unit,
                                             train_pq_codebooks)

        sf, mat = skew_sf
        N, K = mat.shape[0], 16
        ds = rd.read_parquet(f"{sf}/embeddings.parquet")
        cb0 = load_pq_codebooks(sf, n_sub=4, n_codes=K)
        cbT = train_pq_codebooks(ds, sf, n_sub=4, n_codes=K, n_iters=6)
        u = quantize_unit(mat)

        def recon_err(cb):
            codes = _encode_mat(u, cb)
            rec = np.concatenate([cb[codes[:, m], m]
                                  for m in range(cb.shape[1])], axis=1)
            return int(((u - rec) ** 2).sum())

        e0, eT = recon_err(cb0), recon_err(cbT)
        assert eT * 5 < e0     # wide-margin distortion win
        # codewords stay on the int64 grid (every later compare exact)
        assert cbT.dtype == np.int64

        def recall(cb, Q=30, k=5):
            qm = u[N - Q:]
            d_true = ((qm[:, None, :] - u[None, :, :]) ** 2).sum(axis=2)
            codes = _encode_mat(u, cb)
            lut = ((qm.reshape(Q, 4, 2)[:, None, :, :]
                    - cb[None, :, :, :]) ** 2).sum(axis=3)
            dist = np.zeros((Q, N), np.int64)
            for m in range(4):
                dist += lut[:, codes[:, m], m]
            hit = 0
            for qi in range(Q):
                t_ = set(np.lexsort((np.arange(N), d_true[qi]))[:k])
                g_ = set(np.lexsort((np.arange(N), dist[qi]))[:k])
                hit += len(t_ & g_)
            return hit / (Q * k)

        assert recall(cbT) >= recall(cb0)

    def test_trained_codebooks_thread_through_pipeline(self, ray_session,
                                                       skew_sf):
        """topk_pq/pq_codes accept the trained codebook and stay
        batching-independent (the determinism contract holds for ANY
        codebook, not just the first-N twin)."""
        import ray.data as rd

        from vtzero_ray.functions.pq import (pq_codes, topk_pq,
                                             train_pq_codebooks)

        sf, _ = skew_sf

        def ds():
            return rd.read_parquet(f"{sf}/embeddings.parquet")

        cbT = train_pq_codebooks(ds(), sf, n_sub=4, n_codes=16, n_iters=3)
        a = (topk_pq(ds(), sf, k=5, n_queries=6, n_codes=16,
                     codebooks=cbT).to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
        b = (topk_pq(ds().repartition(7), sf, k=5, n_queries=6,
                     n_codes=16, codebooks=cbT).to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
        assert a.equals(b) and len(a) == 30
        c1 = (pq_codes(ds(), sf, n_codes=16, codebooks=cbT).to_pandas()
              .sort_values(["vec_id", "sub"]).reset_index(drop=True))
        c2 = (pq_codes(ds().repartition(5), sf, n_codes=16,
                       codebooks=cbT).to_pandas()
              .sort_values(["vec_id", "sub"]).reset_index(drop=True))
        assert c1.equals(c2)


class TestTrainedIVFPQ:
    def test_trained_index_round_trips_through_files(self, ray_session,
                                                     sf_dir, tmp_path):
        """A trained IVF-PQ index persists its trained quantizers and
        topk_ivfpq serves them back unchanged — no code path differs
        between first-N and trained indexes after the build."""
        import numpy as np

        from vtzero_ray.functions.ivfpq import (_load_codebooks,
                                                build_ivfpq_index,
                                                topk_ivfpq)
        from vtzero_ray.functions.ann import load_ivf_centroids
        from vtzero_ray.functions.pq import load_pq_codebooks

        idx0 = str(tmp_path / "ivfpq_first_n")
        idxT = str(tmp_path / "ivfpq_trained")
        build_ivfpq_index(_ds(sf_dir), idx0, sf_dir)
        build_ivfpq_index(_ds(sf_dir), idxT, sf_dir,
                          train_iters=2, pq_train_iters=2)
        # the trained quantizers land in the index files and differ
        # from the first-N seeds
        cb_seed = load_pq_codebooks(sf_dir)
        cbT = _load_codebooks(idxT).reshape(cb_seed.shape)
        assert (cbT != cb_seed).any()
        _, cm0 = load_ivf_centroids(idx0)
        _, cmT = load_ivf_centroids(idxT)
        assert (cmT != cm0).any()
        # both serve deterministic full-rank results
        a = topk_ivfpq(idxT, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = topk_ivfpq(idxT, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b) and len(a) > 0
        assert (a.groupby("query_id")["rank"].min() == 1).all()


def _split_ds(sf_dir, pred):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def f(t):
        ids = t.column("vec_id").to_numpy()
        mask = np.broadcast_to(np.asarray(pred(ids), dtype=bool), ids.shape)
        return t.filter(pa.array(np.ascontiguousarray(mask)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


class TestExtendIndexes:
    def test_ivf_extend_equals_full_build(self, ray_session, sf_dir,
                                          tmp_path):
        """index(A) + extend(B) must answer queries identically to a
        fresh index over A ∪ B: the stored centroids partition both the
        base and every extension, so the probed candidate sets are the
        same vectors."""
        import glob
        import os
        import shutil

        from vtzero_ray.functions.ann import (extend_ivf_index,
                                              topk_ivf_indexed)
        from vtzero_ray.functions.ann import build_ivf_index

        inc = str(tmp_path / "ivf_inc")
        full = str(tmp_path / "ivf_full")
        build_ivf_index(_split_ds(sf_dir, lambda i: i % 2 == 0), inc,
                        sf_dir)
        ext = extend_ivf_index(inc, _split_ds(sf_dir, lambda i: i % 2 == 1))
        assert os.path.isdir(ext)
        build_ivf_index(_split_ds(sf_dir, lambda i: True), full, sf_dir)
        a = topk_ivf_indexed(inc, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = topk_ivf_indexed(full, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b) and len(a) > 0

        # pruning survives extension: unprobed partitions (base AND
        # extension) can vanish without changing the answer
        from vtzero_ray.functions.ann import (_query_probes,
                                              load_ivf_centroids,
                                              load_queries_quantized)
        import numpy as np

        cids, cmat = load_ivf_centroids(inc)
        qids, qmat = load_queries_quantized(sf_dir, 10)
        probed = set(np.unique(
            _query_probes(qmat, qids, cids, cmat, 4)).tolist())
        for d in glob.glob(f"{inc}/corpus/cpart=*") + \
                glob.glob(f"{inc}/extend-*/cpart=*"):
            if int(d.rsplit("=", 1)[1]) not in probed:
                shutil.rmtree(d)
        c = topk_ivf_indexed(inc, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert c.equals(a)

    def test_ivfpq_extend_equals_full_build(self, ray_session, sf_dir,
                                            tmp_path):
        from vtzero_ray.functions.ivfpq import (build_ivfpq_index,
                                                extend_ivfpq_index,
                                                topk_ivfpq)

        inc = str(tmp_path / "ivfpq_inc")
        full = str(tmp_path / "ivfpq_full")
        build_ivfpq_index(_split_ds(sf_dir, lambda i: i % 2 == 0), inc,
                          sf_dir)
        extend_ivfpq_index(inc, _split_ds(sf_dir, lambda i: i % 2 == 1))
        build_ivfpq_index(_split_ds(sf_dir, lambda i: True), full, sf_dir)
        a = topk_ivfpq(inc, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = topk_ivfpq(full, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b) and len(a) > 0

    def test_trained_ivfpq_extends_with_stored_quantizers(
            self, ray_session, sf_dir, tmp_path):
        """Extending a TRAINED index uses the quantizers read back from
        the index files — the extension's stored codes must equal
        encoding the shard directly with those quantizers."""
        import glob

        import numpy as np
        import pyarrow.parquet as pqr

        from vtzero_ray.functions.ivfpq import (_load_codebooks,
                                                build_ivfpq_index,
                                                extend_ivfpq_index)
        from vtzero_ray.functions.pq import _encode_mat, quantize_unit

        idx = str(tmp_path / "ivfpq_trained")
        build_ivfpq_index(_split_ds(sf_dir, lambda i: i % 2 == 0), idx,
                          sf_dir, train_iters=2, pq_train_iters=2)
        ext = extend_ivfpq_index(idx,
                                 _split_ds(sf_dir, lambda i: i % 2 == 1))
        cb = _load_codebooks(idx)
        cb = cb.reshape(cb.shape[0], 4, -1)
        got = pa.concat_tables([
            pqr.read_table(f) for f in
            glob.glob(f"{ext}/cpart=*/*.parquet")]).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        shard = _split_ds(sf_dir, lambda i: i % 2 == 1).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        want = _encode_mat(
            quantize_unit(np.stack(shard["embedding"].to_numpy())), cb)
        codes = got[[f"code_{m}" for m in range(4)]].to_numpy()
        np.testing.assert_array_equal(codes, want)

    def test_compaction_folds_generations(self, ray_session, sf_dir,
                                          tmp_path):
        """compact_index(base+extensions) serves identical answers from
        a single generation, for BOTH index layouts."""
        import glob
        import os

        from vtzero_ray.functions.ann import (build_ivf_index,
                                              compact_index,
                                              extend_ivf_index,
                                              topk_ivf_indexed)
        from vtzero_ray.functions.ivfpq import (build_ivfpq_index,
                                                extend_ivfpq_index,
                                                topk_ivfpq)

        inc = str(tmp_path / "ivf_inc")
        comp = str(tmp_path / "ivf_comp")
        build_ivf_index(_split_ds(sf_dir, lambda i: i % 2 == 0), inc,
                        sf_dir)
        extend_ivf_index(inc, _split_ds(sf_dir, lambda i: i % 2 == 1))
        compact_index(inc, comp)
        assert not glob.glob(f"{comp}/extend-*")
        a = topk_ivf_indexed(inc, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = topk_ivf_indexed(comp, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b) and len(a) > 0

        pinc = str(tmp_path / "pq_inc")
        pcomp = str(tmp_path / "pq_comp")
        build_ivfpq_index(_split_ds(sf_dir, lambda i: i % 2 == 0), pinc,
                          sf_dir)
        extend_ivfpq_index(pinc, _split_ds(sf_dir, lambda i: i % 2 == 1))
        compact_index(pinc, pcomp)
        assert os.path.isfile(f"{pcomp}/codebooks.parquet")
        c = topk_ivfpq(pinc, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        d = topk_ivfpq(pcomp, sf_dir).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert c.equals(d) and len(c) > 0


class TestRefinedIVFPQ:
    def test_refine_not_worse_than_adc(self, ray_session, sf_dir,
                                       tmp_path):
        """Exact re-ranking of the PQ pool can only improve agreement
        with exact search (it IS exact search on the pool)."""
        from vtzero_ray.functions.ann import topk_bruteforce
        from vtzero_ray.functions.ivfpq import (build_ivfpq_index,
                                                topk_ivfpq,
                                                topk_ivfpq_refined)

        idx = str(tmp_path / "ivfpq")
        build_ivfpq_index(_split_ds(sf_dir, lambda i: i >= 0), idx, sf_dir)
        exact = topk_bruteforce(_split_ds(sf_dir, lambda i: i >= 0),
                                sf_dir, k=5, n_queries=8).to_pandas()
        adc = topk_ivfpq(idx, sf_dir, k=5, n_queries=8).to_pandas()
        ref = topk_ivfpq_refined(idx, sf_dir, k=5, n_queries=8,
                                 rerank=20).to_pandas()
        ek = set(zip(exact.query_id, exact.vec_id))
        ak = set(zip(adc.query_id, adc.vec_id))
        rk = set(zip(ref.query_id, ref.vec_id))
        assert len(rk & ek) >= len(ak & ek)
        # rank-1 self match survives refinement (the query's own vector
        # has cosine 1.0 and is always in its own probe pool)
        e1 = exact[exact["rank"] == 1].set_index("query_id").vec_id
        r1 = ref[ref["rank"] == 1].set_index("query_id").vec_id
        assert (e1 == r1.reindex(e1.index)).all()
