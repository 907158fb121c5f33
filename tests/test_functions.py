"""Dedup / ANN / join operators vs brute-force oracles (sf0.001)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()


@pytest.fixture(scope="module")
def emb(sf_dir):
    df = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"]).to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return df["vec_id"].to_numpy(), mat


class TestMinHash:
    def test_signature_estimates_jaccard(self):
        from vtzero_ray.functions.dedup import MinHasher, _shingle_hashes

        mh = MinHasher(n_perm=256)
        a = "the quick brown fox jumps over the lazy dog and runs far away today"
        b = "the quick brown fox jumps over the lazy dog and runs far away now then"
        sa, sb = mh.signature(a), mh.signature(b)
        est = (sa == sb).mean()
        ha, hb = _shingle_hashes(a), _shingle_hashes(b)
        inter = np.intersect1d(ha, hb).shape[0]
        true_j = inter / (ha.shape[0] + hb.shape[0] - inter)
        assert abs(est - true_j) < 0.2

    def test_identical_docs_always_candidates(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.dedup import minhash_lsh_candidates

        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma delta epsilon zeta eta theta"] * 2
            + ["completely different words here nothing shared at all"],
        })
        out = minhash_lsh_candidates(rd.from_pandas(df)).to_pandas()
        pairs = set(zip(out.doc_a, out.doc_b))
        assert (1, 2) in pairs

    def test_degenerate_bucket_caps_to_star(self, ray_session):
        """A bucket above max_bucket emits a star around the min doc_id
        (O(n) pairs), not the O(n²) clique — and transitive closure still
        links every member of the dup cluster."""
        import ray.data as rd

        from vtzero_ray.functions.dedup import minhash_lsh_candidates

        n = 12
        df = pd.DataFrame({
            "doc_id": list(range(1, n + 1)),
            "text": ["alpha beta gamma delta epsilon zeta eta theta"] * n,
        })
        out = minhash_lsh_candidates(rd.from_pandas(df), max_bucket=4).to_pandas()
        pairs = set(zip(out.doc_a, out.doc_b))
        # star: every doc paired with min id 1, and nothing else
        assert pairs == {(1, b) for b in range(2, n + 1)}
        # uncapped: full clique
        full = minhash_lsh_candidates(rd.from_pandas(df)).to_pandas()
        assert len(full) == n * (n - 1) // 2

    def test_lsh_recall_vs_bruteforce(self, ray_session, docs):
        """All high-Jaccard pairs must be LSH candidates (16 bands x 8 rows
        → pairs with J>=0.7 hit a band w.p. >0.99)."""
        import ray.data as rd

        from vtzero_ray.functions.dedup import (_shingle_hashes,
                                                minhash_lsh_candidates)

        sub = docs.head(200)
        sh = {r.doc_id: _shingle_hashes(r.text) for r in sub.itertuples()}
        true_pairs = set()
        ids = list(sh)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = sh[ids[i]], sh[ids[j]]
                inter = np.intersect1d(a, b, assume_unique=True).shape[0]
                u = a.shape[0] + b.shape[0] - inter
                if u and inter / u >= 0.7:
                    true_pairs.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
        out = minhash_lsh_candidates(rd.from_pandas(sub)).to_pandas()
        got = set(zip(out.doc_a, out.doc_b))
        assert true_pairs <= got


class TestSimHash:
    def test_similar_docs_close_hamming(self):
        from vtzero_ray.functions.dedup import SimHasher

        sh = SimHasher()
        a = sh.signature("the quick brown fox jumps over the lazy dog " * 5)
        b = sh.signature("the quick brown fox jumps over the lazy cat " * 5)
        c = sh.signature("completely unrelated text about databases and queries")
        ham_ab = bin(a ^ b).count("1")
        ham_ac = bin(a ^ c).count("1")
        assert ham_ab < ham_ac

    def test_banded_hamming_join(self, ray_session):
        """Identical docs pair at hamming 0; unrelated docs don't pair
        within the threshold; pigeonhole recall holds for small hamming."""
        import ray.data as rd

        from vtzero_ray.functions.dedup import SimHasher, simhash_near_dups

        base = "the quick brown fox jumps over the lazy dog and runs away"
        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [base, base,
                     base.replace("dog", "cat"),
                     "completely unrelated words about database shuffles"],
        })
        out = simhash_near_dups(rd.from_pandas(df), max_hamming=8).to_pandas()
        got = {(a, b): h for a, b, h in zip(out.doc_a, out.doc_b, out.hamming)}
        assert got[(1, 2)] == 0
        sh = SimHasher()
        s1 = sh.signature(base)
        s3 = sh.signature(base.replace("dog", "cat"))
        ham13 = bin(s1 ^ s3).count("1")
        shares_band = any((s1 >> (16 * b)) & 0xFFFF == (s3 >> (16 * b)) & 0xFFFF
                          for b in range(4))
        if ham13 <= 8 and shares_band:
            assert (1, 3) in got and got[(1, 3)] == ham13
        assert (1, 4) not in got and (2, 4) not in got


class TestANN:
    def test_bruteforce_matches_numpy(self, ray_session, sf_dir, emb):
        import ray.data as rd

        from vtzero_ray.functions.ann import topk_bruteforce

        ids, mat = emb
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        out = topk_bruteforce(ds, sf_dir, k=5, n_queries=5).to_pandas()
        # oracle: full similarity matrix for the 5 smallest vec_ids
        order = np.argsort(ids)[:5]
        sims = np.round(mat[order] @ mat.T, 6)
        for qi, row in zip(order, sims):
            cand = sorted(zip(-row, ids), key=lambda t: (t[0], t[1]))[:5]
            expect = [int(v) for _, v in cand]
            got = out[out.query_id == ids[qi]].sort_values("rank").vec_id.tolist()
            assert got == expect

    def test_lsh_recall(self, ray_session, sf_dir):
        import ray.data as rd

        from vtzero_ray.functions.ann import topk_bruteforce, topk_lsh

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        exact = topk_bruteforce(ds, sf_dir, k=5, n_queries=5).to_pandas()
        approx = topk_lsh(ds, sf_dir, k=5, n_queries=5).to_pandas()
        # query point itself always lands in its own bucket → rank-1 recall 1.0
        e1 = exact[exact["rank"] == 1].set_index("query_id").vec_id
        a1 = approx[approx["rank"] == 1].set_index("query_id").vec_id
        assert (e1 == a1.reindex(e1.index)).all()
        # overall recall reasonable
        ek = set(zip(exact.query_id, exact.vec_id))
        ak = set(zip(approx.query_id, approx.vec_id))
        assert len(ek & ak) / len(ek) > 0.3

    def test_multiprobe_lifts_recall_at_fixed_candidate_budget(self):
        """Multi-probe LSH (Lv et al. 2007): flipping the lowest-|margin|
        bits must (a) strictly beat single-probe recall at the same
        table count, and (b) match single-probe recall achieved with 3×
        the tables while generating FEWER candidates — recall per
        candidate budget improves, which is the whole point."""
        from vtzero_ray.functions.ann import (_int_probe_buckets,
                                              lsh_candidate_scores,
                                              quantize, sign_tensor)

        rng = np.random.default_rng(7)
        dim, N, Q, k = 8, 400, 12, 5
        mat_f = rng.normal(size=(N, dim))
        mat_f /= np.linalg.norm(mat_f, axis=1, keepdims=True)
        mat = quantize(mat_f)
        ids = np.arange(N, dtype=np.int64)
        qids, qmat = ids[:Q], mat[:Q]
        s = (qmat @ mat.T).astype(np.float64) / \
            np.sqrt((mat * mat).sum(axis=1))
        truth = [set(np.lexsort((np.arange(N), -s[i]))[:k].tolist())
                 for i in range(Q)]

        def run(n_tables, n_probes):
            signs = sign_tensor(n_tables, 8, dim)
            qb = _int_probe_buckets(qmat, signs, n_probes)
            df = lsh_candidate_scores(ids, mat, qids, qmat, signs,
                                      qb).to_pandas()
            hit = 0
            for i in range(Q):
                g = df[df.query_id == qids[i]] \
                    .sort_values(["score", "vec_id"],
                                 ascending=[False, True]).head(k) \
                    .vec_id.tolist()
                hit += len(set(g) & truth[i])
            return len(df), hit / (Q * k)

        c_sp, r_sp = run(2, 1)
        c_mp, r_mp = run(2, 4)
        c_sp6, r_sp6 = run(6, 1)
        assert r_mp > r_sp                      # same tables, better recall
        assert r_mp >= r_sp6 and c_mp < c_sp6   # 1/3 the tables, fewer
        #                                         candidates, equal recall

    def test_multiprobe_probe_set_shape(self):
        """Probe 0 is the exact bucket; extra probes are Hamming-1 flips
        of distinct bits, deterministic under the (|margin|, bit) order."""
        from vtzero_ray.functions.ann import (_int_buckets,
                                              _int_probe_buckets,
                                              sign_tensor)

        rng = np.random.default_rng(3)
        qmat = rng.integers(-4096, 4096, size=(6, 8)).astype(np.int64)
        signs = sign_tensor(2, 8, 8)
        base = _int_buckets(qmat, signs)
        mp = _int_probe_buckets(qmat, signs, 4)
        assert (mp[:, 0, :] == base).all()
        for t in range(2):
            for qi in range(6):
                flips = mp[t, 1:, qi] ^ base[t, qi]
                # each probe flips exactly one DISTINCT bit
                assert all(f > 0 and (f & (f - 1)) == 0 for f in flips)
                assert len(set(flips.tolist())) == 3
        with pytest.raises(ValueError, match="n_probes"):
            _int_probe_buckets(qmat, signs, 10)

    def test_lsh_prunes_compute(self, sf_dir):
        """The candidate dot products are computed only over bucket-hit
        columns — the gathered matrix must be smaller than the full corpus
        (VERDICT r2 #3: pruning must prune COMPUTE, not just output)."""
        import pyarrow.parquet as pq

        from vtzero_ray.functions.ann import (_int_buckets,
                                              load_queries_quantized,
                                              lsh_candidate_scores,
                                              quantize, sign_tensor)

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        mat = quantize(np.stack(t.column("embedding").to_numpy(zero_copy_only=False)))
        qids, qmat = load_queries_quantized(sf_dir, 10)
        signs = sign_tensor(4, 8, qmat.shape[1])
        qb = _int_buckets(qmat, signs)
        out = lsh_candidate_scores(ids, mat, qids, qmat, signs, qb)
        n_hit_cols = out.column("vec_id").to_pandas().nunique()
        assert 0 < n_hit_cols < len(ids)
        # every candidate pair's dot is exact: spot-check against numpy
        df = out.to_pandas()
        id_pos = {int(v): i for i, v in enumerate(ids)}
        q_pos = {int(v): i for i, v in enumerate(qids)}
        for r in df.head(20).itertuples():
            expect = int(qmat[q_pos[r.query_id]] @ mat[id_pos[r.vec_id]])
            assert r.qdot == expect

    def test_ivf_prunes_and_recalls(self, ray_session, sf_dir):
        """IVF: self-match at rank 1 (the query's own centroid is always
        probed), candidates only from probed centroid buckets, reasonable
        recall vs exact."""
        import ray.data as rd

        from vtzero_ray.functions.ann import (assign_centroids,
                                              load_centroids, topk_bruteforce,
                                              topk_ivf)

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        exact = topk_bruteforce(ds, sf_dir, k=5, n_queries=5).to_pandas()
        approx = topk_ivf(ds, sf_dir, k=5, n_queries=5,
                          n_centroids=16, nprobe=4).to_pandas()
        e1 = exact[exact["rank"] == 1].set_index("query_id").vec_id
        a1 = approx[approx["rank"] == 1].set_index("query_id").vec_id
        assert (e1 == a1.reindex(e1.index)).all()
        ek = set(zip(exact.query_id, exact.vec_id))
        ak = set(zip(approx.query_id, approx.vec_id))
        assert len(ek & ak) / len(ek) > 0.3
        # the index buckets the whole corpus across the centroid set
        import ray

        idx = assign_centroids(ds, ray.put(load_centroids(sf_dir, 16)))
        cents = idx.to_pandas()
        assert cents["centroid_id"].nunique() > 1
        assert len(cents) == ds.count()


    def test_ivf_index_persist_and_prune(self, ray_session, sf_dir, tmp_path):
        """build_ivf_index once; querying twice reuses the artifact, reads
        fewer rows than the corpus (file-level partition skip), and matches
        the non-indexed topk_ivf byte-for-byte."""
        import os

        import ray.data as rd

        from vtzero_ray.functions.ann import (_query_probes, build_ivf_index,
                                              load_ivf_centroids,
                                              load_queries_quantized,
                                              topk_ivf, topk_ivf_indexed)

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        idx = str(tmp_path / "ivf")
        build_ivf_index(ds, idx, sf_dir, n_centroids=16)
        parts = [d for d in os.listdir(f"{idx}/corpus") if d.startswith("cpart=")]
        assert len(parts) > 4  # corpus spread across buckets

        a = topk_ivf_indexed(idx, sf_dir, k=5, n_queries=2, nprobe=2).to_pandas()
        b = topk_ivf_indexed(idx, sf_dir, k=5, n_queries=2, nprobe=2).to_pandas()
        assert a.equals(b)

        # pruned read: only probed partitions are scanned
        cids, cmat = load_ivf_centroids(idx)
        qids, qmat = load_queries_quantized(sf_dir, 2)
        probe_set = set(np.unique(_query_probes(qmat, qids, cids, cmat, 2)).tolist())
        assert len(probe_set) < len(parts)
        import glob

        pruned_rows = rd.read_parquet(
            [f for c in sorted(probe_set)
             for f in glob.glob(f"{idx}/corpus/cpart={c}/*.parquet")]).count()
        assert 0 < pruned_rows < ds.count()

        # byte-equal to the non-indexed path
        full = topk_ivf(ds, sf_dir, k=5, n_queries=2,
                        n_centroids=16, nprobe=2).to_pandas()
        assert a.reset_index(drop=True).equals(full.reset_index(drop=True))

    def test_ivf_index_build_is_atomic(self, ray_session, sf_dir, tmp_path):
        """The index dir appears only as a complete artifact (rename
        publish): centroids.parquet presence implies completeness, and a
        second build onto an existing index leaves it untouched (the loser
        of a concurrent race discards its copy) — ADVICE r3 #1."""
        import glob
        import os

        import ray.data as rd

        from vtzero_ray.functions.ann import build_ivf_index

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        idx = str(tmp_path / "ivf_atomic")
        build_ivf_index(ds, idx, sf_dir, n_centroids=16)
        assert os.path.isfile(f"{idx}/centroids.parquet")
        files_before = sorted(glob.glob(f"{idx}/corpus/**/*.parquet",
                                        recursive=True))
        rows_before = rd.read_parquet(files_before).count()

        # simulate the losing concurrent builder: rebuild onto the same dir
        build_ivf_index(ds, idx, sf_dir, n_centroids=16)
        files_after = sorted(glob.glob(f"{idx}/corpus/**/*.parquet",
                                       recursive=True))
        assert files_after == files_before  # no duplicated row files
        assert rd.read_parquet(files_after).count() == rows_before
        # no leftover temp build dirs
        assert not glob.glob(f"{idx}.building.*")


class TestTrainedCentroids:
    """Deterministic k-means (train_centroids): on a skewed corpus whose
    first-N vectors all sit in the dominant cluster, trained centroids
    must beat the first-N seed on minority-cluster recall at fixed nprobe
    (VERDICT r3 #4)."""

    DIM = 8
    N_CENT = 16

    def _skewed(self):
        """900 docs near e0, 120 near e1, 60 near e2; vec_ids 0..15 are
        ALL in the dominant e0 cluster (worst case for first-N seeding)."""
        rng = np.random.default_rng(7)
        import numpy as _np

        def cluster(axis, n, sigma):
            m = rng.normal(0, sigma, size=(n, self.DIM))
            m[:, axis] += 1.0
            return m

        # broad minority clusters: their members scatter across the all-A
        # seed buckets, so fixed-nprobe probing misses neighbors unless
        # training dedicates centroids to them
        mat = _np.concatenate([cluster(0, 900, 0.05), cluster(1, 120, 0.2),
                               cluster(2, 60, 0.2)])
        ids = _np.arange(mat.shape[0], dtype=_np.int64)
        labels = _np.array([0] * 900 + [1] * 120 + [2] * 60)
        return ids, mat, labels

    @staticmethod
    def _recall(qmat_i, ids, mat_i, cids, cmat, k, nprobe):
        """IVF recall@k vs exact, pure-numpy mirror of the engine's
        exact-int assignment/probing/scoring formulas."""
        from vtzero_ray.functions.ann import _query_probes

        cnorm = np.sqrt((cmat * cmat).sum(1).astype(np.float64))
        sim = (cmat @ mat_i.T).astype(np.float64) / cnorm[:, None]
        assign = cids[np.argmax(sim, axis=0)]
        probes = _query_probes(qmat_i, np.arange(len(qmat_i)), cids, cmat,
                               nprobe)
        norms = np.sqrt((mat_i * mat_i).sum(1).astype(np.float64))
        qs = (qmat_i @ mat_i.T).astype(np.float64) / norms[None, :]
        hits = 0
        for qi in range(len(qmat_i)):
            exact = set(ids[np.lexsort((ids, -qs[qi]))[:k]].tolist())
            m = np.isin(assign, probes[qi])
            got_ids, got_sc = ids[m], qs[qi][m]
            got = set(got_ids[np.lexsort((got_ids, -got_sc))[:k]].tolist())
            hits += len(exact & got)
        return hits / (k * len(qmat_i))

    def test_trained_beats_first_n_on_skewed_minorities(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.ann import quantize, train_centroids

        ids, mat, labels = self._skewed()
        df = pd.DataFrame({"vec_id": ids,
                           "embedding": [row.tolist() for row in mat]})
        ds = rd.from_pandas(df)
        mat_i = quantize(mat)

        seed_ids = ids[:self.N_CENT]
        seed_mat = mat_i[:self.N_CENT]
        tc, tm = train_centroids(ds, self.N_CENT, n_iters=5,
                                 seed_centroids=(seed_ids, seed_mat))

        # queries: 5 from each minority cluster
        q_idx = np.concatenate([np.where(labels == 1)[0][:5],
                                np.where(labels == 2)[0][:5]])
        qmat_i = mat_i[q_idx]
        r_seed = self._recall(qmat_i, ids, mat_i, seed_ids, seed_mat,
                              k=10, nprobe=2)
        r_trained = self._recall(qmat_i, ids, mat_i, tc, tm, k=10, nprobe=2)
        assert r_trained > r_seed + 0.1, (r_seed, r_trained)
        assert r_trained >= 0.95, r_trained

    def test_training_is_deterministic_and_on_grid(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.ann import quantize, train_centroids

        ids, mat, _ = self._skewed()
        df = pd.DataFrame({"vec_id": ids,
                           "embedding": [row.tolist() for row in mat]})
        seed = (ids[:self.N_CENT], quantize(mat)[:self.N_CENT])
        a = train_centroids(rd.from_pandas(df), self.N_CENT, n_iters=3,
                            seed_centroids=seed)
        b = train_centroids(rd.from_pandas(df), self.N_CENT, n_iters=3,
                            seed_centroids=seed)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
        assert a[1].dtype == np.int64  # stays on the QSCALE grid
        # mini-batch path: deterministic subsample, still converges
        c = train_centroids(rd.from_pandas(df), self.N_CENT, n_iters=3,
                            seed_centroids=seed, sample_mod=2)
        d = train_centroids(rd.from_pandas(df), self.N_CENT, n_iters=3,
                            seed_centroids=seed, sample_mod=2)
        assert np.array_equal(c[1], d[1])

    def test_build_ivf_index_trained(self, ray_session, sf_dir, tmp_path):
        """build_ivf_index(train_iters>0) publishes trained centroids;
        the indexed search still runs, is deterministic, and the default
        (first-N) path is untouched."""
        import ray.data as rd

        from vtzero_ray.functions.ann import (build_ivf_index,
                                              load_centroids,
                                              load_ivf_centroids,
                                              topk_ivf_indexed)

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        idx = str(tmp_path / "ivf_trained")
        build_ivf_index(ds, idx, sf_dir, n_centroids=16, train_iters=3)
        cids, cmat = load_ivf_centroids(idx)
        assert len(cids) == 16
        _, seed_mat = load_centroids(sf_dir, 16)
        assert not np.array_equal(cmat, seed_mat)  # training moved them
        a = topk_ivf_indexed(idx, sf_dir, k=5, n_queries=3, nprobe=2).to_pandas()
        b = topk_ivf_indexed(idx, sf_dir, k=5, n_queries=3, nprobe=2).to_pandas()
        assert a.equals(b) and len(a) == 15


class TestHoppingWindow:
    def test_each_event_in_k_windows(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        from vtzero_ray.pipelines.relational import events_hopping_window

        out = events_hopping_window(sf_dir, window_s=3600, hop_s=900).to_pandas()
        n_events = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        assert out.n_events.sum() == 4 * n_events
        # brute-force a sample: an event at ts belongs to window w iff
        # w <= ts < w + window_s and w % hop_s == 0
        ev = pq.read_table(f"{sf_dir}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas().head(20)
        for r in ev.itertuples():
            t = int(r.ts.timestamp())
            expect = {(t // 900) * 900 - 900 * i for i in range(4)}
            got = set(out[out.event_type == r.event_type]
                      .window_start.map(lambda w: int(w.timestamp())))
            assert expect <= got


class TestDupClusters:
    @staticmethod
    def _brute_components(edges):
        lab = {}
        for a, b in edges:
            lab.setdefault(a, a)
            lab.setdefault(b, b)
        changed = True
        while changed:
            changed = False
            for a, b in edges:
                m = min(lab[a], lab[b])
                if lab[a] != m or lab[b] != m:
                    lab[a] = lab[b] = m
                    changed = True
        return lab

    def test_components_match_bruteforce(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.dedup import dup_clusters

        rng = np.random.default_rng(7)
        edges = [tuple(sorted(e)) for e in
                 rng.integers(0, 200, size=(300, 2)).tolist() if e[0] != e[1]]
        t = pa.table({"doc_a": pa.array([a for a, _ in edges], pa.int64()),
                      "doc_b": pa.array([b for _, b in edges], pa.int64())})
        got = dup_clusters(rd.from_arrow(t)).to_pandas()
        exp = self._brute_components(edges)
        assert dict(zip(got.doc_id, got.cluster_id)) == exp
        # every cluster id is its own cluster's min member
        assert (got.groupby("cluster_id").doc_id.min()
                == got.groupby("cluster_id").cluster_id.first()).all()

    def test_chain_across_blocks(self, ray_session):
        """A long path graph forces components to merge ACROSS blocks —
        the per-block forest compression must not break connectivity."""
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.dedup import dup_clusters

        n = 500
        t = pa.table({"doc_a": pa.array(list(range(n - 1)), pa.int64()),
                      "doc_b": pa.array(list(range(1, n)), pa.int64())})
        # many small input blocks: the chain is split across every block
        ds = rd.from_arrow(t).repartition(32)
        got = dup_clusters(ds).to_pandas()
        assert len(got) == n
        assert (got.cluster_id == 0).all()

    def test_empty_pairs(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.dedup import dup_clusters

        t = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
        got = dup_clusters(rd.from_arrow(t)).to_pandas()
        assert len(got) == 0


class TestEmbeddingNearDups:
    def test_lsh_subset_and_recall_vs_exact(self, ray_session, sf_dir):
        """The bucketed LSH path returns a subset of the exact all-pairs
        twin (identical cosine on shared pairs) with recall > 0.5 at the
        driver parameters — and runs as ONE bucket groupby, no O(B^2)
        block-pair fan-out."""
        import ray.data as rd

        from vtzero_ray.functions.dedup import (embedding_near_dups,
                                                embedding_near_dups_lsh)

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        exact = embedding_near_dups(ds, threshold=0.35).to_pandas()
        approx = embedding_near_dups_lsh(ds, threshold=0.35,
                                         n_bits=4, n_tables=8).to_pandas()
        ek = {(a, b): c for a, b, c in
              zip(exact.vec_a, exact.vec_b, exact.cosine)}
        ak = {(a, b): c for a, b, c in
              zip(approx.vec_a, approx.vec_b, approx.cosine)}
        assert set(ak) <= set(ek)
        for pair, c in ak.items():
            assert abs(c - ek[pair]) < 2e-6
        assert len(ak) / len(ek) > 0.5
        # pairs are unique (first-equal-table emission, no dup shuffle)
        assert len(approx) == len(set(ak))

    def test_lsh_star_guard_matches_sql_oracle(self, ray_session, sf_dir,
                                               caplog):
        """Force star-guard truncation (tiny max_bucket) and check the Ray
        result is EXACTLY the SQL oracle's — the oracle models the guard
        (first-equal-table attribution + star anchor at the group min),
        so divergence at scale is impossible, not just unlikely. Also
        asserts the truncation is loud (ADVICE r3: silent divergence)."""
        import logging as _logging

        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.dedup import (embedding_near_dups_lsh,
                                                embedding_near_dups_lsh_sql)

        import numpy as np
        import pandas as pd

        from vtzero_ray.functions.dedup import _verify_lsh_buckets

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        # n_bits=4 -> 16 buckets/table over 500 vectors: max_bucket=8
        # must truncate
        got = embedding_near_dups_lsh(
            ds, threshold=0.35, n_bits=4, n_tables=8,
            max_bucket=8).to_pandas()
        # loudness: the verify kernel (runs in workers distributed; here
        # in-process so caplog can see it) warns on truncation
        crowd = pd.DataFrame({
            "vec_id": np.arange(10, dtype=np.int64),
            "t": np.zeros(10, np.int32),
            "bucket": np.zeros(10, np.int64),
            "bvec": [np.zeros(8, np.int64)] * 10,
            "emb": [np.ones(4) / 2.0] * 10,
        })
        with caplog.at_level(_logging.WARNING,
                             logger="vtzero_ray.functions.dedup"):
            star = _verify_lsh_buckets(crowd, threshold=0.0, max_bucket=8)
        assert any("max_bucket" in r.message for r in caplog.records)
        assert len(star) == 9  # star around vec_id 0, not all 45 pairs
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')")
        want = con.execute(embedding_near_dups_lsh_sql(
            threshold=0.35, n_bits=4, n_tables=8, max_bucket=8)).df()
        con.close()
        key = ["vec_a", "vec_b"]
        got = got.sort_values(key).reset_index(drop=True)
        want = want.sort_values(key).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got.vec_a.to_numpy() == want.vec_a.to_numpy()).all()
        assert (got.vec_b.to_numpy() == want.vec_b.to_numpy()).all()
        assert (abs(got.cosine.to_numpy()
                    - want.cosine.to_numpy()) < 2e-6).all()

    def test_lsh_empty_corpus(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.dedup import embedding_near_dups_lsh

        empty = rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64()))}))
        out = embedding_near_dups_lsh(empty).to_pandas()
        assert len(out) == 0


class TestJoins:
    def test_pip_matches_l1_oracle(self):
        from vtzero_ray.stages.joins import PIPJoin, admin_polygons

        import pyarrow as pa

        rng = np.random.default_rng(3)
        lat_us = rng.integers(-80_000_000, 80_000_000, 500)
        lon_us = rng.integers(-180_000_000, 180_000_000, 500)
        batch = pa.table({"lat": lat_us / 1e6, "lon": lon_us / 1e6})
        got = PIPJoin()(batch).column("admin_id").to_numpy()
        polys = admin_polygons()
        expect = np.full(500, -1, dtype=np.int64)
        for i in range(len(polys) - 1, -1, -1):
            row = polys.iloc[i]
            inside = (np.abs(lat_us - row.cy_us) * 2 + np.abs(lon_us - row.cx_us) * 2) < (2 * row.r_us + 1)
            expect[inside] = row.admin_id
        assert (got == expect).all()

    def test_pip_cell_index_prunes_and_matches_full_scan(self):
        """VERDICT r3 #2: on a synthesized 10^4-polygon table the cell
        index probes a candidate set << P per cell, and assignment is
        byte-identical to the brute-force full O(P) scan."""
        import pyarrow as pa

        from vtzero_ray.stages.joins import (PIPJoin, _points_in_convex,
                                             admin_polygons)

        P = 10_000
        polys = admin_polygons(P)
        join = PIPJoin(polys)
        # pruning: mean candidate-list length over occupied cells << P
        sizes = np.array([len(v) for v in join.cells.values()])
        assert sizes.mean() < 0.05 * P, sizes.mean()
        assert sizes.max() < 0.25 * P, sizes.max()
        # exactness vs the unindexed full scan
        rng = np.random.default_rng(7)
        n = 2_000
        lat_us = rng.integers(-80_000_000, 80_000_000, n)
        lon_us = rng.integers(-180_000_000, 180_000_000, n)
        batch = pa.table({"lat": lat_us / 1e6, "lon": lon_us / 1e6})
        got = join(batch).column("admin_id").to_numpy()
        y2 = (lat_us * 2).astype(np.int64)
        x2 = (lon_us * 2).astype(np.int64)
        expect = np.full(n, -1, dtype=np.int64)
        aid = polys["admin_id"].to_numpy()
        for i in np.argsort(-aid, kind="stable"):
            hit = _points_in_convex(polys["ring2"].iloc[i], x2, y2)
            expect[hit] = aid[i]
        assert (got == expect).all()
        assert (got >= 0).any()  # probe actually exercises hits

    def test_knn_grid_matches_exact(self):
        import pyarrow as pa

        from vtzero_ray.stages.joins import KNNGrid, KNNJoin

        rng = np.random.default_rng(4)
        lat_us = rng.integers(-80_000_000, 80_000_000, 300)
        lon_us = rng.integers(-180_000_000, 180_000_000, 300)
        batch = pa.table({"lat": lat_us / 1e6, "lon": lon_us / 1e6})
        exact = KNNJoin()(batch)
        grid = KNNGrid()(batch)
        assert exact.column("poi_id").to_pylist() == grid.column("poi_id").to_pylist()
        assert exact.column("poi_d2").to_pylist() == grid.column("poi_d2").to_pylist()

    def test_knn_grid_cell_boundaries(self):
        """Points sitting exactly on grid-cell boundaries and directly on
        POI coordinates (d2=0, plus equidistant ties) must match the exact
        broadcast join."""
        import pyarrow as pa

        from vtzero_ray.stages.joins import KNNGrid, KNNJoin, poi_table

        pois = poi_table()
        px = pois["px_us"].to_numpy()[:50].astype(np.int64)
        py = pois["py_us"].to_numpy()[:50].astype(np.int64)
        cell = KNNGrid.CELL_US
        lon = np.concatenate([px, px - px % cell, px + (cell - px % cell) % cell])
        lat = np.concatenate([py, py - py % cell, py + (cell - py % cell) % cell])
        lat = np.clip(lat, -85_000_000, 85_000_000)
        lon = np.clip(lon, -179_999_999, 179_999_999)
        batch = pa.table({"lat": lat / 1e6, "lon": lon / 1e6})
        exact = KNNJoin()(batch)
        grid = KNNGrid()(batch)
        assert exact.column("poi_id").to_pylist() == grid.column("poi_id").to_pylist()
        assert exact.column("poi_d2").to_pylist() == grid.column("poi_d2").to_pylist()


class TestHLL:
    def test_accuracy_bound(self):
        from vtzero_ray.functions.sketch import HLL

        h = HLL(12)
        h.add_strings([f"item-{i}" for i in range(50000)])
        est = h.estimate()
        assert abs(est - 50000) / 50000 < 0.05  # ~1.04/sqrt(4096) = 1.6% std

    def test_merge_equals_union(self):
        from vtzero_ray.functions.sketch import HLL

        a, b = HLL(12), HLL(12)
        a.add_strings([f"a-{i}" for i in range(10000)])
        b.add_strings([f"a-{i}" for i in range(5000, 15000)])  # overlap 5k
        u = a.merge(b)
        assert abs(u.estimate() - 15000) / 15000 < 0.05
        # merge is idempotent and commutative
        assert (a.merge(b).registers == b.merge(a).registers).all()

    def test_serialization_roundtrip(self):
        from vtzero_ray.functions.sketch import HLL

        h = HLL(12)
        h.add_strings(["x", "y", "z"])
        h2 = HLL.from_bytes(h.to_bytes())
        assert (h.registers == h2.registers).all()

    def test_facts_match_duckdb_oracle(self):
        """Every fact column (incl. the float-derived estimate) must be
        reproduced exactly by the SQL oracle — the md5 hash and the
        single-expression estimate are designed for this."""
        import duckdb
        import pyarrow as pa

        from vtzero_ray.functions.sketch import HLL
        from vtzero_ray.functions.sketch_sql import hll_facts_sql

        texts = [f"doc {i} body" for i in range(777)] + ["doc 0 body"] * 5
        h = HLL(12)
        h.add_strings(texts, hash="md5")
        facts = h.facts()
        facts["column"] = "text"
        con = duckdb.connect()
        con.register("documents", pa.table({"text": texts}))
        row = con.execute(hll_facts_sql(12, "text", "documents")).fetchdf()
        got = row.to_dict("records")[0]
        assert got == facts

    def test_distributed_matches_exact(self, ray_session, sf_dir):
        import ray.data as rd

        from vtzero_ray.functions.sketch import approx_distinct

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        out = approx_distinct(ds, "text")
        exact = len(set(r["text"] for r in ds.take_all()))
        got = out.approx_distinct.iloc[0]
        assert abs(got - exact) / max(exact, 1) < 0.05


class TestCMS:
    def test_upper_bound_and_exactness(self):
        """CMS estimates are >= true counts, exact when the probe's
        buckets are collision-free, and 0-or-collision-mass for absent
        tokens."""
        import numpy as np

        from vtzero_ray.functions.sketch import CMS

        tokens = [f"tok{i}" for i in range(500)]
        counts = np.arange(1, 501, dtype=np.int64)
        c = CMS(w_bits=12, depth=4)
        c.add(tokens, counts)
        est = c.estimate(tokens)
        assert (est >= counts).all()
        # 500 tokens in 4096 buckets x 4 rows: min-over-rows is exact for
        # the overwhelming majority; require > 90% exact
        assert (est == counts).mean() > 0.9
        assert int(c.estimate(["never_seen_tok"])[0]) >= 0

    def test_merge_order_independent(self):
        """Any split of the input into partial sketches merges to the
        SAME counters (integer addition commutes) — the property that
        makes the distributed result bit-deterministic."""
        import numpy as np

        from vtzero_ray.functions.sketch import CMS

        tokens = [f"w{i % 97}" for i in range(300)]
        counts = np.ones(300, np.int64)
        whole = CMS(10, 3)
        whole.add(tokens, counts)
        for cut in (1, 37, 150, 299):
            a, b = CMS(10, 3), CMS(10, 3)
            a.add(tokens[:cut], counts[:cut])
            b.add(tokens[cut:], counts[cut:])
            assert (b.merge(a).counters == whole.counters).all()

    def test_bytes_roundtrip(self):
        import numpy as np

        from vtzero_ray.functions.sketch import CMS

        c = CMS(9, 2)
        c.add(["x", "y", "x"], np.array([5, 7, 1], np.int64))
        c2 = CMS.from_bytes(c.to_bytes())
        assert c2.w_bits == 9 and c2.depth == 2
        assert (c2.counters == c.counters).all()

    def test_matches_duckdb_oracle(self):
        """Every probe estimate (incl. an absent token's collision mass)
        must be reproduced exactly by the SQL twin."""
        import duckdb
        import numpy as np
        import pyarrow as pa

        from vtzero_ray.functions.sketch import CMS, _split_tokens
        from vtzero_ray.functions.sketch_sql import cms_est_sql

        texts = [f"alpha beta g{i % 13} beta" for i in range(211)]
        tab = pa.table({"text": texts})
        vocab, counts, total = _split_tokens(tab, "text")
        c = CMS()
        c.add(vocab, counts)
        probes = ["alpha", "beta", "g0", "g12", "zz_absent"]
        est = c.estimate(probes)
        con = duckdb.connect()
        con.register("documents", tab)
        df = con.execute(cms_est_sql(probes)).fetchdf()
        got = dict(zip(df["token"], df["est"]))
        assert {p: int(e) for p, e in zip(probes, est)} == \
               {k: int(v) for k, v in got.items()}
        assert int(df["total_tokens"].iloc[0]) == total == 211 * 4

    def test_distributed_matches_local(self, ray_session, sf_dir):
        """cms_token_est over a repartitioned Dataset == one local sketch
        over the whole table (merge determinism end-to-end), and est ==
        exact count for the head tokens at this scale."""
        import duckdb
        import pyarrow.parquet as pq
        import ray.data as rd

        from vtzero_ray.functions.sketch import CMS, _split_tokens, \
            cms_token_est

        probes = ["join", "hash", "scan", "zz_absent"]
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["text"]).repartition(8)
        out = cms_token_est(ds, probes)
        tab = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        vocab, counts, total = _split_tokens(tab, "text")
        c = CMS()
        c.add(vocab, counts)
        assert out["est"].tolist() == c.estimate(probes).tolist()
        assert out["total_tokens"].iloc[0] == total
        con = duckdb.connect()
        con.register("documents", tab)
        exact = dict(con.execute(
            "WITH t AS (SELECT unnest(regexp_split_to_array(trim(text),"
            " '\\s+')) tok FROM documents WHERE trim(text) != '')"
            " SELECT tok, COUNT(*) FROM t WHERE tok != '' GROUP BY 1"
        ).fetchall())
        for p, e in zip(probes, out["est"]):
            assert e >= exact.get(p, 0)


class TestCorpusPipelines:
    def test_clean_corpus_subset_of_dedup(self, ray_session, sf_dir):
        """Every kept group must also exist in plain exact-dedup output,
        and keep_id must be the min doc_id of its md5 group."""
        from vtzero_ray.functions.dedup import dedup_exact
        from vtzero_ray.pipelines.corpus import clean_corpus

        import ray.data as rd

        cleaned = clean_corpus(sf_dir).to_pandas()
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        full = dedup_exact(docs).to_pandas().set_index("md5")
        assert len(cleaned) > 0
        for _, row in cleaned.iterrows():
            assert row["md5"] in full.index
            assert row["keep_id"] == full.loc[row["md5"], "keep_id"]
            assert row["n_dups"] == full.loc[row["md5"], "n_dups"]

    def test_clean_corpus_checkpoint_kill_and_resume(self, ray_session,
                                                     sf_dir, tmp_path):
        """Corpus checkpoint/resume (VERDICT r3 #7): a job killed mid-run
        keeps every partition that finished; the resumed run writes ONLY
        the missing buckets and the union equals a clean one-shot run."""
        from vtzero_ray.pipelines.corpus import (clean_corpus,
                                                 clean_corpus_checkpointed)
        from vtzero_ray.sources.checkpoint import (completed_parts,
                                                   read_partitioned)

        expect = clean_corpus(sf_dir).to_pandas() \
            .sort_values("md5").reset_index(drop=True)

        out = str(tmp_path / "corpus_ckpt")
        # run 1: injected crash on two buckets → the job fails, but every
        # OTHER partition's task already published atomically
        with pytest.raises(Exception):
            clean_corpus_checkpointed(sf_dir, out, n_parts=8,
                                      _fail_parts=frozenset({2, 5}))
        done1 = completed_parts(out)
        assert 0 < len(done1) <= 6 and not {2, 5} & done1

        # run 2 (resume): completes only the missing buckets
        s2 = clean_corpus_checkpointed(sf_dir, out, n_parts=8)
        assert sorted(done1) == s2["skipped_partitions"]
        assert s2["partitions"] == 8 - len(done1)
        assert completed_parts(out) == set(range(8))

        got = read_partitioned(out).to_pandas() \
            .drop(columns=["part"]).sort_values("md5").reset_index(drop=True)
        assert got[["md5", "keep_id", "n_dups"]].equals(
            expect[["md5", "keep_id", "n_dups"]])

        # run 3 (already complete): nothing rewritten
        s3 = clean_corpus_checkpointed(sf_dir, out, n_parts=8)
        assert s3["partitions"] == 0
        assert s3["skipped_partitions"] == list(range(8))

    def test_stratified_sample_exact_n_and_ranked(self, ray_session, sf_dir):
        from vtzero_ray.functions.dedup import hash_u64
        from vtzero_ray.pipelines.corpus import stratified_sample

        out = stratified_sample(sf_dir, n_per_group=7).to_pandas()
        sizes = out.groupby("lang").size()
        assert (sizes <= 7).all() and len(out) > 0
        # ranks are 1..n per group and ordered by (hash, doc_id)
        for lang, grp in out.groupby("lang"):
            grp = grp.sort_values("rank")
            assert list(grp["rank"]) == list(range(1, len(grp) + 1))
            hs = [hash_u64(f"samp:{int(d)}") for d in grp["doc_id"]]
            assert hs == sorted(hs)


class TestCellKNN:
    def test_cell_join_matches_broadcast(self, ray_session, sf_dir):
        import ray.data as rd

        from vtzero_ray.sources.pages import read_pages
        from vtzero_ray.stages.geoparse import geoparse
        from vtzero_ray.stages.joins import KNNJoin, cell_knn_join

        pts = geoparse(read_pages(sf_dir, include_html=False)) \
            .select_columns(["url", "lat", "lon"])
        cell = cell_knn_join(pts).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        bcast = pts.map_batches(KNNJoin, batch_format="pyarrow",
                                concurrency=2) \
            .select_columns(["url", "poi_id", "poi_d2"]).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        assert len(cell) == len(bcast)
        assert (cell.poi_id.to_numpy() == bcast.poi_id.to_numpy()).all()
        assert (cell.poi_d2.to_numpy() == bcast.poi_d2.to_numpy()).all()


class TestNgramTopK:
    def test_matches_bruteforce(self, ray_session, sf_dir):
        import pyarrow.parquet as pq
        import ray.data as rd
        from collections import Counter

        from vtzero_ray.functions.textstats import ngram_topk

        df = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["text", "lang"]).to_pandas()
        out = ngram_topk(rd.from_pandas(df), k=10).to_pandas() \
            .sort_values(["lang", "rnk"]).reset_index(drop=True)
        # brute force per lang
        for lang, g in df.groupby("lang"):
            c = Counter()
            for t in g["text"]:
                ws = t.strip().split()
                c.update(" ".join(p) for p in zip(ws, ws[1:]))
            want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            got = out[out.lang == lang]
            assert list(zip(got.ngram, got.n)) == want
            assert got.rnk.tolist() == list(range(1, len(want) + 1))


class TestLengthQuantiles:
    def test_matches_numpy_bruteforce(self, ray_session, sf_dir):
        import math

        import pyarrow.parquet as pq
        import ray.data as rd

        from vtzero_ray.functions.sketch import length_quantiles

        df = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["text", "lang"]).to_pandas()
        out = length_quantiles(rd.from_pandas(df)).to_pandas() \
            .sort_values(["lang", "p"]).reset_index(drop=True)
        for lang, g in df.groupby("lang"):
            lens = np.sort(g["text"].str.len().to_numpy())
            for p in (0.1, 0.5, 0.9, 0.99):
                want = int(lens[max(math.ceil(p * lens.shape[0]), 1) - 1])
                got = out[(out.lang == lang) & (out.p == p)].len_q.iloc[0]
                assert got == want, (lang, p)


class TestRedactPII:
    def _tab(self):
        import pyarrow as pa

        texts = [
            "write to alice.smith+x@sub.example.co.uk today",  # email w/ dots
            "two mails a@b.io and c_d%e@f-g.org here",          # two emails
            "call +1 555-0100 100 or 555 123 4567",             # phone shapes
            "no pii at all",
            "a@b.io sits by +44 20 7946 0958",                  # email + phone
            "",
            "not-an-email @ example . com and short 12-34",     # negatives
        ]
        return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts)})

    def test_matches_duckdb_twin(self, ray_session):
        """Same RE2 patterns through Arrow and DuckDB: identical clean
        text and counts on adversarial shapes (multi-match, boundary
        digits, empty strings, near-misses)."""
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.textstats import redact_pii, redact_pii_sql

        tab = self._tab()
        got = (redact_pii(rd.from_arrow(tab).repartition(3)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(redact_pii_sql(synth=False)).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    def test_semantics(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.textstats import redact_pii

        out = (redact_pii(rd.from_arrow(self._tab())).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert list(out.n_emails) == [1, 2, 0, 0, 1, 0, 0]
        assert "<EMAIL>" not in out.clean_text[3]
        assert out.clean_text[1].count("<EMAIL>") == 2
        assert "alice" not in out.clean_text[0]
        assert "<PHONE>" in out.clean_text[4]
        # near-misses survive untouched
        assert out.clean_text[6] == self._tab()["text"][6].as_py()

    def test_synth_contacts_twin(self, ray_session):
        """The deterministic PII-bearing corpus builder matches its SQL
        expression exactly (suffix cycling by doc_id % 3)."""
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.textstats import (synth_contacts,
                                                    synth_contacts_sql_expr)

        tab = self._tab()
        got = (synth_contacts(rd.from_arrow(tab)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = con.execute(
            f"SELECT doc_id, {synth_contacts_sql_expr()} AS text "
            "FROM documents ORDER BY doc_id").fetchdf()
        assert got.equals(want)
        assert got.text[1].endswith("@ex1.org")          # email only
        assert got.text[2].endswith(" now")              # email + phone
        assert got.text[3] == tab["text"][3].as_py()     # unchanged


class TestRepetitionStats:
    """Gopher-style repetition signals: hand-checked masses, tie-break,
    unicode char lengths, DuckDB-twin equality, composite-key helper."""

    def _tab(self):
        import pyarrow as pa

        texts = [
            "a b a b a b",                    # top bigram "a b" x3
            "x y x y x y x y x y",            # duplicated 5-grams
            "b a a b",                        # all-tie -> smallest gram
            "solo",                           # < 2 tokens
            "",                               # empty doc
            "  padded   spaces  ",            # trim + empty-drop semantics
            "的 是 的 是 的",                  # unicode char (not byte) mass
        ]
        return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts)})

    def test_hand_checked(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.textstats import repetition_stats

        out = (repetition_stats(rd.from_arrow(self._tab()).repartition(3))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out.n_tokens) == [6, 10, 4, 1, 0, 2, 5]
        assert out.top2_gram[0] == "a b" and out.top2_cnt[0] == 3
        assert out.top2_chars[0] == 9
        # "x y x y x" and "y x y x y" each occur 3 times
        assert out.dup5_distinct[1] == 2
        assert out.dup5_occ[1] == 6
        assert out.dup5_chars[1] == 6 * 9
        assert out.dup5_distinct[0] == 0          # 5-grams unique in doc 0
        assert out.top2_gram[2] == "a a"          # tie -> lexicographic min
        assert out.top2_gram[3] == "" and out.top2_cnt[3] == 0
        assert out.n_tokens[4] == 0
        assert out.top2_gram[5] == "padded spaces"
        # zh bigram is 3 CHARS, not 7 utf-8 bytes; tie "的 是"x2 vs
        # "是 的"x2 -> codepoint-smaller "是 的" (U+662F < U+7684)
        assert out.top2_gram[6] == "是 的" and out.top2_chars[6] == 2 * 3

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.textstats import (repetition_sql,
                                                    repetition_stats)

        tab = self._tab()
        got = (repetition_stats(rd.from_arrow(tab).repartition(4))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(repetition_sql()).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    def test_group_count_paths_agree(self):
        """Packed base-V keys and unique-rows produce identical groups
        (the rows path is the V**n-overflow fallback for huge vocabs)."""
        import numpy as np

        from vtzero_ray.functions.textstats import _group_count

        rng = np.random.RandomState(7)
        parts = [rng.randint(0, 9, 4000).astype(np.int64)
                 for _ in range(4)]
        packed_cols, packed_cnt = _group_count(parts, 9)
        rows = np.column_stack(parts)
        uniq, cnt = np.unique(rows, axis=0, return_counts=True)
        assert np.array_equal(packed_cnt, cnt)
        for i in range(4):
            assert np.array_equal(packed_cols[i], uniq[:, i])


class TestClusterSizes:
    def test_conservation_and_exact_assignment(self, ray_session):
        """Cluster sizes partition the corpus (counts and vec_id mass are
        conserved) and match a direct numpy nearest-centroid assignment."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from vtzero_ray.functions.ann import (cluster_sizes, load_centroids,
                                              quantize)

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        out = cluster_sizes(ds, sf, n_centroids=16).to_pandas()
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).to_pandas()
        assert out.n_vecs.sum() == len(t)
        assert out.sum_vec_id.sum() == t.vec_id.sum()
        # direct brute-force assignment
        cids, cmat = load_centroids(sf, 16)
        mat = quantize(np.stack(t.embedding.to_numpy()))
        cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
        sim = (cmat @ mat.T).astype(np.float64) / cnorm[:, None]
        best = cids[np.argmax(sim, axis=0)]
        want = (np.bincount(
            np.searchsorted(np.sort(np.unique(best)), best)))
        got = out.set_index("centroid_id").n_vecs
        for cid in np.unique(best):
            assert got[cid] == (best == cid).sum()
        # every centroid that captured nothing is absent from the output
        assert set(out.centroid_id) == set(np.unique(best))


class TestSemDeDup:
    def test_matches_duckdb_twin_and_semantics(self, ray_session):
        """Exact twin equality at sf0.001 plus semantic invariants:
        every cluster's min vec_id is kept; dup_of is always a smaller
        id in the same cluster; kept == (dup_of == -1)."""
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.ann import semdedup, semdedup_sql

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/embeddings.parquet").repartition(5)
        got = (semdedup(ds, sf, n_centroids=8, threshold=0.35).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf}/embeddings.parquet')")
        want = (con.execute(semdedup_sql(n_centroids=8, threshold=0.35))
                .df().sort_values("vec_id").reset_index(drop=True))
        assert got.equals(want)
        assert (got.kept == (got.dup_of < 0).astype("int64")).all()
        assert ((got.dup_of < got.vec_id) | (got.dup_of == -1)).all()
        by_c = got.groupby("centroid_id")
        assert (by_c.apply(
            lambda g: g.loc[g.vec_id.idxmin(), "kept"] == 1,
            include_groups=False)).all()
        # a non-trivial fraction is actually deduplicated at 0.35
        assert (got.kept == 0).any()

    def test_hand_duplicates(self, ray_session):
        """Identical vectors dedup to the smallest id; orthogonal ones
        all survive."""
        import numpy as np
        import ray.data as rd

        from vtzero_ray.functions.ann import semdedup

        sf = "/root/testdata/sf0.001"
        dim = 64
        rows = []
        v1 = np.zeros(dim); v1[0] = 1.0
        v2 = np.zeros(dim); v2[1] = 1.0
        for vid, v in ((1, v1), (2, v1), (3, v2), (4, v1)):
            rows.append({"vec_id": vid, "embedding": v.tolist()})
        import pandas as pd
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)
        out = (semdedup(ds, sf, n_centroids=4, threshold=0.9).to_pandas()
               .sort_values("vec_id").set_index("vec_id"))
        assert out.loc[1, "kept"] == 1
        assert out.loc[2, "dup_of"] == 1
        assert out.loc[4, "dup_of"] == 1
        assert out.loc[3, "kept"] == 1

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.ann import semdedup

        sf = "/root/testdata/sf0.001"
        outs = []
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/embeddings.parquet") \
                .repartition(parts)
            outs.append(semdedup(ds, sf, threshold=0.35).to_pandas()
                        .sort_values("vec_id").reset_index(drop=True))
        assert outs[0].equals(outs[1])


class TestCompressionStats:
    def test_reference_and_signal(self, ray_session):
        """Matches a direct zlib reference row-for-row; repetitive text
        compresses far better than high-entropy text; empty doc is
        ratio 0 with raw_len 0."""
        import zlib

        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import compression_stats

        texts = ["spam spam spam spam spam spam spam spam",
                 "q7#xZ!kP9@mW2$vL5&nB8*rT1%yU4^eJ6(oH3)",
                 "the quick brown fox jumps over the lazy dog",
                 "", "héllo wörld ünïcode"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        out = (compression_stats(rd.from_arrow(t).repartition(3))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for i, s in enumerate(texts):
            b = s.encode("utf-8")
            assert out.loc[i, "raw_len"] == len(b)
            assert out.loc[i, "deflate_len"] == len(zlib.compress(b, 6))
        r = out.set_index("doc_id").ratio_q9
        assert r[0] < r[1]                 # repetition compresses better
        assert r[3] == 0 and out.loc[3, "raw_len"] == 0
        assert out.loc[4, "raw_len"] > len(texts[4])  # bytes, not chars

    def test_partition_invariance(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import compression_stats

        texts = [f"doc {i} " + "word " * (i % 7) for i in range(40)]
        t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                      "text": pa.array(texts)})
        a = (compression_stats(rd.from_arrow(t).repartition(1)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (compression_stats(rd.from_arrow(t).repartition(6)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)


class TestHeavyHitters:
    def _corpus(self, n_docs=60):
        """Zipf-ish corpus: token t_j appears ~ n/j times."""
        import pyarrow as pa

        texts = []
        for i in range(n_docs):
            toks = []
            for j in range(1, 40):
                if i % j == 0:
                    toks.append(f"t{j}")
            toks.append(f"rare{i}")
            texts.append(" ".join(toks))
        return pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                         "text": pa.array(texts)})

    def _exact(self, tab):
        from collections import Counter

        c = Counter()
        for s in tab.column("text").to_pylist():
            c.update(s.split())
        return c

    def test_guarantees(self, ray_session):
        """est_lo <= true <= est_hi for every reported token; every
        token with true count > the global decrement mass is reported;
        at most k tokens; decrement mass <= n/(k+1)."""
        import ray.data as rd

        from vtzero_ray.functions.sketch import heavy_hitters

        tab = self._corpus()
        exact = self._exact(tab)
        n_total = sum(exact.values())
        k = 12
        out = (heavy_hitters(rd.from_arrow(tab).repartition(5), k=k)
               .to_pandas())
        assert len(out) <= k
        total_dec = int(out.est_hi.iloc[0] - out.est_lo.iloc[0])
        assert total_dec <= n_total // (k + 1)
        for r in out.itertuples():
            assert r.est_lo <= exact[r.token] <= r.est_hi
        reported = set(out.token)
        for tok, c in exact.items():
            if c > total_dec:
                assert tok in reported, (tok, c, total_dec)
        # ranking is (est_lo desc, token asc), dense 1..len
        assert list(out.rnk) == list(range(1, len(out) + 1))
        assert (out.est_lo.to_numpy()[:-1] >= out.est_lo.to_numpy()[1:]).all()

    def test_small_vocab_is_exact(self, ray_session):
        """With vocabulary <= k no compression happens anywhere: counts
        are exact and est_hi == est_lo."""
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.sketch import heavy_hitters

        tab = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                        "text": pa.array(["a a b", "b a", "c", "a c c"])})
        out = (heavy_hitters(rd.from_arrow(tab).repartition(3), k=10)
               .to_pandas().set_index("token"))
        assert (out.est_lo == out.est_hi).all()
        assert out.loc["a", "est_lo"] == 4
        assert out.loc["b", "est_lo"] == 2
        assert out.loc["c", "est_lo"] == 3


class TestGopherRules:
    def _run(self, ray_session, rows, **kw):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import gopher_rules

        t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                      "text": pa.array(rows)})
        return (gopher_rules(rd.from_arrow(t).repartition(2), **kw)
                .to_pandas().sort_values("doc_id").set_index("doc_id"))

    def test_hand_rules(self, ray_session):
        good = ("the cat and the dog sat close to the mat today " * 4
                + "\nthe end of that story have with us")
        out = self._run(ray_session, [
            good,                                       # passes all
            "the to " + "word " * 40,                   # fine too
            "short the to doc",                         # < min_words
            "the to " + "aa " * 60,                     # mean len < 3
            "the to " + "extraordinarily " * 40,        # mean len > 10
            good + " " + "# " * 10,                     # symbol ratio
            "• the to one\n• bullet two\n• bullet three",  # all bullets
            good.replace("\n", "...\n") + "...",        # ellipsis lines
            "the to " + "1234 " * 50,                   # < 80% alpha
            "word " * 50,                               # no stop words
        ], min_words=10)
        assert out.loc[0, "keep"] == 1
        assert out.loc[1, "keep"] == 1
        assert out.loc[2, "keep"] == 0          # word count
        assert out.loc[3, "keep"] == 0          # mean token len low
        assert out.loc[4, "keep"] == 0          # mean token len high
        assert out.loc[5, "keep"] == 0          # symbols
        assert out.loc[6, "keep"] == 0          # bullets
        assert out.loc[7, "keep"] == 0          # ellipsis
        assert out.loc[8, "keep"] == 0          # alpha
        assert out.loc[9, "keep"] == 0          # stops
        # ingredient counts are what the flags claim
        assert out.loc[6, "n_bullet"] == out.loc[6, "n_lines"] == 3
        assert out.loc[9, "n_stops"] == 0

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import (gopher_rules,
                                                    gopher_rules_sql)

        rows = ["the cat and to of " + "filler words here " * (3 + i % 9)
                + ("\n• b item" if i % 3 == 0 else "\nplain line")
                + ("..." if i % 4 == 0 else "") for i in range(40)]
        t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                      "text": pa.array(rows)})
        got = (gopher_rules(rd.from_arrow(t).repartition(3), min_words=10)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        want = (con.execute(gopher_rules_sql(min_words=10, synth=False))
                .df().sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)
        assert 0 < got.keep.sum() < len(got)


class TestSplitSentences:
    def test_hand_semantics_and_twin(self, ray_session):
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import (split_sentences,
                                                    split_sentences_sql)

        texts = ["One. Two! Three? Four",
                 "No terminal punctuation at all",
                 "  padded.  spaced!  ",
                 "a.b stays one sentence. next one.",
                 ""]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        got = (split_sentences(rd.from_arrow(t).repartition(2))
               .to_pandas().sort_values(["doc_id", "sent_idx"])
               .reset_index(drop=True))
        d0 = got[got.doc_id == 0].sentence.tolist()
        assert d0 == ["One.", "Two!", "Three?", "Four"]
        assert got[got.doc_id == 1].sentence.tolist() == [texts[1]]
        assert got[got.doc_id == 2].sentence.tolist() == ["padded.",
                                                          "spaced!"]
        # '.' not followed by whitespace is NOT a boundary
        assert got[got.doc_id == 3].sentence.tolist() == \
            ["a.b stays one sentence.", "next one."]
        # empty doc -> one empty segment dropped by min_chars=1
        assert 4 not in set(got.doc_id)
        con = duckdb.connect()
        con.register("documents", t)
        want = (con.execute(split_sentences_sql()).df()
                .sort_values(["doc_id", "sent_idx"])
                .reset_index(drop=True))
        assert got.equals(want)

    def test_partition_invariance(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import split_sentences

        texts = [f"Sent {i} one. Sent {i} two! tail" for i in range(25)]
        t = pa.table({"doc_id": pa.array(range(25), pa.int64()),
                      "text": pa.array(texts)})
        a = (split_sentences(rd.from_arrow(t).repartition(1)).to_pandas()
             .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True))
        b = (split_sentences(rd.from_arrow(t).repartition(7)).to_pandas()
             .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True))
        assert a.equals(b)


class TestKLL:
    def test_rank_error_bound_and_merge_law(self, ray_session):
        """Distributed KLL quantiles land within the documented rank
        tolerance of exact quantiles; concatenating partial sketch
        tables reproduces a sequential merge."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.sketch import KLL, kll_quantiles

        rng = np.random.default_rng(17)
        vals = rng.integers(0, 1_000_000, 50_000).astype(np.int64)
        t = pa.table({"doc_id": pa.array(range(len(vals)), pa.int64()),
                      "v": pa.array(vals)})
        out = (kll_quantiles(rd.from_arrow(t).repartition(8), "v", k=256)
               .to_pandas().set_index("p"))
        sv = np.sort(vals)
        n = len(vals)
        for p in (0.1, 0.5, 0.9, 0.99):
            q = out.loc[p, "q"]
            # rank of the sketch answer vs target rank
            rank = np.searchsorted(sv, q, side="right")
            import math

            target = max(math.ceil(p * n), 1)
            assert abs(rank - target) <= 0.05 * n, (p, rank, target)
        # merge law: two half-sketches merged == items seen once
        a, b = KLL(128), KLL(128)
        a.add(vals[: n // 2])
        b.add(vals[n // 2:])
        m = a.merge(b)
        assert m.n() == n
        q50 = m.quantile(0.5)
        r = np.searchsorted(sv, q50, side="right")
        assert abs(r - n // 2) <= 0.05 * n

    def test_small_input_is_exact(self, ray_session):
        """Inputs below the level-0 capacity never compact: quantiles
        are exact quantile_disc."""
        import numpy as np

        from vtzero_ray.functions.sketch import KLL

        vals = np.array([5, 1, 9, 3, 7], np.int64)
        s = KLL(256)
        s.add(vals)
        assert s.n() == 5
        assert s.quantile(0.5) == 5
        assert s.quantile(0.1) == 1
        assert s.quantile(1.0) == 9

    def test_weights_conserved_under_compaction(self):
        import numpy as np

        from vtzero_ray.functions.sketch import KLL

        s = KLL(32)
        for i in range(40):
            s.add(np.arange(i * 100, i * 100 + 100, dtype=np.int64))
        # every compaction halves items but doubles weight: n is exact
        assert s.n() == 4000
        # sketch is genuinely compressed
        assert sum(len(b) for b in s.levels) < 1000


class TestPMICollocations:
    def test_hand_checked_and_twin(self, ray_session):
        """A bigram that always co-occurs gets top PMI; frequent-but-
        independent pairs rank below; twin is bit-equal."""
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import pmi_topk, pmi_topk_sql

        texts = (["rare pair here today"] * 4        # "rare pair" glued
                 + ["the cat", "the dog", "the fish", "the bird"] * 3
                 + ["cat the", "dog the"] * 2)
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        got = (pmi_topk(rd.from_arrow(t).repartition(3), k=10,
                        min_count=3).to_pandas().reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        want = (con.execute(pmi_topk_sql(k=10, min_count=3)).df()
                .reset_index(drop=True))
        assert got.equals(want)
        # the three glued bigrams tie on PMI (same counts) and take the
        # top ranks in (pmi DESC, bigram ASC) order
        assert got.head(3).bigram.tolist() == ["here today", "pair here",
                                               "rare pair"]
        # "the cat" (frequent words) ranks below the glued pair
        the_cat = got[got.bigram == "the cat"]
        assert len(the_cat) == 0 or the_cat.iloc[0].rnk > 1

    def test_min_count_gate_and_partition_invariance(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.textstats import pmi_topk

        texts = [f"alpha beta w{i} gamma delta" for i in range(30)]
        t = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                      "text": pa.array(texts)})
        a = (pmi_topk(rd.from_arrow(t).repartition(1), k=5, min_count=5)
             .to_pandas().reset_index(drop=True))
        b = (pmi_topk(rd.from_arrow(t).repartition(6), k=5, min_count=5)
             .to_pandas().reset_index(drop=True))
        assert a.equals(b)
        assert (a.n >= 5).all()
        assert "alpha beta" in set(a.bigram)
