"""PCA (functions/pca.py): the moments reducer is exact-integer and
batching-invariant; projection matches a local NumPy reference built
from the same quantize/center/eigh/sign-fix pipeline; component order
follows eigenvalue magnitude."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vtzero_ray.functions.ann import QSCALE, quantize
from vtzero_ray.functions.pca import (embedding_moments, pca_components,
                                      pca_project)


def synth_embeddings(n=300, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: a few dominant directions so ordering is crisp
    basis = rng.normal(size=(dim, dim))
    scales = np.linspace(3.0, 0.05, dim)
    x = rng.normal(size=(n, dim)) * scales
    raw = (x @ basis).astype(np.float32)
    raw /= np.abs(raw).max() + 1.0   # keep within quantize's domain
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r for r in raw.tolist()],
                              pa.list_(pa.float32())),
    })


def numpy_reference(t, k):
    raw = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
    q = quantize(raw)
    n, dim = q.shape
    S = q.T @ q
    sums = q.sum(axis=0)
    mean = sums / n
    cov = S / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    W = v[:, order]
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    qm = q.astype(np.float64) / QSCALE
    p = (qm - mean / QSCALE) @ W
    return W, np.floor(p * 1e6 + 0.5).astype(np.int64)


class TestMoments:
    @pytest.mark.parametrize("blocks", [1, 6])
    def test_exact_and_partition_invariant(self, ray_session, blocks):
        import ray.data as rd

        t = synth_embeddings()
        got = embedding_moments(rd.from_arrow(t).repartition(blocks),
                                dim=16).to_pandas() \
            .sort_values(["d", "e"]).reset_index(drop=True)
        q = quantize(np.stack(
            t.column("embedding").to_numpy(zero_copy_only=False)))
        S = q.T @ q
        iu, ju = np.triu_indices(16)
        assert (got[got["e"] >= 0].set_index(["d", "e"])["s"]
                .to_dict() == {(int(i), int(j)): int(S[i, j])
                               for i, j in zip(iu, ju)})
        sums = got[(got["e"] == -1) & (got["d"] >= 0)] \
            .sort_values("d")["s"].to_numpy()
        assert (sums == q.sum(axis=0)).all()
        assert int(got[(got["d"] == -1)]["s"].iloc[0]) == len(t)


class TestProjection:
    def test_matches_numpy_reference(self, ray_session):
        import ray.data as rd

        t = synth_embeddings()
        W, exp = numpy_reference(t, k=5)
        got = pca_project(rd.from_arrow(t).repartition(4), k=5,
                          dim=16).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        for j in range(5):
            assert (got[f"c{j}"].to_numpy() == exp[:, j]).all(), j

    def test_variance_ordering(self, ray_session):
        import ray.data as rd

        t = synth_embeddings()
        got = pca_project(rd.from_arrow(t), k=5, dim=16).to_pandas()
        var = [got[f"c{j}"].to_numpy(np.float64).var() for j in range(5)]
        assert all(var[j] >= var[j + 1] for j in range(4))

    def test_sign_fix_deterministic(self):
        t = synth_embeddings(seed=9)
        raw = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
        q = quantize(raw)
        S = q.T @ q
        iu, ju = np.triu_indices(16)
        rows = [(int(i), int(j), int(S[i, j])) for i, j in zip(iu, ju)]
        rows += [(d, -1, int(q[:, d].sum())) for d in range(16)]
        rows += [(-1, -1, len(t))]
        df = pd.DataFrame(rows, columns=["d", "e", "s"])
        W1, _ = pca_components(df, dim=16, k=4)
        W2, _ = pca_components(df.sample(frac=1, random_state=0),
                               dim=16, k=4)
        assert (W1 == W2).all()
        # every component's largest-|coeff| entry is positive
        for j in range(4):
            assert W1[int(np.argmax(np.abs(W1[:, j]))), j] > 0
