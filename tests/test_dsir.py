"""DSIR importance weights (functions/dsir.py) vs an independent plain
NumPy/python oracle: same hashed-bigram features, same add-1 smoothed
log-ratio quantization, same integer per-doc sums."""

import numpy as np
import pandas as pd
import pytest

from vtzero_ray.functions.sketch import CMS

N_DIMS = 64
TARGET_MOD = 4


def _corpus() -> pd.DataFrame:
    rows = []
    words_t = ["alpha", "beta", "gamma", "delta"]
    words_r = ["omega", "sigma", "tau", "rho", "phi"]
    for i in range(40):
        pool = words_t if i % TARGET_MOD == 0 else words_r
        toks = [pool[(i + j) % len(pool)] for j in range(3 + i % 5)]
        rows.append((i, " ".join(toks)))
    rows.append((40, ""))          # empty doc → 0 bigrams, weight 0
    rows.append((41, "single"))    # one token → 0 bigrams
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _feats(text: str) -> list:
    toks = text.split()
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not grams:
        return []
    h = CMS.hash64(grams)
    return list((h % np.uint64(N_DIMS)).astype(np.int64))


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    nt = np.zeros(N_DIMS, np.int64)
    nr = np.zeros(N_DIMS, np.int64)
    feats = {i: _feats(t) for i, t in zip(df.doc_id, df.text)}
    for i, fs in feats.items():
        tgt = (i % TARGET_MOD) == 0
        for f in fs:
            if tgt:
                nt[f] += 1
            else:
                nr[f] += 1
    tt = float(nt.sum() + N_DIMS)
    tr = float(nr.sum() + N_DIMS)
    lam = np.floor((np.log((nt + 1.0) / tt) - np.log((nr + 1.0) / tr))
                   * 1e9 + 0.5).astype(np.int64)
    out = []
    for i, fs in feats.items():
        w = int(sum(int(lam[f]) for f in fs))
        out.append((i, len(fs), w))
    return pd.DataFrame(out, columns=["doc_id", "n_bigrams", "dsir_q9"]) \
        .sort_values("doc_id").reset_index(drop=True)


class TestDSIR:
    def test_matches_numpy_oracle(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.dsir import dsir_weights

        df = _corpus()
        got = dsir_weights(lambda: rd.from_pandas(df), n_dims=N_DIMS,
                           target_mod=TARGET_MOD).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp = _expected(df)
        pd.testing.assert_frame_equal(got, exp)

    def test_batching_independence(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.dsir import dsir_weights

        df = _corpus()
        a = dsir_weights(lambda: rd.from_pandas(df).repartition(1),
                         n_dims=N_DIMS, target_mod=TARGET_MOD).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = dsir_weights(lambda: rd.from_pandas(df).repartition(9),
                         n_dims=N_DIMS, target_mod=TARGET_MOD).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_select_keeps_top_fraction(self, ray_session):
        """dsir_select = the docs whose truncated milli-weight bucket
        clears the (1-p) quantile_disc cutoff, recomputed independently."""
        import math

        import ray.data as rd

        from vtzero_ray.functions.dsir import dsir_select

        df = _corpus()
        exp_w = _expected(df)
        w = exp_w.dsir_q9.to_numpy(np.int64)
        div = 1_000_000
        b = w // div + ((w % div != 0) & (w < 0))  # truncating division
        bs = np.sort(b)
        cutoff = int(bs[max(math.ceil(0.75 * len(bs)), 1) - 1])
        exp = set(exp_w.doc_id.to_numpy()[b >= cutoff])

        got = dsir_select(lambda: rd.from_pandas(df), p=0.25,
                          n_dims=N_DIMS, target_mod=TARGET_MOD).to_pandas()
        assert set(got.doc_id) == exp
        # selection keeps roughly the top quarter, never everything
        assert 0 < len(got) < len(df)

    def test_target_docs_score_higher(self, ray_session):
        """Target-split docs draw from the target vocabulary, so their
        importance log-weights must exceed the raw docs' (per bigram)."""
        import ray.data as rd

        from vtzero_ray.functions.dsir import dsir_weights

        df = _corpus()
        got = dsir_weights(lambda: rd.from_pandas(df), n_dims=N_DIMS,
                           target_mod=TARGET_MOD).to_pandas()
        got = got[got.n_bigrams > 0]
        per = got.dsir_q9 / got.n_bigrams
        tgt = got.doc_id % TARGET_MOD == 0
        assert per[tgt].min() > per[~tgt].max()
