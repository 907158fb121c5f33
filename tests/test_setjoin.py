"""Exact set-similarity join (functions/setjoin.py): the prefix filter
must be EXACT — equal to brute-force all-pairs Jaccard — under any
partitioning, including boundary thresholds and tiny sets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vtzero_ray.functions.dedup import _shingle_hashes
from vtzero_ray.functions.setjoin import set_join_exact


def brute_force(texts, threshold, k):
    from fractions import Fraction

    thr = Fraction(threshold).limit_denominator(10**6)
    sets = {i: np.unique(_shingle_hashes(t, k))
            for i, t in enumerate(texts)}
    out = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = int(np.intersect1d(sets[a], sets[b],
                                       assume_unique=True).shape[0])
            union = int(sets[a].shape[0] + sets[b].shape[0] - inter)
            if union and inter * thr.denominator >= thr.numerator * union:
                out.append((a, b, inter, union))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "n_inter",
                                      "n_union"]).astype("int64")


def corpus(seed=3, n=60):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(120)]
    texts = []
    for i in range(n):
        words = [vocab[int(j)] for j in rng.integers(0, 120, 30)]
        texts.append(" ".join(words))
        if i % 5 == 4:
            # planted near-dup of the previous doc: one word changed
            w = texts[-2].split()
            w[len(w) // 2] = "CHANGED"
            texts.append(" ".join(w))
        if i % 7 == 6:
            texts.append(texts[-1])  # exact dup: survives any threshold
    return texts


class TestSetJoinExact:
    @pytest.mark.parametrize("threshold", [0.5, 0.8, 0.3])
    def test_equals_brute_force(self, ray_session, threshold):
        import ray.data as rd

        texts = corpus()
        t = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        })
        got = set_join_exact(
            lambda: rd.from_arrow(t).repartition(4),
            threshold=threshold, k=5).to_pandas() \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        exp = brute_force(texts, threshold, 5) \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype("int64"), exp)
        assert len(exp) > 0  # planted near-dups must appear

    def test_identical_docs_and_tiny_sets(self, ray_session):
        import ray.data as rd

        texts = ["a b c d e f", "a b c d e f", "one two", "one two",
                 "solo"]
        t = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        })
        got = set_join_exact(lambda: rd.from_arrow(t), threshold=1.0,
                             k=5).to_pandas() \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        exp = brute_force(texts, 1.0, 5)
        pd.testing.assert_frame_equal(got.astype("int64"), exp)

    def test_positional_filter_prunes_but_preserves_output(
            self, ray_session):
        import ray.data as rd

        # 20 docs of 3 shingles each sharing exactly ONE common 5-word
        # run: the run's shingle has df=20 (ranks LAST, position 2,
        # still inside the t=0.3 prefix of length 3), so every pair is
        # a prefix-filter candidate — but the positional bound at that
        # match is 1 + min(0, 0) = 1 < required overlap 2, refuting all
        # 190 pairs before verification. Two exact dups stay true pairs.
        texts = [f"u{i}a u{i}b r1 r2 r3 r4 r5" for i in range(20)]
        texts += ["same text one two three four five six"] * 2
        t = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        })
        with_pos = set_join_exact(
            lambda: rd.from_arrow(t).repartition(4), threshold=0.3,
            k=5, _candidates_only=True).to_pandas()
        without = set_join_exact(
            lambda: rd.from_arrow(t).repartition(4), threshold=0.3,
            k=5, positional=False, _candidates_only=True).to_pandas()
        sw = set(map(tuple, with_pos.to_numpy()))
        so = set(map(tuple, without.to_numpy()))
        assert sw <= so
        assert len(sw) < len(so)   # the bound actually bites
        # and every true pair survives: final outputs identical
        got = set_join_exact(
            lambda: rd.from_arrow(t).repartition(4), threshold=0.3,
            k=5).to_pandas().sort_values(["doc_a", "doc_b"]) \
            .reset_index(drop=True)
        exp = brute_force(texts, 0.3, 5) \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype("int64"), exp)

    def test_large_ids_fallback(self, ray_session):
        import ray.data as rd

        base = 1 << 40
        texts = ["x y z w v u", "x y z w v u"]
        t = pa.table({
            "doc_id": pa.array([base, base + 1], pa.int64()),
            "text": pa.array(texts),
        })
        got = set_join_exact(lambda: rd.from_arrow(t),
                             threshold=0.5, k=5).to_pandas()
        assert got["doc_a"].tolist() == [base]
        assert got["doc_b"].tolist() == [base + 1]
