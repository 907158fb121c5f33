"""Composed fuzzy-dedup removal (dedup.near_dedup_corpus): survivors =
corpus minus every non-canonical member of a verified near-dup cluster.

The expectation is computed independently: exact n-gram Jaccard over ALL
LSH candidate pairs (via jaccard_pairs) → transitive closure in plain
Python → keep each component's min doc_id."""

import numpy as np
import pandas as pd
import pytest


def _corpus() -> pd.DataFrame:
    base = ("the quick brown fox jumps over the lazy dog near the old "
            "river bank every single morning before sunrise happens")
    rows = []
    # cluster A: 0,1,2 near-identical (one-word tail edits)
    rows.append((0, base))
    rows.append((1, base + " today"))
    rows.append((2, base + " again"))
    # cluster B: 10, 11 identical
    b = ("completely different second document about distributed "
         "data processing engines built on top of ray datasets")
    rows.append((10, b))
    rows.append((11, b))
    # singletons: unique texts
    for i in range(20, 30):
        rows.append((i, f"unique document number {i} with its own "
                        f"words token{i} token{i+1} token{i+2} filler "
                        f"alpha{i} beta{i} gamma{i} delta{i}"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _expected_survivors(df: pd.DataFrame, threshold: float = 0.5) -> set:
    import ray.data as rd

    from vtzero_ray.functions.dedup import (jaccard_pairs,
                                            minhash_lsh_candidates)

    cands = minhash_lsh_candidates(rd.from_pandas(df)).to_pandas()
    texts = dict(zip(df.doc_id, df.text))
    pairs = list(zip(cands.doc_a, cands.doc_b))
    ver = jaccard_pairs(texts, pairs) if pairs else pd.DataFrame(
        columns=["doc_a", "doc_b", "jaccard"])
    edges = [(a, b) for a, b, j in
             zip(ver.get("doc_a", []), ver.get("doc_b", []),
                 ver.get("jaccard", [])) if j >= threshold]
    # transitive closure, cluster = min id
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    drop = {n for n in set(parent) if find(n) != n}
    return set(df.doc_id) - drop


class TestNearDedup:
    def test_removal_matches_independent_closure(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.dedup import near_dedup_corpus

        df = _corpus()
        out = near_dedup_corpus(lambda: rd.from_pandas(df),
                                threshold=0.5).to_pandas()
        got = set(out.doc_id)
        assert got == _expected_survivors(df)
        # canonical members survive, non-canonical drop
        assert {0, 10} <= got
        assert got.isdisjoint({1, 2, 11})
        # surviving text rides through unchanged
        texts = dict(zip(df.doc_id, df.text))
        assert all(t == texts[i] for i, t in zip(out.doc_id, out.text))

    def test_no_dups_is_identity(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.dedup import near_dedup_corpus

        df = _corpus()
        df = df[df.doc_id >= 20].reset_index(drop=True)  # singletons only
        out = near_dedup_corpus(lambda: rd.from_pandas(df)).to_pandas()
        assert set(out.doc_id) == set(df.doc_id)

    def test_batching_independence(self, ray_session):
        """Survivor set is invariant to input partitioning."""
        import ray.data as rd

        from vtzero_ray.functions.dedup import near_dedup_corpus

        df = _corpus()
        a = near_dedup_corpus(
            lambda: rd.from_pandas(df).repartition(1)).to_pandas()
        b = near_dedup_corpus(
            lambda: rd.from_pandas(df).repartition(7)).to_pandas()
        assert set(a.doc_id) == set(b.doc_id)

    def test_keep_longest_rule(self, ray_session):
        """RefinedWeb quality-aware canonical pick: max character count
        wins, ties break to min doc_id. Cluster A's tails ' today' /
        ' again' are 6 chars longer than the base, equal to each other →
        doc 1 survives instead of 0; cluster B is an exact dup pair →
        the tie keeps 10 as before."""
        import ray.data as rd

        from vtzero_ray.functions.dedup import near_dedup_corpus

        df = _corpus()
        out = near_dedup_corpus(lambda: rd.from_pandas(df),
                                threshold=0.5, keep="longest").to_pandas()
        got = set(out.doc_id)
        exp = (_expected_survivors(df) - {0}) | {1}
        assert got == exp
        assert 1 in got and got.isdisjoint({0, 2, 11})
        texts = dict(zip(df.doc_id, df.text))
        assert all(t == texts[i] for i, t in zip(out.doc_id, out.text))
        # partitioning invariance for the longest rule too
        b = near_dedup_corpus(lambda: rd.from_pandas(df).repartition(7),
                              threshold=0.5, keep="longest").to_pandas()
        assert set(b.doc_id) == exp

    def test_unknown_keep_rule_raises(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.dedup import near_dedup_corpus

        with pytest.raises(ValueError, match="keep rule"):
            near_dedup_corpus(lambda: rd.from_pandas(_corpus()),
                              keep="shortest")
