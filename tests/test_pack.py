"""Sequence packing (functions/pack.py) — the distributed prefix-sum.

Contract: global token offsets in doc_id order, exactly reproduced by
the DuckDB window-cumsum twin, invariant to block partitioning and to
the range_width knob (which only changes the scan's bucketing, never
the result).
"""

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    texts = [
        "alpha beta gamma",       # 3 tokens
        "",                       # 0 — must not advance the offset
        "one",                    # 1
        "   ",                    # 0 (whitespace-only)
        "a b c d e f g h i j",    # 10
        "x y",                    # 2
        "solo",                   # 1
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })


def _run(tab, ray_session, **kw):
    import ray.data as rd

    from vtzero_ray.functions.pack import pack_sequences

    return (pack_sequences(rd.from_arrow(tab).repartition(4), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


class TestPackSequences:
    def test_hand_checked_offsets(self, ray_session):
        out = _run(_corpus(), ray_session, seq_len=4, range_width=2)
        assert list(out.n_tokens) == [3, 0, 1, 0, 10, 2, 1]
        # exclusive prefix sums: 0,3,3,4,4,14,16
        assert list(out.t_offset) == [0, 3, 3, 4, 4, 14, 16]
        assert list(out.seq_id) == [0, 0, 0, 1, 1, 3, 4]
        assert list(out.seq_pos) == [0, 3, 3, 0, 0, 2, 0]

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb

        from vtzero_ray.functions.pack import pack_sequences_sql

        tab = _corpus()
        got = _run(tab, ray_session, seq_len=4, range_width=3)
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(pack_sequences_sql(seq_len=4)).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    def test_matches_duckdb_twin_sfdata(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.pack import (pack_sequences,
                                               pack_sequences_sql)

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        got = (pack_sequences(ds, seq_len=2048, range_width=64).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')")
        want = (con.execute(pack_sequences_sql(seq_len=2048)).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    def test_invariant_to_partitioning_and_range_width(self, ray_session):
        """Block layout and the scan's bucketing knob are implementation
        details — the output may not depend on either."""
        import ray.data as rd

        from vtzero_ray.functions.pack import pack_sequences

        tab = _corpus()
        ref = _run(tab, ray_session, seq_len=4, range_width=2)
        for parts, width in [(1, 2), (16, 2), (4, 1), (4, 1000)]:
            out = (pack_sequences(rd.from_arrow(tab).repartition(parts),
                                  seq_len=4, range_width=width)
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            assert out.equals(ref), (parts, width)

    def test_sparse_nonzero_ids(self, ray_session):
        """doc_ids with gaps and not starting at 0: ranges are id-space
        buckets, not dense ranks — offsets still follow id order."""
        tab = pa.table({
            "doc_id": pa.array([1000, 7, 500000, 42], pa.int64()),
            "text": pa.array(["b b", "a", "d d d d", "c c c"]),
        })
        out = _run(tab, ray_session, seq_len=4, range_width=16)
        assert list(out.doc_id) == [7, 42, 1000, 500000]
        assert list(out.t_offset) == [0, 1, 4, 6]


class TestShuffleEpoch:
    def test_is_permutation_and_matches_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.pack import shuffle_epoch, shuffle_epoch_sql

        tab = pa.table({
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(["x"] * 200),
        })
        got = (shuffle_epoch(rd.from_arrow(tab).repartition(8), seed=7)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert sorted(got.pos) == list(range(200))  # dense permutation
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(shuffle_epoch_sql(seed=7)).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    def test_seed_changes_order_partitioning_does_not(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.pack import shuffle_epoch

        tab = pa.table({
            "doc_id": pa.array(np.arange(64, dtype=np.int64)),
            "text": pa.array(["x"] * 64),
        })
        a = (shuffle_epoch(rd.from_arrow(tab).repartition(1), seed=1)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (shuffle_epoch(rd.from_arrow(tab).repartition(16), seed=1)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        c = (shuffle_epoch(rd.from_arrow(tab), seed=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)
        assert not a.pos.equals(c.pos)


class TestMixWeighted:
    """Dataset mixing: deterministic weighted up/down-sampling."""

    def _tab(self, n=400):
        import pyarrow as pa

        srcs = ["a", "b", "c", "d"] * (n // 4)
        return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                         "source": pa.array(srcs)})

    def test_semantics(self, ray_session):
        import numpy as np
        import ray.data as rd

        from vtzero_ray.functions.pack import mix_weighted

        w = {"a": 0.0, "b": 2.0, "c": 0.5, "d": 2.25}
        out = (mix_weighted(rd.from_arrow(self._tab()).repartition(3), w,
                            seed=3).to_pandas())
        by = out.groupby("source")
        assert "a" not in set(out.source)                 # dropped
        assert (by.get_group("b").groupby("doc_id").size() == 2).all()
        nc = len(by.get_group("c").doc_id.unique())
        assert 20 <= nc <= 80                             # ~50 of 100 kept
        d = by.get_group("d").groupby("doc_id").size()
        assert set(d.unique()) <= {2, 3}                  # 2 or 3 copies
        assert 0.05 <= (d == 3).mean() <= 0.55            # ~25% get the 3rd
        # copy index is 1..n per doc
        assert (out.groupby(["source", "doc_id"])["copy"].max()
                == out.groupby(["source", "doc_id"]).size()).all()
        assert out["copy"].min() == 1

    def test_default_weight_and_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.pack import mix_weighted, mix_weighted_sql

        tab = self._tab()
        w = {"a": 0.0, "d": 3.5}
        got = (mix_weighted(rd.from_arrow(tab).repartition(4), w, seed=9)
               .to_pandas().sort_values(["doc_id", "source", "copy"])
               .reset_index(drop=True))
        # unlisted sources ride the default: exactly one copy
        assert (got[got.source.isin(["b", "c"])]
                .groupby("doc_id").size() == 1).all()
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(mix_weighted_sql(w, seed=9)).fetchdf()
                .sort_values(["doc_id", "source", "copy"])
                .reset_index(drop=True))
        assert got.equals(want)

    def test_seed_and_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.pack import mix_weighted

        tab = self._tab()
        w = {"a": 0.5, "b": 1.5}

        def run(parts, seed):
            return (mix_weighted(rd.from_arrow(tab).repartition(parts), w,
                                 seed=seed).to_pandas()
                    .sort_values(["doc_id", "source", "copy"])
                    .reset_index(drop=True))

        assert run(1, 5).equals(run(7, 5))         # partition-invariant
        assert not run(1, 5).equals(run(1, 6))     # seed-sensitive


class TestChunkDocs:
    def test_hand_checked(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.pack import chunk_docs

        texts = ["a b c d e f g h i j",   # 10 toks, size 4 stride 2
                 "x y z",                 # n <= size -> one chunk
                 "",                      # no chunks
                 "  p   q  "]             # trim/split -> 2 toks
        tab = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                        "text": pa.array(texts)})
        out = (chunk_docs(rd.from_arrow(tab).repartition(2), size=4,
                          overlap=2).to_pandas()
               .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
        d0 = out[out.doc_id == 0]
        # chunks: [1-4],[3-6],[5-8],[7-10] -> 4 chunks
        assert d0.chunk_text.tolist() == ["a b c d", "c d e f",
                                          "e f g h", "g h i j"]
        assert d0.start_tok.tolist() == [1, 3, 5, 7]
        assert (d0.n_toks == 4).all()
        assert out[out.doc_id == 1].chunk_text.tolist() == ["x y z"]
        assert 2 not in set(out.doc_id)
        assert out[out.doc_id == 3].chunk_text.tolist() == ["p q"]

    def test_tail_chunk_and_twin(self, ray_session):
        """Uneven tail: last chunk is shorter; DuckDB twin equality."""
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.pack import chunk_docs, chunk_docs_sql

        texts = ["t" + " u v w x y z a b"[:k] for k in range(0, 17, 3)]
        tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts)})
        got = (chunk_docs(rd.from_arrow(tab).repartition(3), size=3,
                          overlap=1).to_pandas()
               .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(chunk_docs_sql(size=3, overlap=1)).fetchdf()
                .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
        assert got.equals(want)
        # coverage: every token appears in some chunk, tail included
        last = got.groupby("doc_id").tail(1)
        toks = {i: len(t.split()) for i, t in enumerate(texts)}
        for r in last.itertuples():
            assert r.start_tok + r.n_toks - 1 == toks[r.doc_id]


class TestWeightedSample:
    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.pack import (weighted_sample,
                                               weighted_sample_sql)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(weighted_sample_sql(k=40)).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(exp) == 40
        for parts in (1, 7):
            got = weighted_sample(
                rd.read_parquet(f"{sf}/documents.parquet",
                                columns=["doc_id", "n_chars"])
                .repartition(parts), k=40).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_weights_bias_inclusion(self, ray_session):
        """Across many seeds, heavy docs (w=50) are sampled far more
        often than light docs (w=1) — the A-ES property the op exists
        for. Deterministic: seeds are fixed strings."""
        import ray.data as rd

        n = 200
        tab = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "w": pa.array([50 if i < n // 2 else 1 for i in range(n)],
                          pa.int64())})
        from vtzero_ray.functions.pack import weighted_sample

        heavy = light = 0
        for s in range(8):
            got = weighted_sample(rd.from_arrow(tab), k=20,
                                  weight_column="w",
                                  seed=f"s{s}").to_pandas()
            heavy += (got.doc_id < n // 2).sum()
            light += (got.doc_id >= n // 2).sum()
        assert heavy > 4 * light

    def test_zero_weight_unsampleable(self, ray_session):
        import ray.data as rd

        tab = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                        "w": pa.array([0] * 5 + [3] * 5, pa.int64())})
        from vtzero_ray.functions.pack import weighted_sample

        got = weighted_sample(rd.from_arrow(tab), k=10,
                              weight_column="w").to_pandas()
        assert len(got) == 5 and (got.doc_id >= 5).all()
