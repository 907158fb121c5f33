"""BM25 keyword search (functions/search.py).

The contract under test: bm25_topk is (1) exactly reproduced by its
DuckDB twin bm25_sql — same tokenizer, integer stats, float expression
text — and (2) invariant to block partitioning (per-batch top-k prune +
integer stats combiners are provably order-independent).
"""

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    """Small corpus exercising: repeated terms (tf>1), docs with no query
    terms (score 0 -> excluded), empty/whitespace docs, score ties broken
    by doc_id, and the every-doc term (df == n_docs still has idf > 0
    under the +1-inside-ln variant)."""
    texts = [
        "hash join beats merge join",          # tf(join)=2
        "hash table scan",
        "window functions and window frames",  # tf(window)=2
        "merge sort is stable",
        "nothing relevant here at all",
        "",
        "   ",
        "hash hash hash",                      # tf(hash)=3
        "the quick scan",
        "join window merge hash",              # all four terms once
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })


TERMS = ("hash", "join", "window", "merge")


class TestBM25:
    def test_matches_duckdb_twin_synth(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.search import bm25_sql, bm25_topk

        tab = _corpus()
        got = bm25_topk(rd.from_arrow(tab).repartition(4), TERMS, k=8)
        con = duckdb.connect()
        con.register("documents", tab)
        want = con.execute(bm25_sql(TERMS, k=8)).fetchdf()
        assert list(got.columns) == list(want.columns)
        assert got.dtypes.equals(want.dtypes)
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_matches_duckdb_twin_sfdata(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.search import bm25_sql, bm25_topk

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        got = bm25_topk(ds, ("vector", "window", "merge", "spark"), k=20)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
        want = con.execute(
            bm25_sql(("vector", "window", "merge", "spark"), k=20)).fetchdf()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_partition_invariance(self, ray_session):
        """Same result at 1 block and at more blocks than rows: the
        integer stats merge and the per-batch top-k prune may not depend
        on block boundaries."""
        import ray.data as rd

        from vtzero_ray.functions.search import bm25_topk

        tab = _corpus()
        a = bm25_topk(rd.from_arrow(tab).repartition(1), TERMS, k=5)
        b = bm25_topk(rd.from_arrow(tab).repartition(16), TERMS, k=5)
        assert a.equals(b)

    def test_semantics(self, ray_session):
        """Hand-checkable facts: zero-hit and blank docs excluded; ranks
        are 1..n dense; higher-tf short docs outrank single-hit docs for
        a one-term query."""
        import ray.data as rd

        from vtzero_ray.functions.search import bm25_topk

        out = bm25_topk(rd.from_arrow(_corpus()), ("hash",), k=10)
        # docs containing "hash": 0, 1, 7, 9 — nothing else may appear
        assert set(out.doc_id) == {0, 1, 7, 9}
        assert list(out.rnk) == list(range(1, len(out) + 1))
        assert list(out.score) == sorted(out.score, reverse=True)
        # doc 7 ("hash hash hash", tf=3, dl=3) is the clear winner
        assert out.doc_id.iloc[0] == 7

    def test_indexed_byte_equal_and_pruned(self, ray_session, tmp_path):
        """The persisted-index path must (1) return the exact frame the
        scan path returns — same floats, same ranks — and (2) list only
        the query terms' bucket partitions into read_parquet."""
        import glob

        import ray.data as rd

        from vtzero_ray.functions.search import (bm25_topk,
                                                 bm25_topk_indexed,
                                                 build_text_index,
                                                 index_paths_for)

        tab = _corpus()
        idx = str(tmp_path / "idx")
        build_text_index(rd.from_arrow(tab).repartition(4), idx,
                         n_buckets=16)
        for terms in [TERMS, ("hash",), ("scan", "stable")]:
            scan = bm25_topk(rd.from_arrow(tab).repartition(3), terms, k=6)
            indexed = bm25_topk_indexed(idx, terms, k=6)
            assert scan.equals(indexed), terms
        all_files = glob.glob(f"{idx}/postings/bpart=*/*.parquet")
        pruned = index_paths_for(idx, ("hash",))
        assert 0 < len(pruned) < len(all_files)

    def test_index_build_atomic_and_rebuild_safe(self, ray_session,
                                                 tmp_path):
        """meta.parquet presence implies completeness; a second build
        into an existing dir is a harmless no-op race-loser."""
        import os

        import ray.data as rd

        from vtzero_ray.functions.search import (bm25_topk_indexed,
                                                 build_text_index)

        tab = _corpus()
        idx = str(tmp_path / "idx2")
        build_text_index(rd.from_arrow(tab), idx)
        assert os.path.isfile(f"{idx}/meta.parquet")
        first = bm25_topk_indexed(idx, TERMS, k=5)
        build_text_index(rd.from_arrow(tab), idx)  # concurrent-loser path
        assert bm25_topk_indexed(idx, TERMS, k=5).equals(first)

    def test_indexed_absent_term(self, ray_session, tmp_path):
        """A term hashing to a bucket that was never written returns a
        typed empty frame, not a read error."""
        import ray.data as rd

        from vtzero_ray.functions.search import (bm25_topk_indexed,
                                                 build_text_index)

        idx = str(tmp_path / "idx3")
        build_text_index(rd.from_arrow(_corpus()), idx, n_buckets=256)
        out = bm25_topk_indexed(idx, ("qqqqzzzz",), k=5)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "score", "rnk"]

    def test_idf_positive_at_full_df(self, ray_session):
        """The +1-inside-ln idf keeps every term's contribution positive
        even when df == n_docs, so ubiquitous terms never flip ranking
        signs between engines."""
        import ray.data as rd

        from vtzero_ray.functions.search import bm25_topk

        tab = pa.table({
            "doc_id": pa.array(np.arange(3, dtype=np.int64)),
            "text": pa.array(["the a", "the the b", "the c d e"]),
        })
        out = bm25_topk(rd.from_arrow(tab), ("the",), k=3)
        assert len(out) == 3
        assert (out.score > 0).all()

    def test_indexed_absent_term_shared_bucket(self, ray_session, tmp_path):
        """n_buckets=1 forces every term into ONE bucket: an absent term
        reads real posting files, matches zero rows (df=0), and the
        result still equals the scan path for the present terms."""
        import ray.data as rd

        from vtzero_ray.functions.search import (bm25_topk,
                                                 bm25_topk_indexed,
                                                 build_text_index)

        tab = _corpus()
        idx = str(tmp_path / "idx1b")
        build_text_index(rd.from_arrow(tab), idx, n_buckets=1)
        terms = ("hash", "qqqqzzzz")
        scan = bm25_topk(rd.from_arrow(tab), terms, k=5)
        indexed = bm25_topk_indexed(idx, terms, k=5)
        assert scan.equals(indexed)


class TestHybridRRF:
    def test_fusion_and_twin(self, ray_session):
        """Docs ranked by both legs outrank single-leg docs with equal
        ranks; result equals the spliced SQL oracle."""
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.search import hybrid_sql, hybrid_topk

        sf = "/root/testdata/sf0.001"
        terms = ("hash", "join", "vector")
        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(4)
        emb = rd.read_parquet(f"{sf}/embeddings.parquet").repartition(3)
        got = hybrid_topk(docs, emb, sf, terms, k=10) \
            .reset_index(drop=True)
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf}/{t}.parquet')")
        want = con.execute(hybrid_sql(terms, k=10)).df() \
            .reset_index(drop=True)
        assert got.equals(want)
        assert len(got) == 10
        assert (got.rnk == range(1, 11)).all()
        # rrf scores are monotone with rank
        assert (got.rrf_q9.to_numpy()[:-1] >= got.rrf_q9.to_numpy()[1:]).all()

    def test_both_legs_contribute(self, ray_session):
        """The #1 vector hit (the query itself, cosine 1) always makes
        the fused list even when it matches no term."""
        import ray.data as rd

        from vtzero_ray.functions.search import hybrid_topk

        sf = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(4)
        emb = rd.read_parquet(f"{sf}/embeddings.parquet").repartition(3)
        out = hybrid_topk(docs, emb, sf, ("zzzunmatchable",), k=10)
        # lexical leg is empty -> ranking is the pure vector leg
        assert out.iloc[0].doc_id == 0      # query vec_id 0, cosine 1
