"""Unigram-LM perplexity scoring (functions/lm.py): hand-checked math,
DuckDB-twin equality, vocabulary truncation, partition invariance."""

import numpy as np
import pyarrow as pa


def _tab(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


CORPUS = [
    "the cat sat on the mat",
    "the dog sat",
    "rare unique tokens here",
    "",
    "   ",                      # whitespace-only -> 0 tokens
    "the the the the",
]


class TestUnigramCounts:
    def test_counts(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.lm import unigram_counts

        out = (unigram_counts(rd.from_arrow(_tab(CORPUS)).repartition(3))
               .to_pandas().set_index("tok")["n"].to_dict())
        assert out["the"] == 7
        assert out["sat"] == 2
        assert out["rare"] == 1
        assert "" not in out
        assert sum(out.values()) == 17


class TestDocPerplexity:
    def _expected(self, texts):
        """Reference NLL computed with plain Python floats — the same
        ops in the same order as both engines."""
        toks = [t.strip().split() if t.strip() else [] for t in texts]
        from collections import Counter
        cnt = Counter(tok for ts in toks for tok in ts)
        T, V = sum(cnt.values()), len(cnt)
        denom = float(T + V)
        out = []
        for ts in toks:
            s = 0
            for tok, tf in sorted(Counter(ts).items()):
                import math
                s += int(math.floor((float(tf) *
                                     math.log((cnt[tok] + 1.0) / denom))
                                    * 1e9 + 0.5))
            out.append((len(ts), -s))
        return out

    def test_hand_checked(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.lm import doc_perplexity

        got = (doc_perplexity(rd.from_arrow(_tab(CORPUS)).repartition(3))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        exp = self._expected(CORPUS)
        assert list(got.n_tokens) == [e[0] for e in exp]
        assert list(got.nll_q9) == [e[1] for e in exp]
        # rare-token doc scores worse per token than the common-token doc
        avg = got.nll_q9 / np.maximum(got.n_tokens, 1)
        assert avg[2] > avg[5]

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.lm import doc_perplexity, doc_perplexity_sql

        tab = _tab(CORPUS)
        got = (doc_perplexity(rd.from_arrow(tab).repartition(4))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(doc_perplexity_sql()).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.lm import doc_perplexity

        outs = []
        for parts in (1, 5):
            outs.append(doc_perplexity(
                rd.from_arrow(_tab(CORPUS)).repartition(parts))
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert outs[0].equals(outs[1])

    def test_max_vocab_truncation(self, ray_session):
        """Truncated-away tokens score as unseen (c=0) while T and V keep
        the full-corpus values — the 100-TB broadcast-pruning path."""
        import math

        import ray.data as rd

        from vtzero_ray.functions.lm import doc_perplexity

        texts = ["a a a b", "z"]
        got = (doc_perplexity(rd.from_arrow(_tab(texts)), max_vocab=1)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # corpus: a x3, b, z -> T=5, V=3; kept model = {a: 3}
        denom = 8.0
        q = lambda tf, c: int(math.floor(
            (float(tf) * math.log((c + 1.0) / denom)) * 1e9 + 0.5))
        assert got.nll_q9[0] == -(q(3, 3) + q(1, 0))
        assert got.nll_q9[1] == -q(1, 0)


class TestTfidfTopk:
    def test_hand_checked(self, ray_session):
        """Term unique to one doc outranks corpus-wide terms; ties break
        by term ASC; rank is dense 1..k."""
        import ray.data as rd

        from vtzero_ray.functions.lm import tfidf_topk

        texts = [
            "common common zebra",     # zebra: tf1 * ln(3/1) tops
            "common yak yak",          # yak: tf2 * ln(3/1)
            "common common common",    # only common -> score 0
        ]
        out = (tfidf_topk(rd.from_arrow(_tab(texts)).repartition(2), k=2)
               .to_pandas().sort_values(["doc_id", "rnk"])
               .reset_index(drop=True))
        assert out[out.doc_id == 0].term.tolist() == ["zebra", "common"]
        assert out[out.doc_id == 1].term.tolist() == ["yak", "common"]
        d2 = out[out.doc_id == 2]
        assert d2.term.tolist() == ["common"]   # only one term exists
        assert (d2.tfidf_q9 == 0).all()         # df == N -> ln 1 = 0
        assert out.groupby("doc_id").rnk.apply(
            lambda s: s.tolist() == list(range(1, len(s) + 1))).all()

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.lm import tfidf_topk, tfidf_topk_sql

        tab = _tab(CORPUS)
        got = (tfidf_topk(rd.from_arrow(tab).repartition(3), k=3)
               .to_pandas().sort_values(["doc_id", "rnk"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(tfidf_topk_sql(k=3)).fetchdf()
                .sort_values(["doc_id", "rnk"]).reset_index(drop=True))
        assert got.equals(want)


class TestFilterByPerplexity:
    def test_median_gate_and_twin(self, ray_session):
        """Kept set == DuckDB quantile_disc twin; empty docs land in
        bucket 0 (always kept); kept fraction covers >= p of docs."""
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.lm import (filter_by_perplexity,
                                             filter_by_perplexity_sql)

        texts = CORPUS + ["zz yy xx ww vv uu",        # rare -> high nll
                          "the cat sat",               # common -> low
                          "qq rr ss tt"] * 3
        tab = _tab(texts)
        got = (filter_by_perplexity(rd.from_arrow(tab).repartition(4),
                                    p=0.5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(filter_by_perplexity_sql(p=0.5)).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)
        assert len(got) >= len(texts) / 2            # median keeps >= half
        kept = set(got.doc_id)
        assert 3 in kept and 4 in kept               # empty docs: bucket 0
        # the rare-token doc scores above the common-token docs' buckets
        all_b = {r.doc_id: r.ppl_bucket for r in got.itertuples()}
        if 6 in kept and 7 in kept:
            assert all_b[6] > all_b[7]


class TestBigramPerplexity:
    def _expected(self, texts):
        """Plain-Python bigram add-1 NLL, same quantization."""
        import math

        toks = [t.split() for t in texts]
        vocab = {w for ts in toks for w in ts}
        V = len(vocab)
        cb, ctx = {}, {}
        for ts in toks:
            for a, b in zip(ts, ts[1:]):
                cb[(a, b)] = cb.get((a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        out = []
        for ts in toks:
            pairs = list(zip(ts, ts[1:]))
            tf = {}
            for p in pairs:
                tf[p] = tf.get(p, 0) + 1
            nll = -sum(
                int(math.floor((f * math.log((cb[p] + 1.0)
                                             / (ctx[p[0]] + V)))
                               * 1e9 + 0.5))
                for p, f in tf.items())
            out.append((len(pairs), nll))
        return out

    def test_hand_corpus_with_empty_docs(self, ray_session):
        """Exercises the sentinel channel: empty / whitespace-only /
        1-token docs keep a (0, 0) row."""
        import ray.data as rd

        from vtzero_ray.functions.lm import bigram_perplexity

        corpus = CORPUS + ["single"]
        got = (bigram_perplexity(
            lambda: rd.from_arrow(_tab(corpus)).repartition(3))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = self._expected(corpus)
        assert len(got) == len(corpus)
        for i, (nb, nll) in enumerate(want):
            row = got.iloc[i]
            assert (row.n_bigrams, row.nll_q9) == (nb, nll), i
        # docs 3, 4 (empty/ws-only) and 6 ("single") have no bigrams
        assert got.loc[[3, 4, 6], "n_bigrams"].tolist() == [0, 0, 0]
        assert got.loc[[3, 4, 6], "nll_q9"].tolist() == [0, 0, 0]

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.lm import (bigram_perplexity,
                                             bigram_perplexity_sql)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(bigram_perplexity_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        for parts in (1, 7):
            got = bigram_perplexity(
                lambda: rd.read_parquet(f"{sf}/documents.parquet",
                                        columns=["doc_id", "text"])
                .repartition(parts)) \
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
