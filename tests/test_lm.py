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


class TestBackoffTrigram:
    """Stupid-backoff trigram scoring: every branch of the cascade
    exercised on a hand corpus, then DuckDB-twin equality + partition
    invariance on the sf corpus."""

    # doc_id % 3 == 0 -> SCORE split, else TRAIN split
    HAND = [
        "a b c x q r",     # 0: tri hit (a,b,c); uni-seen (x); uni-unseen (q,r)
        "a b c a b c",     # 1 train
        "a b d x y z",     # 2 train
        "",                # 3: score, 0 trigrams (sentinel)
        "c a b",           # 4 train (adds trigram c a b context variety)
        "q q q q",         # 5 train? 5%3=2 -> train: makes q a SEEN unigram!
        "z x y",           # 6: score, tri (z,x,y) miss, bigram (x,y) HIT
        "w w",             # 7 train
        "k c a b d",       # 8 train
        "a b",             # 9: score, < 3 tokens -> sentinel 0
    ]

    def _expected(self, texts, train_mod=3):
        import math

        toks = [t.split() for t in texts]
        trn = [ts for i, ts in enumerate(toks) if i % train_mod != 0]
        c3, x12, c2, x2, c1 = {}, {}, {}, {}, {}
        for ts in trn:
            for a, b, c in zip(ts, ts[1:], ts[2:]):
                c3[(a, b, c)] = c3.get((a, b, c), 0) + 1
                x12[(a, b)] = x12.get((a, b), 0) + 1
            for a, b in zip(ts, ts[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
                x2[a] = x2.get(a, 0) + 1
            for a in ts:
                c1[a] = c1.get(a, 0) + 1
        N = sum(c1.values())
        V = len(c1)
        out = {}
        for i, ts in enumerate(toks):
            if i % train_mod != 0:
                continue
            tris = list(zip(ts, ts[1:], ts[2:]))
            tf = {}
            for t in tris:
                tf[t] = tf.get(t, 0) + 1
            nll = 0
            for (a, b, c), f in tf.items():
                if (a, b, c) in c3:
                    s = c3[(a, b, c)] / x12[(a, b)]
                elif (b, c) in c2:
                    s = 0.4 * (c2[(b, c)] / x2[b])
                else:
                    s = 0.4 * (0.4 * ((c1.get(c, 0) + 1.0) / (N + V)))
                nll -= int(math.floor((f * math.log(s)) * 1e9 + 0.5))
            out[i] = (len(tris), nll)
        return out

    def test_hand_corpus_all_branches(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.lm import backoff_trigram_perplexity

        want = self._expected(self.HAND)
        got = (backoff_trigram_perplexity(
            lambda: rd.from_arrow(_tab(self.HAND)).repartition(3))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert sorted(got.doc_id) == sorted(want)   # score split only
        for row in got.itertuples():
            assert (row.n_trigrams, row.nll_q9) == want[row.doc_id], \
                row.doc_id
        # the branch the corpus is built to exercise really fired:
        # doc 0 has a trigram hit AND a double-backoff unseen unigram;
        # doc 6's only trigram resolves at the bigram level
        assert want[0][1] != 0 and want[6][1] != 0
        assert got.loc[got.doc_id == 3, "n_trigrams"].item() == 0
        assert got.loc[got.doc_id == 9, "n_trigrams"].item() == 0

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.lm import (backoff_trigram_perplexity,
                                             backoff_trigram_sql)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(backoff_trigram_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(exp) > 0
        for parts in (1, 7):
            got = backoff_trigram_perplexity(
                lambda: rd.read_parquet(f"{sf}/documents.parquet",
                                        columns=["doc_id", "text"])
                .repartition(parts)) \
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_twin_hand_corpus(self, ray_session):
        """Twin equality on the branch-covering hand corpus too (the sf
        corpus may not hit every backoff level)."""
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.lm import (backoff_trigram_perplexity,
                                             backoff_trigram_sql)

        con = duckdb.connect()
        con.register("documents", _tab(self.HAND).to_pandas())
        exp = con.execute(backoff_trigram_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        got = (backoff_trigram_perplexity(
            lambda: rd.from_arrow(_tab(self.HAND)).repartition(4))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestCCNetTiers:
    def test_twin_and_tier_semantics(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.lm import ccnet_tiers, ccnet_tiers_sql

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(ccnet_tiers_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        for parts in (1, 5):
            got = ccnet_tiers(
                rd.read_parquet(f"{sf}/documents.parquet",
                                columns=["doc_id", "text", "lang"])
                .repartition(parts)).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # every doc labeled; all three tiers present per big language;
        # tiers ordered by bucket within a language
        assert len(got) == con.execute(
            "SELECT COUNT(*) FROM documents").fetchone()[0]
        big = got.groupby("lang").size().idxmax()
        sub = got[got.lang == big]
        assert set(sub.tier) == {0, 1, 2}
        assert sub[sub.tier == 0].ppl_bucket.max() \
            <= sub[sub.tier == 1].ppl_bucket.min()
        assert sub[sub.tier == 1].ppl_bucket.max() \
            <= sub[sub.tier == 2].ppl_bucket.min()
        # head holds roughly the best third
        assert len(sub[sub.tier == 0]) >= len(sub) // 6
