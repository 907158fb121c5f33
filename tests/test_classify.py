"""Naive-Bayes classifier (functions/classify.py): hand-checked math,
DuckDB-twin equality, tie-break, vocabulary truncation, partition
invariance."""

import math

import numpy as np
import pyarrow as pa


def _tab(rows):
    """rows = [(doc_id, text, lang), ...]"""
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows]),
                     "lang": pa.array([r[2] for r in rows])})


# doc_id % 3 == 0 is the seed split used by the driver query; every
# class appears in the seed (ids 0, 3, 6, 9) — a class absent from the
# seed cannot be predicted (standard NB)
CORPUS = [
    (0, "der hund und die katze", "de"),
    (1, "the dog and the cat", "en"),
    (2, "le chien et le chat", "fr"),
    (3, "the cat and the bird", "en"),
    (4, "die katze und der vogel", "de"),
    (5, "le chat et le poisson", "fr"),
    (6, "le poisson et le chien", "fr"),
    (7, "der vogel und der hund", "de"),
    (8, "", ""),                      # empty text -> prior argmax
    (9, "die katze und der hund", "de"),
]


def _split(ray_session, tab, mod=3):
    import ray.data as rd

    seed_rows = tab.filter(pa.array(
        [i % mod == 0 for i in tab.column("doc_id").to_pylist()]))
    ds = rd.from_arrow(tab.select(["doc_id", "text"])).repartition(3)
    seed = rd.from_arrow(seed_rows).repartition(2)
    return ds, seed


class TestNBClassify:
    def test_separable_classes(self, ray_session):
        from vtzero_ray.functions.classify import nb_classify

        tab = _tab(CORPUS)
        ds, seed = _split(ray_session, tab)
        out = (nb_classify(ds, seed).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        pred = out.set_index("doc_id")["pred"].to_dict()
        # seed docs classify to their own class; held-out docs with
        # class-typical vocabulary classify correctly
        for i, _, lang in CORPUS:
            if i in (8,):
                continue
            assert pred[i] == lang, (i, pred[i], lang)

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb

        from vtzero_ray.functions.classify import (nb_classify,
                                                   nb_classify_sql)

        tab = _tab(CORPUS)
        ds, seed = _split(ray_session, tab)
        got = (nb_classify(ds, seed).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", tab)
        want = (con.execute(nb_classify_sql(train_mod=3)).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    def test_empty_doc_prior_argmax(self, ray_session):
        """A doc with no tokens scores priors only; the seed split has
        2x 'de'/'en'... -> ties break class ASC."""
        from vtzero_ray.functions.classify import nb_classify

        tab = _tab(CORPUS)
        ds, seed = _split(ray_session, tab)
        out = nb_classify(ds, seed).to_pandas().set_index("doc_id")
        # seed = docs 0,3,6,9 -> priors de:2, en:1, fr:1 -> argmax de
        assert out.loc[8, "pred"] == "de"
        n, K = 4, 3
        prior_de = int(math.floor(math.log(3.0 / (n + K)) * 1e9 + 0.5))
        assert out.loc[8, "score_q9"] == prior_de

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.classify import nb_classify

        tab = _tab(CORPUS)
        seed_rows = tab.filter(pa.array(
            [i % 3 == 0 for i in tab.column("doc_id").to_pylist()]))
        outs = []
        for parts in (1, 5):
            ds = rd.from_arrow(tab.select(["doc_id", "text"])) \
                .repartition(parts)
            seed = rd.from_arrow(seed_rows).repartition(parts)
            outs.append(nb_classify(ds, seed).to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
        assert outs[0].equals(outs[1])

    def test_max_vocab_truncation(self, ray_session):
        """Truncated tokens score as unseen (c=0) for every class while
        T_c and V keep full-vocabulary values — the broadcast-pruning
        path. With one kept token the argmax is decided by that token
        plus priors."""
        from vtzero_ray.functions.classify import nb_classify

        rows = [(0, "aa aa aa bb", "x"), (1, "cc cc cc dd", "y"),
                (2, "aa zz", "x"), (3, "cc zz", "y")]
        tab = _tab(rows)
        ds, seed = _split(ray_session, tab, mod=1)  # train on all
        full = nb_classify(ds, seed).to_pandas().set_index("doc_id")
        ds2, seed2 = _split(ray_session, tab, mod=1)
        trunc = nb_classify(ds2, seed2, max_vocab=2).to_pandas() \
            .set_index("doc_id")
        # kept model = {aa, cc} (top-2 by count); preds still separable
        assert list(trunc["pred"]) == list(full["pred"])
        # doc 0: full model scores bb with c=1, truncated with c=0
        assert trunc.loc[0, "score_q9"] < full.loc[0, "score_q9"]
        # expected truncated score for doc 0 under class 'x':
        # seed tokens: x: aa*4? no -> x: aa,aa,aa,bb,aa,zz (T=6); y: cc*3,dd,cc,zz (T=6); V=5
        T, V, n, K = 6, 5, 4, 2
        q = lambda tf, c: int(math.floor(
            (float(tf) * math.log((c + 1.0) / (T + V))) * 1e9 + 0.5))
        prior = int(math.floor(math.log(3.0 / (n + K)) * 1e9 + 0.5))
        assert trunc.loc[0, "score_q9"] == prior + q(3, 4) + q(1, 0)
