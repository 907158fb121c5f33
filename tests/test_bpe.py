"""BPE tokenizer (functions/bpe.py): distributed training matches a
naive single-process reference, rank-greedy encoding reproduces training
segmentation, per-doc counts, partition invariance."""

import numpy as np
import pyarrow as pa


def _tab(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "",
    "   ",
    "low lower newest",
]


def naive_train(texts, n_merges):
    """Single-process reference trainer: same word counting, same
    deterministic tie-breaks (count DESC, pair ASC), same greedy
    leftmost-nonoverlapping application."""
    from collections import Counter

    from vtzero_ray.functions.bpe import END, _apply_merge

    wc = Counter()
    for t in texts:
        for w in t.split():
            wc[w] += 1
    words = {tuple(w) + (END,): n for w, n in sorted(wc.items())}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {_apply_merge(sym, *best): n for sym, n in words.items()}
    return merges, words


def naive_counts(texts, merges):
    """Per-doc emitted-token counts via direct rank-greedy encoding
    (the bare END sentinel is a boundary marker, not a token)."""
    from vtzero_ray.functions.bpe import END, _encode_word

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out = []
    for t in texts:
        n = 0
        for w in t.split():
            n += sum(1 for s in _encode_word(w, ranks) if s != END)
        out.append(n)
    return out


class TestTrainBPE:
    def test_matches_naive(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.bpe import train_bpe

        got = train_bpe(rd.from_arrow(_tab(CORPUS)).repartition(3),
                        n_merges=12)
        want, _ = naive_train(CORPUS, 12)
        assert got == want

    def test_first_merges_classic(self, ray_session):
        """Sennrich-style corpus: the most frequent pair ('e','s') with
        ties broken pair-ASC, then its extension ('es','t')."""
        import ray.data as rd

        from vtzero_ray.functions.bpe import train_bpe

        merges = train_bpe(rd.from_arrow(_tab(CORPUS)), n_merges=3)
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")

    def test_exhausts_small_corpus(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.bpe import train_bpe

        # asking for far more merges than pairs exist must terminate
        merges = train_bpe(rd.from_arrow(_tab(["ab ab", "ab"])),
                           n_merges=100)
        want, _ = naive_train(["ab ab", "ab"], 100)
        assert merges == want
        assert len(merges) < 100

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.bpe import train_bpe

        a = train_bpe(rd.from_arrow(_tab(CORPUS)).repartition(1), n_merges=8)
        b = train_bpe(rd.from_arrow(_tab(CORPUS)).repartition(7), n_merges=8)
        assert a == b


class TestEncodeConsistency:
    def test_encode_reproduces_training(self, ray_session):
        """The standard BPE invariant: rank-greedy inference segments
        every training word exactly as training left it."""
        import ray.data as rd

        from vtzero_ray.functions.bpe import _encode_word, train_bpe

        from vtzero_ray.functions.bpe import END

        merges = train_bpe(rd.from_arrow(_tab(CORPUS)), n_merges=10)
        _, words = naive_train(CORPUS, 10)
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        for w in {w for t in CORPUS for w in t.split()}:
            trained = next(sym for sym in words
                           if "".join(sym) == w + END)
            assert _encode_word(w, ranks) == trained, w


class TestBPETokenCounts:
    def test_counts_match_naive(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.bpe import bpe_token_counts, train_bpe

        ds = rd.from_arrow(_tab(CORPUS)).repartition(3)
        merges = train_bpe(ds, n_merges=8)
        got = (bpe_token_counts(ds, merges).to_pandas()
               .sort_values("doc_id").set_index("doc_id")
               ["n_bpe_tokens"].to_list())
        assert got == naive_counts(CORPUS, merges)

    def test_zero_merges_counts_chars(self, ray_session):
        """With no merges every word splits to its characters (END
        sentinel not counted)."""
        import ray.data as rd

        from vtzero_ray.functions.bpe import bpe_token_counts

        got = (bpe_token_counts(rd.from_arrow(_tab(["ab cde", ""])), [])
               .to_pandas().sort_values("doc_id")["n_bpe_tokens"].to_list())
        assert got == [5, 0]

    def test_emit_tokens(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.bpe import (_encode_word,
                                              bpe_token_counts, train_bpe)

        from vtzero_ray.functions.bpe import END

        ds = rd.from_arrow(_tab(CORPUS))
        merges = train_bpe(ds, n_merges=8)
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        out = (bpe_token_counts(ds, merges, emit_tokens=True).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        for i, text in enumerate(CORPUS):
            want = " ".join(
                " ".join(s.replace(END, "")
                         for s in _encode_word(w, ranks) if s != END)
                for w in text.split())
            assert out["bpe_tokens"][i] == want
            # concatenation restores the original words
            assert out["bpe_tokens"][i].replace(" ", "") == \
                text.replace(" ", "").strip()

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.bpe import bpe_token_counts, train_bpe

        ds1 = rd.from_arrow(_tab(CORPUS)).repartition(1)
        ds7 = rd.from_arrow(_tab(CORPUS)).repartition(7)
        merges = train_bpe(ds1, n_merges=6)
        a = (bpe_token_counts(ds1, merges).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (bpe_token_counts(ds7, merges).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)

    def test_on_sf_documents(self, ray_session, sf_dir):
        """Train on the real synthetic docs table and sanity-check the
        count bounds: chars >= bpe tokens >= whitespace tokens."""
        import ray.data as rd

        from vtzero_ray.functions.bpe import bpe_token_counts, train_bpe

        ds = rd.read_parquet(sf_dir + "/documents.parquet",
                             columns=["doc_id", "text"])
        merges = train_bpe(ds, n_merges=20)
        assert len(merges) == 20
        out = bpe_token_counts(ds, merges).to_pandas()
        docs = ds.to_pandas().set_index("doc_id")["text"]
        joined = out.set_index("doc_id")["n_bpe_tokens"]
        for did, text in docs.items():
            ws = text.split()
            n = int(joined[did])
            assert n >= len(ws)
            assert n <= sum(len(w) for w in ws)
