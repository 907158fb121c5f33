"""Incremental dedup against a persisted md5 index
(functions/dedup_index.py): brute-force semantics, bucket-pruned reads
(proved by deleting untouched buckets), atomic rebuild, DuckDB twin."""

import glob
import hashlib
import os
import shutil

import pandas as pd
import pyarrow as pa


def _tab(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})


OLD = _tab([0, 2, 4, 6], ["alpha", "beta", "gamma", "alpha"])
NEW = _tab([1, 3, 5, 7, 9, 11],
           ["alpha",     # already indexed -> dropped
            "delta",     # novel, dup within shard (min id 3 wins)
            "delta",
            "beta",      # already indexed -> dropped
            "epsilon",   # novel unique
            "delta"])    # third shard copy


def brute(old_texts, new_rows):
    seen = {hashlib.md5(t.encode()).hexdigest() for t in old_texts}
    groups = {}
    for did, t in new_rows:
        m = hashlib.md5(t.encode()).hexdigest()
        g = groups.setdefault(m, [None, 0])
        g[0] = did if g[0] is None else min(g[0], did)
        g[1] += 1
    rows = [(m, v[0], v[1]) for m, v in groups.items() if m not in seen]
    return (pd.DataFrame(rows, columns=["md5", "keep_id", "n_dups"])
            .sort_values("md5").reset_index(drop=True))


class TestDedupAgainstIndex:
    def _build(self, tmp_path, ray_session, n_buckets=8):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import build_md5_index

        d = str(tmp_path / "idx")
        build_md5_index(rd.from_arrow(OLD).repartition(2), d,
                        n_buckets=n_buckets)
        return d

    def test_hand_checked(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import dedup_against_index

        idx = self._build(tmp_path, ray_session)
        got = (dedup_against_index(rd.from_arrow(NEW).repartition(3), idx)
               .to_pandas().sort_values("md5").reset_index(drop=True))
        want = brute(["alpha", "beta", "gamma", "alpha"],
                     list(zip(NEW["doc_id"].to_pylist(),
                              NEW["text"].to_pylist())))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        kept_texts = {"delta", "epsilon"}
        assert len(got) == 2
        row = got.set_index("md5").loc[
            hashlib.md5(b"delta").hexdigest()]
        assert row["keep_id"] == 3 and row["n_dups"] == 3

    def test_untouched_buckets_never_read(self, ray_session, tmp_path):
        """Delete every index bucket the new shard does NOT hash into;
        the query must still succeed with identical output — proof the
        anti-join reads only its own buckets."""
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (_md5_bucket_array,
                                                      dedup_against_index)

        idx = self._build(tmp_path, ray_session, n_buckets=8)
        before = (dedup_against_index(rd.from_arrow(NEW), idx)
                  .to_pandas().sort_values("md5").reset_index(drop=True))
        new_md5 = pa.array([hashlib.md5(t.encode()).hexdigest()
                            for t in NEW["text"].to_pylist()])
        touched = set(_md5_bucket_array(new_md5, 8).tolist())
        removed = 0
        for p in glob.glob(f"{idx}/md5s/bpart=*"):
            b = int(p.rsplit("=", 1)[1])
            if b not in touched:
                shutil.rmtree(p)
                removed += 1
        assert removed > 0, "fixture must leave some buckets untouched"
        after = (dedup_against_index(rd.from_arrow(NEW), idx)
                 .to_pandas().sort_values("md5").reset_index(drop=True))
        pd.testing.assert_frame_equal(before, after)

    def test_atomic_rebuild(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_md5_index,
                                                      dedup_against_index)

        idx = self._build(tmp_path, ray_session)
        assert os.path.isfile(f"{idx}/meta.parquet")
        # second build over the published dir must not corrupt it
        build_md5_index(rd.from_arrow(OLD), idx, n_buckets=8)
        assert os.path.isfile(f"{idx}/meta.parquet")
        assert not glob.glob(f"{idx}.building.*")
        got = (dedup_against_index(rd.from_arrow(NEW), idx)
               .to_pandas().sort_values("md5").reset_index(drop=True))
        assert len(got) == 2

    def test_partition_invariance(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import dedup_against_index

        idx = self._build(tmp_path, ray_session)
        a = (dedup_against_index(rd.from_arrow(NEW).repartition(1), idx)
             .to_pandas().sort_values("md5").reset_index(drop=True))
        b = (dedup_against_index(rd.from_arrow(NEW).repartition(6), idx)
             .to_pandas().sort_values("md5").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestExtendIndex:
    def test_crawl_loop_chain(self, ray_session, tmp_path):
        """build(A) → dedup(B) → extend(novel B) → dedup(C) must equal
        brute force with seen = A ∪ B."""
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_md5_index,
                                                      dedup_against_index,
                                                      extend_md5_index)

        A = _tab([0, 1], ["alpha", "beta"])
        B = _tab([10, 11, 12], ["beta", "delta", "delta"])
        C = _tab([20, 21, 22, 23],
                 ["alpha",    # in A
                  "delta",    # novel in B, extended -> dropped
                  "omega",    # novel
                  "omega"])   # shard dup
        idx = str(tmp_path / "chain")
        build_md5_index(rd.from_arrow(A), idx, n_buckets=4)
        kept_b = dedup_against_index(rd.from_arrow(B), idx).materialize()
        n = extend_md5_index(idx, kept_b, md5_column="md5")
        assert n == kept_b.count() == 1  # only 'delta'
        got = (dedup_against_index(rd.from_arrow(C), idx).to_pandas()
               .sort_values("md5").reset_index(drop=True))
        want = brute(["alpha", "beta", "delta"],
                     list(zip(C["doc_id"].to_pylist(),
                              C["text"].to_pylist())))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got["keep_id"].to_list() == [
            k for k, t in [(22, "omega")]]

    def test_extend_idempotent(self, ray_session, tmp_path):
        """Re-running the same extension (crash-retry) changes nothing
        semantically — the index is a membership set."""
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_md5_index,
                                                      dedup_against_index,
                                                      extend_md5_index)

        idx = str(tmp_path / "idem")
        build_md5_index(rd.from_arrow(OLD), idx, n_buckets=4)
        extra = _tab([100], ["zeta"])
        extend_md5_index(idx, rd.from_arrow(extra))
        extend_md5_index(idx, rd.from_arrow(extra))  # retry
        probe = _tab([200, 201], ["zeta", "eta"])
        got = (dedup_against_index(rd.from_arrow(probe), idx).to_pandas())
        assert got["keep_id"].to_list() == [201]  # zeta seen once-extended

    def test_extend_from_text_column(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_md5_index,
                                                      dedup_against_index,
                                                      extend_md5_index)

        idx = str(tmp_path / "txt")
        build_md5_index(rd.from_arrow(OLD), idx, n_buckets=4)
        n = extend_md5_index(idx, rd.from_arrow(
            _tab([50, 51], ["theta", "theta"])))
        assert n == 1  # per-batch unique
        got = dedup_against_index(
            rd.from_arrow(_tab([60], ["theta"])), idx).to_pandas()
        assert len(got) == 0


class TestBloomIndex:
    def test_matches_exact_index(self, ray_session, tmp_path):
        """With 2^20 bits and a tiny corpus the false-positive term is
        ~0, so the Bloom result must EQUAL the exact-index result; in
        general it may only be a subset (FPs drop novel docs)."""
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_bloom_index,
                                                      build_md5_index,
                                                      dedup_against_bloom,
                                                      dedup_against_index)

        bidx = str(tmp_path / "bloom")
        midx = str(tmp_path / "md5")
        build_bloom_index(rd.from_arrow(OLD).repartition(2), bidx,
                          n_buckets=8)
        build_md5_index(rd.from_arrow(OLD).repartition(2), midx,
                        n_buckets=8)
        got = (dedup_against_bloom(rd.from_arrow(NEW).repartition(3), bidx)
               .to_pandas().sort_values("md5").reset_index(drop=True))
        want = (dedup_against_index(rd.from_arrow(NEW).repartition(3), midx)
                .to_pandas().sort_values("md5").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert os.path.isfile(f"{bidx}/meta.parquet")
        assert not glob.glob(f"{bidx}.building.*")

    def test_no_false_negatives(self, ray_session, tmp_path):
        """Exact copies of indexed docs are ALWAYS dropped — the Bloom
        guarantee that matters for dedup."""
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_bloom_index,
                                                      dedup_against_bloom)

        idx = str(tmp_path / "nofn")
        build_bloom_index(rd.from_arrow(OLD), idx, n_buckets=8)
        copies = _tab([100, 101, 102], ["alpha", "beta", "gamma"])
        got = dedup_against_bloom(rd.from_arrow(copies), idx).to_pandas()
        assert len(got) == 0

    def test_chained_extend(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_bloom_index,
                                                      dedup_against_bloom,
                                                      extend_bloom_index)

        idx = str(tmp_path / "bloomchain")
        build_bloom_index(rd.from_arrow(_tab([0, 1], ["alpha", "beta"])),
                          idx, n_buckets=8)
        B = _tab([10, 11], ["beta", "delta"])
        kept = dedup_against_bloom(rd.from_arrow(B), idx).materialize()
        assert kept.count() == 1  # only 'delta'
        extend_bloom_index(idx, kept, md5_column="md5")
        extend_bloom_index(idx, kept, md5_column="md5")  # idempotent retry
        C = _tab([20, 21, 22], ["delta", "alpha", "omega"])
        got = dedup_against_bloom(rd.from_arrow(C), idx).to_pandas()
        assert got["keep_id"].to_list() == [22]  # only 'omega' is novel


BASE = "the quick brown fox jumps over the lazy dog " * 10


def _near_docs(ids_texts):
    return _tab([i for i, _ in ids_texts], [t for _, t in ids_texts])


NEAR_ALL = [
    (0, BASE),
    (2, BASE),                                   # old exact dup of 0
    (4, BASE + "with an extra tail of words"),   # old near-dup
    (6, "completely unrelated text about ray data pipelines and arrow "
        "batches flowing through a streaming executor with backpressure"),
    (1, BASE),                                   # new dup of old 0/2
    (3, BASE.replace("lazy", "sleepy")),         # new near-dup
    (5, BASE),                                   # new dup (also of 1)
    (7, "another fully distinct document mentioning parquet row groups "
        "and bucketed shuffles and combiner partials"),
]


class TestBandIndex:
    def _full_filtered(self, rows, is_new):
        """Reference: full-corpus LSH candidates filtered to pairs with
        >= 1 new member."""
        import ray.data as rd

        from vtzero_ray.functions.dedup import minhash_lsh_candidates

        full = (minhash_lsh_candidates(rd.from_arrow(_near_docs(rows)))
                .to_pandas())
        mask = full.apply(lambda r: is_new(r["doc_a"]) or is_new(r["doc_b"]),
                          axis=1)
        return (full[mask].sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))

    def test_matches_full_scan_filtered(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (
            build_band_index, near_dup_candidates_vs_index)

        old = [r for r in NEAR_ALL if r[0] % 2 == 0]
        new = [r for r in NEAR_ALL if r[0] % 2 == 1]
        idx = str(tmp_path / "bands")
        build_band_index(rd.from_arrow(_near_docs(old)), idx, n_buckets=8)
        got = (near_dup_candidates_vs_index(
            rd.from_arrow(_near_docs(new)).repartition(3), idx)
            .to_pandas().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))
        want = self._full_filtered(NEAR_ALL, lambda i: i % 2 == 1)
        assert len(want) > 0  # fixture must produce candidates
        assert (want["doc_a"] % 2 == 0).any()  # incl. old-new pairs
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_chained_extend(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (
            build_band_index, extend_band_index,
            near_dup_candidates_vs_index)

        A = [(0, BASE), (2, "unrelated filler text with many distinct "
                            "words nothing shared here at all")]
        B = [(10, BASE), (12, BASE.replace("dog", "cat"))]
        C = [(20, BASE), (21, "yet another disjoint document")]
        idx = str(tmp_path / "chain_bands")
        build_band_index(rd.from_arrow(_near_docs(A)), idx, n_buckets=8)
        n = extend_band_index(idx, rd.from_arrow(_near_docs(B)))
        assert n > 0
        got = (near_dup_candidates_vs_index(
            rd.from_arrow(_near_docs(C)), idx)
            .to_pandas().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))
        want = self._full_filtered(A + B + C, lambda i: i >= 20)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # doc 20 must pair with the indexed BASE copies from BOTH shards
        partners = set(got.loc[got["doc_b"] == 20, "doc_a"]) | \
            set(got.loc[got["doc_a"] == 20, "doc_b"])
        assert {0, 10} <= partners

    def test_untouched_buckets_never_read(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (
            build_band_index, near_dup_candidates_vs_index)

        old = [r for r in NEAR_ALL if r[0] % 2 == 0]
        # one probe doc → ≤16 band rows touch ≤16 of 32 buckets, and it
        # is a dup of indexed copies so the comparison is non-empty
        new = [(9, BASE)]
        idx = str(tmp_path / "prune_bands")
        build_band_index(rd.from_arrow(_near_docs(old)), idx,
                         n_buckets=32)
        before = near_dup_candidates_vs_index(
            rd.from_arrow(_near_docs(new)), idx).to_pandas()
        # delete every bucket the probe does not touch
        import pyarrow.parquet as pq

        from vtzero_ray.functions.dedup_index import _band_meta, _band_rows
        meta = _band_meta(idx)
        touched = set(
            _band_rows(rd.from_arrow(_near_docs(new)), meta["n_perm"],
                       meta["n_bands"], meta["k"], meta["seed"],
                       meta["n_buckets"])
            .to_pandas()["bpart"].tolist())
        removed = 0
        for p in glob.glob(f"{idx}/bands/bpart=*"):
            if int(p.rsplit("=", 1)[1]) not in touched:
                shutil.rmtree(p)
                removed += 1
        assert removed > 0
        after = near_dup_candidates_vs_index(
            rd.from_arrow(_near_docs(new)), idx).to_pandas()
        pd.testing.assert_frame_equal(
            before.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
            after.sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    def test_sql_twin_on_sf(self, ray_session, sf_dir, tmp_path):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (
            build_band_index, minhash_incremental_sql,
            near_dup_candidates_vs_index)

        def split(keep_old):
            def f(t):
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                mask = (ids % 3 == 0) if keep_old else (ids % 3 != 0)
                return t.filter(pa.array(mask))
            return rd.read_parquet(
                sf_dir + "/documents.parquet",
                columns=["doc_id", "text"]).repartition(8).map_batches(
                f, batch_format="pyarrow", batch_size=None)

        idx = str(tmp_path / "sf_bands")
        build_band_index(split(True), idx)
        got = (near_dup_candidates_vs_index(split(False), idx)
               .to_pandas().sort_values(["doc_a", "doc_b"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = (con.execute(minhash_incremental_sql()).df()
                .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False)


class TestSynthTwin:
    def test_duckdb_twin_on_sf(self, ray_session, sf_dir, tmp_path):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.dedup_index import (build_md5_index,
                                                      dedup_against_index,
                                                      dedup_incremental_sql,
                                                      synth_dup_corpus)

        def load():
            return rd.read_parquet(sf_dir + "/documents.parquet",
                                   columns=["doc_id"]).repartition(8)

        def split(ds, keep_old):
            def f(t):
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                mask = (ids % 3 == 0) if keep_old else (ids % 3 != 0)
                return t.filter(pa.array(mask))
            return ds.map_batches(f, batch_format="pyarrow",
                                  batch_size=None)

        idx = str(tmp_path / "sfidx")
        build_md5_index(split(synth_dup_corpus(load()), True), idx)
        got = (dedup_against_index(
            split(synth_dup_corpus(load()), False), idx)
            .to_pandas().sort_values("md5").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = (con.execute(dedup_incremental_sql()).df()
                .sort_values("md5").reset_index(drop=True))
        # all three outcomes must occur in the fixture
        assert len(want) > 0
        assert (want["n_dups"] == 2).any() and (want["n_dups"] == 1).any()
        n_new = con.execute(
            "SELECT count(*) FROM documents WHERE doc_id % 3 <> 0"
        ).fetchone()[0]
        assert int(want["n_dups"].sum()) < n_new  # some were indexed
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)
