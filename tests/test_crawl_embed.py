"""Crawl management (functions/crawl.py), feature-hashing embeddings
(functions/embed.py) and the tile pyramid (pipelines/pyramid.py):
hand-checked semantics, DuckDB twin equality, partition invariance."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestHashEmbed:
    def test_hand_derivation(self, ray_session):
        """One doc, known tokens: every (dim, w) matches a direct md5
        re-derivation of the hashing trick."""
        import ray.data as rd

        from vtzero_ray.functions.embed import hash_embed

        text = "a b a c"
        n_dims = 8
        ds = rd.from_arrow(pa.table({"doc_id": pa.array([7], pa.int64()),
                                     "text": pa.array([text])}))
        got = hash_embed(ds, n_dims=n_dims).to_pandas()
        exp: dict[int, int] = {}
        for tok in text.split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[8:],
                               "little")
            d = h % n_dims
            exp[d] = exp.get(d, 0) + (1 if (h // n_dims) % 2 == 0 else -1)
        exp = {d: w for d, w in exp.items() if w != 0}
        assert dict(zip(got["dim"], got["w"])) == exp
        assert (got["doc_id"] == 7).all()

    def test_cancellation_and_empty_doc(self, ray_session):
        """Two tokens hashing to the same dim with opposite signs cancel
        to w == 0 and emit nothing; empty docs emit nothing."""
        import ray.data as rd

        from vtzero_ray.functions.embed import hash_embed
        from vtzero_ray.functions.sketch import CMS

        # find two distinct tokens with equal dim, opposite sign at D=4
        D = 4
        toks, seen = None, {}
        for i in range(10000):
            t = f"t{i}"
            h = int(CMS.hash64([t])[0])
            key = h % D
            sgn = 1 if (h // D) % 2 == 0 else -1
            if (key, -sgn) in seen:
                toks = (seen[(key, -sgn)], t)
                break
            seen[(key, sgn)] = t
        assert toks is not None
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([f"{toks[0]} {toks[1]}", "   "])}))
        got = hash_embed(ds, n_dims=D).to_pandas()
        assert len(got) == 0

    def test_twin_and_partition_invariance(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.embed import hash_embed, hash_embed_sql

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        exp = _canon(con.execute(hash_embed_sql(n_dims=16)).df())
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]).repartition(parts)
            got = _canon(hash_embed(ds, n_dims=16).to_pandas())
            pd.testing.assert_frame_equal(got, exp)


class TestLatestSnapshot:
    def _snaps(self):
        return pa.table({
            "url": pa.array(["u1", "u1", "u1", "u2", "u2", "u3"]),
            "warc_ts": pa.array(
                np.array([3, 1, 2, 5, 5, 9], "datetime64[s]").astype(
                    "datetime64[us]"), pa.timestamp("us")),
            "text": pa.array(["a", "b", "c", "aa-loses", "zz-wins", "only"]),
        })

    def test_hand_semantics_and_tiebreak(self, ray_session):
        """Max warc_ts wins; equal timestamps break to the greater text."""
        import ray.data as rd

        from vtzero_ray.functions.crawl import latest_snapshot

        got = (latest_snapshot(rd.from_arrow(self._snaps()).repartition(3))
               .to_pandas().set_index("url"))
        assert got.loc["u1", "text"] == "a"
        assert got.loc["u2", "text"] == "zz-wins"
        assert got.loc["u3", "text"] == "only"
        assert len(got) == 3

    def test_twin_and_partition_invariance(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.crawl import (latest_snapshot,
                                                latest_snapshot_sql,
                                                snapshots_sql_cte,
                                                synth_snapshots_batch)
        from vtzero_ray.sources.pages import SQL_URL

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        exp = _canon(con.execute(
            latest_snapshot_sql(snapshots_sql_cte(SQL_URL))).df())
        for parts in (1, 5):
            snaps = rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ).repartition(parts).map_batches(
                synth_snapshots_batch, batch_format="pyarrow",
                batch_size=None)
            got = _canon(latest_snapshot(snaps).to_pandas())
            pd.testing.assert_frame_equal(got, exp)


class TestDomainCap:
    def test_hand_semantics(self, ray_session):
        """Cap 2 keeps the two smallest ids per host; schemeless rows
        drop."""
        import ray.data as rd

        from vtzero_ray.functions.crawl import domain_cap

        t = pa.table({
            "url": pa.array([
                "https://a.example/1", "https://a.example/2",
                "https://a.example/3", "http://b.example/x",
                "not-a-url",
            ]),
            "doc_id": pa.array([11, 5, 7, 1, 2], pa.int64()),
        })
        got = (domain_cap(rd.from_arrow(t).repartition(4), max_per_domain=2)
               .to_pandas())
        kept = set(zip(got["domain"], got["doc_id"]))
        assert kept == {("a.example", 5), ("a.example", 7),
                        ("b.example", 1)}

    def test_twin_and_partition_invariance(self, ray_session, sf_dir):
        import duckdb

        import numpy as np
        import ray.data as rd

        from vtzero_ray.functions.crawl import domain_cap, domain_cap_sql

        def synth_urls(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy()
            url = np.char.add(np.char.add(np.char.add(
                "https://host", (d % 7).astype(str)), ".example/p/"),
                d.astype(str))
            return pa.table({"url": pa.array(url, pa.string()),
                             "doc_id": batch.column("doc_id")})

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        exp = _canon(con.execute(domain_cap_sql(
            "(SELECT 'https://host' || (doc_id % 7) || '.example/p/' || "
            "doc_id AS url, doc_id FROM documents)", 3)).df())
        assert len(exp) == 21  # the cap genuinely bites: 7 hosts x 3
        for parts in (1, 6):
            pages = rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id"]
            ).repartition(parts).map_batches(
                synth_urls, batch_format="pyarrow", batch_size=None)
            got = _canon(domain_cap(pages, max_per_domain=3).to_pandas())
            pd.testing.assert_frame_equal(got, exp)


class TestTilePyramid:
    def test_parent_sums_and_conservation(self, ray_session, sf_dir):
        """Every level's counts sum to the page total, and each parent
        tile's count equals the sum of its children two levels down."""
        from vtzero_ray.pipelines.pyramid import tile_pyramid
        from vtzero_ray.pipelines.tiling import features_dataset

        ds = features_dataset(sf_dir, zooms=(10,))
        out = tile_pyramid(ds, base_zoom=10, levels=(10, 8, 6, 4)).to_pandas()
        totals = out.groupby("z")["n_pages"].sum()
        assert len(set(totals)) == 1
        for child, parent in ((10, 8), (8, 6), (6, 4)):
            c = out[out["z"] == child].copy()
            c["px"] = c["x"] // 4
            c["py"] = c["y"] // 4
            rolled = (c.groupby(["px", "py"])["n_pages"].sum()
                      .reset_index()
                      .rename(columns={"px": "x", "py": "y"}))
            p = out[out["z"] == parent][["x", "y", "n_pages"]]
            pd.testing.assert_frame_equal(
                _canon(rolled[["x", "y", "n_pages"]]), _canon(p))

    def test_partition_invariance(self, ray_session, sf_dir):
        from vtzero_ray.pipelines.pyramid import tile_pyramid
        from vtzero_ray.pipelines.tiling import features_dataset

        base = features_dataset(sf_dir, zooms=(10,))
        a = _canon(tile_pyramid(base, base_zoom=10).to_pandas())
        b = _canon(tile_pyramid(
            features_dataset(sf_dir, zooms=(10,)).repartition(11),
            base_zoom=10).to_pandas())
        pd.testing.assert_frame_equal(a, b)


class TestExtractLinks:
    def test_hand_extraction(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.crawl import extract_links

        html = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "html": pa.array([
                '<a href="u1">x</a> mid <a href="u2">y</a>',
                'no links here',
                'unterminated href="oops',   # no closing quote -> no match
                'empty href=""></a> then href="u3"',
            ]),
        })
        got = extract_links(rd.from_arrow(html)).to_pandas()
        got = got.sort_values(["doc_id", "link_idx"]).reset_index(drop=True)
        assert list(map(tuple, got.itertuples(index=False))) == [
            (1, 0, "u1"), (1, 1, "u2"), (4, 0, ""), (4, 1, "u3")]

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.crawl import (extract_links,
                                                extract_links_sql,
                                                linked_html_sql_expr,
                                                synth_linked_html)

        sf = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
        got = extract_links(synth_linked_html(docs)).to_pandas()
        got7 = extract_links(
            synth_linked_html(docs.repartition(7))).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(extract_links_sql(linked_html_sql_expr())).fetchdf()
        key = ["doc_id", "link_idx"]
        for frame in (got, got7):
            pd.testing.assert_frame_equal(
                frame.sort_values(key).reset_index(drop=True),
                exp.sort_values(key).reset_index(drop=True))


class TestAnchorText:
    def test_hand_html(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.crawl import extract_anchors

        html = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "html": pa.array([
                'x <a href="u1">one</a> y <a href="u2">two</a>',
                'no links here',
                'href="u3">unclosed anchor',     # no </a> -> no match
                'href="u4">has<tag</a> href="u5"></a>',  # '<' breaks #0
            ]),
        })
        got = extract_anchors(rd.from_arrow(html)).to_pandas()
        got = got.sort_values(["doc_id", "link_idx"]).reset_index(drop=True)
        assert list(map(tuple, got.itertuples(index=False))) == [
            (1, 0, "u1", "one"), (1, 1, "u2", "two"), (4, 0, "u5", "")]

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.crawl import (anchor_topk,
                                                anchor_topk_sql,
                                                extract_anchors,
                                                linked_html_sql_expr,
                                                synth_linked_html)

        sf = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
        got = anchor_topk(
            extract_anchors(synth_linked_html(docs)), k=3).to_pandas()
        got7 = anchor_topk(
            extract_anchors(synth_linked_html(docs.repartition(7))),
            k=3).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(
            anchor_topk_sql(linked_html_sql_expr(), k=3)).fetchdf()
        key = ["host", "anchor"]
        assert len(exp) > 0
        for frame in (got, got7):
            pd.testing.assert_frame_equal(
                frame.sort_values(key).reset_index(drop=True),
                exp.sort_values(key).reset_index(drop=True),
                check_dtype=False)
            assert frame["n"].dtype == np.int64


class TestRobotsFilter:
    def test_hand_rules(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.crawl import robots_filter

        pages = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "url": pa.array([
                "https://a.example/p/1x",    # banned: prefix /p/1
                "https://a.example/q/1",     # kept: other path
                "https://b.example/p/1",     # kept: other host
                "https://a.example",         # kept: no path
                "noscheme/p/1",              # kept: no host -> no rule
            ]),
        })
        got = robots_filter(rd.from_arrow(pages),
                            [("a.example", "/p/1")]).to_pandas()
        assert sorted(got["doc_id"]) == [2, 3, 4, 5]

    def test_twin(self, ray_session):
        import duckdb
        import numpy as np
        import ray.data as rd

        from vtzero_ray.functions.crawl import (robots_filter,
                                                robots_filter_sql,
                                                synth_robots_rules)

        sf = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])

        def synth_urls(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy()
            url = np.char.add(
                np.char.add(np.char.add("https://host",
                                        (d % 37).astype(str)),
                            ".example/p/"), d.astype(str))
            return pa.table({"url": pa.array(url, pa.string()),
                             "doc_id": batch.column("doc_id")})

        pages = docs.map_batches(synth_urls, batch_format="pyarrow",
                                 batch_size=None)
        rules = synth_robots_rules()
        got = robots_filter(pages, rules).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(robots_filter_sql(
            "(SELECT 'https://host' || (doc_id % 37) || '.example/p/' "
            "|| doc_id AS url, doc_id FROM documents)", rules)).fetchdf()
        assert 0 < len(got) < docs.count()  # the rules actually bite
        pd.testing.assert_frame_equal(
            got.sort_values("doc_id").reset_index(drop=True)[
                sorted(got.columns)],
            exp.sort_values("doc_id").reset_index(drop=True)[
                sorted(exp.columns)])
