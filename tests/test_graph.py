"""PageRank (functions/graph.py): hand-checked two-node chain, DuckDB
twin equality, mass conservation, hub ordering, partition invariance."""

import math

import numpy as np
import pytest
import pyarrow as pa


class TestPageRank:
    def test_hand_checked_star(self, ray_session):
        """4 nodes, everyone links only to node 0: after one iteration
        node 0 holds base + 3 quantized full contributions and the
        others hold base only."""
        import ray.data as rd

        from vtzero_ray.functions.graph import pagerank

        nodes = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64())})
        edges = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                          "dst": pa.array([1, 0, 0, 0], pa.int64()),
                          "deg": pa.array([1, 1, 1, 1], pa.int64())})
        out = pagerank(rd.from_arrow(nodes).repartition(2),
                       rd.from_arrow(edges).repartition(2), n_iters=1) \
            .to_pandas().set_index("v")
        r0 = int(math.floor(1e9 / 4 + 0.5))
        base = int(math.floor(0.15 * 1e9 / 4 + 0.5))
        t = int(math.floor(0.85 * r0 / 1 + 0.5))
        assert out.loc[0, "rank_q9"] == base + 3 * t
        assert out.loc[1, "rank_q9"] == base + t
        assert out.loc[2, "rank_q9"] == base
        assert out.loc[3, "rank_q9"] == base
        assert len(out) == 4

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.graph import pagerank_mod, pagerank_sql

        sf = "/root/testdata/sf0.001"
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
        ds = rd.read_parquet(f"{sf}/documents.parquet",
                             columns=["doc_id"]).repartition(6)
        got = (pagerank_mod(ds, n).to_pandas()
               .sort_values("v").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want = (con.execute(pagerank_sql()).df()
                .sort_values("v").reset_index(drop=True))
        assert got.equals(want)
        # mass conservation (graph has no dangling nodes: every src has
        # out-edges), up to rounding: total stays ~1e9
        assert abs(got.rank_q9.sum() - 1_000_000_000) < n * 2
        # real skew: hubs above base, sinks at base
        assert got.rank_q9.max() > 2 * got.rank_q9.min()

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import pagerank_mod

        sf = "/root/testdata/sf0.001"
        outs = []
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            outs.append(pagerank_mod(ds, 500).to_pandas()
                        .sort_values("v").reset_index(drop=True))
        assert outs[0].equals(outs[1])

    def test_more_iterations_converge(self, ray_session):
        """Iterating further moves ranks less (power-iteration
        contraction) — 0 iterations returns the uniform init."""
        import ray.data as rd

        from vtzero_ray.functions.graph import pagerank_mod

        sf = "/root/testdata/sf0.001"

        def run(k):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(4)
            return pagerank_mod(ds, 500, n_iters=k).to_pandas() \
                .sort_values("v").reset_index(drop=True).rank_q9 \
                .to_numpy(np.int64)

        r0, r1, r2, r3 = run(0), run(1), run(2), run(3)
        assert (r0 == r0[0]).all()
        d01 = np.abs(r1 - r0).sum()
        d12 = np.abs(r2 - r1).sum()
        d23 = np.abs(r3 - r2).sum()
        assert d01 > d12 > d23 > 0


class TestHostPageRank:
    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.crawl import linked_html_sql_expr
        from vtzero_ray.functions.graph import (host_pagerank,
                                                host_pagerank_sql)

        sf = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        got = host_pagerank(docs).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(host_pagerank_sql(linked_html_sql_expr())) \
            .df().sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert got["rank_q9"].dtype == np.int64
        # hubs exist: some host outranks the linkless-sink floor
        assert got["rank_q9"].max() > 2 * got["rank_q9"].min()

    def test_host_edges_distinct_and_degrees(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import host_edges

        edges = pa.table({
            "doc_id": pa.array([1, 1, 1, 2001, 5], pa.int64()),
            "dst": pa.array([
                "https://site7.example/p/a",
                "https://site7.example/p/b",   # same (src=1, dst=7) pair
                "https://site9.example/x",
                "https://site7.example/y",     # 2001 % 1000 = src 1 too
                "nohost-here",                 # no match -> dropped
            ]),
        })
        got = host_edges(rd.from_arrow(edges)).to_pandas() \
            .sort_values(["src", "dst"]).reset_index(drop=True)
        assert list(map(tuple, got.itertuples(index=False))) == [
            (1, 7, 2), (1, 9, 2)]

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import host_pagerank

        sf = "/root/testdata/sf0.001"
        outs = []
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            outs.append(host_pagerank(ds).to_pandas()
                        .sort_values("v").reset_index(drop=True))
        assert outs[0].equals(outs[1])


class TestHostWalks:
    def test_hand_walk_semantics(self, ray_session):
        """Two-node hand graph: every hop is forced, so the walk path
        is fully determined without hashing assumptions; a sink node
        truncates its walk."""
        import ray.data as rd

        from vtzero_ray.functions.graph import random_walks

        nodes = rd.from_arrow(pa.table({"doc_id":
                                        pa.array([0, 1, 2], pa.int64())}))
        edges = rd.from_arrow(pa.table({
            "src": pa.array([0, 1], pa.int64()),
            "dst": pa.array([1, 2], pa.int64()),
        }))
        got = random_walks(nodes, edges, n_steps=3).to_pandas() \
            .sort_values(["walk", "step"]).reset_index(drop=True)
        assert list(map(tuple, got.itertuples(index=False))) == [
            (0, 0, 0), (0, 1, 1), (0, 2, 2),      # 0 -> 1 -> 2 (sink)
            (1, 0, 1), (1, 1, 2),                  # 1 -> 2 (sink)
            (2, 0, 2)]                             # 2 is a sink

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.crawl import linked_html_sql_expr
        from vtzero_ray.functions.graph import host_walks, host_walks_sql

        sf = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        got = host_walks(docs).to_pandas() \
            .sort_values(["walk", "step"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(host_walks_sql(linked_html_sql_expr())).df() \
            .sort_values(["walk", "step"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # the hash choice is real: walks branch (not all length 1)
        assert (got.groupby("walk").size() > 1).any()

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import host_walks

        sf = "/root/testdata/sf0.001"
        outs = []
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            outs.append(host_walks(ds).to_pandas()
                        .sort_values(["walk", "step"])
                        .reset_index(drop=True))
        assert outs[0].equals(outs[1])


class TestCocitation:
    def test_hand_semantics(self, ray_session):
        """src 1 links {7, 9, 11} -> 3 pairs; src 2 links {7, 9} ->
        (7,9) counted twice; duplicate edges collapse first; a
        single-target source contributes nothing."""
        import ray.data as rd

        from vtzero_ray.functions.graph import cocitation

        edges = pa.table({
            "src": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "dst": pa.array([7, 9, 11, 7, 9, 7, 5], pa.int64()),
        })
        got = cocitation(rd.from_arrow(edges)).to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        assert list(map(tuple, got.itertuples(index=False))) == [
            (7, 9, 2), (7, 11, 1), (9, 11, 1)]

    def test_star_guard_raises(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import cocitation

        edges = pa.table({
            "src": pa.array([1, 1, 1], pa.int64()),
            "dst": pa.array([5, 6, 7], pa.int64()),
        })
        with pytest.raises(Exception, match="fan-out"):
            cocitation(rd.from_arrow(edges),
                       max_fanout=2).to_pandas()

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.crawl import linked_html_sql_expr
        from vtzero_ray.functions.graph import (host_cocitation,
                                                host_cocitation_sql)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(host_cocitation_sql(linked_html_sql_expr())) \
            .df().sort_values(["u", "v"]).reset_index(drop=True)
        assert exp["n_shared"].max() >= 2   # the count genuinely counts
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            got = host_cocitation(ds).to_pandas() \
                .sort_values(["u", "v"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestWeightedPageRank:
    def test_twin_and_weight_effect(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.graph import (pagerank_mod,
                                                pagerank_weighted_mod,
                                                pagerank_weighted_sql)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(pagerank_weighted_sql()).df() \
            .sort_values("v").reset_index(drop=True)
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            got = pagerank_weighted_mod(ds, 500).to_pandas() \
                .sort_values("v").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # weights actually change the ranking
        ds = rd.read_parquet(f"{sf}/documents.parquet",
                             columns=["doc_id"]).repartition(4)
        unw = pagerank_mod(ds, 500).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert not got["rank_q9"].equals(unw["rank_q9"])

    def test_uniform_weights_equal_unweighted(self, ray_session):
        """w = const collapses to the unweighted split exactly (the
        IEEE no-op argument: (d*rq*w)/ (w*deg) with w=2 is NOT a no-op,
        so use w=1 explicitly)."""
        import pyarrow as pa_
        import ray.data as rd

        from vtzero_ray.functions.graph import (pagerank, synth_edges)

        sf = "/root/testdata/sf0.001"
        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"]).repartition(4)
        base = synth_edges(docs, 500)

        def with_unit_w(t):
            import numpy as np_
            return pa_.table({"src": t.column("src"),
                              "dst": t.column("dst"),
                              "w": pa_.array(np_.ones(len(t), np_.int64)),
                              "wsum": t.column("deg")})

        ew = base.map_batches(with_unit_w, batch_format="pyarrow",
                              batch_size=None)
        docs2 = rd.read_parquet(f"{sf}/documents.parquet",
                                columns=["doc_id"]).repartition(4)
        a = pagerank(docs2, ew).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        docs3 = rd.read_parquet(f"{sf}/documents.parquet",
                                columns=["doc_id"]).repartition(4)
        b = pagerank(docs3, synth_edges(docs3, 500)).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert a.equals(b)


class TestHITS:
    def test_hand_star(self, ray_session):
        """Star 1->0, 2->0, 3->0: node 0 is the only authority
        (auth_q9 = 1e9); 1,2,3 split hub mass equally."""
        import ray.data as rd

        from vtzero_ray.functions.graph import hits

        nodes = rd.from_arrow(pa.table({"doc_id":
                                        pa.array(range(4), pa.int64())}))
        edges = rd.from_arrow(pa.table({
            "src": pa.array([1, 2, 3], pa.int64()),
            "dst": pa.array([0, 0, 0], pa.int64()),
        }))
        got = hits(nodes, edges, n_iters=2).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert got.auth_q9.tolist() == [1_000_000_000, 0, 0, 0]
        assert got.hub_q9.tolist()[0] == 0
        assert got.hub_q9.tolist()[1:] == [333333333] * 3

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.crawl import linked_html_sql_expr
        from vtzero_ray.functions.graph import host_hits, host_hits_sql

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(host_hits_sql(linked_html_sql_expr())).df() \
            .sort_values("v").reset_index(drop=True)
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            got = host_hits(ds).to_pandas() \
                .sort_values("v").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # both channels carry real signal
        assert exp.auth_q9.max() > 0 and exp.hub_q9.max() > 0


class TestTriangles:
    def test_hand_graph(self, ray_session):
        """K4 minus one edge: edges {01,02,03,12,13} — triangles {012}
        and {013}; edge (0,1) supports both, (2,3) absent, (1,2)/(1,3)
        support one each; duplicate/reversed/self-loop inputs collapse."""
        import ray.data as rd

        from vtzero_ray.functions.graph import triangle_support

        edges = pa.table({
            "src": pa.array([0, 2, 0, 3, 1, 2, 1, 3, 5, 0], pa.int64()),
            "dst": pa.array([1, 0, 2, 0, 2, 1, 3, 1, 5, 1], pa.int64()),
        })
        got = triangle_support(rd.from_arrow(edges)).to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        assert list(map(tuple, got.itertuples(index=False))) == [
            (0, 1, 2), (0, 2, 1), (0, 3, 1), (1, 2, 1), (1, 3, 1)]

    def test_star_guard(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import triangle_support

        edges = pa.table({
            "src": pa.array([0, 0, 0], pa.int64()),
            "dst": pa.array([1, 2, 3], pa.int64()),
        })
        with pytest.raises(Exception, match="degree"):
            triangle_support(rd.from_arrow(edges),
                             max_degree=2).to_pandas()

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.graph import triangles_mod, triangles_sql

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(triangles_sql()).df() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        assert exp.n_tri.sum() % 3 == 0 and exp.n_tri.sum() > 0
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            got = triangles_mod(ds, 500).to_pandas() \
                .sort_values(["u", "v"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestAdamicAdar:
    def test_hand_graph(self, ray_session):
        """Path 0-1-2 plus 1-3: wedges at center 1 (deg 3) give the
        three non-edges (0,2),(0,3),(2,3) identical q=floor(1e9/ln 3);
        centers 0/2/3 have deg 1 and contribute nothing."""
        import numpy as np
        import ray.data as rd

        from vtzero_ray.functions.graph import adamic_adar

        edges = pa.table({
            "src": pa.array([0, 1, 1, 1], pa.int64()),
            "dst": pa.array([1, 2, 3, 0], pa.int64()),  # dup 0-1 reversed
        })
        got = adamic_adar(rd.from_arrow(edges), k=10).to_pandas() \
            .sort_values(["y", "z"]).reset_index(drop=True)
        q = int(np.floor(1e9 / np.log(3.0)))
        assert list(map(tuple, got.itertuples(index=False))) == [
            (0, 2, q), (0, 3, q), (2, 3, q)]

    def test_edges_excluded_and_summed(self, ray_session):
        """Square 0-1-2-3-0: each diagonal has TWO common neighbors of
        degree 2 → aa_q = 2*floor(1e9/ln 2); the four edges themselves
        never appear even though they are also wedge pairs."""
        import numpy as np
        import ray.data as rd

        from vtzero_ray.functions.graph import adamic_adar

        edges = pa.table({
            "src": pa.array([0, 1, 2, 3], pa.int64()),
            "dst": pa.array([1, 2, 3, 0], pa.int64()),
        })
        got = adamic_adar(rd.from_arrow(edges), k=10).to_pandas() \
            .sort_values(["y", "z"]).reset_index(drop=True)
        q2 = 2 * int(np.floor(1e9 / np.log(2.0)))
        assert list(map(tuple, got.itertuples(index=False))) == [
            (0, 2, q2), (1, 3, q2)]

    def test_star_guard(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import adamic_adar

        edges = pa.table({
            "src": pa.array([0, 0, 0], pa.int64()),
            "dst": pa.array([1, 2, 3], pa.int64()),
        })
        with pytest.raises(Exception, match="degree"):
            adamic_adar(rd.from_arrow(edges), max_degree=2).to_pandas()

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.graph import adamic_adar_mod, \
            adamic_adar_sql

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(adamic_adar_sql()).df().reset_index(drop=True)
        assert len(exp) == 20 and exp.aa_q.is_monotonic_decreasing
        for parts in (1, 7):
            ds = rd.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id"]).repartition(parts)
            got = adamic_adar_mod(ds, 500).to_pandas() \
                .reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestLabelProp:
    """Deterministic label propagation: hand graph vs a plain-Python
    reference, DuckDB-twin equality over the really-extracted host
    graph, partition invariance."""

    def _reference(self, n_nodes, edges, n_iters):
        """Synchronous LPA, ties (count DESC, label ASC), undirected
        closure, isolated nodes keep their own label."""
        und = set()
        for s, d in edges:
            if s != d:
                und.add((min(s, d), max(s, d)))
        adj = {v: [] for v in range(n_nodes)}
        for lo, hi in und:
            adj[lo].append(hi)
            adj[hi].append(lo)
        lbl = {v: v for v in range(n_nodes)}
        for _ in range(n_iters):
            new = {}
            for v in range(n_nodes):
                if not adj[v]:
                    new[v] = lbl[v]
                    continue
                cnt = {}
                for u in adj[v]:
                    cnt[lbl[u]] = cnt.get(lbl[u], 0) + 1
                new[v] = min(cnt, key=lambda k: (-cnt[k], k))
            lbl = new
        return lbl

    def test_hand_graph(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import label_prop

        # two triangles bridged by one edge + an isolated node, with a
        # duplicate reversed edge that must NOT vote twice
        edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3),
                 (2, 3), (1, 0)]
        n = 7
        edf = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                        "dst": pa.array([e[1] for e in edges], pa.int64())})
        nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(n),
                                                           pa.int64())}))
        for iters in (1, 3):
            got = label_prop(nodes, rd.from_arrow(edf).repartition(3),
                             n_iters=iters).to_pandas() \
                .sort_values("v").reset_index(drop=True)
            want = self._reference(n, edges, iters)
            assert dict(zip(got.v, got.community)) == want, iters
        # the isolated node stayed a singleton
        assert want[6] == 6
        # the triangles really collapsed onto shared labels
        assert len({want[0], want[1], want[2]}) == 1

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.crawl import linked_html_sql_expr
        from vtzero_ray.functions.graph import (host_communities,
                                                host_communities_sql)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(host_communities_sql(linked_html_sql_expr())) \
            .df().sort_values("v").reset_index(drop=True)
        # communities genuinely formed (not everyone kept their own id)
        assert (exp.v != exp.community).sum() > 0
        for parts in (2, 9):
            docs = rd.read_parquet(f"{sf}/documents.parquet",
                                   columns=["doc_id"]).repartition(parts)
            got = host_communities(docs).to_pandas() \
                .sort_values("v").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestKCore:
    """Bulk-synchronous k-core peel: hand graph, twin equality,
    convergence at test scale, partition invariance."""

    def test_hand_graph(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.graph import kcore_peel

        # K4 on {0,1,2,3} + a tail 3-4-5: peeling at k=2 kills 5 then
        # 4; at k=3 only the K4 survives
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
                 (3, 4), (4, 5)]
        edf = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                        "dst": pa.array([e[1] for e in edges], pa.int64())})
        nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(6),
                                                           pa.int64())}))
        import ray.data as rd2
        got2 = kcore_peel(nodes, rd2.from_arrow(edf).repartition(3),
                          k=2, rounds=3).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert got2.v.tolist() == [0, 1, 2, 3]
        assert got2.deg.tolist() == [3, 3, 3, 3]
        got3 = kcore_peel(nodes, rd2.from_arrow(edf), k=3,
                          rounds=2).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert got3.v.tolist() == [0, 1, 2, 3]

    def test_twin_convergence_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.graph import kcore_mod, kcore_sql

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(kcore_sql(k=4, rounds=3)).df() \
            .sort_values("v").reset_index(drop=True)
        # the peel genuinely removed nodes AND converged at this scale
        n_docs = con.execute("SELECT COUNT(*) FROM documents") \
            .fetchone()[0]
        assert 0 < len(exp) < n_docs
        exp4 = con.execute(kcore_sql(k=4, rounds=4)).df() \
            .sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(exp, exp4)
        for parts in (1, 6):
            docs = rd.read_parquet(f"{sf}/documents.parquet",
                                   columns=["doc_id"]).repartition(parts)
            got = kcore_mod(docs, n_docs, k=4, rounds=3).to_pandas() \
                .sort_values("v").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # k-core property on the converged output: every member keeps
        # >= k neighbors inside the core
        assert (got.deg >= 4).all()


class TestDenseIdentity:
    """The dense bounded-universe paths must be BIT-IDENTICAL to the
    bucketed twins — they share the per-edge term and normalization
    expressions; only the orchestration differs."""

    def _docs(self, blocks=5):
        import ray.data as rd
        return rd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id"]).repartition(blocks)

    def test_pagerank_dense_equals_bucketed(self, ray_session):
        from vtzero_ray.functions.graph import (pagerank, pagerank_dense,
                                                synth_edges)
        ds = self._docs()
        n = ds.count()
        edges = synth_edges(ds, n)
        a = (pagerank(ds, edges, n_iters=3).to_pandas()
             .sort_values("v").reset_index(drop=True))
        b = (pagerank_dense(synth_edges(self._docs(3), n), n, n_iters=3)
             .to_pandas().sort_values("v").reset_index(drop=True))
        assert a.equals(b)

    def test_pagerank_dense_weighted_equals_bucketed(self, ray_session):
        from vtzero_ray.functions.graph import (pagerank, pagerank_dense,
                                                synth_weighted_edges)
        ds = self._docs()
        n = ds.count()
        a = (pagerank(ds, synth_weighted_edges(ds, n), n_iters=2)
             .to_pandas().sort_values("v").reset_index(drop=True))
        b = (pagerank_dense(synth_weighted_edges(self._docs(2), n), n,
                            n_iters=2)
             .to_pandas().sort_values("v").reset_index(drop=True))
        assert a.equals(b)

    def test_hits_dense_equals_bucketed(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from vtzero_ray.functions.graph import hits, hits_dense, synth_edges
        ds = self._docs()
        n = ds.count()
        nodes = rd.range(n, override_num_blocks=3).map_batches(
            lambda t: pa.table({"doc_id": t.column("id").cast(pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        a = (hits(nodes, synth_edges(ds, n), n_iters=2).to_pandas()
             .sort_values("v").reset_index(drop=True))
        b = (hits_dense(synth_edges(self._docs(4), n), n, n_iters=2)
             .to_pandas().sort_values("v").reset_index(drop=True))
        assert a.equals(b)

    def test_label_prop_dense_equals_bucketed(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from vtzero_ray.functions.graph import (label_prop,
                                                label_prop_dense,
                                                synth_edges)
        ds = self._docs()
        n = ds.count()
        nodes = rd.range(n, override_num_blocks=3).map_batches(
            lambda t: pa.table({"doc_id": t.column("id").cast(pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        a = (label_prop(nodes, synth_edges(ds, n), n_iters=3).to_pandas()
             .sort_values("v").reset_index(drop=True))
        b = (label_prop_dense(synth_edges(self._docs(4), n), n, n_iters=3)
             .to_pandas().sort_values("v").reset_index(drop=True))
        assert a.equals(b)

    def test_kcore_dense_equals_bucketed(self, ray_session):
        from vtzero_ray.functions.graph import (kcore_dense, kcore_peel,
                                                synth_edges)
        ds = self._docs()
        n = ds.count()
        a = (kcore_peel(ds, synth_edges(ds, n), k=4, rounds=3).to_pandas()
             .sort_values("v").reset_index(drop=True))
        b = (kcore_dense(synth_edges(self._docs(4), n), n, k=4, rounds=3)
             .to_pandas().sort_values("v").reset_index(drop=True))
        assert a.equals(b)

    def test_personalized_teleport(self, ray_session):
        import numpy as np

        from vtzero_ray.functions.graph import pagerank_dense, synth_edges

        ds = self._docs()
        n = ds.count()
        seeds = np.arange(0, n, 7)
        r = (pagerank_dense(synth_edges(ds, n), n, n_iters=3,
                            seeds=seeds).to_pandas()
             .sort_values("v").reset_index(drop=True))
        # total mass ~1e9 (restart mass conserved up to sink leakage)
        assert 0 < r["rank_q9"].sum() <= 1_100_000_000
        # seed-cohort mass dominates the uniform share
        seed_mass = r.loc[r["v"].isin(seeds), "rank_q9"].sum()
        assert seed_mass > r["rank_q9"].sum() * len(seeds) / n
        # non-seed nodes with no inbound path from seeds hold zero
        import ray.data as rd
        import pyarrow as pa

        e2 = rd.from_arrow(pa.table({
            "src": pa.array([0, 1], pa.int64()),
            "dst": pa.array([1, 2], pa.int64()),
            "deg": pa.array([1, 1], pa.int64())}))
        r2 = pagerank_dense(e2, 4, n_iters=3, seeds=[0]).to_pandas() \
            .set_index("v")["rank_q9"]
        assert r2[3] == 0 and r2[0] > 0 and r2[1] > 0

        with pytest.raises(ValueError, match="seeds"):
            pagerank_dense(e2, 4, n_iters=1, seeds=[])

    def test_walks_dense_equals_bucketed(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from vtzero_ray.functions.graph import (random_walks,
                                                random_walks_dense,
                                                synth_edges)
        ds = self._docs()
        n = ds.count()
        nodes = rd.range(n, override_num_blocks=3).map_batches(
            lambda t: pa.table({"doc_id": t.column("id").cast(pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        a = (random_walks(nodes, synth_edges(ds, n), n_steps=3)
             .to_pandas().sort_values(["walk", "step"])
             .reset_index(drop=True))
        b = (random_walks_dense(synth_edges(self._docs(4), n), n,
                                n_steps=3)
             .to_pandas().sort_values(["walk", "step"])
             .reset_index(drop=True))
        assert a.equals(b)

    def test_label_prop_dense_guard(self, ray_session):
        import ray.data as rd
        from vtzero_ray.functions.graph import label_prop_dense

        edges = rd.from_arrow(pa.table({
            "src": pa.array([0], pa.int64()),
            "dst": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError, match="too large"):
            label_prop_dense(edges, 1 << 16, n_iters=1)

    def test_dense_rejects_out_of_range_ids(self, ray_session):
        import ray.data as rd
        from vtzero_ray.functions.graph import pagerank_dense

        edges = rd.from_arrow(pa.table({
            "src": pa.array([0, 5], pa.int64()),
            "dst": pa.array([1, 0], pa.int64()),
            "deg": pa.array([1, 1], pa.int64())}))
        with pytest.raises(Exception, match="outside"):
            pagerank_dense(edges, 3, n_iters=1).to_pandas()
