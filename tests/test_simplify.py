"""Douglas-Peucker simplification (functions/simplify.py): hand-checked
semantics, scalar-recursive vs iterative-vectorized identity, exact
big-int fallback, DuckDB recursive-CTE twin, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from vtzero_ray.functions.simplify import (dp_keep_mask,
                                           dp_keep_mask_scalar,
                                           dp_oracle_sql, simplify_paths)


def _both(wx, wy, tol2):
    a = dp_keep_mask(np.asarray(wx), np.asarray(wy), tol2)
    b = dp_keep_mask_scalar(wx, wy, tol2)
    assert (a == b).all(), (wx, wy, tol2, a, b)
    return a


class TestMask:
    def test_hand_spike(self):
        # (0,0)..(20,0) with an 8-px spike at index 3, tol 5: the spike
        # survives, the flat interior points go
        m = _both([0, 5, 10, 15, 20], [0, 0, 0, 8, 0], 25)
        assert m.tolist() == [True, False, False, True, True]

    def test_hand_keep_all(self):
        m = _both([0, 10, 20, 30, 40], [0, 1, 30, 1, 0], 25)
        assert m.tolist() == [True, True, True, True, True]

    def test_collinear_dropped_at_tol0(self):
        m = _both([0, 1, 2, 3], [0, 1, 2, 3], 0)
        assert m.tolist() == [True, False, False, True]

    def test_endpoints_always_kept(self):
        m = _both([5, 5], [7, 7], 0)  # coincident endpoints, len 2
        assert m.tolist() == [True, True]
        m = _both([5], [7], 0)
        assert m.tolist() == [True]
        assert dp_keep_mask(np.array([], np.int64),
                            np.array([], np.int64), 0).shape == (0,)

    def test_degenerate_closed_path(self):
        # first == last: the root span is degenerate -> point-distance
        # metric; the far point (0,10) exceeds tol 5, near one doesn't
        m = _both([0, 3, 0, 0], [0, 0, 10, 0], 25)
        assert m[0] and m[2] and m[3]
        # after the split at (0,10): span (0..2) line (0,0)-(0,10),
        # point (3,0) is 3 px off -> dropped at tol 5
        assert not m[1]

    def test_tie_breaks_smallest_index(self):
        # two interior points at the same distance: both engines must
        # keep the SAME one (smallest index first)
        wx = [0, 10, 20, 30]
        wy = [0, 7, 7, 0]
        m = _both(wx, wy, 25)
        assert m.tolist() == [True, True, False, True]

    def test_random_paths_identity(self):
        rng = np.random.default_rng(7)
        for trial in range(40):
            n = int(rng.integers(2, 40))
            wx = rng.integers(0, 1 << 14, n)
            wy = rng.integers(0, 1 << 14, n)
            if trial % 3 == 0:  # inject duplicate runs
                wx[n // 2:] = wx[n // 2]
            if trial % 5 == 0:  # closed path
                wx[-1], wy[-1] = wx[0], wy[0]
            for tol2 in (0, 100, 65536, 1 << 24):
                _both(wx.tolist(), wy.tolist(), tol2)

    def test_bigint_fallback_exact(self):
        # coords around 2^40: the vectorized path would overflow int64
        # squaring; the span guard must route to exact Python ints
        base = 1 << 40
        wx = [base, base + (1 << 35), base + (1 << 36), base + (1 << 37)]
        wy = [base, base + (1 << 34), base, base]
        m = _both(wx, wy, (1 << 30) ** 2)
        assert m[0] and m[-1]
        rng = np.random.default_rng(11)
        for _ in range(10):
            n = int(rng.integers(3, 12))
            wx = (rng.integers(0, 1 << 35, n) + (1 << 41)).tolist()
            wy = (rng.integers(0, 1 << 35, n) + (1 << 41)).tolist()
            _both(wx, wy, int(rng.integers(1, 1 << 40)))

    def test_idempotent(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            n = int(rng.integers(3, 30))
            wx = rng.integers(0, 1 << 14, n)
            wy = rng.integers(0, 1 << 14, n)
            tol2 = int(rng.integers(1, 1 << 16))
            m1 = dp_keep_mask(wx, wy, tol2)
            m2 = dp_keep_mask(wx[m1], wy[m1], tol2)
            assert m2.all(), "simplify must be a fixpoint of itself"


def _synth_points(n_sites=6, n_pts=25, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_sites):
        for i in range(n_pts):
            rows.append((s, s * 1000 + i,
                         int(rng.integers(0, 16384)),
                         int(rng.integers(0, 16384))))
    # duplicate consecutive points on site 0 to exercise the dedup
    rows[1] = (0, 1, rows[0][2], rows[0][3])
    return pd.DataFrame(rows, columns=["site", "doc_id", "wx", "wy"])


class TestSimplifyPipeline:
    def test_matches_recursive_cte(self, ray_session):
        import ray.data as rd

        pts = _synth_points()
        tol2 = 512 * 512
        got = simplify_paths(rd.from_pandas(pts), tol2=tol2).to_pandas()
        got = got.sort_values(["site", "pt_idx"]).reset_index(drop=True)

        con = duckdb.connect()
        con.register("rawpts", pts)
        e_ctes = ("d AS (SELECT *, CASE WHEN lag(wx) OVER w = wx AND "
                  "lag(wy) OVER w = wy THEN 0 ELSE 1 END AS keep FROM rawpts "
                  "WINDOW w AS (PARTITION BY site ORDER BY doc_id)), "
                  "e AS (SELECT site, doc_id, wx, wy, row_number() OVER "
                  "(PARTITION BY site ORDER BY doc_id) - 1 AS pt_idx "
                  "FROM d WHERE keep = 1)")
        exp = con.execute(dp_oracle_sql(e_ctes, tol2)).fetchdf()
        exp = exp.sort_values(["site", "pt_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      exp.astype("int64"))
        assert len(got) < len(pts)  # the tolerance actually bites

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        pts = _synth_points(seed=9)
        tol2 = 1024 * 1024
        a = simplify_paths(rd.from_pandas(pts), tol2=tol2).to_pandas()
        b = simplify_paths(
            rd.from_pandas(pts).repartition(7), tol2=tol2).to_pandas()
        key = ["site", "pt_idx"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))
