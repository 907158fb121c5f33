"""Range (band) join — orders_shipped_in_range.

Covers the distributed correctness hazards of the bucket-replication plan:
window endpoints (both inclusive), probes exactly on bucket boundaries,
candidates found only via the bucket-(b-1) replica, zero-match probes,
and full parity against a DuckDB LEFT-JOIN oracle on real testdata.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vtzero_ray.pipelines.relational import orders_shipped_in_range

W = 7 * 86400  # the pipeline's default window (seconds)


def _ts(seconds):
    return pd.to_datetime(np.asarray(seconds, np.int64) * 1_000_000, unit="us")


def _write_fixture(tmp_path, order_ts, ship_ts, qty):
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, len(order_ts) + 1, dtype=np.int64)),
        "o_orderdate": pa.array(_ts(order_ts)).cast(pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_shipdate": pa.array(_ts(ship_ts)).cast(pa.timestamp("us")),
        "l_quantity": pa.array(np.asarray(qty, np.float64)),
    }), str(tmp_path / "lineitem.parquet"))


def _run(tmp_path):
    df = orders_shipped_in_range(str(tmp_path)).to_pandas()
    return df.sort_values("o_orderkey").reset_index(drop=True)


class TestRangeJoinBoundaries:
    def test_inclusive_endpoints_and_bucket_edges(self, ray_session, tmp_path):
        # order 1 starts exactly on a bucket boundary (t0 = W): its window
        # [W, 2W] ends exactly on the NEXT boundary — shipment at 2W lives
        # in bucket 2 and is only visible through the b-1 replica.
        t0 = W
        ships = [t0 - 1,        # 1s before the window: excluded
                 t0,            # left endpoint: included
                 t0 + W,        # right endpoint (next bucket start): included
                 t0 + W + 1]    # 1s past: excluded
        _write_fixture(tmp_path, [t0], ships, [1.25, 2.50, 4.00, 8.00])
        out = _run(tmp_path)
        assert out["n_shipped"].tolist() == [2]
        assert out["qty_cents"].tolist() == [250 + 400]

    def test_zero_match_probe_emitted(self, ray_session, tmp_path):
        # order 2's window is empty -> LEFT-join row with n_shipped = 0;
        # order 3 sits mid-bucket and matches across the bucket boundary
        _write_fixture(
            tmp_path,
            order_ts=[0, 10 * W, 2 * W + 1000],
            ship_ts=[500, 3 * W - 1],  # in buckets 0 and 2
            qty=[1.00, 3.00],
        )
        out = _run(tmp_path)
        assert out["o_orderkey"].tolist() == [1, 2, 3]
        assert out["n_shipped"].tolist() == [1, 0, 1]
        assert out["qty_cents"].tolist() == [100, 0, 300]

    def test_no_double_count_on_replicas(self, ray_session, tmp_path):
        # a shipment is replicated into two buckets; a window spanning both
        # buckets must still count it exactly once (it has ONE home bucket)
        _write_fixture(tmp_path, [W // 2], [W // 2 + 100], [2.00])
        out = _run(tmp_path)
        assert out["n_shipped"].tolist() == [1]
        assert out["qty_cents"].tolist() == [200]


def test_range_join_matches_duckdb(ray_session, sf_dir):
    import duckdb

    got = orders_shipped_in_range(sf_dir).to_pandas()
    got = got.sort_values("o_orderkey").reset_index(drop=True)
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT o.o_orderkey,
               CAST(COUNT(s.ship_s) AS BIGINT) AS n_shipped,
               CAST(COALESCE(SUM(s.qty_c), 0) AS BIGINT) AS qty_cents
        FROM '{sf_dir}/orders.parquet' o LEFT JOIN (
            SELECT CAST(epoch(l_shipdate) AS BIGINT) AS ship_s,
                   CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
            FROM '{sf_dir}/lineitem.parquet') s
        ON s.ship_s BETWEEN CAST(epoch(o.o_orderdate) AS BIGINT)
                        AND CAST(epoch(o.o_orderdate) AS BIGINT) + {W}
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["n_shipped"] > 0).any()


class TestEventsFunnel:
    def _run(self, rows, blocks=3, steps=("view", "click", "purchase")):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.pipelines.relational import events_funnel
        import tempfile, os
        import pyarrow.parquet as pq

        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                pd.to_datetime([r[1] for r in rows], unit="s")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        })
        d = tempfile.mkdtemp(prefix="funnel_")
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = events_funnel(d, steps=steps).to_pandas()
        return dict(zip(out["event_type"], out["n_users"]))

    def test_order_and_strictness(self, ray_session):
        rows = [
            # user 1: full funnel in order
            (1, 100, 1, "view"), (2, 200, 1, "click"), (3, 300, 1, "purchase"),
            # user 2: click BEFORE view -> reaches view only
            (4, 100, 2, "click"), (5, 200, 2, "view"),
            # user 3: purchase without click -> view only
            (6, 100, 3, "view"), (7, 200, 3, "purchase"),
            # user 4: completes twice -> counted once
            (8, 100, 4, "view"), (9, 110, 4, "click"), (10, 120, 4, "purchase"),
            (11, 130, 4, "view"), (12, 140, 4, "click"), (13, 150, 4, "purchase"),
            # user 5: never views -> not counted anywhere
            (14, 100, 5, "click"), (15, 200, 5, "purchase"),
        ]
        got = self._run(rows)
        assert got == {"view": 4, "click": 2, "purchase": 2}

    def test_ts_tie_broken_by_event_id(self, ray_session):
        # same timestamp: event_id order decides — view(id=1) precedes
        # click(id=2), so the funnel completes
        rows = [(1, 100, 7, "view"), (2, 100, 7, "click"),
                (3, 100, 7, "purchase")]
        assert self._run(rows) == {"view": 1, "click": 1, "purchase": 1}
        # reversed ids: click sits before view -> stops at view
        rows = [(3, 100, 8, "view"), (2, 100, 8, "click"),
                (1, 100, 8, "purchase")]
        assert self._run(rows) == {"view": 1, "click": 0, "purchase": 0}

    def test_partition_invariance_vs_sql(self, ray_session):
        import duckdb
        import pandas as pd

        from vtzero_ray.pipelines.relational import (events_funnel,
                                                     events_funnel_sql)

        sf = "/root/testdata/sf0.001"
        got = events_funnel(sf).to_pandas().sort_values("step") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        exp = con.execute(events_funnel_sql()).df().sort_values("step") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
        assert (got["n_users"].to_numpy()[1:]
                <= got["n_users"].to_numpy()[:-1]).all()


class TestCrosstab:
    def test_partition_invariant_and_exact(self, ray_session):
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.pipelines.relational import (crosstab_counts,
                                                     crosstab_sql)

        import numpy as np
        rng = np.random.default_rng(11)
        t = pa.table({
            "lang": pa.array(np.array(["en", "de", "fr"])
                             [rng.integers(0, 3, 500)].tolist()),
            "source": pa.array(np.array(["a", "b", "c", "d"])
                               [rng.integers(0, 4, 500)].tolist()),
        })
        for blocks in (1, 9):
            got = crosstab_counts(rd.from_arrow(t).repartition(blocks),
                                  "lang", "source").to_pandas()
            con = duckdb.connect()
            con.register("tbl", t)
            exp = con.execute(
                crosstab_sql("tbl", "lang", "source",
                             ["a", "b", "c", "d"])).df() \
                .sort_values("lang").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp)
        assert (got["total"] == got[[c for c in got.columns
                                     if c.startswith("n_")]]
                .sum(axis=1)).all()

    def test_missing_combination_zero(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.pipelines.relational import crosstab_counts

        t = pa.table({"lang": pa.array(["en", "de"]),
                      "source": pa.array(["a", "b"])})
        got = crosstab_counts(rd.from_arrow(t), "lang", "source") \
            .to_pandas().set_index("lang")
        assert got.loc["en", "n_a"] == 1 and got.loc["en", "n_b"] == 0
        assert got.loc["de", "n_b"] == 1 and got.loc["de", "n_a"] == 0
