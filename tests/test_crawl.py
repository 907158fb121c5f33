"""Snapshot diff (functions/crawl.py): the continuous-crawl delta —
hand semantics, DuckDB twin over the two-version synth corpus,
partition invariance."""

import pyarrow as pa


class TestSnapshotDiff:
    def test_hand_semantics(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.crawl import snapshot_diff

        old = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                        "text": pa.array(["a", "b", "c", "d"])})
        new = pa.table({"doc_id": pa.array([2, 3, 5], pa.int64()),
                        "text": pa.array(["b", "C!", "e"])})
        got = snapshot_diff(rd.from_arrow(old).repartition(2),
                            rd.from_arrow(new)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert dict(zip(got.doc_id, got.status)) == {
            1: 3, 2: 0, 3: 1, 4: 3, 5: 2}

    def test_twin_and_partition_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.crawl import (snapshot_diff,
                                                snapshot_diff_sql,
                                                synth_snapshot_sides)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(snapshot_diff_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        # all four statuses genuinely occur
        assert set(exp.status) == {0, 1, 2, 3}
        for parts in (1, 5):
            old, new = synth_snapshot_sides(
                lambda: rd.read_parquet(f"{sf}/documents.parquet",
                                        columns=["doc_id", "text"])
                .repartition(parts))
            got = snapshot_diff(old, new).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
