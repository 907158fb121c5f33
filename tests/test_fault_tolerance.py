"""Failure handling: Ray task retries + deterministic, idempotent kernels
(SURVEY.md §4 stragglers/retries row — encode kernels must be safe to
re-execute)."""

import pytest

from vtzero_ray.state.testing import FlakyOnce


class TestRetries:
    def test_pipeline_survives_transient_task_failures(self, ray_session, sf_dir, tmp_path):
        import ray.data as rd

        flag_dir = str(tmp_path)
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        flaky = ds.map_batches(
            FlakyOnce(flag_dir), batch_format="pyarrow", batch_size=None,
            retry_exceptions=True, max_retries=3,
        )
        out = flaky.to_pandas()
        assert len(out) == 500  # every row survived exactly once

    def test_encode_deterministic_across_reexecution(self, ray_session, sf_dir):
        """Re-executing the whole pipeline (as a retry would) yields
        byte-identical tiles — the idempotence retries rely on."""
        from vtzero_ray.pipelines.tiling import tiles_pipeline

        a = tiles_pipeline(sf_dir, zooms=(6,), validate=False).to_pandas()
        b = tiles_pipeline(sf_dir, zooms=(6,), validate=False).to_pandas()
        a = a.sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = b.sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert (a.mvt == b.mvt).all()
