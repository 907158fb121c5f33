"""End-to-end flagship pipeline tests on sf0.001 (Ray session-scoped)."""

import numpy as np
import pytest

from vtzero_ray.mvt.decoder import VectorTile


@pytest.fixture(scope="module")
def tiles_df(ray_session, sf_dir):
    from vtzero_ray.pipelines.tiling import tiles_pipeline

    return tiles_pipeline(sf_dir, zooms=(2, 6)).to_pandas()


class TestTilingPipeline:
    def test_every_tile_validates(self, tiles_df):
        assert (tiles_df.check_code <= 1).all()  # warnings ok, errors not

    def test_feature_conservation(self, tiles_df, sf_dir):
        # every page lands in exactly one tile per zoom
        import pyarrow.parquet as pq

        n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        per_zoom = tiles_df.groupby("z").n_features.sum()
        assert (per_zoom == n_docs).all()

    def test_tiles_decode_and_roundtrip(self, tiles_df):
        row = tiles_df.sort_values("n_features", ascending=False).iloc[0]
        layer = VectorTile(row.mvt).get_layer(0)
        assert layer.name == b"pages"
        feats = list(layer.features())
        assert len(feats) == row.n_features
        # feature ids sorted (deterministic interning order)
        ids = [f.id for f in feats]
        assert ids == sorted(ids)
        # every feature decodes to a single in-extent point
        for f in feats:
            pts = f.decode_geometry()
            assert pts.shape == (1, 2)
            assert 0 <= pts[0, 0] < 4096 and 0 <= pts[0, 1] < 4096

    def test_hot_cell_skew_exists(self, tiles_df):
        # FIXTURES.md F1: >=30% of pages geoparse into one hot tile
        z6 = tiles_df[tiles_df.z == 6]
        assert z6.n_features.max() >= 0.3 * z6.n_features.sum()

    def test_deterministic_bytes(self, tiles_df, sf_dir):
        from vtzero_ray.pipelines.tiling import tiles_pipeline

        again = tiles_pipeline(sf_dir, zooms=(2, 6)).to_pandas()
        a = tiles_df.sort_values(["z", "x", "y"]).reset_index(drop=True)
        b = again.sort_values(["z", "x", "y"]).reset_index(drop=True)
        assert (a.mvt == b.mvt).all()


class TestTextInvariant:
    def test_text_byte_identical_per_url(self, ray_session, sf_dir):
        """input_hint per-row invariant: text survives the stages byte-identical."""
        from vtzero_ray.sources.pages import read_pages
        from vtzero_ray.stages.geoparse import geoparse

        raw = {r["url"]: r["text"] for r in read_pages(sf_dir, include_html=False).take_all()}
        processed = geoparse(read_pages(sf_dir, include_html=False)).take_all()
        assert len(processed) == len(raw)
        for r in processed:
            assert r["text"] == raw[r["url"]]
            # marker parses back to the text's own coordinates
            assert f"geo:{r['lat']:.6f},{r['lon']:.6f}" in r["text"]


class TestWriteResume:
    def test_write_tiles_and_resume(self, ray_session, sf_dir, tmp_path):
        from vtzero_ray.pipelines.tiling import tiles_pipeline
        from vtzero_ray.sources import mvt_io

        out = str(tmp_path / "tiles")
        tiles = tiles_pipeline(sf_dir, zooms=(2, 6), validate=False)
        s1 = mvt_io.write_tiles(tiles, out)
        assert s1["tiles"] > 0 and s1["skipped_partitions"] == []
        back = mvt_io.read_tiles(out).to_pandas()
        assert len(back) == s1["tiles"]
        # second run skips completed z partitions (resume anti-join)
        s2 = mvt_io.write_tiles(tiles_pipeline(sf_dir, zooms=(2, 6), validate=False), out)
        assert s2["tiles"] == 0
        assert sorted(s2["skipped_partitions"]) == [2, 6]


class TestPrepTrainingData:
    def test_matches_spliced_oracle_and_stages_bite(self, ray_session):
        """Composition == the four spliced stage oracles; every stage
        removes at least one doc at sf0.001; outputs are the packing
        invariants (offsets = exclusive prefix sum in doc_id order)."""
        import duckdb
        import numpy as np

        from vtzero_ray.pipelines.corpus import (prep_training_data,
                                                 prep_training_data_sql)

        sf = "/root/testdata/sf0.001"
        got = (prep_training_data(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want = (con.execute(prep_training_data_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)
        n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
        assert 0 < len(got) < n_docs
        off = got.t_offset.to_numpy(np.int64)
        n = got.n_tokens.to_numpy(np.int64)
        assert off[0] == 0
        assert (off[1:] == off[:-1] + n[:-1]).all()
        assert (got.seq_id.to_numpy() == off // 2048).all()
        assert (got.seq_pos.to_numpy() == off % 2048).all()

    def test_partition_invariance(self, ray_session):
        from vtzero_ray.pipelines.corpus import prep_training_data

        sf = "/root/testdata/sf0.001"
        a = (prep_training_data(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (prep_training_data(sf, range_width=16).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.drop(columns=[]).equals(b)


class TestHilbertStore:
    def test_sorted_store_disjoint_file_ranges(self, ray_session, tmp_path):
        import numpy as np

        from vtzero_ray.functions.geo import hilbert_d
        from vtzero_ray.pipelines.tiling import tiles_pipeline
        from vtzero_ray.sources.mvt_io import (file_hilbert_ranges,
                                               read_tiles,
                                               sort_tiles_hilbert,
                                               write_tiles)

        tiles = tiles_pipeline("/root/testdata/sf0.001", zooms=(6,),
                               validate=False)
        out = str(tmp_path / "hstore")
        write_tiles(sort_tiles_hilbert(tiles), out)
        ranges = file_hilbert_ranges(out)
        assert len(ranges) >= 2  # the sort range-partitions into blocks
        # disjoint AND ordered: pruning a range read is a binary search
        for (f1, lo1, hi1, _), (f2, lo2, hi2, _) in zip(ranges,
                                                        ranges[1:]):
            assert hi1 < lo2, (f1, f2)
        # keys really are the (z << 52) | hilbert_d of the tile coords
        back = read_tiles(out).to_pandas()
        z = back["z"].to_numpy(np.int64)
        d = hilbert_d(back["x"].to_numpy(np.int64),
                      back["y"].to_numpy(np.int64), 6)
        assert (back["hkey"].to_numpy() == ((z << 52) | d)).all()
        # content identical to the unsorted pipeline
        plain = tiles_pipeline("/root/testdata/sf0.001", zooms=(6,),
                               validate=False).to_pandas()
        a = {(r.x, r.y): r.mvt for r in plain.itertuples()}
        b = {(r.x, r.y): r.mvt for r in back.itertuples()}
        assert a == b
