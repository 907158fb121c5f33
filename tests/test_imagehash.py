"""Perceptual dHash + banded near-dup pairs (functions/imagehash.py):
scalar-vs-SQL signature parity, banded-join exactness vs the all-pairs
oracle, pigeonhole guard, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest


class TestDHash:
    def test_signatures_match_twin(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.imagehash import (dhash_signatures,
                                                    dhash_signatures_sql,
                                                    synth_media_dhash)

        got = dhash_signatures(
            rd.from_arrow(synth_media_dhash(64)).repartition(5)) \
            .to_pandas().sort_values("media_id").reset_index(drop=True)
        exp = duckdb.sql(dhash_signatures_sql(64)).df() \
            .sort_values("media_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_pairs_exact_vs_allpairs(self, ray_session):
        """The banded join returns EXACTLY the all-pairs hamming<=thr
        set (pigeonhole: 3 diffs over 4 bands leave one band equal),
        under any partitioning."""
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.imagehash import (dhash_pairs,
                                                    dhash_pairs_sql,
                                                    synth_media_dhash)

        exp = duckdb.sql(dhash_pairs_sql(3, 128)).df() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert len(exp) >= 20      # the planted variants really pair up
        for parts in (1, 6):
            got = dhash_pairs(
                rd.from_arrow(synth_media_dhash(128)).repartition(parts),
                thr=3).to_pandas() \
                .sort_values(["id_a", "id_b"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_planted_variants_found(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.imagehash import (dhash_pairs,
                                                    synth_media_dhash)

        got = dhash_pairs(rd.from_arrow(synth_media_dhash(64)),
                          thr=3).to_pandas()
        planted = {(4 * k + 2, 4 * k + 3) for k in range(16)}
        found = set(zip(got.id_a, got.id_b))
        # brightness wrap flips only a handful of bits; most planted
        # neighbor pairs land under the threshold
        assert len(planted & found) >= len(planted) // 2

    def test_thr_guard(self):
        from vtzero_ray.functions.imagehash import dhash_pairs

        with pytest.raises(ValueError, match="pigeonhole"):
            dhash_pairs(None, thr=4)

    def test_dhash_bands_scalar(self):
        """Hand image: a horizontal gradient sets every comparison bit
        one way; a flat image sets none."""
        from vtzero_ray.functions.imagehash import dhash_bands

        flat = np.full((8, 9, 3), 100, np.uint8)
        assert dhash_bands(flat) == [0, 0, 0, 0]
        grad = np.tile(np.arange(9, 0, -1, dtype=np.uint8)[None, :, None]
                       * 20, (8, 1, 3))
        assert dhash_bands(grad) == [65535, 65535, 65535, 65535]


class TestAudioFingerprint:
    """Audio energy fingerprint through the REAL WAV decode, sharing
    banded_pairs with the image dHash."""

    def test_signatures_match_twin(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.imagehash import (audiofp_signatures,
                                                    audiofp_signatures_sql,
                                                    synth_media_audiofp)

        got = audiofp_signatures(
            rd.from_arrow(synth_media_audiofp(64)).repartition(5)) \
            .to_pandas().sort_values("media_id").reset_index(drop=True)
        exp = duckdb.sql(audiofp_signatures_sql(64)).df() \
            .sort_values("media_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_pairs_exact_and_selective(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from vtzero_ray.functions.imagehash import (audiofp_pairs,
                                                    audiofp_pairs_sql,
                                                    synth_media_audiofp)

        exp = duckdb.sql(audiofp_pairs_sql(3, 128)).df() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        # exactly the planted variants pair up: selective, not trivial
        planted = {(4 * k + 2, 4 * k + 3) for k in range(32)}
        assert set(zip(exp.id_a, exp.id_b)) == planted
        for parts in (1, 6):
            got = audiofp_pairs(
                rd.from_arrow(synth_media_audiofp(128))
                .repartition(parts), thr=3).to_pandas() \
                .sort_values(["id_a", "id_b"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_short_clip_raises(self):
        import numpy as np

        import pytest as _pytest

        from vtzero_ray.functions.imagehash import audiofp_bands

        with _pytest.raises(ValueError, match="too short"):
            audiofp_bands(np.zeros((100, 1), np.int16))
