"""Profiling + constraint validation (functions/profile.py): the merge
must be partition-invariant (int extrema merge in the INT domain — the
lexicographic "99" > "553" trap), nulls/empty blocks handled, rules
vectorized and exact vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vtzero_ray.functions.profile import (check_constraints,
                                          check_constraints_sql,
                                          profile_sql, profile_table)


def make_table(seed=0, n=400, with_nulls=True):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(7, 1234, n)      # crosses a digit-count boundary
    langs = np.array(["en", "de", "fr", "zz"])[rng.integers(0, 4, n)]
    lang_arr = langs.astype(object)
    if with_nulls:
        lang_arr[rng.integers(0, n, 25)] = None
    return pa.table({
        "doc_id": pa.array(ids),
        "v": pa.array(vals, pa.int64()),
        "lang": pa.array(lang_arr.tolist(), pa.string()),
    })


def duck(t: pa.Table):
    con = duckdb.connect()
    con.register("tbl", t)
    return con


class TestProfile:
    @pytest.mark.parametrize("blocks", [1, 7])
    def test_matches_duckdb_any_partitioning(self, ray_session, blocks):
        import ray.data as rd

        t = make_table()
        ds = rd.from_arrow(t).repartition(blocks)
        got = profile_table(ds, ["doc_id", "v", "lang"]).to_pandas() \
            .sort_values("column").reset_index(drop=True)
        exp = duck(t).execute(profile_sql("tbl", ["doc_id", "v", "lang"])) \
            .df().sort_values("column").reset_index(drop=True)
        # DuckDB NULL-safe COALESCE('' ) already matches the Ray side
        pd.testing.assert_frame_equal(got, exp)

    def test_int_extrema_cross_block(self, ray_session):
        # the lexicographic trap: one block's max is 99, another's 553 —
        # a string-domain merge would answer "99"
        import ray.data as rd

        a = pa.table({"v": pa.array([1, 99], pa.int64())})
        b = pa.table({"v": pa.array([40, 553], pa.int64())})
        ds = rd.from_arrow([a, b])
        got = profile_table(ds, ["v"]).to_pandas()
        assert got.loc[0, "min_s"] == "1"
        assert got.loc[0, "max_s"] == "553"
        assert got.loc[0, "n_distinct"] == 4

    def test_all_null_column(self, ray_session):
        import ray.data as rd

        t = pa.table({"s": pa.array([None, None], pa.string())})
        got = profile_table(rd.from_arrow(t), ["s"]).to_pandas()
        assert got.loc[0, "n"] == 2 and got.loc[0, "n_null"] == 2
        assert got.loc[0, "n_distinct"] == 0
        assert got.loc[0, "min_s"] == "" and got.loc[0, "max_s"] == ""

    def test_uniqueness_from_profile(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": pa.array([1, 2, 2, 3, None], pa.int64())})
        got = profile_table(rd.from_arrow(t), ["k"]).to_pandas()
        non_null = int(got.loc[0, "n"] - got.loc[0, "n_null"])
        assert non_null - int(got.loc[0, "n_distinct"]) == 1  # one dup


class TestConstraints:
    RULES = (("not_null", "lang"),
             ("range", "v", 100, 1000),
             ("in_set", "lang", ("en", "de", "fr")),
             ("matches", "lang", "^[a-z]{2}$"))

    @pytest.mark.parametrize("blocks", [1, 6])
    def test_matches_duckdb(self, ray_session, blocks):
        import ray.data as rd

        t = make_table(seed=3)
        ds = rd.from_arrow(t).repartition(blocks)
        got = check_constraints(ds, self.RULES).to_pandas() \
            .sort_values("rule_id").reset_index(drop=True)
        exp = duck(t).execute(check_constraints_sql("tbl", self.RULES)) \
            .df().sort_values("rule_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
        assert got.loc[0, "violations"] > 0      # nulls planted
        assert got.loc[2, "violations"] > 0      # 'zz' outside the set

    def test_unknown_rule_rejected(self):
        with pytest.raises(ValueError, match="unknown rule"):
            check_constraints(None, [("frobnicate", "x")])
