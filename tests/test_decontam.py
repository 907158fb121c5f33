"""Benchmark decontamination (functions/decontam.py): hand-checked
overlap, distinct-gram counting, DuckDB-twin equality, benchmark
exclusion."""

import pyarrow as pa


def _tab(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


class TestDecontam:
    def test_hand_checked_flags(self, ray_session):
        import ray
        import ray.data as rd

        from vtzero_ray.functions.decontam import (benchmark_grams,
                                                   contamination_flags)

        bench = ["the quick brown fox jumps over the lazy dog"]
        corpus = [
            "see the quick brown fox jumps high",   # shares 1 distinct 4-gram
            "the quick brown fox the quick brown fox",  # repeated -> still 2
            "nothing in common here at all today",
            "too short",
        ]
        ref = ray.put(benchmark_grams(bench, n=4))
        out = (contamination_flags(rd.from_arrow(_tab(corpus)).repartition(2),
                                   ref, n=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out.contaminated) == [True, True, False, False]
        # "the quick brown fox" + "quick brown fox jumps"
        assert out.n_hits[0] == 2
        # doc 1's repeats collapse: "the quick brown fox" counted ONCE
        assert out.n_hits[1] == 1
        assert out.n_hits[3] == 0          # < n tokens

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.decontam import (decontaminate_mod,
                                                   decontaminate_sql)

        sf = "/root/testdata/sf0.001"
        import ray.data as rd
        ds = rd.read_parquet(f"{sf}/documents.parquet",
                             columns=["doc_id", "text"])
        got = (decontaminate_mod(ds, sf, n=4, mod=10)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = (con.execute(decontaminate_sql(n=4, mod=10)).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)
        # benchmark docs are excluded from the scan output
        assert (got.doc_id % 10 != 0).all()
        # denser eval split (10%) must contaminate something at sf0.001
        assert got.contaminated.any()
