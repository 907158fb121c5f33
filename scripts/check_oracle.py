"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side over an sf dir, compare row count,
schema (sorted column names) and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.decode() if isinstance(v, (bytes, bytearray)) else v)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def df_kind(s: pd.Series) -> str:
    """Coarse dtype kind: int/float/bool/object — what a dtype-sensitive
    value hash would disagree on."""
    return s.dtype.kind


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = dict(e.queries())
    oracles = dict(e.oracle_sql())
    # twin probes the driver's 50-entry budget excludes — still checked here
    qs.update(e.queries_extra())
    oracles.update(e.oracle_sql_extra())
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            continue
        exp = canon(con.execute(sql).df())
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            # the driver's value hash is dtype-sensitive (round-2 ANN red
            # cells: DuckDB HUGEINT sums -> pandas float64 vs Ray int64) —
            # flag any kind mismatch even when values compare equal
            kinds_got = [df_kind(got[c]) for c in got.columns]
            kinds_exp = [df_kind(exp[c]) for c in exp.columns]
            if kinds_got != kinds_exp:
                failures += 1
                print(f"DTYPE-MISMATCH {name}: ray {dict(zip(got.columns, kinds_got))}"
                      f" vs oracle {dict(zip(exp.columns, kinds_exp))}")
                continue
            print(f"PASS {name}: {len(got)} rows ({dt:.1f}s)")
        else:
            failures += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, cols {list(got.columns)} vs {list(exp.columns)}")
            if ok_rows and ok_cols:
                print(f"      value mismatch: {msg}")
                bad = (got != exp).any(axis=1)
                print(got[bad].head(3))
                print(exp[bad].head(3))
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
