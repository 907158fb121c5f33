"""Data profiling + declarative constraint validation — the Deequ/TFDV
slice of a training-data pipeline: before a 100-TB corpus feeds
training, the engine should answer "what's in this table" (per-column
counts, nulls, exact distincts, min/max) and "does it satisfy the
contract" (completeness, ranges, value sets, patterns) WITHOUT a
per-metric corpus pass.

Shapes (nothing here is corpus-shuffled):
- ``profile_table``: ONE scan emits two channels into ONE bucketed
  shuffle — per-batch per-column stats partials (n, nulls, min, max:
  mergeable) keyed crc(col), and per-batch-DISTINCT value rows keyed
  crc(col:value) so exact distinct counts are a local count per bucket
  (each value lives in exactly one bucket; per-batch dedup bounds the
  shuffle by batch dictionaries, the dedup_exact move) — then the
  output-sized single-task merge (the ngram_topk rule).
- ``check_constraints``: all row-local rules evaluate vectorized in ONE
  scan emitting per-batch int64 violation counts, merged in one
  output-sized task. Uniqueness is NOT row-local — it falls out of
  ``profile_table`` (violations = non-null rows − distinct values).

String min/max order is Arrow's bytewise comparison == DuckDB's default
binary collation; int mins/maxes are formatted str(int) == CAST(x AS
VARCHAR), so the SQL twins are exact.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..runtime import tune_allocator

_PROFILE_SCHEMA = pa.table({
    "bucket": pa.array([], pa.int32()),
    "kind": pa.array([], pa.int8()),          # 0 stats partial, 1 value
    "column": pa.array([], pa.string()),
    "n": pa.array([], pa.int64()),
    "n_null": pa.array([], pa.int64()),
    "is_int": pa.array([], pa.int8()),
    "min_i": pa.array([], pa.int64()),
    "max_i": pa.array([], pa.int64()),
    "min_s": pa.array([], pa.string()),
    "max_s": pa.array([], pa.string()),
    "val": pa.array([], pa.string()),
}).schema


def _fmt(v) -> str:
    """Driver/worker-stable scalar rendering matching DuckDB's
    CAST(x AS VARCHAR): ints render base-10, strings pass through."""
    if v is None:
        return ""
    if isinstance(v, bool):
        raise TypeError("profile_table: bool columns unsupported")
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, str):
        return v
    raise TypeError(f"profile_table: unsupported scalar type {type(v)}")


def profile_table(ds, columns, n_buckets: int = 32):
    """→ Dataset (column, n, n_null, n_distinct, min_s, max_s), one row
    per profiled column; n_distinct counts DISTINCT NON-NULL values
    exactly. Supported column types: integer and string."""
    cols = list(columns)

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        out = []
        for name in cols:
            arr = t.column(name)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            n_null = arr.null_count
            is_int = pa.types.is_integer(arr.type)
            mni = mxi = 0
            mn = mx = ""
            nonempty = n - n_null > 0
            if nonempty:
                mm = pc.min_max(arr)
                if is_int:
                    # int extrema merge in the INT domain — partial
                    # strings would compare lexicographically ("99" >
                    # "553") and corrupt the merge
                    mni = int(mm["min"].as_py())
                    mxi = int(mm["max"].as_py())
                    mn = "i"   # non-empty marker
                    mx = "i"
                else:
                    mn = _fmt(mm["min"].as_py())
                    mx = _fmt(mm["max"].as_py())
            out.append(pa.table({
                "bucket": pa.array([zlib.crc32(name.encode()) % n_buckets],
                                   pa.int32()),
                "kind": pa.array([0], pa.int8()),
                "column": pa.array([name]),
                "n": pa.array([n], pa.int64()),
                "n_null": pa.array([n_null], pa.int64()),
                "is_int": pa.array([1 if is_int else 0], pa.int8()),
                "min_i": pa.array([mni], pa.int64()),
                "max_i": pa.array([mxi], pa.int64()),
                "min_s": pa.array([mn if nonempty else ""]),
                "max_s": pa.array([mx if nonempty else ""]),
                "val": pa.array([""]),
            }))
            uniq = pc.unique(arr.drop_null())
            m = len(uniq)
            if m:
                vals = [_fmt(v.as_py()) for v in uniq]
                b = np.fromiter(
                    (zlib.crc32(f"{name}:{v}".encode()) % n_buckets
                     for v in vals), np.int32, count=m)
                out.append(pa.table({
                    "bucket": pa.array(b),
                    "kind": pa.array(np.ones(m, np.int8)),
                    "column": pa.array([name] * m),
                    "n": pa.array(np.zeros(m, np.int64)),
                    "n_null": pa.array(np.zeros(m, np.int64)),
                    "is_int": pa.array(np.zeros(m, np.int8)),
                    "min_i": pa.array(np.zeros(m, np.int64)),
                    "max_i": pa.array(np.zeros(m, np.int64)),
                    "min_s": pa.array([""] * m),
                    "max_s": pa.array([""] * m),
                    "val": pa.array(vals),
                }))
        return pa.concat_tables(out) if out else \
            _PROFILE_SCHEMA.empty_table()

    def _reduce(g):
        """Merge stats partials for ONE column (min/max in the native
        domain, rendered only here)."""
        nn = g[g["min_s"] != ""]
        if len(nn) == 0:
            return "", ""
        # read is_int from a STATS row (nn) — the merged frame also holds
        # the column's distinct-count row, whose is_int is a zero filler
        if int(nn["is_int"].iloc[0]):
            return (_fmt(int(nn["min_i"].min())),
                    _fmt(int(nn["max_i"].max())))
        return nn["min_s"].min(), nn["max_s"].max()

    def per_bucket(df):
        import pandas as pd

        stats = df[df["kind"] == 0]
        vals = df[df["kind"] == 1]
        rows = []
        for name, g in stats.groupby("column", sort=False):
            nn = g[g["min_s"] != ""]
            mni = int(nn["min_i"].min()) if len(nn) else 0
            mxi = int(nn["max_i"].max()) if len(nn) else 0
            rows.append((name, int(g["n"].sum()), int(g["n_null"].sum()),
                         0, int(g["is_int"].iloc[0]), mni, mxi,
                         nn["min_s"].min() if len(nn) else "",
                         nn["max_s"].max() if len(nn) else ""))
        for name, g in vals.groupby("column", sort=False):
            rows.append((name, 0, 0, int(g["val"].nunique()),
                         0, 0, 0, "", ""))
        return pd.DataFrame(rows, columns=["column", "n", "n_null",
                                           "n_distinct", "is_int",
                                           "min_i", "max_i",
                                           "min_s", "max_s"])

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        rows = []
        for name, g in df.groupby("column", sort=True):
            mn, mx = _reduce(g)
            rows.append((name, int(g["n"].sum()), int(g["n_null"].sum()),
                         int(g["n_distinct"].sum()), mn, mx))
        out = pd.DataFrame(rows, columns=["column", "n", "n_null",
                                          "n_distinct", "min_s", "max_s"])
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    bucketed = parts.groupby("bucket").map_groups(per_bucket,
                                                  batch_format="pandas")
    return bucketed.repartition(1).map_batches(merge,
                                               batch_format="pyarrow",
                                               batch_size=None)


def check_constraints(ds, rules):
    """Declarative row-local contract checks → Dataset (rule_id, rule,
    column, violations). Rules (tuples):

        ("not_null", col)              null rows
        ("range", col, lo, hi)         non-null ints outside [lo, hi]
        ("in_set", col, values)        non-null values outside the set
        ("matches", col, pattern)      non-null strings NOT matching the
                                       RE2 pattern (Arrow == DuckDB)

    ONE vectorized scan emits per-batch int64 violation counts; the
    merge is a single output-sized task. Uniqueness checks belong to
    ``profile_table`` (n − n_null − n_distinct)."""
    rules = list(rules)
    for r in rules:
        if r[0] not in ("not_null", "range", "in_set", "matches"):
            raise ValueError(f"unknown rule kind {r[0]!r}")

    def partial(t: pa.Table) -> pa.Table:
        tune_allocator()
        counts = np.zeros(len(rules), np.int64)
        for i, r in enumerate(rules):
            kind, col = r[0], r[1]
            arr = t.column(col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if kind == "not_null":
                counts[i] = arr.null_count
                continue
            nn = arr.drop_null()
            if kind == "range":
                lo, hi = r[2], r[3]
                bad = pc.or_(pc.less(nn, pa.scalar(lo)),
                             pc.greater(nn, pa.scalar(hi)))
            elif kind == "in_set":
                bad = pc.invert(pc.is_in(nn, value_set=pa.array(list(r[2]))))
            else:  # matches
                bad = pc.invert(pc.match_substring_regex(nn, r[2]))
            counts[i] = int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
        return pa.table({
            "rule_id": pa.array(np.arange(len(rules), dtype=np.int64)),
            "violations": pa.array(counts),
        })

    def merge(t: pa.Table) -> pa.Table:
        rid = t.column("rule_id").to_numpy()
        v = t.column("violations").to_numpy()
        tot = np.zeros(len(rules), np.int64)
        np.add.at(tot, rid, v)
        return pa.table({
            "rule_id": pa.array(np.arange(len(rules), dtype=np.int64)),
            "rule": pa.array([r[0] for r in rules]),
            "column": pa.array([r[1] for r in rules]),
            "violations": pa.array(tot),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


def profile_sql(table: str, columns) -> str:
    """Exact DuckDB twin of profile_table (binary-collation min/max,
    CAST AS VARCHAR rendering)."""
    parts = []
    for c in columns:
        parts.append(
            f'SELECT \'{c}\' AS "column", COUNT(*) AS n, '
            f"COUNT(*) - COUNT({c}) AS n_null, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"COALESCE(CAST(MIN({c}) AS VARCHAR), '') AS min_s, "
            f"COALESCE(CAST(MAX({c}) AS VARCHAR), '') AS max_s "
            f"FROM {table}")
    return " UNION ALL ".join(parts)


def check_constraints_sql(table: str, rules) -> str:
    """Exact DuckDB twin of check_constraints."""
    parts = []
    for i, r in enumerate(rules):
        kind, col = r[0], r[1]
        if kind == "not_null":
            cond = f"{col} IS NULL"
            base = ""
        elif kind == "range":
            cond = f"({col} < {r[2]} OR {col} > {r[3]})"
            base = f"{col} IS NOT NULL AND "
        elif kind == "in_set":
            vals = ", ".join(f"'{v}'" for v in r[2])
            cond = f"{col} NOT IN ({vals})"
            base = f"{col} IS NOT NULL AND "
        elif kind == "matches":
            cond = f"NOT regexp_matches({col}, '{r[2]}')"
            base = f"{col} IS NOT NULL AND "
        else:
            raise ValueError(kind)
        parts.append(
            f'SELECT CAST({i} AS BIGINT) AS rule_id, \'{kind}\' AS rule, '
            f'\'{col}\' AS "column", '
            f"CAST(COUNT(*) FILTER (WHERE {base}{cond}) AS BIGINT) "
            f"AS violations FROM {table}")
    return " UNION ALL ".join(parts)
