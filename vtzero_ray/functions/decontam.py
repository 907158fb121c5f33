"""Benchmark decontamination — flag training documents that share any
word n-gram with an evaluation/benchmark set (the GPT-3/PaLM-style
13-gram rule; n is a knob).

Shape: the benchmark side is SMALL by nature (eval sets are thousands of
docs, not corpora) → build its distinct-gram set once on the driver and
broadcast it (ray.put); the corpus side is ONE vectorized map_batches
scan — dictionary-coded tokens, composite-int distinct-gram extraction
(textstats._group_count), gram strings materialized only for each
batch's DISTINCT (doc, gram) pairs, membership via one Arrow is_in
against the broadcast value set. No shuffle at any corpus size.

Outputs are integers/bools (the oracle-exactness invariant):
(doc_id, n_hits = distinct contaminated n-grams, contaminated)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()
import pyarrow.compute as pc

from .lm import _split_codes
from .textstats import _group_count


def _doc_grams(batch: pa.Table, n: int, column: str):
    """Distinct (doc, n-gram) pairs of a batch → (doc_idx ndarray,
    gram StringArray). Vectorized: all-windows-in-doc mask + one
    composite-int unique pass; strings built only for unique pairs."""
    codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
    if codes.size < n:
        return np.empty(0, np.int64), pa.array([], pa.string()), n_docs
    same = tok_doc[: -(n - 1)] == tok_doc[n - 1:]
    if not same.any():
        return np.empty(0, np.int64), pa.array([], pa.string()), n_docs
    parts = [tok_doc[: -(n - 1)][same]]
    parts += [codes[i: codes.size - (n - 1) + i][same] for i in range(n)]
    cols, _ = _group_count(parts, len(vocab))
    pieces = [vocab.take(pa.array(c)) for c in cols[1:]]
    grams = pc.binary_join_element_wise(*pieces, " ")
    return cols[0].astype(np.int64), grams, n_docs


def benchmark_grams(texts, n: int = 8) -> pa.Array:
    """Distinct n-grams of the benchmark set (driver-side; eval sets are
    small). ``texts`` is any iterable of strings."""
    batch = pa.table({"text": pa.array(list(texts), pa.string())})
    _, grams, _ = _doc_grams(batch, n, "text")
    return pc.unique(grams)


def contamination_flags(ds, bench_ref, n: int = 8, column: str = "text",
                        id_column: str = "doc_id"):
    """→ Dataset (doc_id, n_hits, contaminated): n_hits = how many
    DISTINCT n-grams of the doc appear in the benchmark gram set
    (``bench_ref`` = ray.put(benchmark_grams(...)))."""
    import ray

    def flag(t: pa.Table) -> pa.Table:
        tune_allocator()
        bench = ray.get(bench_ref)
        ids = t.column(id_column)
        doc_of, grams, n_docs = _doc_grams(t, n, column)
        hits = np.zeros(n_docs, np.int64)
        if len(grams) and len(bench):
            m = pc.is_in(grams, value_set=bench).to_numpy(
                zero_copy_only=False)
            m = np.nan_to_num(m.astype(np.float64)).astype(bool)
            hits = np.bincount(doc_of[m], minlength=n_docs).astype(np.int64)
        return pa.table({id_column: ids,
                         "n_hits": pa.array(hits),
                         "contaminated": pa.array(hits > 0)})

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


def decontaminate_mod(ds, sf_dir: str, n: int = 8, mod: int = 50,
                      column: str = "text", id_column: str = "doc_id"):
    """Driver-query shape: docs with doc_id % mod == 0 ARE the benchmark
    (a deterministic synthesized eval set — the synth-corpus precedent);
    every other doc is scanned for n-gram overlap against it. The
    benchmark read is a pruned parquet scan (2 columns, tiny)."""
    import pyarrow.parquet as pq
    import ray

    bt = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=[id_column, column])
    idc = bt.column(id_column)
    mask = pc.equal(
        pc.subtract(idc, pc.multiply(pc.divide(idc, mod), mod)), 0)
    bench_texts = bt.filter(mask).column(column).to_pylist()
    bench_ref = ray.put(benchmark_grams(bench_texts, n))

    def not_bench(t: pa.Table) -> pa.Table:
        idc = t.column(id_column)
        m = pc.subtract(idc, pc.multiply(pc.divide(idc, mod), mod))
        return t.filter(pc.not_equal(m, 0))

    corpus = ds.map_batches(not_bench, batch_format="pyarrow",
                            batch_size=None)
    return contamination_flags(corpus, bench_ref, n=n, column=column,
                               id_column=id_column)


def decontaminate_sql(n: int = 8, mod: int = 50, table: str = "documents",
                      column: str = "text", id_column: str = "doc_id") -> str:
    """DuckDB twin: same tokenizer, same distinct-gram semantics, same
    benchmark membership rule."""
    gram = " || ' ' || ".join(f"ws[i + {j}]" if j else "ws[i]"
                              for j in range(n))
    return (
        f"WITH t AS (SELECT {id_column} AS doc_id, "
        f"regexp_split_to_array(trim({column}), '\\s+') AS ws FROM {table}), "
        f"g AS (SELECT doc_id, unnest([{gram} "
        f"for i in generate_series(1, len(ws) - {n - 1})]) AS gram "
        f"FROM t WHERE len(ws) >= {n}), "
        f"bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {mod} = 0), "
        f"dg AS (SELECT DISTINCT doc_id, gram FROM g "
        f"WHERE doc_id % {mod} <> 0), "
        "hits AS (SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits "
        "FROM dg d JOIN bg USING (gram) GROUP BY 1) "
        f"SELECT doc.{id_column} AS doc_id, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "COALESCE(h.n_hits, 0) > 0 AS contaminated "
        f"FROM {table} doc LEFT JOIN hits h ON h.doc_id = doc.{id_column} "
        f"WHERE doc.{id_column} % {mod} <> 0"
    )
