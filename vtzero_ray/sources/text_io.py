"""JSONL / CSV sources and sinks for document tables — the interchange
formats every web-corpus pipeline ingests besides parquet (S1 source
breadth; the reference's reader/writer surface is format-agnostic
bytes-in/bytes-out, `/root/reference/examples/vtzero-streets.cpp:12`
reads whole files the same way).

Both directions ride Ray Data's native distributed readers/writers
(one file per block, the resumable-output rule); the wrappers add the
two things raw read_json/read_csv lack for an engine contract:
- SCHEMA ENFORCEMENT: inferred dtypes are cast to the expected Arrow
  schema (JSON infers int64 but CSV may widen, and a column of all-null
  becomes null-typed) with loud errors on missing columns;
- column pruning at the read (only requested columns survive the first
  map_batches, mirroring read_parquet(columns=...)).
"""

from __future__ import annotations

import pyarrow as pa

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def _enforce(schema: pa.Schema, columns=None):
    cols = list(columns) if columns else [f.name for f in schema]
    sub = pa.schema([schema.field(c) for c in cols])

    def fn(t: pa.Table) -> pa.Table:
        missing = [c for c in cols if c not in t.column_names]
        if missing:
            raise ValueError(f"source missing columns {missing}; "
                             f"has {t.column_names}")
        return t.select(cols).cast(sub)

    return fn


def write_jsonl(ds, out_dir: str) -> None:
    """Dataset → newline-delimited JSON shards (one file per block)."""
    ds.write_json(out_dir)


def read_jsonl(path: str, schema: pa.Schema = DOC_SCHEMA, columns=None):
    """JSONL dir/file → Dataset with the declared schema enforced."""
    import ray.data as rd

    ds = rd.read_json(path)
    return ds.map_batches(_enforce(schema, columns),
                          batch_format="pyarrow", batch_size=None)


def write_csv(ds, out_dir: str) -> None:
    """Dataset → CSV shards (one file per block, headers per shard)."""
    ds.write_csv(out_dir)


def read_csv(path: str, schema: pa.Schema = DOC_SCHEMA, columns=None):
    """CSV dir/file → Dataset with the declared schema enforced."""
    import ray.data as rd

    ds = rd.read_csv(path)
    return ds.map_batches(_enforce(schema, columns),
                          batch_format="pyarrow", batch_size=None)
