"""Feature-hashing document embeddings (the "hashing trick").

The engine's embedding-GENERATION op: every other vector stage (ANN,
near-dup, SemDeDup, clustering) consumes a precomputed ``embedding``
column; this produces one from raw text with no trained model — the
hashing trick of Weinberger et al. 2009 ("Feature Hashing for Large
Scale Multitask Learning"), the standard model-free text featurizer
(sklearn's HashingVectorizer shape).

Semantics (all-integer, so the DuckDB twin is bit-exact):
  for each whitespace token occurrence t in doc d:
      h    = lower-8-md5-bytes little-endian (DuckDB md5_number_lower)
      dim  = h % n_dims
      sign = +1 if (h // n_dims) % 2 == 0 else -1
  w[d, dim] = sum of signs; output exploded rows (doc_id, dim, w) with
  w != 0 (sparse COO — the layout a 100-TB featurizer must emit: dense
  list columns for every doc would carry n_dims * N values; COO carries
  only the nonzeros and feeds groupby/join stages directly).

Scale shape: ONE map_batches scan, NO shuffle — a doc's tokens live in
its own row, so every (doc, dim) weight is a local decision. Per-batch
md5 cost is vocabulary-bounded (hash the batch dictionary once, not
every occurrence — the CMS/unigram_counts pattern).

Tokenizer parity with the rest of the text family: Arrow
utf8_split_whitespace + empty-token drop == DuckDB
regexp_split_to_array(trim(text), '\\s+') with tok <> '' (lm._split_codes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vtzero_ray.functions.lm import _split_codes
from vtzero_ray.functions.sketch import CMS
from vtzero_ray.runtime import tune_allocator

_EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                   "dim": pa.array([], pa.int64()),
                   "w": pa.array([], pa.int64())})


def hash_embed(ds, n_dims: int = 64, column: str = "text",
               id_column: str = "doc_id"):
    """Dataset (id, text) → Dataset (doc_id, dim, w) sparse hashed
    embeddings. One streaming scan; nothing shuffles."""
    if n_dims < 1:
        raise ValueError(f"n_dims must be >= 1, got {n_dims}")

    def per_batch(batch: pa.Table) -> pa.Table:
        tune_allocator()
        codes, tok_doc, vocab, n_docs = _split_codes(batch, column)
        if codes.size == 0:
            return _EMPTY
        ids = batch.column(id_column).to_numpy()
        h = CMS.hash64(vocab.to_pylist())  # vocab-bounded md5
        dim_v = (h % np.uint64(n_dims)).astype(np.int64)
        neg_v = (((h // np.uint64(n_dims)) % np.uint64(2)) == 1)
        # accumulate +1/-1 per (doc, dim) as two int64 bincounts
        key = tok_doc * n_dims + dim_v[codes]
        m = n_docs * n_dims
        neg = neg_v[codes]
        w = (np.bincount(key[~neg], minlength=m).astype(np.int64)
             - np.bincount(key[neg], minlength=m).astype(np.int64))
        nz = np.flatnonzero(w)
        return pa.table({
            "doc_id": pa.array(ids[nz // n_dims], pa.int64()),
            "dim": pa.array((nz % n_dims).astype(np.int64)),
            "w": pa.array(w[nz]),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def hash_embed_sql(n_dims: int = 64, table: str = "documents",
                   column: str = "text", id_column: str = "doc_id") -> str:
    """DuckDB twin: same tokenizer, same md5_number_lower hash, same
    dim/sign derivation, integer sums — bit-exact vs hash_embed."""
    return (
        f"WITH toks AS (SELECT {id_column} AS doc_id, "
        "md5_number_lower(tok)::UBIGINT AS h FROM (SELECT "
        f"{id_column}, unnest(regexp_split_to_array(trim({column}), "
        f"'\\s+')) AS tok FROM {table}) WHERE tok <> '') "
        f"SELECT doc_id, CAST(h % {n_dims} AS BIGINT) AS dim, "
        f"CAST(SUM(CASE WHEN (h // {n_dims}) % 2 = 0 THEN 1 ELSE -1 END) "
        "AS BIGINT) AS w "
        "FROM toks GROUP BY doc_id, dim "
        "HAVING SUM(CASE WHEN (h // " + str(n_dims) + ") % 2 = 0 "
        "THEN 1 ELSE -1 END) <> 0 "
        "ORDER BY doc_id, dim"
    )
