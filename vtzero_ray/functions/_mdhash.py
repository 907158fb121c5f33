"""md5-derived 64-bit hash shared by dedup (MinHash perms, sampling) and
ann (LSH hyperplanes) — a LEAF module so both can import it at module
scope without a dedup↔ann cycle (worker-executed bodies cannot do
function-local package imports under ship-by-value, and cyclic by-value
module pickles recurse in cloudpickle).

Semantics: DuckDB's md5_number_lower = digest bytes [8:16] little-endian,
so every Ray-side hash is bit-reproducible in the SQL oracles
(functions/dedup_sql.py).
"""

from __future__ import annotations

import hashlib

_TOKEN_CACHE: dict[str, int] = {}


def hash_u64(s: str) -> int:
    h = _TOKEN_CACHE.get(s)
    if h is None:
        h = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")
        if len(_TOKEN_CACHE) < 1_000_000:
            _TOKEN_CACHE[s] = h
    return h
