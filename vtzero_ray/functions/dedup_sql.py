"""DuckDB oracle SQL generators for the dedup/ANN signature operators.

Every hash these operators use is defined so BOTH engines can compute it
exactly:

- token hash  = lower 8 md5 bytes little-endian = DuckDB ``md5_number_lower``
- k-gram hash = fixed-base polynomial over token hashes with uint64
  WRAPPING arithmetic (numpy native; SQL replicates the low-64 bits of
  each 64x64 product via a 32-bit split in HUGEINT)
- minhash     = min over shingles of ((g*a mod 2^64) + b mod 2^64) mod M61
  with (a, b) drawn from the same seeded generator as ``MinHasher``
- band hash   = FNV-style fold over the band's minhashes (uint64 wrap)
- simhash     = per-bit ±1 vote over token hashes

The generated SQL is pure SELECT (runs against the pre-registered
``documents`` view) with all constants inlined — the driver's oracle gate
can execute it verbatim.
"""

from __future__ import annotations

import numpy as np

U64 = "18446744073709551616"          # 2^64
M61 = "2305843009213693951"           # 2^61 - 1
FNV = "1099511628211"
_POLY_B = 1099511628211


def _low64_mul_const(lo: int, hi: int, t: str) -> str:
    """SQL for the low 64 bits of (const * t) where const = hi*2^32 + lo
    and t is a HUGEINT column < 2^64 (every intermediate fits HUGEINT)."""
    return (f"((({lo}::HUGEINT * {t}) + ((({hi}::HUGEINT * {t}) % 4294967296)"
            f" * 4294967296)) % {U64})")


def _weights(k: int) -> list[int]:
    """B^(k-1), ..., B^0 with uint64 wraparound — the gram polynomial
    weights (must equal dedup._shingle_hashes's numpy computation)."""
    w = _POLY_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    return [int(v) for v in w]


def _words_toks_ctes() -> str:
    return (
        "words AS (SELECT doc_id, list_filter(regexp_split_to_array(text,"
        " '\\s+'), w -> w <> '') AS ws FROM documents), "
        "toks0 AS (SELECT doc_id, unnest(ws) AS w,"
        " unnest(generate_series(1, len(ws))) AS i, len(ws) AS n FROM words), "
        "toks AS (SELECT doc_id, i, n, md5_number_lower(w)::HUGEINT AS h"
        " FROM toks0), "
    )


def _grams_ctes(k: int) -> str:
    """CTEs words/toks/grams: per-doc DISTINCT k-gram hashes (short docs
    fall back to one whole-doc gram, mirroring _shingle_hashes)."""
    w = _weights(k)
    leads = ", ".join(
        f"lead(h, {j}) OVER win AS h{j}" for j in range(1, k))
    terms = []
    for j, wj in enumerate(w):
        lo, hi = wj & 0xFFFFFFFF, wj >> 32
        terms.append(_low64_mul_const(lo, hi, f"h{j}" if j else "h0"))
    poly = "(" + " + ".join(terms) + f") % {U64}"
    # B^e for e = 0..k-2 (short-doc whole-text gram weights)
    pow_rows = []
    for e in range(k - 1):
        v = int(np.uint64(_POLY_B) ** np.uint64(e))
        pow_rows.append(f"({e}, {v & 0xFFFFFFFF}, {v >> 32})")
    return (
        _words_toks_ctes()
        + f"wins AS (SELECT doc_id, h AS h0, {leads}, n FROM toks"
        f" WINDOW win AS (PARTITION BY doc_id ORDER BY i)), "
        f"g5 AS (SELECT doc_id, {poly} AS g FROM wins"
        f" WHERE n >= {k} AND h{k - 1} IS NOT NULL), "
        f"pows(e, lo, hi) AS (VALUES {', '.join(pow_rows)}), "
        f"gshort AS (SELECT t.doc_id,"
        f" SUM({_low64_mul_const('p.lo', 'p.hi', 't.h')}) % {U64} AS g"
        f" FROM toks t JOIN pows p ON p.e = t.n - t.i"
        f" WHERE t.n < {k} GROUP BY t.doc_id), "
        f"grams AS (SELECT DISTINCT doc_id, g FROM"
        f" (SELECT * FROM g5 UNION ALL SELECT * FROM gshort)), "
    )


def _minhash_ctes(n_perm: int, n_bands: int, k: int, seed: int) -> str:
    """CTEs through candidate pairs (cands) — mirrors MinHasher +
    _bands_batch + the LSH bucket join."""
    from .dedup import MinHasher

    mh = MinHasher(n_perm=n_perm, k=k, seed=seed)
    rpb = n_perm // n_bands
    perm_rows = ", ".join(
        f"({p}, {int(mh.a[p])}, {int(mh.b[p])})" for p in range(n_perm))
    return (
        _grams_ctes(k)
        + f"perms(p, a, b) AS (VALUES {perm_rows}), "
        f"sigs AS (SELECT g.doc_id, pm.p,"
        f" MIN((((g.g * pm.a::HUGEINT) % {U64}) + pm.b) % {U64} % {M61}) AS v"
        f" FROM grams g CROSS JOIN perms pm GROUP BY 1, 2), "
        # empty docs hash to the all-zero signature (MinHasher.signature)
        f"sigs_all AS (SELECT * FROM sigs UNION ALL"
        f" SELECT w.doc_id, pm.p, 0::HUGEINT AS v FROM words w"
        f" CROSS JOIN perms pm WHERE len(w.ws) = 0), "
        f"bandh AS (SELECT doc_id, p // {rpb} AS band,"
        f" list_reduce(list_prepend(0::HUGEINT, list(v ORDER BY p)),"
        f" (acc, v) -> ((acc * {FNV}) % {U64} + v) % {U64}) AS bh"
        f" FROM sigs_all GROUP BY doc_id, p // {rpb}), "
        f"cands AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b"
        f" FROM bandh x JOIN bandh y ON x.band = y.band AND x.bh = y.bh"
        f" AND x.doc_id < y.doc_id), "
    )


def minhash_candidates_sql(n_perm: int = 128, n_bands: int = 16, k: int = 5,
                           seed: int = 42) -> str:
    ctes = _minhash_ctes(n_perm, n_bands, k, seed)
    return (f"WITH {ctes}"
            f"final AS (SELECT doc_a, doc_b, COUNT(*) AS n_bands_hit"
            f" FROM cands GROUP BY 1, 2) SELECT * FROM final")


def jaccard_verified_sql(n_perm: int = 128, n_bands: int = 16, k: int = 5,
                         seed: int = 42, thr_num: int = 1,
                         thr_den: int = 2) -> str:
    """Verified near-dup pairs: LSH candidates with EXACT integer Jaccard
    counts (keep when n_inter * thr_den >= thr_num * n_union)."""
    ctes = _minhash_ctes(n_perm, n_bands, k, seed)
    return (
        f"WITH {ctes}"
        f"upairs AS (SELECT DISTINCT doc_a, doc_b FROM cands), "
        f"gcount AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1), "
        f"inter AS (SELECT u.doc_a, u.doc_b, COUNT(*) AS n_inter FROM upairs u"
        f" JOIN grams ga ON ga.doc_id = u.doc_a"
        f" JOIN grams gb ON gb.doc_id = u.doc_b AND gb.g = ga.g"
        f" GROUP BY 1, 2) "
        f"SELECT u.doc_a, u.doc_b, COALESCE(i.n_inter, 0) AS n_inter,"
        f" ca.n + cb.n - COALESCE(i.n_inter, 0) AS n_union"
        f" FROM upairs u"
        f" JOIN gcount ca ON ca.doc_id = u.doc_a"
        f" JOIN gcount cb ON cb.doc_id = u.doc_b"
        f" LEFT JOIN inter i ON i.doc_a = u.doc_a AND i.doc_b = u.doc_b"
        f" WHERE COALESCE(i.n_inter, 0) * {thr_den} >="
        f" {thr_num} * (ca.n + cb.n - COALESCE(i.n_inter, 0))"
    )


def simhash_sql() -> str:
    """64-bit SimHash per doc (per-bit ±1 vote over token md5 hashes) —
    mirrors dedup.SimHasher.signature exactly."""
    return (
        f"WITH {_words_toks_ctes()}"
        f"votes AS (SELECT doc_id, b.range AS bit,"
        f" SUM(CASE WHEN (h // CAST(power(2, b.range) AS HUGEINT)) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS vote"
        f" FROM toks CROSS JOIN range(64) b GROUP BY 1, 2), "
        f"sig AS (SELECT doc_id, CAST(SUM(CASE WHEN vote > 0 THEN"
        f" CAST(power(2, bit) AS HUGEINT) ELSE 0 END) AS UBIGINT) AS simhash"
        f" FROM votes GROUP BY 1) "
        f"SELECT d.doc_id, CAST(COALESCE(s.simhash, 0) AS UBIGINT) AS simhash"
        f" FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id"
    )


def simhash_near_dups_sql(n_bands: int = 4, band_bits: int = 16,
                          max_hamming: int = 8) -> str:
    """Banded hamming-join oracle: equal 16-bit band → candidate pair →
    exact popcount(xor) filter — mirrors dedup.simhash_near_dups."""
    mask = (1 << band_bits) - 1
    return (
        f"WITH sigq AS ({simhash_sql()}), "
        f"bands AS (SELECT doc_id, simhash, b.range AS band,"
        f" (simhash >> CAST({band_bits} * b.range AS INTEGER))"
        f" & CAST({mask} AS UBIGINT) AS bv"
        f" FROM sigq CROSS JOIN range({n_bands}) b), "
        f"pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        f" a.simhash AS sa, b.simhash AS sb"
        f" FROM bands a JOIN bands b"
        f" ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id) "
        f"SELECT doc_a, doc_b,"
        f" CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming"
        f" FROM pairs WHERE bit_count(xor(sa, sb)) <= {max_hamming}"
    )


def dup_clusters_sql(n_perm: int = 128, n_bands: int = 16, k: int = 5,
                     seed: int = 42) -> str:
    """DuckDB oracle for dup_clusters over minhash LSH candidate pairs:
    connected components by recursive closure, cluster = min doc_id."""
    ctes = _minhash_ctes(n_perm, n_bands, k, seed)
    return (f"WITH RECURSIVE {ctes}"
            f"pairs AS (SELECT DISTINCT doc_a, doc_b FROM cands), "
            f"edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs"
            f" UNION ALL SELECT doc_b, doc_a FROM pairs), "
            f"nodes AS (SELECT DISTINCT a AS n FROM edges), "
            f"reach AS (SELECT n AS node, n AS label FROM nodes"
            f" UNION SELECT e.b, r.label FROM reach r"
            f" JOIN edges e ON e.a = r.node) "
            f"SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id"
            f" FROM reach GROUP BY 1")


def near_dedup_sql(n_perm: int = 128, n_bands: int = 16, k: int = 5,
                   seed: int = 42, thr_num: int = 1,
                   thr_den: int = 2) -> str:
    """DuckDB twin of dedup.near_dedup_corpus: LSH candidates → exact
    integer-Jaccard verified pairs → recursive-closure components →
    keep docs that are unpaired or their cluster's min doc_id."""
    ctes = _minhash_ctes(n_perm, n_bands, k, seed)
    return (
        f"WITH RECURSIVE {ctes}"
        f"upairs AS (SELECT DISTINCT doc_a, doc_b FROM cands), "
        f"gcount AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1), "
        f"inter AS (SELECT u.doc_a, u.doc_b, COUNT(*) AS n_inter FROM upairs u"
        f" JOIN grams ga ON ga.doc_id = u.doc_a"
        f" JOIN grams gb ON gb.doc_id = u.doc_b AND gb.g = ga.g"
        f" GROUP BY 1, 2), "
        f"vpairs AS (SELECT u.doc_a, u.doc_b FROM upairs u"
        f" JOIN gcount ca ON ca.doc_id = u.doc_a"
        f" JOIN gcount cb ON cb.doc_id = u.doc_b"
        f" LEFT JOIN inter i ON i.doc_a = u.doc_a AND i.doc_b = u.doc_b"
        f" WHERE COALESCE(i.n_inter, 0) * {thr_den} >="
        f" {thr_num} * (ca.n + cb.n - COALESCE(i.n_inter, 0))), "
        f"edges AS (SELECT doc_a AS a, doc_b AS b FROM vpairs"
        f" UNION ALL SELECT doc_b, doc_a FROM vpairs), "
        f"nodes AS (SELECT DISTINCT a AS n FROM edges), "
        f"reach AS (SELECT n AS node, n AS label FROM nodes"
        f" UNION SELECT e.b, r.label FROM reach r"
        f" JOIN edges e ON e.a = r.node), "
        f"clus AS (SELECT node AS doc_id, MIN(label) AS cluster_id"
        f" FROM reach GROUP BY 1) "
        f"SELECT d.doc_id, d.text FROM documents d"
        f" LEFT JOIN clus c ON c.doc_id = d.doc_id"
        f" WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id"
    )


def near_dedup_longest_sql(n_perm: int = 128, n_bands: int = 16,
                           k: int = 5, seed: int = 42, thr_num: int = 1,
                           thr_den: int = 2) -> str:
    """DuckDB twin of near_dedup_corpus(keep="longest"): the same
    closure, but each cluster's survivor is the member with the most
    characters (row_number over length(text) DESC, doc_id ASC)."""
    base = near_dedup_sql(n_perm, n_bands, k, seed, thr_num, thr_den)
    tail = (f"SELECT d.doc_id, d.text FROM documents d"
            f" LEFT JOIN clus c ON c.doc_id = d.doc_id"
            f" WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id")
    assert base.endswith(tail)
    return base[:-len(tail)] + (
        ", winners AS (SELECT doc_id FROM ("
        "SELECT c.doc_id, row_number() OVER ("
        "PARTITION BY c.cluster_id"
        " ORDER BY length(d.text) DESC, c.doc_id) AS rn"
        " FROM clus c JOIN documents d ON d.doc_id = c.doc_id)"
        " WHERE rn = 1) "
        "SELECT d.doc_id, d.text FROM documents d"
        " LEFT JOIN clus c ON c.doc_id = d.doc_id"
        " WHERE c.doc_id IS NULL"
        " OR d.doc_id IN (SELECT doc_id FROM winners)"
    )
