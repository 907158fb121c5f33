"""DuckDB oracle SQL for the HyperLogLog sketch (sketch.HLL, md5 hash).

The whole sketch state is integer math, so it is exactly reproducible in
SQL:

- hash      = lower 8 md5 bytes little-endian = DuckDB ``md5_number_lower``
  (the same primitive every dedup/ANN oracle uses, dedup_sql.py)
- register  = top p bits of the hash
- rank      = leading zeros of ``(h << p) | (1 << (p-1))`` + 1, computed
  branch-free as ``64 - bit_count(smear(rest))`` (smear = OR of right
  shifts by 1,2,4,8,16,32) — exact on UBIGINT
- register value = MAX(rank) per register (the HLL merge law)

The estimate is ONE float expression over exact integers (constant
``alpha*m^2*2^63`` inlined as a Python double literal, divided by the
integer ``sum(2^(63-reg))``), plus the standard small-range correction
``m*ln(m/V)`` whose ln both engines take from libm — so even the float
column hashes identically. sketch.HLL.facts() mirrors this expression
order exactly.
"""

from __future__ import annotations


def cms_est_sql(probes, column: str = "text", table: str = "documents",
                w_bits: int = 12, depth: int = 4) -> str:
    """Exact SQL twin of sketch.cms_token_est: a CMS counter is the SUM
    of counts of every corpus token sharing the bucket, so the point
    estimate is MIN over depth rows of that bucket sum — pure integer
    math on md5_number_lower bit-slices, reproduced verbatim here
    (including the collision mass an absent probe reads)."""
    mask = (1 << w_bits) - 1
    vals = ", ".join(f"('{p}')" for p in probes)
    return (
        f"WITH toks AS (SELECT unnest(regexp_split_to_array(trim({column}),"
        f" '\\s+')) AS token FROM {table} WHERE trim({column}) != ''), "
        f"tc AS (SELECT token, COUNT(*)::BIGINT AS n FROM toks"
        f" WHERE token != '' GROUP BY 1), "
        f"h AS (SELECT n, md5_number_lower(token)::UBIGINT AS hv FROM tc), "
        f"probes(token) AS (VALUES {vals}), "
        f"ph AS (SELECT token, md5_number_lower(token)::UBIGINT AS hv"
        f" FROM probes), "
        f"rws AS (SELECT unnest(generate_series(0, {depth - 1})) AS r), "
        f"cells AS (SELECT p.token, r.r, COALESCE(SUM(c.n), 0) AS rowsum"
        f" FROM ph p CROSS JOIN rws r LEFT JOIN h c"
        f" ON ((c.hv >> (16 * r.r)) & {mask}::UBIGINT)"
        f" = ((p.hv >> (16 * r.r)) & {mask}::UBIGINT)"
        f" GROUP BY 1, 2) "
        f"SELECT e.token, e.est,"
        f" (SELECT COUNT(*) FROM toks WHERE token != '')::BIGINT"
        f" AS total_tokens FROM"
        f" (SELECT token, MIN(rowsum)::BIGINT AS est FROM cells"
        f" GROUP BY 1) e"
    )


def hll_facts_sql(p: int = 12, column: str = "text",
                  table: str = "documents") -> str:
    m = 1 << p
    pow_lo = 1 << (64 - p)          # 2^(64-p): modulus for low bits
    guard = 1 << (p - 1)
    alpha_c = 0.7213 / (1 + 1.079 / m) * m * m * float(1 << 63)
    smears = []
    prev = "rest"
    for i, sh in enumerate((1, 2, 4, 8, 16, 32)):
        smears.append(f"s{i} AS (SELECT reg, (v | (v >> {sh})) AS v FROM "
                      f"{'rb2' if i == 0 else f's{i-1}'})")
        prev = f"s{i}"
    smear_ctes = ", ".join(smears).replace(
        "FROM rb2", "FROM (SELECT reg, rest AS v FROM rb)")
    return (
        f"WITH h AS (SELECT md5_number_lower({column})::UBIGINT AS hv"
        f" FROM {table}), "
        f"rb AS (SELECT (hv >> {64 - p}) AS reg,"
        f" (((hv % {pow_lo}::UBIGINT) * {1 << p}::UBIGINT)"
        f" + {guard}::UBIGINT) AS rest FROM h), "
        f"{smear_ctes}, "
        f"regs AS (SELECT reg, MAX(64 - bit_count(v) + 1) AS rank"
        f" FROM {prev} GROUP BY reg), "
        f"facts AS (SELECT COUNT(*) AS n_nonzero,"
        f" SUM(rank)::BIGINT AS register_sum,"
        f" md5(string_agg(reg::VARCHAR || ':' || rank::VARCHAR, ','"
        f" ORDER BY reg)) AS register_checksum,"
        f" SUM(CAST(power(2, 63 - rank) AS HUGEINT)) AS z_nonzero"
        f" FROM regs), "
        f"est AS (SELECT *,"
        f" ({m} - n_nonzero) AS n_zero,"
        f" {alpha_c!r} / CAST(z_nonzero +"
        f" ({m} - n_nonzero)::HUGEINT * {1 << 63}::HUGEINT AS DOUBLE) AS e0"
        f" FROM facts) "
        f"SELECT '{column}' AS \"column\","
        f" n_zero::BIGINT AS n_zero_registers, register_sum,"
        f" register_checksum,"
        f" CAST(floor((CASE WHEN e0 <= {2.5 * m!r} AND n_zero > 0"
        f" THEN {float(m)!r} * ln({m}::DOUBLE / n_zero)"
        f" ELSE e0 END) + 0.5) AS BIGINT) AS approx_distinct"
        f" FROM est"
    )
