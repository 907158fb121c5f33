"""Deterministic Common-Crawl-style pages table (input_hint schema).

Schema (BASELINE.json input_hint, exact): ``url:string, warc_ts:timestamp,
html:binary, text:string, lang:string``.

Synthesized 1:1 from the driver's ``documents.parquet`` (doc_id, text, lang)
with pure integer arithmetic so the SAME derivation is expressible in the
DuckDB oracle SQL:

- url        = 'https://site' || (doc_id % 1000) || '.example/p/' || doc_id
- warc_ts    = TIMESTAMP '2024-01-01' + doc_id seconds
- geo marker = ' geo:' appended to the document text with lat/lon in
  fixed-point microdegrees from a Knuth multiplicative hash of doc_id;
  30% of pages (doc_id % 10 < 3) land in one hot ~NYC cell to exercise
  skew splitting (FIXTURES.md F1 skew fixture)
- html       = b'<html><body>' + text + b'</body></html>'
- text       = document text + geo marker; must survive the pipeline
  BYTE-IDENTICAL per url (input_hint per-row invariant)

All integer expressions stay below 2^63 so DuckDB BIGINT matches Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = 2654435761  # 2^32 / phi, fits doc_id*KNUTH in int64 for doc_id < 3.4e9
HOT_LAT_US = 40712800   # microdegrees, ~NYC
HOT_LON_US = -74006000

# SQL fragments reused by oracle_sql() — single source of truth for the
# deterministic derivation (kept in lockstep with _geo_microdeg below).
SQL_HASH = f"((doc_id * {KNUTH}) % 4294967296)"
SQL_IS_HOT = "((doc_id % 10) < 3)"
SQL_LAT_US = (
    f"(CASE WHEN {SQL_IS_HOT} THEN {HOT_LAT_US} + ({SQL_HASH} % 2000) - 1000 "
    f"ELSE (({SQL_HASH} * 48271) % 160000000) - 80000000 END)"
)
SQL_LON_US = (
    f"(CASE WHEN {SQL_IS_HOT} THEN {HOT_LON_US} + (({SQL_HASH} // 2000) % 2000) - 1000 "
    f"ELSE (({SQL_HASH} * 69621) % 360000000) - 180000000 END)"
)
SQL_URL = "('https://site' || (doc_id % 1000) || '.example/p/' || doc_id)"


def _geo_microdeg(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """doc_id → (lat_microdeg, lon_microdeg) int64; mirrors SQL_LAT_US/SQL_LON_US."""
    d = doc_id.astype(np.int64)
    h = (d * KNUTH) % 4294967296
    hot = (d % 10) < 3
    lat = np.where(hot, HOT_LAT_US + (h % 2000) - 1000,
                   ((h * 48271) % 160000000) - 80000000)
    lon = np.where(hot, HOT_LON_US + ((h // 2000) % 2000) - 1000,
                   ((h * 69621) % 360000000) - 180000000)
    return lat, lon


def _fmt_microdeg(us: np.ndarray) -> np.ndarray:
    """int64 microdegrees → '[-]D.DDDDDD' decimal strings (lossless)."""
    sign = np.where(us < 0, "-", "")
    a = np.abs(us)
    whole = (a // 1_000_000).astype(str)
    frac = np.char.zfill((a % 1_000_000).astype(str), 6)
    return np.char.add(np.char.add(np.char.add(sign, whole), "."), frac)


def pages_batch(batch: pa.Table, expand: int = 1) -> pa.Table:
    """documents batch (doc_id, text, lang) → pages batch (input_hint schema).

    Vectorized Arrow/NumPy; used via map_batches so pages are synthesized
    in parallel and never materialized as a whole.

    ``expand`` > 1 deterministically fans each document out to ``expand``
    pages with page ids ``doc_id*expand + r`` (bench-scale volume; the
    geo derivation spreads the extra pages over cells). Correctness queries
    always use expand=1 so the SQL oracle stays 1:1 with documents.
    """
    if expand > 1:
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), expand)
        batch = batch.take(pa.array(idx))
        r = np.tile(np.arange(expand, dtype=np.int64), len(batch) // expand)
        base = batch.column("doc_id").to_numpy() * expand + r
        batch = batch.set_column(
            batch.column_names.index("doc_id"), "doc_id", pa.array(base, pa.int64())
        )
    doc_id = batch.column("doc_id").to_numpy()
    lat_us, lon_us = _geo_microdeg(doc_id)
    marker = np.char.add(
        np.char.add(np.char.add(" geo:", _fmt_microdeg(lat_us)), ","),
        _fmt_microdeg(lon_us),
    )
    text = pc.binary_join_element_wise(
        pc.cast(batch.column("text"), pa.string()), pa.array(marker, pa.string()), ""
    )
    url = pa.array(
        np.char.add(
            np.char.add(
                np.char.add("https://site", (doc_id % 1000).astype(str)),
                ".example/p/",
            ),
            doc_id.astype(str),
        ),
        pa.string(),
    )
    warc_ts = pc.add(
        pa.scalar(np.datetime64("2024-01-01T00:00:00", "us"), pa.timestamp("us")),
        pc.multiply(pa.array(doc_id, pa.int64()), pa.scalar(1_000_000, pa.int64())).cast(
            pa.duration("us")
        ),
    )
    html = pc.binary_join_element_wise(
        pa.scalar("<html><body>"), text, pa.scalar("</body></html>"), ""
    ).cast(pa.binary())
    return pa.table(
        {
            "url": url,
            "warc_ts": warc_ts,
            "html": html,
            "text": text,
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),  # carried for id assignment
        }
    )


def read_pages(sf_dir: str, include_html: bool = True, expand: int = 1,
               n_blocks: int = 64):
    """Pages Dataset for an sf dir. Column-pruned read of documents.parquet
    → vectorized synthesis per batch (streaming; no driver materialization).

    The read is split into ``n_blocks`` blocks up front so every downstream
    stage parallelizes; all map_batches stages use batch_size=None (batch ==
    block) — a positive batch_size would BUNDLE the small blocks back into
    one task and serialize the pipeline (observed: 600k-row run collapsing
    to a single 112s encode task).
    """
    import functools

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    ds = ds.repartition(n_blocks)
    fn = functools.partial(pages_batch, expand=expand)
    ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    if not include_html:
        ds = ds.select_columns(["url", "warc_ts", "text", "lang", "doc_id"])
    return ds
