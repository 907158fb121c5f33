"""Salted (sharded) encoding of HOT tiles (SURVEY.md §4 skew handling).

Problem: one dense-urban tile can hold 30%+ of all features; a plain
groupby(z,x,y) puts them in ONE group → one straggler task and one
worker holding the whole group in memory. At 100 TB that's fatal.

Design — deterministic distributed interning in two passes, no
single-node re-encode:

1. *Plan* (tiny aggregates): per hot tile and salt ``s = doc_id % S``:
   feature count; per lang: first (salt, doc_id) occurrence. From these the
   planner derives, per tile: per-salt global-rank bases, each lang's
   global value-table index, and the byte layout of the value table. The
   plan is small (hot_tiles × S rows) and broadcast via ray.put.

2. *Shard encode* (parallel over (tile, salt)): each shard encodes its
   features' COMPLETE wire bytes — including tag indexes — using global
   indexes computed from the plan:
       url_idx(rank r)  = r + #{langs with first_rank < r}
       lang_idx(first f) = f + 1 + #{langs with first_rank < f}
   (the closed form of vtzero's sequential first-occurrence interning,
   builder_impl.hpp:104-147, over the canonical order (salt, doc_id)).
   It also emits its url value-table SEGMENT bytes.

3. *Merge* (per tile, cheap): concatenate shard feature sections in salt
   order, splice lang value entries at their planned positions, prepend
   the layer header + key table → byte-complete tile. Pure byte
   concatenation — O(output size), no re-interning.

Output bytes are deterministic (fixed S and threshold) and decode to the
same logical content as the unsalted kernel; the canonical feature order
is (salt, doc_id) instead of plain doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..mvt.pbf import encode_varint, field_bytes, field_varint
from .encode_segmented import encode_feature_section, encode_url_value_entries


def url_indexes(global_ranks: np.ndarray, lang_ranks_sorted: np.ndarray) -> np.ndarray:
    """url value index per feature = rank + #langs first-seen at rank < r
    ... strictly before the url add of feature r (lang first-seen AT rank r
    happens AFTER that feature's url add)."""
    extra = np.searchsorted(lang_ranks_sorted, global_ranks, side="left")
    return global_ranks + extra


def encode_shard(
    feature_ids: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
    urls: list,
    langs: list,
    global_base: int,
    lang_ranks_sorted: np.ndarray,
    lang_index: dict[str, int],
) -> tuple[bytes, bytes]:
    """One (tile, salt) shard → (feature_section_bytes, url_value_segment).

    Features must be sorted by doc_id. Vectorized via the segmented-kernel
    primitives with PLAN-DERIVED global indexes (shards never see each
    other; the plan makes the interning deterministic across them).
    """
    ranks = np.arange(global_base, global_base + feature_ids.shape[0], dtype=np.int64)
    uidx = url_indexes(ranks, lang_ranks_sorted)
    lidx = np.fromiter((lang_index[l] for l in langs), dtype=np.int64,
                       count=len(langs))
    feats = encode_feature_section(
        feature_ids.astype(np.uint64), np.asarray(px), np.asarray(py),
        uidx.astype(np.uint64), lidx.astype(np.uint64),
    )
    useg = encode_url_value_entries(pa.array(list(urls), pa.string()))
    return feats, useg


def merge_shards(
    shard_rows: list,
    plan,
    layer_name: bytes = b"pages",
    version: int = 2,
    extent: int = 4096,
) -> bytes:
    """Per tile: shards (sorted by salt) → complete tile bytes.

    Value table = url segments concatenated in salt order with each lang's
    entry spliced in at its planned global index. Splice positions are
    found by walking the url entries' per-salt counts (urls occupy every
    position that is not a lang index).
    """
    shard_rows = sorted(shard_rows, key=lambda r: r["salt"])
    feats = b"".join(r["feat_bytes"] for r in shard_rows)
    # build the value table: iterate global value indexes; lang positions
    # come from the plan, everything else consumes url entries in order
    lang_positions = sorted((idx, lang) for lang, idx in plan["lang_index"].items())
    url_entry_iters = []
    for r in shard_rows:
        url_entry_iters.append(r["url_seg"])
    url_blob = b"".join(url_entry_iters)
    vbuf = bytearray()
    upos = 0
    total_vals = plan["total"] + len(lang_positions)
    lp = 0
    for p in range(total_vals):
        if lp < len(lang_positions) and lang_positions[lp][0] == p:
            lb = lang_positions[lp][1].encode("utf-8")
            entry = b"\x0a" + encode_varint(len(lb)) + lb
            vbuf += b"\x22" + encode_varint(len(entry)) + entry
            lp += 1
        else:
            # consume next url entry: parse its length prefix
            assert url_blob[upos] == 0x22
            q = upos + 1
            ln = 0
            shift = 0
            while True:
                b = url_blob[q]
                q += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            vbuf += url_blob[upos:q + ln]
            upos = q + ln
    header = (field_varint(15, version)
              + field_bytes(1, layer_name)
              + field_varint(5, extent))
    keys = b"\x1a\x03url\x1a\x04lang"
    payload = header + feats + keys + bytes(vbuf)
    return field_bytes(3, payload)
