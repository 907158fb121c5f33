"""Segmented point-tile encoder: every tile of a bucket in ONE vectorized
pass — no per-tile Python loop at all.

The per-tile kernels (stages/encode.py) leave ~15-20µs/tile of Python/
allocator overhead, which dominates z12-grade workloads where tiles are
tiny and tile count approaches row count. This kernel computes every byte
offset for the whole bucket with NumPy (features, per-tile layer headers,
key tables, value tables with lang entries spliced at their interning
positions) and materializes a single buffer, sliced per tile at the end.

Byte-identical to encode_point_tile / the scalar builders (asserted in
tests); the interning math is the closed form of vtzero's sequential
first-occurrence order (builder_impl.hpp:104-147) evaluated per tile:

    url_idx(r)   = r + #{langs with first_rank < r}
    lang_idx(f)  = f + 1 + #{langs with first_rank < f}
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..mvt.pbf import encode_varint, varint_lengths_np
from ..runtime import tune_allocator
from .encode import (_binary_parts, _encode_point_tile_small,
                     write_varints_at, zigzag32_np)

_BIG = np.int64(1 << 60)


def encode_feature_section(fid: np.ndarray, px: np.ndarray, py: np.ndarray,
                           uv: np.ndarray, lv: np.ndarray,
                           id_first: bool = False) -> bytes:
    """Feature messages (type+id+geom+tags) for single-point features with
    PRE-RESOLVED value indexes — the vectorized core shared with the salted
    shard encoder (whose indexes come from the distributed plan).

    ``id_first`` mirrors GeometryFeatureBuilder's field order (id before
    type, builder.py:487 / vtzero's copy path) instead of the typed
    builders' type-before-id — needed for byte-identity with the scalar
    filter/re-encode copy path."""
    fid = fid.astype(np.uint64)
    zzx = zigzag32_np(px)
    zzy = zigzag32_np(py)
    uv = uv.astype(np.uint64)
    lv = lv.astype(np.uint64)
    l_id = varint_lengths_np(fid)
    l_zzx = varint_lengths_np(zzx)
    l_zzy = varint_lengths_np(zzy)
    geom_len = 1 + l_zzx + l_zzy
    l_geomlen = varint_lengths_np(geom_len.astype(np.uint64))
    l_uv = varint_lengths_np(uv)
    l_lv = varint_lengths_np(lv)
    tags_len = 2 + l_uv + l_lv
    l_tagslen = varint_lengths_np(tags_len.astype(np.uint64))
    body_len = 2 + 1 + l_id + 1 + l_geomlen + geom_len + 1 + l_tagslen + tags_len
    l_bodylen = varint_lengths_np(body_len.astype(np.uint64))
    feat_total = 1 + l_bodylen + body_len
    starts = np.zeros(fid.shape[0] + 1, dtype=np.int64)
    np.cumsum(feat_total, out=starts[1:])
    buf = np.zeros(int(starts[-1]), dtype=np.uint8)
    o = starts[:-1]
    buf[o] = 0x12
    write_varints_at(buf, o + 1, body_len.astype(np.uint64), l_bodylen)
    o = o + 1 + l_bodylen
    if id_first:
        buf[o] = 0x08
        write_varints_at(buf, o + 1, fid, l_id)
        o = o + 1 + l_id
        buf[o] = 0x18
        buf[o + 1] = 1
        o = o + 2
    else:
        buf[o] = 0x18
        buf[o + 1] = 1
        o = o + 2
        buf[o] = 0x08
        write_varints_at(buf, o + 1, fid, l_id)
        o = o + 1 + l_id
    buf[o] = 0x22
    write_varints_at(buf, o + 1, geom_len.astype(np.uint64), l_geomlen)
    o = o + 1 + l_geomlen
    buf[o] = 0x09
    write_varints_at(buf, o + 1, zzx, l_zzx)
    write_varints_at(buf, o + 1 + l_zzx, zzy, l_zzy)
    o = o + 1 + l_zzx + l_zzy
    buf[o] = 0x12
    write_varints_at(buf, o + 1, tags_len.astype(np.uint64), l_tagslen)
    o = o + 1 + l_tagslen
    buf[o] = 0x00
    write_varints_at(buf, o + 1, uv, l_uv)
    o = o + 1 + l_uv
    buf[o] = 0x01
    write_varints_at(buf, o + 1, lv, l_lv)
    return buf.tobytes()


def encode_url_value_entries(url_pa: pa.Array) -> bytes:
    """Framed value-table entries (0x22 len 0x0a len str) for a url column,
    in order — the shard encoder's url segment, built in C++."""
    if isinstance(url_pa, pa.ChunkedArray):
        url_pa = url_pa.combine_chunks()
    if pa.types.is_string(url_pa.type) or pa.types.is_large_string(url_pa.type):
        url_pa = url_pa.cast(pa.binary())
    _, _, u_len = _binary_parts(url_pa)
    n = len(url_pa)
    l_slen = varint_lengths_np(u_len.astype(np.uint64))
    entry_len = 1 + l_slen + u_len
    l_elen = varint_lengths_np(entry_len.astype(np.uint64))
    pfx_total = 2 + l_elen + l_slen
    p_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(pfx_total, out=p_starts[1:])
    pbuf = np.zeros(int(p_starts[-1]), dtype=np.uint8)
    po = p_starts[:-1]
    pbuf[po] = 0x22
    write_varints_at(pbuf, po + 1, entry_len.astype(np.uint64), l_elen)
    po = po + 1 + l_elen
    pbuf[po] = 0x0A
    write_varints_at(pbuf, po + 1, u_len.astype(np.uint64), l_slen)
    prefix_arr = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(p_starts.astype(np.int32).tobytes()),
         pa.py_buffer(pbuf.tobytes())],
    )
    entries = pa.compute.binary_join_element_wise(prefix_arr, url_pa, b"")
    e_data, e_off, _ = _binary_parts(entries)
    total = int(e_off[-1] - e_off[0]) + int(u_len[-1] + pfx_total[-1]) if n else 0
    # entries are contiguous; slice from first offset through the end
    end = int(e_off[-1]) + int((1 + l_elen[-1] + entry_len[-1])) if n else 0
    return e_data[int(e_off[0]):end].tobytes()


def encode_point_tiles_segmented(
    starts: np.ndarray,          # (T+1,) feature index bounds per tile (sorted bucket)
    feature_ids: np.ndarray,     # (n,) uint64, sorted by (tile, doc_id)
    px: np.ndarray,
    py: np.ndarray,
    url_arr: pa.Array,
    lang_arr: pa.Array,
    layer_name: bytes = b"pages",
    version: int = 2,
    extent: int = 4096,
    id_first: bool = False,
) -> list[bytes]:
    tune_allocator()
    n = feature_ids.shape[0]
    T = starts.shape[0] - 1
    counts = (starts[1:] - starts[:-1]).astype(np.int64)
    tid = np.repeat(np.arange(T, dtype=np.int64), counts)
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts[:-1].astype(np.int64), counts)

    # ---- lang coding (bucket-global dictionary, per-tile first ranks) ----
    if isinstance(lang_arr, pa.ChunkedArray):
        lang_arr = lang_arr.combine_chunks()
    d = pa.compute.dictionary_encode(lang_arr)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy().astype(np.int64)
    lang_bytes = [s.encode("utf-8") if isinstance(s, str) else s
                  for s in d.dictionary.to_pylist()]
    K = len(lang_bytes)

    FR = np.full((T, K), _BIG, dtype=np.int64)
    np.minimum.at(FR, (tid, codes), rank)

    # per-feature: #langs first-seen strictly before this feature's url add
    langs_before = np.zeros(n, dtype=np.int64)
    for l in range(K):
        langs_before += FR[tid, l] < rank
    url_vidx = rank + langs_before

    # per (tile, lang): value index; present mask
    present = FR < _BIG
    lb_tl = np.zeros((T, K), dtype=np.int64)
    for l2 in range(K):
        lb_tl += FR[:, l2][:, None] < FR
    lang_vidx_tl = FR + 1 + lb_tl           # valid only where present
    lang_vidx_feat = lang_vidx_tl[tid, codes]

    # ---- per-feature byte sizes ----
    fid = feature_ids.astype(np.uint64)
    zzx = zigzag32_np(px)
    zzy = zigzag32_np(py)
    l_id = varint_lengths_np(fid)
    l_zzx = varint_lengths_np(zzx)
    l_zzy = varint_lengths_np(zzy)
    geom_len = 1 + l_zzx + l_zzy
    l_geomlen = varint_lengths_np(geom_len.astype(np.uint64))
    uv = url_vidx.astype(np.uint64)
    lv = lang_vidx_feat.astype(np.uint64)
    l_uv = varint_lengths_np(uv)
    l_lv = varint_lengths_np(lv)
    tags_len = 2 + l_uv + l_lv
    l_tagslen = varint_lengths_np(tags_len.astype(np.uint64))
    body_len = 2 + 1 + l_id + 1 + l_geomlen + geom_len + 1 + l_tagslen + tags_len
    l_bodylen = varint_lengths_np(body_len.astype(np.uint64))
    feat_total = 1 + l_bodylen + body_len

    feats_per_tile = np.zeros(T, dtype=np.int64)
    np.add.at(feats_per_tile, tid, feat_total)

    # ---- value-table entry sizes ----
    url_pa = url_arr.combine_chunks() if isinstance(url_arr, pa.ChunkedArray) else url_arr
    if pa.types.is_string(url_pa.type) or pa.types.is_large_string(url_pa.type):
        url_pa = url_pa.cast(pa.binary())
    u_data, u_off, u_len = _binary_parts(url_pa)
    l_slen = varint_lengths_np(u_len.astype(np.uint64))
    entry_len = 1 + l_slen + u_len
    l_elen = varint_lengths_np(entry_len.astype(np.uint64))
    url_ventry = 1 + l_elen + entry_len      # 0x22 len 0x0a len str

    lang_entry_bytes = []
    for lbts in lang_bytes:
        e = b"\x0a" + encode_varint(len(lbts)) + lbts
        lang_entry_bytes.append(b"\x22" + encode_varint(len(e)) + e)
    lang_entry_len = np.array([len(b) for b in lang_entry_bytes], dtype=np.int64)

    vals_per_tile = np.zeros(T, dtype=np.int64)
    np.add.at(vals_per_tile, tid, url_ventry)
    lang_tiles, lang_ls = np.nonzero(present)
    np.add.at(vals_per_tile, lang_tiles, lang_entry_len[lang_ls])

    # ---- per-tile framing ----
    header = (b"\x78" + encode_varint(version)
              + b"\x0a" + encode_varint(len(layer_name)) + layer_name
              + b"\x28" + encode_varint(extent))
    keys = b"\x1a\x03url\x1a\x04lang"
    payload = len(header) + feats_per_tile + len(keys) + vals_per_tile
    l_payload = varint_lengths_np(payload.astype(np.uint64))
    tile_total = 1 + l_payload + payload
    tile_start = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(tile_total, out=tile_start[1:])
    buf = np.zeros(int(tile_start[-1]), dtype=np.uint8)

    # tile wrappers + headers + keys (headers/keys via tiled template)
    to = tile_start[:-1]
    buf[to] = 0x1A
    write_varints_at(buf, to + 1, payload.astype(np.uint64), l_payload)
    hdr_np = np.frombuffer(header, dtype=np.uint8)
    keys_np = np.frombuffer(keys, dtype=np.uint8)
    hdr_off = to + 1 + l_payload
    idx = (hdr_off[:, None] + np.arange(len(header))[None, :]).ravel()
    buf[idx] = np.tile(hdr_np, T)
    feats_off_tile = hdr_off + len(header)
    keys_off = feats_off_tile + feats_per_tile
    idx = (keys_off[:, None] + np.arange(len(keys))[None, :]).ravel()
    buf[idx] = np.tile(keys_np, T)
    vals_off_tile = keys_off + len(keys)

    # ---- feature section scatters ----
    cfeat = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(feat_total, out=cfeat[1:])
    within = cfeat[:-1] - np.repeat(cfeat[starts[:-1]], counts)
    o = feats_off_tile[tid] + within
    buf[o] = 0x12
    write_varints_at(buf, o + 1, body_len.astype(np.uint64), l_bodylen)
    o = o + 1 + l_bodylen
    if id_first:
        buf[o] = 0x08
        write_varints_at(buf, o + 1, fid, l_id)
        o = o + 1 + l_id
        buf[o] = 0x18
        buf[o + 1] = 1
        o = o + 2
    else:
        buf[o] = 0x18
        buf[o + 1] = 1
        o = o + 2
        buf[o] = 0x08
        write_varints_at(buf, o + 1, fid, l_id)
        o = o + 1 + l_id
    buf[o] = 0x22
    write_varints_at(buf, o + 1, geom_len.astype(np.uint64), l_geomlen)
    o = o + 1 + l_geomlen
    buf[o] = 0x09
    write_varints_at(buf, o + 1, zzx, l_zzx)
    write_varints_at(buf, o + 1 + l_zzx, zzy, l_zzy)
    o = o + 1 + l_zzx + l_zzy
    buf[o] = 0x12
    write_varints_at(buf, o + 1, tags_len.astype(np.uint64), l_tagslen)
    o = o + 1 + l_tagslen
    buf[o] = 0x00
    write_varints_at(buf, o + 1, uv, l_uv)
    o = o + 1 + l_uv
    buf[o] = 0x01
    write_varints_at(buf, o + 1, lv, l_lv)

    # ---- value tables ----
    # url entries framed once for the whole bucket in C++ (prefix ++ url via
    # binary_join_element_wise; a byte-level numpy scatter here measured
    # ~30x slower on big tiles), then per tile the entry blob is copied in
    # RUNS between the <=K lang splice points.
    pfx_total = 2 + l_elen + l_slen
    p_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(pfx_total, out=p_starts[1:])
    if p_starts[-1] >= 2**31:
        raise MemoryError("value-table prefixes exceed 2 GiB in one bucket; shard it")
    pbuf = np.zeros(int(p_starts[-1]), dtype=np.uint8)
    po = p_starts[:-1]
    pbuf[po] = 0x22
    write_varints_at(pbuf, po + 1, entry_len.astype(np.uint64), l_elen)
    po = po + 1 + l_elen
    pbuf[po] = 0x0A
    write_varints_at(pbuf, po + 1, u_len.astype(np.uint64), l_slen)
    prefix_arr = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(p_starts.astype(np.int32).tobytes()),
         pa.py_buffer(pbuf.tobytes())],
    )
    entries = pa.compute.binary_join_element_wise(prefix_arr, url_pa, b"")
    e_data, e_off0, _ = _binary_parts(entries)
    base = int(e_off0[0])
    ue_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(url_ventry, out=ue_off[1:])
    ue_off += base

    # per-tile lang splice plan: (value index, code) sorted per tile
    lang_np = np.frombuffer(b"".join(lang_entry_bytes), dtype=np.uint8) \
        if lang_entry_bytes else np.empty(0, np.uint8)
    lang_off = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(lang_entry_len, out=lang_off[1:])
    lv_sorted_idx = np.lexsort((lang_vidx_tl[lang_tiles, lang_ls], lang_tiles))
    lt = lang_tiles[lv_sorted_idx]
    ll = lang_ls[lv_sorted_idx]
    lg = lang_vidx_tl[lt, ll]
    lang_ptr = np.searchsorted(lt, np.arange(T + 1))

    starts_l = starts.astype(np.int64)
    for t in range(T):
        out_pos = int(vals_off_tile[t])
        s_feat = int(starts_l[t])
        prev = s_feat
        k0, k1 = int(lang_ptr[t]), int(lang_ptr[t + 1])
        for j in range(k0, k1):
            gpos = int(lg[j])
            urls_before = s_feat + gpos - (j - k0)
            if urls_before > prev:
                a, b = int(ue_off[prev]), int(ue_off[urls_before])
                buf[out_pos:out_pos + b - a] = e_data[a:b]
                out_pos += b - a
                prev = urls_before
            c0, c1 = int(lang_off[ll[j]]), int(lang_off[ll[j] + 1])
            buf[out_pos:out_pos + c1 - c0] = lang_np[c0:c1]
            out_pos += c1 - c0
        e_feat = int(starts_l[t + 1])
        if e_feat > prev:
            a, b = int(ue_off[prev]), int(ue_off[e_feat])
            buf[out_pos:out_pos + b - a] = e_data[a:b]

    raw = buf.tobytes()
    return [raw[tile_start[t]:tile_start[t + 1]] for t in range(T)]


def encode_sorted_point_tiles(
    starts: np.ndarray,
    feature_ids: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
    url_arr: pa.Array,
    lang_arr: pa.Array,
    layer_name: bytes = b"pages",
    extent: int = 4096,
    id_first: bool = False,
) -> list[bytes]:
    """Segmented vectorized encode PLUS the exact interning-conflict
    fallback, factored out of PointTileAssembler so every producer of
    sorted point-feature segments (the tile shuffle, overzoom re-encode)
    shares ONE byte-identical path.

    The closed-form interning indexes assume per-tile-distinct urls and
    url∩lang=∅; violations are detected exactly (one dictionary-encode +
    one int64 sort per call) and only the offending tiles re-encode
    through the scalar interning path (_encode_point_tile_small — imported
    at module scope: this body runs in Ray workers under ship-by-value,
    where function-local package imports fail).
    """
    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    if isinstance(lang_arr, pa.ChunkedArray):
        lang_arr = lang_arr.combine_chunks()
    mvts = encode_point_tiles_segmented(
        starts, feature_ids.astype(np.uint64), px, py, url_arr, lang_arr,
        layer_name=layer_name, extent=extent, id_first=id_first,
    )
    counts = (starts[1:] - starts[:-1]).astype(np.int64)
    tidf = np.repeat(np.arange(len(mvts), dtype=np.int64), counts)
    ucodes = pa.compute.dictionary_encode(url_arr)
    if isinstance(ucodes, pa.ChunkedArray):
        ucodes = ucodes.combine_chunks()
    ucodes = ucodes.indices.to_numpy().astype(np.int64)
    key = tidf * (int(ucodes.max()) + 2) + ucodes
    skey = np.sort(key)
    bad_keys = skey[1:][skey[1:] == skey[:-1]]
    bad = set((bad_keys // (int(ucodes.max()) + 2)).tolist())
    lang_vals = pa.compute.unique(lang_arr)
    coll = pa.compute.is_in(url_arr, value_set=lang_vals)
    if pa.compute.any(coll).as_py():
        coll_np = coll.to_numpy(zero_copy_only=False)
        bad |= set(np.unique(tidf[coll_np]).tolist())
    if bad:
        urls_py = url_arr.to_pylist()
        langs_py = lang_arr.to_pylist()
        for t in sorted(bad):
            s, e = int(starts[t]), int(starts[t + 1])
            mvts[t] = _encode_point_tile_small(
                [int(v) for v in feature_ids[s:e]],
                [int(v) for v in px[s:e]], [int(v) for v in py[s:e]],
                urls_py[s:e], langs_py[s:e],
                layer_name, 2, extent,
            )
    return mvts
