"""Tile encode stage: features grouped by (z,x,y) → serialized MVT bytes.

Two paths, byte-identical output:

1. ``encode_point_tile`` — the HOT kernel for the flagship pipeline
   (single-point features with string properties). Fully vectorized: all
   varints for the features section, the value table and the key table are
   written with NumPy scatter passes; there is no per-feature Python loop.
   Replicates vtzero's builder byte layout exactly (feature wire order
   type→id→geometry→tags per /root/reference/include/vtzero/builder.hpp:
   587-600; interning order = per-feature property add order per
   builder_impl.hpp:104-147).

2. ``TileEncoder`` — general map_groups callable using the scalar
   LayerBuilder (arbitrary geometry types / property sets).

Skew note (SURVEY.md §4): groups are whole tiles; hot tiles are handled by
the salted split in pipelines/tiling.py which pre-encodes geometry before
the shuffle and merges partial layers via property re-interning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..runtime import tune_allocator

tune_allocator()

from ..mvt import codec
from ..mvt.builder import LayerBuilder, TileBuilder
from ..mvt.pbf import (encode_varint, field_bytes, field_varint,
                        varint_lengths_np)
from ..mvt import values as mval

_U7 = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def _ragged_arange(lengths: np.ndarray) -> np.ndarray:
    """[3,1,2] → [0,1,2, 0, 0,1]."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - lengths, lengths)


def write_varints_at(buf: np.ndarray, offsets: np.ndarray, values: np.ndarray,
                     lens: np.ndarray) -> None:
    """Scatter varint encodings of ``values`` into ``buf`` at ``offsets``.

    Vectorized over values; loops only over byte positions (≤10 passes).
    """
    shifted = values.astype(np.uint64, copy=True)
    maxlen = int(lens.max()) if lens.size else 0
    for k in range(maxlen):
        mask = lens > k
        byte = (shifted[mask] & _MASK7).astype(np.uint8)
        cont = ((lens[mask] > k + 1).astype(np.uint8)) << np.uint8(7)
        buf[offsets[mask] + k] = byte | cont
        shifted >>= _U7


def scatter_bytes(buf: np.ndarray, dst_offsets: np.ndarray,
                  src: np.ndarray, src_offsets: np.ndarray,
                  lengths: np.ndarray) -> None:
    """Copy ragged byte slices src[src_offsets[i]:+len[i]] → buf[dst_offsets[i]:]."""
    ra = _ragged_arange(lengths)
    idx_dst = np.repeat(dst_offsets, lengths) + ra
    idx_src = np.repeat(src_offsets, lengths) + ra
    buf[idx_dst] = src[idx_src]


def _binary_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """pyarrow string/binary array → (data uint8, offsets int64, lengths)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    else:
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32).astype(np.int64)
    off = off[arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, off[:-1], (off[1:] - off[:-1])


def zigzag32_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int32, copy=False)
    return (((v.astype(np.uint32) << np.uint32(1)) ^ (v >> 31).astype(np.uint32))
            .astype(np.uint64))


def interleaved_value_indexes(n: int, lang_codes: np.ndarray,
                              n_langs: int) -> tuple[np.ndarray, np.ndarray]:
    """Value-table indexes when each feature interns (url_i, lang_i) in order.

    urls are all distinct; langs repeat. Index of url_i = i + (# langs first
    seen before feature i); index of lang j = first_i[j] + 1 + (# langs first
    seen strictly before it). Replicates sequential add_value order
    (builder_impl.hpp:104-147) without a sequential loop.
    """
    first_i = np.full(n_langs, n, dtype=np.int64)
    # first occurrence feature index per lang code
    rev = np.arange(n - 1, -1, -1)
    first_i_rev = np.full(n_langs, -1, dtype=np.int64)
    first_i_rev[lang_codes[rev]] = rev  # last write wins = first occurrence
    first_i = first_i_rev
    order = np.argsort(first_i, kind="stable")
    rank = np.empty(n_langs, dtype=np.int64)
    rank[order] = np.arange(n_langs)
    lang_vidx_per_code = first_i + 1 + rank
    # langs first seen before feature i: count of first_i < i
    counts = np.searchsorted(np.sort(first_i), np.arange(n), side="left")
    url_vidx = np.arange(n, dtype=np.int64) + counts
    return url_vidx.astype(np.uint64), lang_vidx_per_code.astype(np.uint64)


SMALL_TILE_CUTOFF = 48


def _has_interning_conflict(url_arr, lang_arr, n: int) -> bool:
    """True iff the closed-form interning precondition is violated: a
    duplicate url within the tile, or a url equal to a lang string. One
    hash pass (count_distinct + is_in against the tiny lang set)."""
    if not isinstance(url_arr, (pa.Array, pa.ChunkedArray)):
        url_arr = pa.array(list(url_arr), pa.string())
    if not isinstance(lang_arr, (pa.Array, pa.ChunkedArray)):
        lang_arr = pa.array(list(lang_arr), pa.string())
    if pa.compute.count_distinct(url_arr).as_py() != n:
        return True
    langs = pa.compute.unique(lang_arr)
    if pa.types.is_binary(url_arr.type) or pa.types.is_large_binary(url_arr.type):
        langs = langs.cast(url_arr.type if isinstance(url_arr, pa.Array)
                           else url_arr.type)
    hit = pa.compute.any(pa.compute.is_in(url_arr, value_set=langs))
    return bool(hit.as_py())


def _encode_point_tile_small(fids, pxs, pys, urls, langs,
                             layer_name: bytes, version: int, extent: int) -> bytes:
    """Pure-Python fast path for tiny tiles (byte-identical to the
    vectorized kernel). NumPy's per-op dispatch costs ~0.4ms on a
    3-feature tile; straight-line Python does it in ~20µs — and tiny tiles
    dominate tile COUNT at high zooms even when they don't dominate rows.
    """
    feats = bytearray()
    values: list[bytes] = []
    vidx: dict[bytes, int] = {}
    for fid, x, y, url, lang in zip(fids, pxs, pys, urls, langs):
        ub = url.encode() if isinstance(url, str) else url
        ui = vidx.get(ub)
        if ui is None:
            ui = len(values)
            vidx[ub] = ui
            values.append(ub)
        lb = lang.encode() if isinstance(lang, str) else lang
        li = vidx.get(lb)
        if li is None:
            li = len(values)
            vidx[lb] = li
            values.append(lb)
        zx = ((x << 1) ^ (x >> 31)) & 0xFFFFFFFF
        zy = ((y << 1) ^ (y >> 31)) & 0xFFFFFFFF
        geom = (b"\x09"
                + (bytes((zx,)) if zx < 128 else encode_varint(zx))
                + (bytes((zy,)) if zy < 128 else encode_varint(zy)))
        tags = (b"\x00" + (bytes((ui,)) if ui < 128 else encode_varint(ui))
                + b"\x01" + (bytes((li,)) if li < 128 else encode_varint(li)))
        body = (b"\x18\x01\x08" + encode_varint(fid)
                + b"\x22" + bytes((len(geom),)) + geom
                + b"\x12" + bytes((len(tags),)) + tags)
        feats += b"\x12" + encode_varint(len(body)) + body
    header = (b"\x78" + encode_varint(version)
              + b"\x0a" + encode_varint(len(layer_name)) + layer_name
              + b"\x28" + encode_varint(extent))
    keys = b"\x1a\x03url\x1a\x04lang"
    vbuf = bytearray()
    for s in values:
        entry = b"\x0a" + encode_varint(len(s)) + s
        vbuf += b"\x22" + encode_varint(len(entry)) + entry
    payload = header + bytes(feats) + keys + bytes(vbuf)
    return b"\x1a" + encode_varint(len(payload)) + payload


def encode_point_tile(
    feature_ids: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
    url_arr: pa.Array,
    lang_arr: pa.Array,
    layer_name: bytes = b"pages",
    version: int = 2,
    extent: int = 4096,
) -> bytes:
    """Vectorized single-point-feature layer+tile encoder (hot kernel).

    Features must already be in deterministic order (sorted by feature id).
    Properties per feature: url (key idx 0), lang (key idx 1).
    Small tiles dispatch to the pure-Python fast path (identical bytes).
    """
    n = feature_ids.shape[0]
    if n > SMALL_TILE_CUTOFF and _has_interning_conflict(url_arr, lang_arr, n):
        # closed-form value indexes assume per-tile-distinct urls disjoint
        # from lang strings; conflicting tiles take the scalar interning path
        return _encode_point_tile_small(
            [int(v) for v in feature_ids],
            [int(v) for v in px],
            [int(v) for v in py],
            url_arr.to_pylist() if isinstance(url_arr, (pa.Array, pa.ChunkedArray)) else list(url_arr),
            lang_arr.to_pylist() if isinstance(lang_arr, (pa.Array, pa.ChunkedArray)) else list(lang_arr),
            layer_name, version, extent,
        )
    if n <= SMALL_TILE_CUTOFF:
        return _encode_point_tile_small(
            [int(v) for v in feature_ids],
            [int(v) for v in px],
            [int(v) for v in py],
            url_arr.to_pylist() if isinstance(url_arr, (pa.Array, pa.ChunkedArray)) else list(url_arr),
            lang_arr.to_pylist() if isinstance(lang_arr, (pa.Array, pa.ChunkedArray)) else list(lang_arr),
            layer_name, version, extent,
        )
    fid = feature_ids.astype(np.uint64)
    zzx = zigzag32_np(px)
    zzy = zigzag32_np(py)

    # value table index assignment (url, lang interleaved per feature);
    # arrow dictionary_encode gives first-occurrence codes in C++ (string
    # comparisons in numpy measured 50ms+ per 100k rows)
    if not isinstance(lang_arr, (pa.Array, pa.ChunkedArray)):
        lang_arr = pa.array(list(lang_arr), pa.string())
    dict_arr = pa.compute.dictionary_encode(lang_arr)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    lang_codes = dict_arr.indices.to_numpy().astype(np.int64)
    lang_uniques = dict_arr.dictionary.to_pylist()
    n_langs = len(lang_uniques)
    url_vidx, lang_vidx_per_code = interleaved_value_indexes(n, lang_codes, n_langs)
    lang_vidx = lang_vidx_per_code[lang_codes]

    # varint lengths
    l_id = varint_lengths_np(fid)
    l_zzx = varint_lengths_np(zzx)
    l_zzy = varint_lengths_np(zzy)
    geom_len = 1 + l_zzx + l_zzy
    l_geomlen = varint_lengths_np(geom_len.astype(np.uint64))
    l_uv = varint_lengths_np(url_vidx)
    l_lv = varint_lengths_np(lang_vidx)
    tags_len = 1 + l_uv + 1 + l_lv  # key idx 0 and 1 are single-byte varints
    l_tagslen = varint_lengths_np(tags_len.astype(np.uint64))
    body_len = (
        2                      # type field: 0x18, value
        + 1 + l_id             # id field
        + 1 + l_geomlen + geom_len
        + 1 + l_tagslen + tags_len
    )
    l_bodylen = varint_lengths_np(body_len.astype(np.uint64))
    feat_total = 1 + l_bodylen + body_len
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(feat_total, out=starts[1:])
    buf = np.zeros(int(starts[-1]), dtype=np.uint8)

    o = starts[:-1]
    buf[o] = 0x12                                   # layer.features field
    write_varints_at(buf, o + 1, body_len.astype(np.uint64), l_bodylen)
    o = o + 1 + l_bodylen
    buf[o] = 0x18                                   # feature.type
    buf[o + 1] = 1                                  # GeomType.POINT
    o = o + 2
    buf[o] = 0x08                                   # feature.id
    write_varints_at(buf, o + 1, fid, l_id)
    o = o + 1 + l_id
    buf[o] = 0x22                                   # feature.geometry (packed)
    write_varints_at(buf, o + 1, geom_len.astype(np.uint64), l_geomlen)
    o = o + 1 + l_geomlen
    buf[o] = 0x09                                   # MoveTo(1)
    write_varints_at(buf, o + 1, zzx, l_zzx)
    write_varints_at(buf, o + 1 + l_zzx, zzy, l_zzy)
    o = o + 1 + l_zzx + l_zzy
    buf[o] = 0x12                                   # feature.tags (packed)
    write_varints_at(buf, o + 1, tags_len.astype(np.uint64), l_tagslen)
    o = o + 1 + l_tagslen
    buf[o] = 0x00                                   # key index 0 ("url")
    write_varints_at(buf, o + 1, url_vidx, l_uv)
    o = o + 1 + l_uv
    buf[o] = 0x01                                   # key index 1 ("lang")
    write_varints_at(buf, o + 1, lang_vidx, l_lv)

    features_section = buf.tobytes()

    # keys table (insertion order: url, lang — first feature's adds)
    keys_data = field_bytes(3, b"url") + field_bytes(3, b"lang")

    # values table: url entries framed in C++ (prefix ++ url via
    # binary_join_element_wise — byte-level numpy scatter measured 5x
    # slower), lang entries spliced at their assigned indexes
    url_pa = url_arr if isinstance(url_arr, pa.Array) else url_arr.combine_chunks()
    if pa.types.is_string(url_pa.type) or pa.types.is_large_string(url_pa.type):
        url_pa = url_pa.cast(pa.binary())
    _, _, u_len = _binary_parts(url_pa)
    l_strlen = varint_lengths_np(u_len.astype(np.uint64))
    entry_len = 1 + l_strlen + u_len                # 0x0a + varint(len) + str
    l_entrylen = varint_lengths_np(entry_len.astype(np.uint64))
    pfx_total = 2 + l_entrylen + l_strlen           # 0x22 varint 0x0a varint
    p_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(pfx_total, out=p_starts[1:])
    pbuf = np.zeros(int(p_starts[-1]), dtype=np.uint8)
    po = p_starts[:-1]
    pbuf[po] = 0x22                                 # layer.values field
    write_varints_at(pbuf, po + 1, entry_len.astype(np.uint64), l_entrylen)
    po = po + 1 + l_entrylen
    pbuf[po] = 0x0A                                 # value.string_value
    write_varints_at(pbuf, po + 1, u_len.astype(np.uint64), l_strlen)
    prefix_arr = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(p_starts.astype(np.int32).tobytes()
                            if p_starts[-1] < 2**31 else p_starts.tobytes()),
         pa.py_buffer(pbuf.tobytes())],
    ) if p_starts[-1] < 2**31 else None
    if prefix_arr is None:  # >2GiB table: fall back to large_binary path
        raise MemoryError("value table exceeds 2 GiB in one tile; shard it")
    entries = pa.compute.binary_join_element_wise(prefix_arr, url_pa, b"")
    e_data, e_off, _ = _binary_parts(entries)
    base = int(e_off[0])
    # splice lang entries at their global indexes: url entries fill all
    # other positions in order → cut the url blob at the byte offsets of
    # the urls that FOLLOW each lang position
    url_entry_sizes = pfx_total + u_len
    url_entry_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(url_entry_sizes, out=url_entry_starts[1:])
    url_entry_starts += base
    lang_entries = []
    for li, lang in enumerate(lang_uniques):
        lb = lang.encode("utf-8") if isinstance(lang, str) else lang
        entry = b"\x0a" + encode_varint(len(lb)) + lb
        lang_entries.append(b"\x22" + encode_varint(len(entry)) + entry)
    # lang at global index g means: g urls... no — langs before it too.
    # number of URL entries before lang position g = g - (#langs before g)
    lang_positions = sorted(
        (int(lang_vidx_per_code[li]), li) for li in range(n_langs)
    )
    pieces = []
    prev_urls = 0
    for rank, (gpos, li) in enumerate(lang_positions):
        urls_before = gpos - rank
        pieces.append(e_data[url_entry_starts[prev_urls]:url_entry_starts[urls_before]])
        pieces.append(np.frombuffer(lang_entries[li], dtype=np.uint8))
        prev_urls = urls_before
    pieces.append(e_data[url_entry_starts[prev_urls]:url_entry_starts[n]])
    values_data = b"".join(p.tobytes() for p in pieces)

    header = (
        field_varint(15, version)
        + field_bytes(1, layer_name)
        + field_varint(5, extent)
    )
    payload = header + features_section + keys_data + values_data
    return field_bytes(3, payload)


def add_tile_bucket(batch: pa.Table, n_buckets: int = 256) -> pa.Table:
    """Deterministic shuffle bucket from the (z,x,y) tile key.

    Bucketing the tile keys (instead of grouping by raw (z,x,y)) keeps the
    number of shuffle groups fixed and small, so per-group scheduling
    overhead amortizes over many tiles per bucket — essential at z12+ where
    tile cardinality approaches row cardinality.
    """
    z = batch.column("z").to_numpy().astype(np.int64)
    x = batch.column("x").to_numpy().astype(np.int64)
    y = batch.column("y").to_numpy().astype(np.int64)
    h = (z * 73856093) ^ (x * 19349663) ^ (y * 83492791)
    return batch.append_column("bucket", pa.array((h % n_buckets).astype(np.int32)))


class PointTileAssembler:
    """map_groups callable: one BUCKET of point features → one tile row per
    (z,x,y) in the bucket.

    Expects columns: z, x, y, doc_id, px, py, url, lang (+bucket). Sorts by
    (z,x,y,doc_id) — doc_id order fixes the interning order so tile bytes
    are deterministic (SURVEY.md §7.4 byte-identical interning).
    """

    def __init__(self, layer_name: str = "pages", extent: int = 4096,
                 id_first: bool = False) -> None:
        self.layer_name = layer_name.encode("utf-8")
        self.extent = extent
        self.id_first = id_first
        self.__name__ = "PointTileAssembler"  # map_groups wraps plain fns
        # the filter fast path constructs assemblers INSIDE worker bodies,
        # so the segmented-encode binding must resolve without an import
        # at call time: _seg is a module-level global (bottom of this
        # file), ship-safe under by-value pickling
        self._encode_sorted = _seg.encode_sorted_point_tiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
                "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
                "n_features": pa.array([], pa.int64()),
            })
        order = pa.compute.sort_indices(
            batch,
            sort_keys=[("z", "ascending"), ("x", "ascending"),
                       ("y", "ascending"), ("doc_id", "ascending")],
        )
        batch = batch.take(order).combine_chunks()
        z = batch.column("z").to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        doc_id = batch.column("doc_id").to_numpy()
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        url = batch.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        # tile segment boundaries in the sorted bucket → ONE segmented
        # vectorized encode for every tile in the bucket (no per-tile
        # Python; see stages/encode_segmented.py)
        key_changed = np.empty(len(batch), dtype=bool)
        key_changed[0] = True
        key_changed[1:] = (z[1:] != z[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])
        seg_starts = np.flatnonzero(key_changed)
        starts = np.append(seg_starts, len(batch)).astype(np.int64)
        # segmented vectorized encode + exact interning-conflict fallback,
        # shared with the overzoom re-encode (encode_segmented.py)
        mvts = self._encode_sorted(
            starts, doc_id, px, py, url, lang,
            layer_name=self.layer_name, extent=self.extent,
            id_first=self.id_first,
        )
        return pa.table(
            {
                "z": pa.array(z[seg_starts].astype(np.int32)),
                "x": pa.array(x[seg_starts].astype(np.int32)),
                "y": pa.array(y[seg_starts].astype(np.int32)),
                "mvt": pa.array(mvts, pa.binary()),
                "n_features": pa.array(starts[1:] - starts[:-1]),
            }
        )


class TileEncoder:
    """General map_groups encoder via the scalar builders (any geometry).

    Expects columns: z, x, y, layer, feature_id, geom_type, parts (list of
    (n,2) coords per part), prop_keys, prop_vals. Used by re-encode /
    filter pipelines and tests; the flagship hot path is PointTileAssembler.
    """

    def __init__(self, extent: int = 4096, version: int = 2) -> None:
        self.extent = extent
        self.version = version
        self.__name__ = "TileEncoder"  # map_groups wraps plain fns

    def __call__(self, df):
        import pandas as pd

        df = df.sort_values(["layer", "feature_id"], kind="stable")
        z, x, y = int(df["z"].iloc[0]), int(df["x"].iloc[0]), int(df["y"].iloc[0])
        tb = TileBuilder()
        for layer_name, g in df.groupby("layer", sort=True):
            lb = tb.add_layer(str(layer_name), self.version, self.extent)
            for _, row in g.iterrows():
                self._add_feature(lb, row)
        data = tb.serialize()
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "mvt": [data], "n_features": [len(df)]}
        )

    @staticmethod
    def _add_feature(lb: LayerBuilder, row) -> None:
        parts = [np.asarray(p) for p in row["parts"]]
        cmds = codec.encode_geometry(int(row["geom_type"]), parts)
        props = []
        for k, v in zip(row.get("prop_keys", []) or [], row.get("prop_vals", []) or []):
            props.append((k, mval.encode_value(v)))
        fid = row.get("feature_id")
        lb.add_feature_encoded(
            int(row["geom_type"]), cmds,
            feature_id=None if fid is None else int(fid),
            props=props,
        )


# imported at the BOTTOM so encode_segmented's own module-level
# `from .encode import ...` names are already defined in either import
# order (module-object form keeps the pair cycle-safe; cloudpickle's
# by-value module pickle terminates because encode_segmented's globals
# hold only leaf functions, never this module)
from . import encode_segmented as _seg  # noqa: E402
