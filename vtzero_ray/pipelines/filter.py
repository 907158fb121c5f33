"""Filter / re-encode pipelines — vtzero-streets / vtzero-filter parity
(SURVEY.md §3.3): read-modify-write with OPAQUE geometry passthrough (T7,
geometry blobs copied without decoding) and property re-interning via the
PropertyMapper (T12).

Ray shape: decode map_batches → predicate filter → re-encode map_batches
(per-tile, stateless tasks — each input tile maps to one output tile, so
no shuffle is needed at all; this is the narrow-transform fast class).
"""

from __future__ import annotations

import logging
import struct

import pyarrow as pa

from ..exceptions import VtzeroError
from ..mvt.builder import (GeometryFeatureBuilder, PropertyMapper,
                           TileBuilder)
from ..mvt.decoder import VectorTile
from ..mvt.pbf import decode_varint, encode_varint
from ..mvt.values import encode_value

_log = logging.getLogger(__name__)


def filter_features(tiles_ds, layer_name: str, key: str, value) -> "ray.data.Dataset":
    """Keep only features in ``layer_name`` whose property key == value —
    the vtzero-streets job (examples/vtzero-streets.cpp:22-85): geometry
    blobs pass through undecoded; properties re-interned via mapper."""
    want_key = key.encode("utf-8")
    want_val = encode_value(value)

    def per_tile(batch: pa.Table) -> pa.Table:
        out = {"z": [], "x": [], "y": [], "mvt": [], "n_features": []}
        for z, x, y, mvt in zip(batch.column("z").to_pylist(),
                                batch.column("x").to_pylist(),
                                batch.column("y").to_pylist(),
                                batch.column("mvt")):
            src = VectorTile(mvt.as_py())
            layer = src.get_layer_by_name(layer_name)
            if layer is None:
                continue
            tb = TileBuilder()
            lb = tb.add_layer(layer.name, layer.version, layer.extent)
            mapper = PropertyMapper(layer, lb)
            kept = 0
            for f in layer.features():
                keep = any(k == want_key and v == want_val
                           for k, v in f.properties_raw())
                if not keep:
                    continue
                fb = GeometryFeatureBuilder(lb)
                fb.copy_id(f)
                fb.set_geometry(f.geom_type, f.geometry_data)
                fb.copy_properties(f, mapper)
                fb.commit()
                kept += 1
            if kept:
                out["z"].append(z)
                out["x"].append(x)
                out["y"].append(y)
                out["mvt"].append(tb.serialize())
                out["n_features"].append(kept)
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "mvt": pa.array(out["mvt"], pa.binary()),
            "n_features": pa.array(out["n_features"], pa.int64()),
        })

    return tiles_ds.map_batches(per_tile, batch_format="pyarrow", batch_size=None)


def _tile_layer_spans(buf: bytes, pos: int, end: int):
    """Top-level tile walk → [(lo, hi)] byte spans of each layer message.
    O(#fields) per tile — no feature or property parsing at all."""
    spans = []
    while pos < end:
        key = buf[pos]
        pos += 1
        if key & 0x80:
            raise ValueError("multi-byte tile field key")
        wt = key & 0x7
        if wt == 2:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > end:
                raise ValueError("layer overruns tile")
            if key >> 3 == 3:  # TILE_LAYERS
                spans.append((pos, pos + ln))
            pos += ln
        elif wt == 0:
            while buf[pos] & 0x80:
                pos += 1
            pos += 1
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:
            raise ValueError(f"bad wire type {wt}")
    return spans


def _layer_name_of(buf: bytes, lo: int, hi: int) -> bytes:
    """Scan a layer message's fields for field 1 (name) only."""
    pos = lo
    while pos < hi:
        key = buf[pos]
        pos += 1
        if key & 0x80:
            raise ValueError("multi-byte layer field key")
        wt = key & 0x7
        if wt == 2:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > hi:
                raise ValueError("field overruns layer")
            if key >> 3 == 1:
                return buf[pos:pos + ln]
            pos += ln
        elif wt == 0:
            while buf[pos] & 0x80:
                pos += 1
            pos += 1
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:
            raise ValueError(f"bad wire type {wt}")
    return b""


def select_layer(tiles_ds, layer_name: str):
    """vtzero-filter layer selection (examples/vtzero-filter.cpp:66-100):
    extract one layer per tile with ZERO re-encode (add_existing_layer
    verbatim copy, builder.hpp:119-132).

    Fast path: a top-level span walk finds each layer's byte range and
    name WITHOUT parsing features/properties — the output tile is one
    header + one bytes slice. Tiles that fail the structural walk fall
    back per tile to the full VectorTile parse (byte-identical output,
    asserted in tests)."""
    want = layer_name.encode("utf-8")

    def scalar_one(data: bytes):
        """Returns (picked_bytes_or_None, quarantined). Only parse-shaped
        errors quarantine the tile; anything else propagates loudly."""
        try:
            for layer in VectorTile(data).layers():
                if layer.name == want:
                    tb = TileBuilder()
                    tb.add_existing_layer(layer.data)
                    return tb.serialize(), False
        except (VtzeroError, ValueError, IndexError, struct.error):
            return None, True  # unparseable tile → quarantined (dropped)
        return None, False  # parsed fine, layer just absent

    def per_tile(batch: pa.Table) -> pa.Table:
        out = {"z": [], "x": [], "y": [], "mvt": []}
        quarantined = 0
        for z, x, y, mvt in zip(batch.column("z").to_pylist(),
                                batch.column("x").to_pylist(),
                                batch.column("y").to_pylist(),
                                batch.column("mvt")):
            data = mvt.as_py()
            try:
                picked = None
                for lo, hi in _tile_layer_spans(data, 0, len(data)):
                    if _layer_name_of(data, lo, hi) == want:
                        picked = b"\x1a" + encode_varint(hi - lo) + data[lo:hi]
                        break
            except (ValueError, IndexError):
                picked, bad = scalar_one(data)  # full-parse fallback
                quarantined += bad
            if picked is None:
                continue
            out["z"].append(z)
            out["x"].append(x)
            out["y"].append(y)
            out["mvt"].append(picked)
        if quarantined:
            _log.warning("select_layer: quarantined %d unparseable tile(s) "
                         "in batch of %d", quarantined, batch.num_rows)
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "mvt": pa.array(out["mvt"], pa.binary()),
        })

    return tiles_ds.map_batches(per_tile, batch_format="pyarrow", batch_size=None)


def merge_tiles(a_ds, b_ds, *more, single_task: bool = False):
    """Union of N tile corpora: tiles with the same (z,x,y) merge by layer
    concatenation (add_existing_layer semantics, builder.hpp:119-132) —
    Ray ds.union + ONE bucketed shuffle regardless of corpus count
    (SURVEY §2.5 set ops). Layer order follows argument order (src tag).
    The shuffle key is the fixed-count tile bucket, not raw (z,x,y) —
    tile cardinality approaches row cardinality at z12+ (repo invariant).

    ``single_task=True`` replaces the groupby barrier with ONE
    repartition(1) merge task — the repo's output-sized-merge rule. Use
    it when the merged TILE-SPACE is bounded (z <= ~8 → <= 64k tiles):
    the groupby orchestration costs seconds on a union of many small
    blocks while the actual merge is milliseconds (measured 8.8 s vs
    0.12 s on the 343-tile z6 corpus). Both paths are byte-identical
    (asserted in TestMergeTiles)."""
    import pandas as pd

    from ..stages.encode import add_tile_bucket

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("src", kind="stable")
        tb = TileBuilder()
        for mvt in df["mvt"]:
            for view in VectorTile(mvt).layer_views():
                tb.add_existing_layer(view)
        first = df.iloc[0]
        return pd.DataFrame({
            "z": [first["z"]], "x": [first["x"]], "y": [first["y"]],
            "mvt": [tb.serialize()],
        })

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        parts = [merge_group(g) for _, g in
                 df.drop(columns=["bucket"]).groupby(["z", "x", "y"],
                                                     sort=True)]
        if not parts:
            return pd.DataFrame({
                "z": pd.Series([], dtype="int32"),
                "x": pd.Series([], dtype="int32"),
                "y": pd.Series([], dtype="int32"),
                "mvt": pd.Series([], dtype=object)})
        return pd.concat(parts, ignore_index=True)

    def tag(i):
        return lambda t: t.append_column("src", pa.array([i] * len(t), pa.int32()))

    parts = [ds.map_batches(tag(i), batch_format="pyarrow")
             for i, ds in enumerate((a_ds, b_ds, *more))]
    both = parts[0]
    for p in parts[1:]:
        both = both.union(p)
    if single_task:
        def merge_all(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["bucket"] = 0
            return merge_bucket(df)

        return both.repartition(1).map_batches(
            merge_all, batch_format="pandas", batch_size=None)
    bucketed = both.map_batches(add_tile_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


# ---------------------------------------------------------------------------
# vectorized filter/re-encode fast path (pages-schema tiles)
# ---------------------------------------------------------------------------


def _strip_string_entries(flat: pa.Array):
    """Value-table entry bytes (0x0A + varint(len) + payload) → payload
    strings, vectorized. Returns (strings, ok_mask); entries that aren't
    short string values get ok=False (caller falls back to scalar)."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.binary_length(flat).to_numpy().astype(np.int64)
    first = pc.binary_slice(flat, 0, 1)
    b0 = np.frombuffer(b"".join(first.to_pylist()), np.uint8) if len(flat) else \
        np.empty(0, np.uint8)
    second = pc.binary_slice(flat, 1, 2).to_pylist()
    b1 = np.array([s[0] if s else 0 for s in second], np.uint8)
    third = pc.binary_slice(flat, 2, 3).to_pylist()
    b2 = np.array([s[0] if s else 0 for s in third], np.uint8)
    # 0x0A tag + 1-byte len (payload < 128) or 2-byte len that TERMINATES
    # at byte 2 (payload < 16384; b2 >= 0x80 means a 3+-byte varint —
    # ok=False so the tile takes the scalar path, not silent corruption)
    one = (b0 == 0x0A) & (b1 < 0x80) & (lens >= 2)
    two = (b0 == 0x0A) & (b1 >= 0x80) & (b2 < 0x80) & (lens >= 3)
    ok = one | two
    out1 = pc.binary_slice(flat, 2, np.iinfo(np.int32).max)
    out2 = pc.binary_slice(flat, 3, np.iinfo(np.int32).max)
    sel = pc.if_else(pa.array(one), out1, out2)
    # non-ok entries (e.g. uint/double values) may slice to invalid UTF-8 —
    # blank them BEFORE the string cast so the whole batch can't fail
    sel = pc.if_else(pa.array(ok), sel, pa.scalar(b"", pa.binary()))
    return pc.cast(sel, pa.string()), ok


def filter_features_fast(tiles_ds, layer_name: str, key: str, value,
                         extent: int = 4096):
    """Vectorized vtzero-streets for pages-schema tiles: batch decode →
    Arrow predicate on the property column → segmented re-encode through
    the point-tile assembler (closed-form interning). Byte-identical to
    filter_features (asserted in tests): decode preserves feature order,
    the assembler re-interns in kept order exactly as PropertyMapper does,
    and single-point geometry re-encodes canonically. Tiles that don't
    match the pages schema (other layers, != 2 props, non-(url,lang) keys,
    long values, multi-point or malformed geometry, decode quarantine)
    fall back PER TILE to the scalar copy path — full T7/T12 semantics."""
    import numpy as np
    import pyarrow.compute as pc

    from ..mvt.decode_fast import multipoint_coords
    from ..stages.encode import PointTileAssembler
    from .decode import decode_tiles_batch_v

    if key not in ("url", "lang") or not isinstance(value, str):
        # the fast path only understands the pages (url, lang) string
        # schema — any other predicate takes the scalar copy path wholesale
        return tiles_ds.map_batches(
            _scalar_filter_batch(layer_name, key, value),
            batch_format="pyarrow", batch_size=None)

    scalar = None  # built lazily per worker

    def per_batch(batch: pa.Table) -> pa.Table:
        nonlocal scalar
        feats = decode_tiles_batch_v(batch, with_props=True,
                                     with_geometry=True)
        empty = pa.table({
            "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
            "n_features": pa.array([], pa.int64())})
        if len(feats) == 0:
            return empty
        feats = feats.combine_chunks()
        n = len(feats)
        zc = feats.column("z").to_numpy()
        xc = feats.column("x").to_numpy()
        yc = feats.column("y").to_numpy()

        # ---- per-row eligibility ----
        row_ok = (pc.equal(feats.column("layer"), layer_name).to_numpy(zero_copy_only=False)
                  & pc.equal(feats.column("n_props"), 2).to_numpy(zero_copy_only=False)
                  & feats.column("has_id").to_numpy(zero_copy_only=False)
                  & pc.is_null(feats.column("error")).to_numpy(zero_copy_only=False))
        pk = feats.column("prop_keys")
        if isinstance(pk, pa.ChunkedArray):
            pk = pk.combine_chunks()
        kflat = pk.values
        koff = pk.offsets.to_numpy().astype(np.int64)
        is_url = pc.equal(kflat, "url").to_numpy(zero_copy_only=False)
        is_lang = pc.equal(kflat, "lang").to_numpy(zero_copy_only=False)
        two = (koff[1:] - koff[:-1]) == 2
        keys_ok = np.zeros(n, dtype=bool)
        kidx = koff[:-1]
        safe = two & (kidx + 1 < koff[-1] + 1)
        keys_ok[safe] = is_url[kidx[safe]] & is_lang[kidx[safe] + 1]
        row_ok &= keys_ok

        pv = feats.column("prop_vals_raw")
        if isinstance(pv, pa.ChunkedArray):
            pv = pv.combine_chunks()
        vflat = pv.values
        voff = pv.offsets.to_numpy().astype(np.int64)
        strs, v_ok = _strip_string_entries(vflat)
        # rows with fewer than 2 property values (foreign-layer features)
        # are ineligible AND must not index past the flat value table
        has2 = (voff[1:] - voff[:-1]) >= 2
        vals_ok = np.zeros(n, dtype=bool)
        sv = safe & has2
        vals_ok[sv] = v_ok[voff[:-1][sv]] & v_ok[voff[:-1][sv] + 1]
        row_ok &= vals_ok

        feat_of, px, py, bad_geom = multipoint_coords(feats.column("geom_cmds"))
        single = np.zeros(n, dtype=np.int64)
        np.add.at(single, feat_of, 1)
        geom_ok = (single == 1) & ~bad_geom
        row_ok &= geom_ok

        # ---- per-tile eligibility (contiguous tile segments) ----
        seg = np.ones(n, dtype=bool)
        seg[1:] = (zc[1:] != zc[:-1]) | (xc[1:] != xc[:-1]) | (yc[1:] != yc[:-1])
        tile_id = np.cumsum(seg) - 1
        n_tiles = int(tile_id[-1]) + 1
        tile_ok = np.ones(n_tiles, dtype=bool)
        np.logical_and.at(tile_ok, tile_id, row_ok)

        # interning preconditions of the segmented kernel (per-tile
        # distinct urls, url∩lang=∅): violating tiles would otherwise hit
        # the assembler's type-first scalar fallback and break id-first
        # byte identity — route them to the scalar copy path instead
        # clamp take indices for rows without 2 values (they're already
        # ineligible; a garbage gather value can only mark ITS OWN tile
        # for scalar fallback, which such a tile gets anyway)
        i0 = np.where(has2, voff[:-1], 0)
        i1 = np.where(has2, voff[:-1] + 1, 0)
        if len(strs) == 0:
            urls_all = pa.array([""] * n, pa.string())
            langs_all = urls_all
        else:
            urls_all = strs.take(pa.array(i0))
            langs_all = strs.take(pa.array(i1))
        ucodes = pc.dictionary_encode(urls_all)
        if isinstance(ucodes, pa.ChunkedArray):
            ucodes = ucodes.combine_chunks()
        uc = ucodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = int(uc.max()) + 2 if n else 2
        skey = np.sort(tile_id * K + uc)
        dup_tiles = np.unique(skey[1:][skey[1:] == skey[:-1]] // K)
        tile_ok[dup_tiles] = False
        coll = pc.is_in(urls_all, value_set=pc.unique(langs_all))             .to_numpy(zero_copy_only=False)
        if coll.any():
            tile_ok[np.unique(tile_id[coll])] = False
        fast_rows = tile_ok[tile_id]

        pieces = []
        if fast_rows.any():
            # point coords per row (geom_ok rows have exactly one point)
            px_row = np.zeros(n, np.int32)
            py_row = np.zeros(n, np.int32)
            px_row[feat_of] = px
            py_row[feat_of] = py
            urls = urls_all
            langs = langs_all
            cmp_col = langs if key == "lang" else urls
            keep = fast_rows & pc.equal(
                cmp_col, value).to_numpy(zero_copy_only=False)
            if keep.any():
                ki = np.flatnonzero(keep)
                sub = pa.table({
                    "z": pa.array(zc[ki]), "x": pa.array(xc[ki]),
                    "y": pa.array(yc[ki]),
                    "doc_id": pa.array(
                        feats.column("feature_id").to_numpy()[ki]
                        .astype(np.int64)),
                    "px": pa.array(px_row[ki]), "py": pa.array(py_row[ki]),
                    "url": urls.take(pa.array(ki)),
                    "lang": langs.take(pa.array(ki)),
                })
                pieces.append(PointTileAssembler(
                    layer_name=layer_name, extent=extent,
                    id_first=True)(sub))
        if not tile_ok.all():
            # scalar fallback for ineligible tiles only
            tz = zc[seg][~tile_ok]
            tx = xc[seg][~tile_ok]
            ty = yc[seg][~tile_ok]
            bad_keys = set(zip(tz.tolist(), tx.tolist(), ty.tolist()))
            bz = batch.column("z").to_numpy()
            bx = batch.column("x").to_numpy()
            by = batch.column("y").to_numpy()
            mask = np.array([(a, b, c) in bad_keys
                             for a, b, c in zip(bz, bx, by)])
            # also route tiles that vanished from decode (fully quarantined)
            decoded = set(zip(zc[seg].tolist(), xc[seg].tolist(),
                              yc[seg].tolist()))
            mask |= np.array([(a, b, c) not in decoded
                              for a, b, c in zip(bz, bx, by)])
            if mask.any():
                if scalar is None:
                    scalar = _scalar_filter_batch(layer_name, key, value)
                pieces.append(scalar(batch.filter(pa.array(mask))))
        if not pieces:
            return empty
        return pa.concat_tables([p.select(empty.column_names) for p in pieces],
                                promote_options="permissive")

    return tiles_ds.map_batches(per_batch, batch_format="pyarrow",
                                batch_size=None)


def _scalar_filter_batch(layer_name: str, key: str, value):
    """The filter_features per-batch fn as a reusable callable."""
    want_key = key.encode("utf-8")
    want_val = encode_value(value)

    def per_tile(batch: pa.Table) -> pa.Table:
        out = {"z": [], "x": [], "y": [], "mvt": [], "n_features": []}
        for z, x, y, mvt in zip(batch.column("z").to_pylist(),
                                batch.column("x").to_pylist(),
                                batch.column("y").to_pylist(),
                                batch.column("mvt")):
            src = VectorTile(mvt.as_py())
            layer = src.get_layer_by_name(layer_name)
            if layer is None:
                continue
            tb = TileBuilder()
            lb = tb.add_layer(layer.name, layer.version, layer.extent)
            mapper = PropertyMapper(layer, lb)
            kept = 0
            for f in layer.features():
                if not any(k == want_key and v == want_val
                           for k, v in f.properties_raw()):
                    continue
                fb = GeometryFeatureBuilder(lb)
                fb.copy_id(f)
                fb.set_geometry(f.geom_type, f.geometry_data)
                fb.copy_properties(f, mapper)
                fb.commit()
                kept += 1
            if kept:
                out["z"].append(z)
                out["x"].append(x)
                out["y"].append(y)
                out["mvt"].append(tb.serialize())
                out["n_features"].append(kept)
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "mvt": pa.array(out["mvt"], pa.binary()),
            "n_features": pa.array(out["n_features"], pa.int64()),
        })

    return per_tile
