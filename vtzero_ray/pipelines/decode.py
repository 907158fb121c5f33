"""Decode pipelines — the read path (SURVEY.md §3.2) as Ray Data stages.

- ``decode_tiles``: tiles Dataset (mvt:binary) → exploded feature rows
  (tile → layer → feature explosion, M1/M4), a stateless map_batches kernel.
- ``tile_stats``: vtzero-stats equivalent (A1,
  /root/reference/examples/vtzero-stats.cpp:20-54): per (tile, layer) feature
  count / geometry byte sums / table sizes.
- ``check_corpus``: vtzero-check over a corpus → per-tile grade + diagnostics.

Bad tiles don't abort the pipeline: errors land in a quarantine column
(SURVEY.md §2.2 M3 "errors → quarantine column instead of throw").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..mvt import codec
from ..mvt.check import check_tile
from ..mvt.decode_fast import decode_tiles_batch_fast, tile_stats_batch_fast
from ..mvt.decoder import VectorTile


def decode_tiles_batch(batch: pa.Table, with_props: bool = True,
                       with_geometry: bool = True) -> pa.Table:
    """mvt rows → feature rows: z,x,y,layer,feature_id,has_id,geom_type,
    n_props,geom_cmds(list<u32>)[,prop_keys,prop_vals_raw], error."""
    zs = batch.column("z").to_pylist() if "z" in batch.column_names else [None] * len(batch)
    xs = batch.column("x").to_pylist() if "x" in batch.column_names else [None] * len(batch)
    ys = batch.column("y").to_pylist() if "y" in batch.column_names else [None] * len(batch)
    out = {
        "z": [], "x": [], "y": [], "layer": [], "feature_id": [], "has_id": [],
        "geom_type": [], "n_props": [], "error": [],
    }
    if with_geometry:
        out["geom_cmds"] = []
    if with_props:
        out["prop_keys"] = []
        out["prop_vals_raw"] = []
    for z, x, y, mvt in zip(zs, xs, ys, batch.column("mvt")):
        data = mvt.as_py()
        try:
            for layer in VectorTile(data).layers():
                lname = layer.name.decode("utf-8", "replace")
                for f in layer.features():
                    out["z"].append(z)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["layer"].append(lname)
                    out["feature_id"].append(f.id if f.has_id else 0)
                    out["has_id"].append(f.has_id)
                    out["geom_type"].append(f.geom_type)
                    out["n_props"].append(f.num_properties)
                    out["error"].append(None)
                    if with_geometry:
                        out["geom_cmds"].append(f.geometry_cmds())
                    if with_props:
                        keys, vals = [], []
                        for k, v in f.properties_raw():
                            keys.append(k.decode("utf-8", "replace"))
                            vals.append(v)
                        out["prop_keys"].append(keys)
                        out["prop_vals_raw"].append(vals)
        except Exception as e:  # quarantine, don't abort the corpus
            out["z"].append(z)
            out["x"].append(x)
            out["y"].append(y)
            out["layer"].append(None)
            out["feature_id"].append(0)
            out["has_id"].append(False)
            out["geom_type"].append(0)
            out["n_props"].append(0)
            out["error"].append(f"{type(e).__name__}: {e}")
            if with_geometry:
                out["geom_cmds"].append([])
            if with_props:
                out["prop_keys"].append([])
                out["prop_vals_raw"].append([])
    t = {
        "z": pa.array(out["z"], pa.int32()),
        "x": pa.array(out["x"], pa.int32()),
        "y": pa.array(out["y"], pa.int32()),
        "layer": pa.array(out["layer"], pa.string()),
        "feature_id": pa.array(out["feature_id"], pa.uint64()),
        "has_id": pa.array(out["has_id"], pa.bool_()),
        "geom_type": pa.array(out["geom_type"], pa.int8()),
        "n_props": pa.array(out["n_props"], pa.int32()),
        "error": pa.array(out["error"], pa.string()),
    }
    if with_geometry:
        t["geom_cmds"] = pa.array(
            [np.asarray(g, dtype=np.uint32) for g in out["geom_cmds"]],
            pa.list_(pa.uint32()),
        )
    if with_props:
        t["prop_keys"] = pa.array(out["prop_keys"], pa.list_(pa.string()))
        t["prop_vals_raw"] = pa.array(out["prop_vals_raw"], pa.list_(pa.binary()))
    return pa.table(t)


def decode_tiles_batch_v(batch: pa.Table, with_props: bool = True,
                         with_geometry: bool = True) -> pa.Table:
    """Vectorized decode with per-tile scalar fallback: clean tiles go
    through mvt/decode_fast.py (numpy structural + frontier parse); any
    tile the fast path flags is re-decoded by decode_tiles_batch, which
    reproduces the exact quarantine semantics."""
    fast, bad = decode_tiles_batch_fast(batch, with_props=with_props,
                                        with_geometry=with_geometry)
    if not bad:
        return fast
    sub = batch.take(pa.array(bad))
    slow = decode_tiles_batch(sub, with_props=with_props,
                              with_geometry=with_geometry)
    return pa.concat_tables([fast, slow.select(fast.column_names)],
                            promote_options="permissive")


def decode_tiles(tiles_ds, with_props: bool = True, with_geometry: bool = True):
    import functools

    fn = functools.partial(decode_tiles_batch_v, with_props=with_props,
                           with_geometry=with_geometry)
    return tiles_ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def tile_stats(tiles_ds):
    """vtzero-stats (A1): per (z,x,y,layer): feature count, geom bytes,
    key/value table sizes. Vectorized (mvt/decode_fast.py) with scalar
    fallback per flagged tile."""

    def stats_batch_scalar(batch: pa.Table) -> pa.Table:
        rows = {"z": [], "x": [], "y": [], "layer": [], "n_features": [],
                "geom_bytes": [], "n_keys": [], "n_values": []}
        for z, x, y, mvt in zip(batch.column("z").to_pylist(),
                                batch.column("x").to_pylist(),
                                batch.column("y").to_pylist(),
                                batch.column("mvt")):
            for layer in VectorTile(mvt.as_py()).layers():
                gb = sum(len(f.geometry_data) for f in layer.features())
                rows["z"].append(z)
                rows["x"].append(x)
                rows["y"].append(y)
                rows["layer"].append(layer.name.decode("utf-8", "replace"))
                rows["n_features"].append(layer.num_features)
                rows["geom_bytes"].append(gb)
                rows["n_keys"].append(len(layer.key_table()))
                rows["n_values"].append(len(layer.value_table()))
        return pa.table({
            "z": pa.array(rows["z"], pa.int32()),
            "x": pa.array(rows["x"], pa.int32()),
            "y": pa.array(rows["y"], pa.int32()),
            "layer": pa.array(rows["layer"], pa.string()),
            "n_features": pa.array(rows["n_features"], pa.int64()),
            "geom_bytes": pa.array(rows["geom_bytes"], pa.int64()),
            "n_keys": pa.array(rows["n_keys"], pa.int64()),
            "n_values": pa.array(rows["n_values"], pa.int64()),
        })

    def stats_batch(batch: pa.Table) -> pa.Table:
        fast, bad = tile_stats_batch_fast(batch)
        if not bad:
            return fast
        slow = stats_batch_scalar(batch.take(pa.array(bad)))
        return pa.concat_tables([fast, slow.select(fast.column_names)],
                                promote_options="permissive")

    return tiles_ds.map_batches(stats_batch, batch_format="pyarrow", batch_size=None)


def check_corpus(tiles_ds):
    """vtzero-check over a tile corpus: per-tile grade + first diagnostics."""
    def check_batch(batch: pa.Table) -> pa.Table:
        codes, firsts, counts = [], [], []
        for mvt in batch.column("mvt"):
            code, diags = check_tile(mvt.as_py())
            codes.append(code)
            counts.append(len(diags))
            firsts.append(diags[0][1] if diags else None)
        return pa.table({
            "z": batch.column("z"), "x": batch.column("x"), "y": batch.column("y"),
            "check_code": pa.array(codes, pa.int8()),
            "n_diagnostics": pa.array(counts, pa.int32()),
            "first_diagnostic": pa.array(firsts, pa.string()),
        })

    return tiles_ds.map_batches(check_batch, batch_format="pyarrow", batch_size=None)
