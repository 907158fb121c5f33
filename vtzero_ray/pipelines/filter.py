"""Filter / re-encode pipelines — vtzero-streets / vtzero-filter parity
(SURVEY.md §3.3): read-modify-write with OPAQUE geometry passthrough (T7,
geometry blobs copied without decoding) and property re-interning via the
PropertyMapper (T12).

Ray shape: decode map_batches → predicate filter → re-encode map_batches
(per-tile, stateless tasks — each input tile maps to one output tile, so
no shuffle is needed at all; this is the narrow-transform fast class).
"""

from __future__ import annotations

import pyarrow as pa

from ..mvt.builder import (GeometryFeatureBuilder, PropertyMapper,
                           TileBuilder)
from ..mvt.decoder import VectorTile
from ..mvt.values import encode_value


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


def select_layer(tiles_ds, layer_name: str):
    """vtzero-filter layer selection (examples/vtzero-filter.cpp:66-100):
    extract one layer per tile with ZERO re-encode (add_existing_layer
    verbatim copy, builder.hpp:119-132)."""
    want = layer_name.encode("utf-8")

    def per_tile(batch: pa.Table) -> pa.Table:
        out = {"z": [], "x": [], "y": [], "mvt": []}
        for z, x, y, mvt in zip(batch.column("z").to_pylist(),
                                batch.column("x").to_pylist(),
                                batch.column("y").to_pylist(),
                                batch.column("mvt")):
            data = mvt.as_py()
            for layer in VectorTile(data).layers():
                if layer.name == want:
                    tb = TileBuilder()
                    tb.add_existing_layer(layer.data)
                    out["z"].append(z)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["mvt"].append(tb.serialize())
                    break
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "mvt": pa.array(out["mvt"], pa.binary()),
        })

    return tiles_ds.map_batches(per_tile, batch_format="pyarrow", batch_size=None)


def merge_tiles(a_ds, b_ds, *more):
    """Union of N tile corpora: tiles with the same (z,x,y) merge by layer
    concatenation (add_existing_layer semantics, builder.hpp:119-132) —
    Ray ds.union + ONE groupby(z,x,y) re-group regardless of corpus count
    (SURVEY §2.5 set ops). Layer order follows argument order (src tag)."""
    import pandas as pd

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

    def tag(i):
        return lambda t: t.append_column("src", pa.array([i] * len(t), pa.int32()))

    parts = [ds.map_batches(tag(i), batch_format="pyarrow")
             for i, ds in enumerate((a_ds, b_ds, *more))]
    both = parts[0]
    for p in parts[1:]:
        both = both.union(p)
    return both.groupby(["z", "x", "y"]).map_groups(merge_group, batch_format="pandas")
