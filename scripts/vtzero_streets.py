#!/usr/bin/env python
"""vtzero-streets parity CLI: predicate-filter features into a new tile
(/root/reference/examples/vtzero-streets.cpp:22-85).

Usage: vtzero_streets.py TILE [LAYER [KEY VALUE]] [-o FILE]

Defaults mirror the reference: layer "road_label", keep features whose
property class == "street". Geometry blobs are copied WITHOUT decoding
(geometry_feature_builder, T7) and properties re-interned via the
property_mapper (T12).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vtzero_ray.mvt.builder import (GeometryFeatureBuilder,  # noqa: E402
                                    PropertyMapper, TileBuilder)
from vtzero_ray.mvt.decoder import VectorTile  # noqa: E402
from vtzero_ray.mvt.values import encode_value  # noqa: E402


def main() -> int:
    args = []
    out_file = "streets.mvt"
    it = iter(sys.argv[1:])
    for a in it:
        if a in ("-o", "--output"):
            out_file = next(it, out_file)
        else:
            args.append(a)
    if not args:
        print(f"Usage: {sys.argv[0]} TILE [LAYER [KEY VALUE]] [-o FILE]",
              file=sys.stderr)
        return 1
    layer_name = args[1] if len(args) > 1 else "road_label"
    want_key = (args[2] if len(args) > 3 else "class").encode()
    want_val = encode_value(args[3] if len(args) > 3 else "street")
    with open(args[0], "rb") as f:
        data = f.read()
    try:
        layer = VectorTile(data).get_layer_by_name(layer_name)
        if layer is None:
            print(f"No layer named '{layer_name}'.", file=sys.stderr)
            return 1
        tb = TileBuilder()
        lb = tb.add_layer_from(layer)
        mapper = PropertyMapper(layer, lb)
        kept = 0
        for feat in layer.features():
            if not any(k == want_key and v == want_val
                       for k, v in feat.properties_raw()):
                continue
            fb = GeometryFeatureBuilder(lb)
            fb.copy_id(feat)
            fb.set_geometry(feat.geom_type, feat.geometry_data)
            fb.copy_properties(feat, mapper)
            fb.commit()
            kept += 1
        with open(out_file, "wb") as f:
            f.write(tb.serialize())
        print(f"kept {kept} features", file=sys.stderr)
    except Exception as e:
        print(f"Fatal error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
