#!/usr/bin/env python
"""vtzero-filter parity CLI: copy parts of a vector tile into a new tile
(/root/reference/examples/vtzero-filter.cpp:23-110).

Usage: vtzero_filter.py TILE LAYER-NUM|LAYER-NAME [ID] [-o FILE]

Whole-layer selection uses the zero-re-encode ``add_existing_layer``
path (builder.hpp:119-132 semantics); single-feature selection copies
the feature (id + opaque geometry blob + re-interned properties) into a
layer inheriting name/version/extent (builder.hpp:196-205, 1350-1361).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vtzero_ray.mvt.builder import TileBuilder  # noqa: E402
from vtzero_ray.mvt.decoder import VectorTile  # noqa: E402


def get_layer(tile: VectorTile, num_or_name: str):
    """Layer by index if NUM parses as int, else by name — mirrors
    examples/utils.cpp get_layer."""
    try:
        idx = int(num_or_name)
    except ValueError:
        layer = tile.get_layer_by_name(num_or_name)
        if layer is None:
            print(f"No layer named '{num_or_name}'.", file=sys.stderr)
            sys.exit(1)
        return layer
    layer = tile.get_layer(idx)
    if layer is None:
        print(f"No layer {idx}.", file=sys.stderr)
        sys.exit(1)
    return layer


def main() -> int:
    args = []
    out_file = "filtered.mvt"
    it = iter(sys.argv[1:])
    for a in it:
        if a in ("-o", "--output"):
            out_file = next(it, out_file)
        else:
            args.append(a)
    if len(args) < 2:
        print(f"Usage: {sys.argv[0]} TILE LAYER-NUM|LAYER-NAME [ID] [-o FILE]",
              file=sys.stderr)
        return 1
    with open(args[0], "rb") as f:
        data = f.read()
    try:
        tile = VectorTile(data)
        layer = get_layer(tile, args[1])
        print(f"Found layer: {layer.name.decode('utf-8', 'replace')}",
              file=sys.stderr)
        tb = TileBuilder()
        if len(args) < 3:
            tb.add_existing_layer(layer.data)
        else:
            fid = int(args[2])
            if fid < 0:
                print("Feature ID must be >= 0.", file=sys.stderr)
                return 1
            feature = layer.get_feature_by_id(fid)
            if feature is None:
                print(f"No feature with that id: {fid}", file=sys.stderr)
                return 1
            lb = tb.add_layer_from(layer)
            lb.copy_feature(feature)
        with open(out_file, "wb") as f:
            f.write(tb.serialize())
    except Exception as e:
        print(f"Fatal error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
