#!/usr/bin/env python
"""vtzero-stats parity CLI: per-layer stats CSV
(/root/reference/examples/vtzero-stats.cpp:20-60).

Usage: vtzero_stats.py TILE

Columns match the reference exactly: layer,num_features,raw_size,
raw_geometries_size,key_table_size,value_table_size.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vtzero_ray.mvt.decoder import VectorTile  # noqa: E402


def main() -> int:
    if len(sys.argv) != 2:
        print(f"Usage: {sys.argv[0]} TILE", file=sys.stderr)
        return 1
    with open(sys.argv[1], "rb") as f:
        data = f.read()
    print("layer,num_features,raw_size,raw_geometries_size,"
          "key_table_size,value_table_size")
    try:
        for layer in VectorTile(data).layers():
            geom_bytes = sum(len(f.geometry_data) for f in layer.features())
            name = layer.name.decode("utf-8", "replace")
            print(f"{name},{layer.num_features},{len(layer.data)},"
                  f"{geom_bytes},{len(layer.key_table())},"
                  f"{len(layer.value_table())}")
    except Exception as e:  # mirror the reference's catch-all (stats.cpp:56)
        print(f"Error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
