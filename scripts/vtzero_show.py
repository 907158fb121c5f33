#!/usr/bin/env python
"""vtzero-show parity CLI: dump a tile's layers/features/properties
(/root/reference/examples/vtzero-show.cpp:182-253).

Usage: vtzero_show.py TILE [-l|--layers] [-t|--tables]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vtzero_ray.mvt.decoder import VectorTile  # noqa: E402
from vtzero_ray.mvt.values import TYPE_NAMES, decode_value  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    flags = {a for a in sys.argv[1:] if a.startswith("-")}
    if not args:
        print(f"Usage: {sys.argv[0]} TILE [-l|--layers] [-t|--tables]", file=sys.stderr)
        return 1
    with open(args[0], "rb") as f:
        data = f.read()
    try:
        for layer in VectorTile(data).layers():
            print(f"layer: {layer.name.decode('utf-8', 'replace')}")
            print(f"  version: {layer.version}")
            print(f"  extent: {layer.extent}")
            if "-t" in flags or "--tables" in flags:
                print(f"  keys: {[k.decode('utf-8', 'replace') for k in layer.key_table()]}")
                print(f"  values: {[decode_value(v) for v in layer.value_table()]}")
            if "-l" in flags or "--layers" in flags:
                continue
            for feature in layer.features():
                fid = feature.id if feature.has_id else None
                print(f"  feature: id={fid} geomtype={feature.geom_type} "
                      f"props={feature.num_properties}")
                for k, v in feature.properties_raw():
                    vt, val = decode_value(v)
                    print(f"    {k.decode('utf-8', 'replace')}="
                          f"{val!r} ({TYPE_NAMES[vt]})")
    except Exception as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
