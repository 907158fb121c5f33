#!/usr/bin/env python
"""vtzero-check parity CLI: lint a tile file, graded exit codes
0 ok / 1 warning / 2 error / 3 fatal
(/root/reference/examples/vtzero-check.cpp:21-49)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vtzero_ray.mvt.check import check_tile  # noqa: E402


def main() -> int:
    if len(sys.argv) != 2:
        print(f"Usage: {sys.argv[0]} TILE", file=sys.stderr)
        return 1
    with open(sys.argv[1], "rb") as f:
        data = f.read()
    code, diags = check_tile(data)
    for _, msg in diags:
        print(msg, file=sys.stderr)
    return code


if __name__ == "__main__":
    sys.exit(main())
