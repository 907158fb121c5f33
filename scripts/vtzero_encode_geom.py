#!/usr/bin/env python
"""vtzero-encode-geom parity CLI: show the encoded form of geometry
elements (/root/reference/examples/vtzero-encode-geom.cpp:36-145).

Usage: vtzero_encode_geom.py ELEMENT...
  M[count] -- MOVE_TO count
  L[count] -- LINE_TO count
  C        -- CLOSE_PATH
  [number] -- number that will be zigzag encoded
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vtzero_ray.mvt.codec import command_integer  # noqa: E402

CMD_MOVE_TO, CMD_LINE_TO, CMD_CLOSE_PATH = 1, 2, 7


def zigzag32(v: int) -> int:
    return ((v << 1) ^ (v >> 31)) & 0xFFFFFFFF


def main() -> int:
    if len(sys.argv) < 2:
        print(f"Usage: {sys.argv[0]} GEOMETRY ELEMENTS...\n"
              "GEOMETRY ELEMENTS are:\n"
              "  M[count] -- MOVE_TO count\n"
              "  L[count] -- LINE_TO count\n"
              "  C        -- CLOSE_PATH\n"
              "  [number] -- number that will be zigzag encoded",
              file=sys.stderr)
        return 1
    values = []
    print("raw data\tencoded\n-----------------------------------")
    for i, arg in enumerate(sys.argv[1:], 1):
        try:
            if not arg:
                continue
            if arg[0] == "M":
                count = int(arg[1:])
                if count <= 0:
                    raise ValueError("count after M command must be 1 or larger")
                ci = command_integer(CMD_MOVE_TO, count)
                print(f"MOVE_TO({count})\t{ci}")
            elif arg[0] == "L":
                count = int(arg[1:])
                if count <= 0:
                    raise ValueError("count after L command must be 1 or larger")
                ci = command_integer(CMD_LINE_TO, count)
                print(f"LINE_TO({count})\t{ci}")
            elif arg == "C":
                ci = command_integer(CMD_CLOSE_PATH, 1)
                print(f"CLOSE_PATH\t{ci}")
            else:
                num = int(arg)
                ci = zigzag32(num)
                print(f"number({num})\t{ci}")
            values.append(ci)
        except ValueError as e:
            print(f"error({i}): {e}", file=sys.stderr)
            return 1
    out = "[" + "".join(f" {v}," for v in values)
    out = (out[:-1] + " ") if values else out  # out.back() = ' '
    print("\n" + out + "]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
