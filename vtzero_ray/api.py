"""Public extension surface (SURVEY.md §2.8).

1. Duck-typed geometry handlers, mirroring the reference's handler
   contract (/root/reference/include/vtzero/geometry.hpp:125-169,
   doc/reading.md:355-399): ``points_begin/points_point/points_end``,
   ``linestring_begin/point/end``, ``ring_begin/point/end``; an optional
   ``result()`` is returned by the decode driver; ``ring_end`` receives a
   ring_type by default, or the raw 2x signed area when the handler sets
   ``wants_area = True`` (the Python analogue of the SFINAE dispatch).

2. Pipeline steps: "pyarrow.Table in → pyarrow.Table out" callables
   composed onto Datasets with ``apply_steps`` — the engine's equivalent
   of vtzero's builder-subclassing / visitor customization points.
"""

from __future__ import annotations

import numpy as np

from .mvt import codec
from .mvt.codec import _Decoder
from .exceptions import GeometryError

CMD_MOVE_TO = codec.CMD_MOVE_TO
CMD_LINE_TO = codec.CMD_LINE_TO
CMD_CLOSE_PATH = codec.CMD_CLOSE_PATH


def decode_point_handler(cmds, handler, max_count=None):
    """Streaming point decode driving handler callbacks (geometry.hpp:276-301)."""
    cmds = np.asarray(cmds, dtype=np.uint32)
    d = _Decoder(cmds, len(cmds) // 2 if max_count is None else max_count)
    count = d.next_command(CMD_MOVE_TO)
    if count is None:
        raise GeometryError("expected MoveTo command (spec 4.3.4.2)")
    if count == 0:
        raise GeometryError("MoveTo command count is zero (spec 4.3.4.2)")
    handler.points_begin(count)
    xs, ys = d.take_points(count)
    for i in range(count):
        handler.points_point((int(xs[i]), int(ys[i])))
    if not d.done():
        raise GeometryError("additional data after end of geometry (spec 4.3.4.2)")
    handler.points_end()
    return handler.result() if hasattr(handler, "result") else None


def decode_linestring_handler(cmds, handler, max_count=None):
    """Streaming linestring decode (geometry.hpp:303-335)."""
    cmds = np.asarray(cmds, dtype=np.uint32)
    d = _Decoder(cmds, len(cmds) // 2 if max_count is None else max_count)
    while True:
        count = d.next_command(CMD_MOVE_TO)
        if count is None:
            break
        if count != 1:
            raise GeometryError("MoveTo command count is not 1 (spec 4.3.4.3)")
        fx, fy = d.take_points(1)
        count = d.next_command(CMD_LINE_TO)
        if count is None:
            raise GeometryError("expected LineTo command (spec 4.3.4.3)")
        if count == 0:
            raise GeometryError("LineTo command count is zero (spec 4.3.4.3)")
        handler.linestring_begin(count + 1)
        handler.linestring_point((int(fx[0]), int(fy[0])))
        xs, ys = d.take_points(count)
        for i in range(count):
            handler.linestring_point((int(xs[i]), int(ys[i])))
        handler.linestring_end()
    return handler.result() if hasattr(handler, "result") else None


def decode_polygon_handler(cmds, handler, max_count=None):
    """Streaming polygon decode (geometry.hpp:337-379); ring_end receives
    ring_type, or sum/2 (the raw area) when handler.wants_area."""
    cmds = np.asarray(cmds, dtype=np.uint32)
    d = _Decoder(cmds, len(cmds) // 2 if max_count is None else max_count)
    wants_area = getattr(handler, "wants_area", False)
    while True:
        count = d.next_command(CMD_MOVE_TO)
        if count is None:
            break
        if count != 1:
            raise GeometryError("MoveTo command count is not 1 (spec 4.3.4.4)")
        sx, sy = d.take_points(1)
        start = (int(sx[0]), int(sy[0]))
        count = d.next_command(CMD_LINE_TO)
        if count is None:
            raise GeometryError("expected LineTo command (spec 4.3.4.4)")
        handler.ring_begin(count + 2)
        handler.ring_point(start)
        last = start
        total = 0
        if count:
            xs, ys = d.take_points(count)
            for i in range(count):
                p = (int(xs[i]), int(ys[i]))
                total += last[0] * p[1] - p[0] * last[1]
                last = p
                handler.ring_point(p)
        if d.next_command(CMD_CLOSE_PATH) is None:
            raise GeometryError("expected ClosePath command (spec 4.3.4.4)")
        total += last[0] * start[1] - start[0] * last[1]
        handler.ring_point(start)
        if wants_area:
            handler.ring_end(total // 2 if total >= 0 else -((-total) // 2))
        else:
            rt = (codec.RING_OUTER if total > 0
                  else codec.RING_INNER if total < 0 else codec.RING_INVALID)
            handler.ring_end(rt)
    return handler.result() if hasattr(handler, "result") else None


def decode_geometry_handler(cmds, geom_type, handler, max_count=None):
    """Dynamic dispatch (geometry.hpp:448-462)."""
    if geom_type == codec.GEOM_POINT:
        return decode_point_handler(cmds, handler, max_count)
    if geom_type == codec.GEOM_LINESTRING:
        return decode_linestring_handler(cmds, handler, max_count)
    if geom_type == codec.GEOM_POLYGON:
        return decode_polygon_handler(cmds, handler, max_count)
    raise GeometryError("unknown geometry type")


# ---------------------------------------------------------------------------
# pipeline-step composition
# ---------------------------------------------------------------------------


def apply_steps(ds, *steps, batch_format: str = "pyarrow", **map_kwargs):
    """Compose Table→Table (or DataFrame→DataFrame) steps onto a Dataset.

    Each step is a callable or a (callable, kwargs) pair forwarded to
    map_batches — the engine's UDF plug point (SURVEY.md §2.8: handlers
    become pluggable per-batch callables).
    """
    for step in steps:
        if isinstance(step, tuple):
            fn, kw = step
            ds = ds.map_batches(fn, batch_format=batch_format, **{**map_kwargs, **kw})
        else:
            ds = ds.map_batches(step, batch_format=batch_format, **map_kwargs)
    return ds
