"""Extension surface: duck-typed geometry handlers + pipeline steps."""

import numpy as np
import pytest

from vtzero_ray import api
from vtzero_ray.exceptions import GeometryError
from vtzero_ray.mvt import codec


class CollectHandler:
    def __init__(self):
        self.points = []
        self.lines = []
        self.rings = []
        self.ring_info = []
        self._cur = None

    def points_begin(self, count): self._cur = []
    def points_point(self, p): self._cur.append(p)
    def points_end(self): self.points = self._cur

    def linestring_begin(self, count): self._cur = []
    def linestring_point(self, p): self._cur.append(p)
    def linestring_end(self): self.lines.append(self._cur)

    def ring_begin(self, count): self._cur = []
    def ring_point(self, p): self._cur.append(p)
    def ring_end(self, info):
        self.rings.append(self._cur)
        self.ring_info.append(info)

    def result(self):
        return self


class AreaHandler(CollectHandler):
    wants_area = True


class TestHandlers:
    def test_point_handler(self):
        h = api.decode_point_handler([9, 50, 34], CollectHandler())
        assert h.points == [(25, 17)]

    def test_multilinestring_handler(self):
        h = api.decode_linestring_handler(
            [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8], CollectHandler())
        assert h.lines == [[(2, 2), (2, 10), (10, 10)], [(1, 1), (3, 5)]]

    def test_polygon_handler_ring_type(self):
        h = api.decode_polygon_handler([9, 6, 12, 18, 10, 12, 24, 44, 15], CollectHandler())
        assert h.rings == [[(3, 6), (8, 12), (20, 34), (3, 6)]]
        assert h.ring_info == [codec.RING_OUTER]

    def test_polygon_handler_area(self):
        # ring (0,0)(10,0)(10,10)(0,10): 2A = 200 -> area 100
        h = api.decode_polygon_handler(
            [9, 0, 0, 26, 20, 0, 0, 20, 19, 0, 15], AreaHandler())
        assert h.ring_info == [100]

    def test_dispatch_unknown_raises(self):
        with pytest.raises(GeometryError, match="unknown geometry type"):
            api.decode_geometry_handler([9, 0, 0], 0, CollectHandler())

    def test_handler_errors_match_reference(self):
        with pytest.raises(GeometryError, match="ClosePath command count is not 1"):
            api.decode_polygon_handler(
                [9, 6, 12, 18, 10, 12, 24, 44, codec.command_integer(7, 2)],
                CollectHandler())


class TestPipelineSteps:
    def test_apply_steps(self, ray_session):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        ds = rd.range(100).map_batches(
            lambda t: pa.table({"v": t.column("id")}), batch_format="pyarrow")

        def double(t: pa.Table) -> pa.Table:
            return t.set_column(0, "v", pc.multiply(t.column("v"), 2))

        def only_big(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t.column("v"), 100))

        out = api.apply_steps(ds, double, only_big).to_pandas()
        assert (out.v > 100).all()
        assert len(out) == 49
