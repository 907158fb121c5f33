"""MVT 2.x core: wire codec, builders, decoder, validator.

Pure Python/NumPy — no Ray dependency. The Ray Data stages in
``vtzero_ray.stages`` call into this package inside ``map_batches``.
"""

from . import builder, check, codec, decoder, pbf, values  # noqa: F401
from .builder import (  # noqa: F401
    GeometryFeatureBuilder,
    LayerBuilder,
    LinestringFeatureBuilder,
    PointFeatureBuilder,
    PolygonFeatureBuilder,
    PropertyMapper,
    TileBuilder,
)
from .decoder import Feature, Layer, VectorTile, is_vector_tile  # noqa: F401
