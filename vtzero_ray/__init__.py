"""vtzero_ray — a Ray-Data-native MVT encode/decode + spatial tiling engine.

Brand-new implementation with the query/data-processing capabilities of
mapbox/vtzero (reference read-only at /root/reference), re-expressed as
`ray.data.Dataset` pipelines: zero-copy Arrow `map_batches` kernels, actor
pools for stateful encoder stages, groupby shuffles keyed on (z,x,y).
"""

__version__ = "0.1.0"

from . import exceptions  # noqa: F401
