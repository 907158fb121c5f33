"""vtzero_ray — a Ray-Data-native MVT encode/decode + spatial tiling engine.

Brand-new implementation with the query/data-processing capabilities of
mapbox/vtzero (reference read-only at /root/reference), re-expressed as
`ray.data.Dataset` pipelines: zero-copy Arrow `map_batches` kernels, actor
pools for stateful encoder stages, groupby shuffles keyed on (z,x,y).
"""

__version__ = "0.1.0"

from . import exceptions  # noqa: F401

# Allocator hygiene for EVERY process that imports the library (drivers
# and Ray workers alike): disables NumPy's MADV_HUGEPAGE — transparent-
# hugepage faults run ~200x slow on this class of virtualized host — and
# raises glibc's mmap/trim thresholds. Idempotent, a no-op off glibc;
# escape hatch VTZERO_NO_MALLOC_TUNE=1. See runtime.tune_allocator.
from .runtime import tune_allocator as _tune_allocator

_tune_allocator()
