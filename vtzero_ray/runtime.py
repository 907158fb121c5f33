"""Driver-side runtime helpers shared by every entry point.

``register_udfs_by_value`` ships vtzero_ray UDF modules to Ray workers BY
VALUE: workers only inherit the driver's cwd, not its sys.path, so when a
driver imports the library from outside the repo root every map_batches
task would die with ModuleNotFoundError. Registering the modules with
Ray's VENDORED cloudpickle embeds the function/class bodies in the task
payload instead, removing the worker-side import entirely.
"""

from __future__ import annotations

import os
import sys

_ALLOC_TUNED = False


def tune_allocator(mmap_threshold: int = 128 << 20,
                   trim_threshold: int = 128 << 20,
                   warm_mb: int = 32) -> bool:
    """Raise glibc's mmap/trim thresholds and pre-fault a small heap arena.

    Large NumPy temporaries (>128 KiB) otherwise go through fresh
    anonymous mmaps every call; on this class of virtualized host the
    first-touch page faults on those mappings are pathologically slow
    (measured 10-600x on cold (n_tokens, 64) bit matrices — 34 s vs
    0.9 s for the SimHash kernel). Keeping big temporaries on the brk
    heap (and not trimming it back) makes the cost one-time per worker
    process. Idempotent; per-worker memory retained is bounded by
    ``trim_threshold``. Set VTZERO_NO_MALLOC_TUNE=1 to disable.
    """
    global _ALLOC_TUNED
    if _ALLOC_TUNED or os.environ.get("VTZERO_NO_MALLOC_TUNE"):
        return _ALLOC_TUNED
    _ALLOC_TUNED = True  # one attempt per process either way
    # ROOT CAUSE (found round 3): NumPy madvises MADV_HUGEPAGE on every
    # allocation >= 4 MiB, and transparent-hugepage faults on this
    # virtualized host run at ~10 MB/s — np.ones(256 MB) measured 26 s
    # with the madvise vs 0.13 s without (200x). The mallopt/brk tuning
    # below was only ever a partial shield (NumPy madvises brk pages
    # too). Disable the madvise process-wide; PR_SET_THP_DISABLE covers
    # non-NumPy allocators (Arrow, glibc) as well.
    try:
        from numpy.core import multiarray

        multiarray._set_madvise_hugepage(False)
    except Exception:
        pass
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE
        libc.mallopt(-3, int(mmap_threshold))  # M_MMAP_THRESHOLD
        libc.mallopt(-1, int(trim_threshold))  # M_TRIM_THRESHOLD
        if warm_mb:
            import numpy as np

            # touch one word per page to fault the arena in now
            w = np.empty(warm_mb << 17, dtype=np.float64)
            w[::512] = 0.0
            del w
    except Exception:
        pass  # non-glibc platform: nothing to tune
    return _ALLOC_TUNED


def register_udfs_by_value() -> None:
    try:
        # Ray serializes tasks with its VENDORED cloudpickle — registering
        # on the standalone cloudpickle package has no effect
        from ray import cloudpickle

        # import every vtzero_ray module UDFs live in, then register them
        import vtzero_ray  # noqa: F401
        from vtzero_ray import api, exceptions  # noqa: F401
        from vtzero_ray.functions import (ann, dedup, dedup_sql,  # noqa: F401
                                          sketch, textstats)
        from vtzero_ray.mvt import (builder, check, codec,  # noqa: F401
                                    decode_fast, decoder, pbf, values)
        from vtzero_ray.pipelines import (clip_paths, decode, filter,  # noqa: F401
                                          paths, relational, tiling,
                                          tiling_sharded)
        from vtzero_ray.sources import mvt_io, pages  # noqa: F401
        from vtzero_ray.stages import (cells, clip, encode,  # noqa: F401
                                       encode_lines, encode_segmented,
                                       geoparse, joins, multimodal, raster,
                                       shard_encode)
        from vtzero_ray.state import testing  # noqa: F401

        for name, mod in list(sys.modules.items()):
            if name.startswith("vtzero_ray") and mod is not None:
                cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass  # workers that can import normally don't need this
