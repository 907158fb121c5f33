"""Driver-side runtime helpers shared by every entry point.

``register_udfs_by_value`` ships vtzero_ray UDF modules to Ray workers BY
VALUE: workers only inherit the driver's cwd, not its sys.path, so when a
driver imports the library from outside the repo root every map_batches
task would die with ModuleNotFoundError. Registering the modules with
Ray's VENDORED cloudpickle embeds the function/class bodies in the task
payload instead, removing the worker-side import entirely.
"""

from __future__ import annotations

import sys


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
        from vtzero_ray.pipelines import (decode, filter, paths,  # noqa: F401
                                          relational, tiling, tiling_sharded)
        from vtzero_ray.sources import mvt_io, pages  # noqa: F401
        from vtzero_ray.stages import (cells, encode, encode_lines,  # noqa: F401
                                       encode_segmented, geoparse, joins,
                                       multimodal, raster, shard_encode)
        from vtzero_ray.state import testing  # noqa: F401

        for name, mod in list(sys.modules.items()):
            if name.startswith("vtzero_ray") and mod is not None:
                cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass  # workers that can import normally don't need this
