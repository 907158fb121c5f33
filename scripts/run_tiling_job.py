#!/usr/bin/env python
"""Production job entrypoint: the flagship tiling pipeline as a Ray job.

Local run:      python scripts/run_tiling_job.py --sf-dir /root/testdata/sf0.01 --out /tmp/tiles
Cluster run:    ray job submit --working-dir . -- python scripts/run_tiling_job.py \
                    --sf-dir <input> --out <output> [--zooms 2,6,12] [--hot-threshold 1000000]

Resumable: re-running with the same --out skips z-partitions recorded
complete in the manifest (lineage + metrics per partition). Exit code is
non-zero if any tile fails vtzero-check validation.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--zooms", default="2,6,12")
    ap.add_argument("--expand", type=int, default=1)
    ap.add_argument("--hot-threshold", type=int, default=0,
                    help="salted shard encoding for tiles above this many "
                         "features (0 = off; pays off above ~1M)")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="only for standalone local runs; under ray job "
                         "submit the cluster provides the resources")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vtzero_ray.pipelines.tiling import tiles_pipeline
    from vtzero_ray.runtime import register_udfs_by_value
    from vtzero_ray.sources.mvt_io import write_tiles

    register_udfs_by_value()  # workers inherit cwd, not sys.path

    zooms = tuple(int(z) for z in args.zooms.split(","))
    t0 = time.time()
    tiles = tiles_pipeline(
        args.sf_dir, zooms=zooms, validate=True, expand=args.expand,
        hot_threshold=args.hot_threshold or None,
    )

    # the invalid count is aggregated THROUGH the dataset by write_tiles
    # (driver-local closures never see worker-side mutations)
    summary = write_tiles(tiles, args.out)
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 2 if summary["invalid_tiles"] else 0


if __name__ == "__main__":
    sys.exit(main())
