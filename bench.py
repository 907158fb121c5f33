"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "tiles_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32), GRAFT_EXPAND (default 40).

``python bench.py --scaling`` runs the headline twice in fresh processes at
num_cpus=8 and 32 and reports throughput + scaling efficiency (the
two-cluster-size criterion, evidenced at two parallelism levels per
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("GRAFT_EXPAND", "40"))
QUICK = os.environ.get("GRAFT_QUICK", "") == "1"  # headline only (scaling runs)


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ray.data.aggregate import Count, Sum

    from vtzero_ray.pipelines.tiling import features_dataset, tiles_pipeline

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # warm the page cache + Ray workers with one untimed pass
    features_dataset(SF_DIR, zooms=(6,)).count()

    # headline: full encode pipeline (geoparse → assign → shuffle → encode →
    # vtzero-check validate), consumed as an aggregate (no driver materialize)
    t0 = time.time()
    tiles = tiles_pipeline(SF_DIR, zooms=(2, 6, 12), validate=True, expand=EXPAND)
    stats = tiles.aggregate(Count(), Sum("n_features"), Sum("check_code"))
    headline = time.time() - t0
    n_tiles = stats["count()"]
    n_feats = stats["sum(n_features)"]
    queries["tiles_encode_validate"] = round(headline, 3)
    extra["tiles"] = n_tiles
    extra["features"] = n_feats
    extra["tiles_per_sec"] = round(n_tiles / headline, 1)
    extra["features_per_sec"] = round(n_feats / headline, 1)

    if QUICK:
        return {
            "metric": "MVT tiles encoded/sec (vtzero-check-validated), end-to-end pages pipeline",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "expand": EXPAND,
            **extra,
        }

    # stage benches
    t0 = time.time()
    features_dataset(SF_DIR, zooms=(2, 6, 12), expand=EXPAND).count()
    queries["geoparse_assign"] = round(time.time() - t0, 3)

    t0 = time.time()
    features_dataset(SF_DIR, zooms=(12,), expand=EXPAND).groupby(["z", "x", "y"]).count().count()
    queries["tile_groupby_z12"] = round(time.time() - t0, 3)

    # extended ops (present from later milestones; time if available)
    try:
        import __ray_entry__ as e

        qs = e.queries()
        for name in ("dedup_exact", "minhash_lsh_candidates", "ann_topk_bruteforce"):
            if name in qs:
                t0 = time.time()
                res = qs[name](SF_DIR)
                if hasattr(res, "count"):
                    res.count()
                queries[name] = round(time.time() - t0, 3)
    except Exception:
        pass

    return {
        "metric": "MVT tiles encoded/sec (vtzero-check-validated), end-to-end pages pipeline",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "expand": EXPAND,
        **extra,
    }


def run_scaling() -> dict:
    """Same job at 8 and 32 CPUs in fresh processes → scaling efficiency."""
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_QUICK="1",
                   GRAFT_EXPAND=str(int(os.environ.get("GRAFT_EXPAND", "100"))))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    thr_lo = lo["tiles_per_sec"] / 8
    thr_hi = hi["tiles_per_sec"] / 32
    eff = thr_hi / thr_lo
    return {
        "metric": "scaling efficiency (8 -> 32 CPUs, fresh ray.init each)",
        "sec_8cpu": lo["value"],
        "sec_32cpu": hi["value"],
        "tiles_per_sec_8cpu": lo["tiles_per_sec"],
        "tiles_per_sec_32cpu": hi["tiles_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        import ray

        ray.shutdown()
        print(json.dumps(result))
