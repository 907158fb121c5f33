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


def host_probe_ms() -> float:
    """Fixed single-core calibration work (golden-tile full decode, no Ray):
    reported with every bench JSON so throughputs from different host boots
    are comparable — the sandbox VM's per-core speed varies across boots
    (133 ms on the round-1 box vs 238 ms on the round-2 box, identical
    code). Normalize cross-round comparisons by this ratio."""
    from vtzero_ray.mvt.decoder import VectorTile

    path = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"
    try:
        with open(path, "rb") as fh:
            data = fh.read()
    except OSError:
        return -1.0
    t0 = time.time()
    for layer in VectorTile(data).layers():
        for f in layer.features():
            f.decode_geometry()
    return round((time.time() - t0) * 1000, 1)


def bw_probe_gbps() -> float:
    """Single-core memory-bandwidth probe (64 MB copy loop). Hypervisor
    neighbors can saturate the socket's memory bandwidth WITHOUT showing
    up as CPU steal — a clean-steal pair with a degraded bandwidth probe
    explains a low scaling ratio that steal can't."""
    import numpy as np

    from vtzero_ray.runtime import tune_allocator

    tune_allocator()
    a = np.empty(64 << 20, np.uint8)
    a[::4096] = 1
    best = 0.0
    # pass 0 is untimed: it absorbs the one-time heap-growth faults
    # (~50us/page on this box — the same pathology tune_allocator bounds)
    for timed in (False, True):
        t0 = time.perf_counter()
        for _ in range(6):
            b = a.copy()  # noqa: F841
        dt = time.perf_counter() - t0
        if timed:
            best = round(6 * a.nbytes * 2 / dt / 1e9, 2)
    return best


def ray_rtt_ms() -> float:
    """Median round-trip of a trivial Ray task on warm workers — the
    scheduler/raylet RPC latency. ~1 ms on a healthy local node; measured
    45 ms on a degraded sandbox boot, where it (not CPU, steal, or
    bandwidth — all probed clean) capped 16-CPU pipeline throughput:
    orchestration latency x task count floors every stage regardless of
    cores, deflating scaling pairs. Recorded with every bench JSON so the
    confound is attributable per run."""
    import ray

    @ray.remote
    def _echo(x):
        return x

    ray.get(_echo.remote(0))  # warm one worker
    samples = []
    for _ in range(15):
        t0 = time.time()
        ray.get(_echo.remote(0))
        samples.append((time.time() - t0) * 1000.0)
    samples.sort()
    return round(samples[len(samples) // 2], 2)


def _steal_pct(window_s: float = 1.0) -> float:
    """Hypervisor CPU steal over a short window, % of all-cpu ticks."""
    def ticks():
        try:
            with open("/proc/stat") as fh:
                vals = list(map(int, fh.readline().split()[1:]))
            return vals[7], sum(vals)
        except Exception:
            return 0, 1

    s0, t0 = ticks()
    time.sleep(window_s)
    s1, t1 = ticks()
    return round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)


def gate_window(extra: dict) -> None:
    """Hold the sweep until the sandbox window is clean: ray_rtt low AND
    steal <= 2% (the same discipline --scaling applies per pair).
    BENCH_r03 was recorded in a 5.2 ms-rtt window and its per-query walls
    overstated cost 2-6x vs the same code minutes later — gating makes the
    official JSON reflect the code, not the sandbox.

    The rtt bar RELAXES with elapsed wait (2 ms -> 3 ms after 60 s ->
    4.5 ms after 180 s): holding out for a perfect window while a
    good-enough one is live is how a round-4 attempt burned a 2.5 ms
    window waiting for 2.0 and then swept at 16.6 ms after the budget
    expired — windows rot on minute timescales, so take the best one ON
    OFFER, soon. window_clean records whether the STRICT bar was met;
    gate_tier_rtt_ms records the bar actually applied. On a degraded
    BOOT (rtt never recovers) we proceed after the wait budget with
    window_clean=false so the pollution is loud, not silent.

    Tunables: GRAFT_GATE_RTT_MS (strict bar, default 2.0),
    GRAFT_GATE_STEAL (2.0), GRAFT_GATE_WAIT_S (300; 0 disables)."""
    strict_rtt = float(os.environ.get("GRAFT_GATE_RTT_MS", "2.0"))
    max_steal = float(os.environ.get("GRAFT_GATE_STEAL", "2.0"))
    budget = float(os.environ.get("GRAFT_GATE_WAIT_S", "300"))
    t0 = time.time()
    attempts = []
    while True:
        waited = time.time() - t0
        tier = strict_rtt if waited < 60 else (
            strict_rtt * 1.5 if waited < 180 else strict_rtt * 2.25)
        rtt, steal = ray_rtt_ms(), _steal_pct()
        attempts.append({"rtt_ms": rtt, "steal_pct": steal,
                         "tier_rtt_ms": round(tier, 2)})
        if rtt <= tier and steal <= max_steal:
            extra["window_clean"] = rtt <= strict_rtt
            extra["gate_tier_rtt_ms"] = round(tier, 2)
            break
        if waited >= budget:
            extra["window_clean"] = False
            extra["gate_tier_rtt_ms"] = round(tier, 2)
            break
        time.sleep(10)
    extra["gate_waited_s"] = round(time.time() - t0, 1)
    extra["gate_attempts"] = attempts
    extra["ray_rtt_ms"] = attempts[-1]["rtt_ms"]
    extra["steal_pct"] = attempts[-1]["steal_pct"]


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
    extra: dict[str, float] = {"host_probe_ms": host_probe_ms(),
                               "bw_probe_gbps": bw_probe_gbps()}

    # warm the page cache + Ray workers with one untimed pass
    features_dataset(SF_DIR, zooms=(6,)).count()
    if QUICK:
        # scaling runs gate at the pair level (all_pairs retry); a per-level
        # wait here would skew the lo/hi windows apart
        extra["ray_rtt_ms"] = ray_rtt_ms()
    else:
        # hold the sweep for a clean sandbox window, recording attempts
        gate_window(extra)

    # headline: full encode pipeline (geoparse → assign → shuffle → encode →
    # vtzero-check validate), consumed as an aggregate (no driver materialize)
    # hot-tile sharding pays off when a tile exceeds ~1M features (the
    # vectorized kernel does 1.4M feat/s single-core); below that the plan
    # passes cost more than the straggler — keep it opt-in for the bench
    hot = int(os.environ.get("GRAFT_HOT_THRESHOLD", "0")) or None
    import pyarrow.compute as _pc

    # consume by STREAMING the tiny stat columns to the driver
    # (Dataset.aggregate adds an extra exchange); best of 2 runs — the
    # first pays per-worker module import warmup
    def run_once():
        t0 = time.time()
        tiles = tiles_pipeline(SF_DIR, zooms=(2, 6, 12), validate=True,
                               expand=EXPAND, hot_threshold=hot)
        nt = nf = 0
        for b in tiles.select_columns(["n_features", "check_code"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            nt += len(b)
            nf += int(_pc.sum(b.column("n_features")).as_py() or 0)
        return time.time() - t0, nt, nf

    # median-of-3 by default: the sandbox host's speed drifts ~2x on
    # minute timescales (hypervisor neighbors); run 1 additionally pays
    # per-worker module imports. headline_runs exposes the raw spread.
    runs = int(os.environ.get("GRAFT_BENCH_RUNS", "3"))
    times = []
    n_tiles = n_feats = 0
    for _ in range(runs):
        t, n_tiles, n_feats = run_once()
        times.append(t)
    extra["headline_runs"] = [round(t, 3) for t in times]
    times.sort()
    headline = times[len(times) // 2] if runs >= 3 else times[0]
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

    # optional: exercise the resumable partitioned sink at bench scale
    if os.environ.get("GRAFT_WRITE") == "1":
        import shutil
        import tempfile

        from vtzero_ray.sources.mvt_io import write_tiles

        out_dir = tempfile.mkdtemp(prefix="tiles-bench-")
        t0 = time.time()
        tiles = tiles_pipeline(SF_DIR, zooms=(2, 6, 12), validate=False,
                               expand=EXPAND, hot_threshold=hot)
        summary = write_tiles(tiles, out_dir)
        queries["tiles_write"] = round(time.time() - t0, 3)
        extra["written_bytes"] = summary["bytes"]
        shutil.rmtree(out_dir, ignore_errors=True)

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
        qs.update(e.queries_extra())
        for name in ("dedup_exact", "minhash_lsh_candidates", "ann_topk_bruteforce",
                     "ann_topk_ivf_indexed", "simhash_near_dups",
                     "embedding_near_dups_lsh", "ngram_topk",
                     "bm25_topk_indexed",
                     "media_features_jpeg", "clipped_paths_z2",
                     # round-4 training-data ops (all single-scan corpus
                     # stages — cheap, and their sf0.1 walls are the
                     # scale evidence)
                     "repetition_stats", "doc_perplexity", "bigram_perplexity",
                     "mix_weighted", "decontaminate", "cluster_docs",
                     # web cleaning + incremental dedup (late round 4)
                     "clean_lines_c4", "url_dedup", "dedup_lines_c4",
                     "dedup_incremental", "minhash_incremental",
                     # round-4 continuation: classifier, substring-dedup
                     # signals, semantic dedup, link rank, composed prep
                     "nb_lang_classify", "dup_ngram_spans", "semdedup",
                     "pagerank", "host_pagerank", "host_walks", "cocitation_hosts",
                     "pagerank_weighted", "hits_hosts", "triangle_support",
                     "prep_training_data",
                     # round-4 final session: embedding generation, crawl
                     # management, overview pyramid
                     "hash_embed", "latest_snapshot", "domain_cap",
                     "tile_pyramid",
                     # DP simplification, crawl-graph edges + anchor
                     # text, robots filter
                     "simplify_paths_z2", "extract_links", "anchor_topk",
                     "robots_filter",
                     # product quantization (ADC search scan)
                     "topk_pq", "topk_ivfpq",
                     # composed fuzzy-dedup removal + DSIR selection
                     "near_dedup", "dsir_weights",
                     # grid-DBSCAN spatial clustering + indexed bbox query
                     "grid_clusters", "bbox_query_indexed",
                     "hilbert_tiles_z6", "nearest_segment_z6",
                     # round-4 continuation 2: backoff LM cascade,
                     # co-partitioned map matching, communities,
                     # perceptual dedup (image + audio), CCNet tiers,
                     # weighted sampling, k-core, crawl diff
                     "trigram_backoff", "nearest_segment_cells_z6",
                     "label_prop_hosts", "image_dhash_pairs",
                     "audio_fp_pairs", "ccnet_tiers", "weighted_sample",
                     "kcore_docs", "snapshot_diff",
                     # round-4 continuation 3: shuffle-free pyramid
                     # extension from encoded tiles (points + re-clipped
                     # linestrings)
                     "overzoom_z7", "overzoom_paths_z3", "downzoom_z5",
                     "overzoom_cells_z7", "pyramid_store_z4",
                     "profile_documents", "validate_documents",
                     "events_funnel", "strip_boilerplate",
                     "pca_moments", "downzoom_paths_z1",
                     "crosstab_lang_source", "ppr_hosts",
                     "set_join_exact", "downzoom_cells_z5",
                     # round 5: holed-polygon pyramid, multi-probe LSH,
                     # incremental pyramid delta update
                     "overzoom_holed_z7", "downzoom_holed_z5",
                     "ann_topk_lsh_mp", "pyramid_update_z4",
                     "near_dedup_longest", "ann_topk_ivf_extended",
                     "topk_ivfpq_refined"):
            if name in qs:
                t0 = time.time()
                res = qs[name](SF_DIR)
                if hasattr(res, "count"):
                    res.count()
                queries[name] = round(time.time() - t0, 3)
    except Exception:
        pass

    # post-sweep rtt: a clean gate + degraded post-rtt flags mid-sweep
    # window rot (per-query walls after the rot are suspect)
    extra["ray_rtt_ms_post"] = ray_rtt_ms()

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
    """Same job at N and 4N CPUs in fresh processes → scaling efficiency.

    Default pair 6/24 (override GRAFT_SCALE_N): on this 32-core box the
    Ray head daemons + driver + object-store manager need ~4-8 cores of
    headroom; num_cpus=32 oversubscribes the host and measures saturation,
    not the pipeline (8→32 read 0.36 while 6→24 reads ~0.8 on identical
    code). On a real multi-node cluster the head/daemon cost is per-node
    constant, which this pair models more faithfully.
    """
    n = int(os.environ.get("GRAFT_SCALE_N", "4"))

    def steal_ticks() -> tuple[int, int]:
        try:
            with open("/proc/stat") as fh:
                vals = list(map(int, fh.readline().split()[1:]))
            return vals[7], sum(vals)  # steal, total
        except Exception:
            return 0, 1

    def one(ncpu: int) -> dict:
        # median-of-3 inside one fresh process (per-run CPU totals vary
        # ±30% on this host; the median damps it)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_QUICK="1",
                   GRAFT_BENCH_RUNS="3",
                   GRAFT_EXPAND=str(int(os.environ.get("GRAFT_EXPAND", "200"))))
        s0, t0 = steal_ticks()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        s1, t1 = steal_ticks()
        res = json.loads(out.strip().splitlines()[-1])
        # hypervisor CPU-steal during this level, as % of all-cpu ticks:
        # measured to RISE with our own load on this sandbox (3.6% at 4
        # busy cores -> 16% at 32), systematically deflating the hi level
        res["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 1)
        return res

    # the sandbox host's speed drifts ~2x across minutes (see host_probe_ms);
    # a lo/hi pair measured minutes apart confounds drift with scaling. Run
    # interleaved pairs and report the pair with the CLOSEST host probes
    # (least drift between its two levels); all raw pairs are included.
    # ADAPTIVE: measure pairs until one is clean — max steal <= 2% at both
    # levels AND <= 15% single-core probe drift between them — or the pair
    # cap is hit. A fixed pair count kept landing entirely inside noisy
    # windows (efficiency read 0.48 where a calm window reads 0.8+ for
    # identical code).
    def mp_ceiling() -> float:
        """Ray-free multiprocessing md5 throughput at n vs 4n procs — the
        box's compute-only scaling ceiling RIGHT NOW (an upper bound for
        any pipeline; a low pipeline pair under a high ceiling implicates
        Ray IPC/object-store latency or bandwidth, not CPU)."""
        import hashlib
        import multiprocessing as mp

        def burn(q):
            t0 = time.time()
            cnt = 0
            while time.time() - t0 < 2.0:
                hashlib.md5(b"x" * 100000).digest()
                cnt += 1
            q.put(cnt)

        def level(k):
            q = mp.Queue()
            ps = [mp.Process(target=burn, args=(q,)) for _ in range(k)]
            for p in ps:
                p.start()
            tot = sum(q.get() for _ in ps)
            for p in ps:
                p.join()
            return tot

        lo = level(n)
        hi = level(4 * n)
        return round((hi / (4 * n)) / max(lo / n, 1e-9), 3)

    n_pairs = int(os.environ.get("GRAFT_SCALE_PAIRS", "6"))
    max_steal = float(os.environ.get("GRAFT_SCALE_MAX_STEAL", "2.0"))
    # neighbors can saturate memory bandwidth without showing as steal; a
    # pair only counts as clean if both levels saw near-idle bandwidth
    # (~20 GB/s idle vs ~9 under heavy contention on this box)
    min_bw = float(os.environ.get("GRAFT_SCALE_MIN_BW", "12.0"))
    pairs = []
    for _ in range(n_pairs):
        lo, hi = one(n), one(4 * n)
        eff = (hi["tiles_per_sec"] / (4 * n)) / (lo["tiles_per_sec"] / n)
        p = {
            "sec_lo": lo["value"], "sec_hi": hi["value"],
            "tiles_per_sec_lo": lo["tiles_per_sec"],
            "tiles_per_sec_hi": hi["tiles_per_sec"],
            "probe_lo_ms": lo.get("host_probe_ms", -1.0),
            "probe_hi_ms": hi.get("host_probe_ms", -1.0),
            "rtt_lo_ms": lo.get("ray_rtt_ms", -1.0),
            "rtt_hi_ms": hi.get("ray_rtt_ms", -1.0),
            "bw_lo_gbps": lo.get("bw_probe_gbps", -1.0),
            "bw_hi_gbps": hi.get("bw_probe_gbps", -1.0),
            "steal_lo_pct": lo.get("steal_pct", -1.0),
            "steal_hi_pct": hi.get("steal_pct", -1.0),
            "scaling_efficiency": round(eff, 3),
            "mp_ceiling_eff": mp_ceiling(),
        }
        pairs.append(p)
        drift = abs(p["probe_hi_ms"] - p["probe_lo_ms"]) / max(p["probe_lo_ms"], 1.0)
        if (max(p["steal_lo_pct"], p["steal_hi_pct"]) <= max_steal
                and drift <= 0.15
                and min(p["bw_lo_gbps"], p["bw_hi_gbps"]) >= min_bw):
            break  # clean window found — stop burning wall-clock
    # pick the pair least polluted by hypervisor CPU steal: measured pairs
    # swing 0.27..0.80 for identical code, tracking steal_hi (a stolen
    # 16-cpu window caps throughput at the steal ceiling, not the
    # pipeline's). Among equally-clean pairs report the MEDIAN efficiency
    # (not the max — that would bias the reported number upward); all_pairs
    # exposes the raw spread + per-level steal and single-core probe so
    # the number can be audited.
    def pair_drift(p):
        return abs(p["probe_hi_ms"] - p["probe_lo_ms"]) / max(p["probe_lo_ms"], 1.0)

    def dirt(p):
        return (max(0.0, min_bw - min(p["bw_lo_gbps"], p["bw_hi_gbps"])),
                max(p["steal_lo_pct"], p["steal_hi_pct"]),
                pair_drift(p))

    # clean = same gate as the early-break: low steal, idle bandwidth AND
    # matched single-core probes (a drifted pair compares two different
    # host speeds, corrupting the ratio in either direction)
    clean = [p for p in pairs
             if max(p["steal_lo_pct"], p["steal_hi_pct"]) <= max_steal
             and min(p["bw_lo_gbps"], p["bw_hi_gbps"]) >= min_bw
             and pair_drift(p) <= 0.15]
    if clean:
        by_eff = sorted(clean, key=lambda p: p["scaling_efficiency"])
        best = by_eff[(len(by_eff) - 1) // 2]   # median clean pair
    else:
        best = sorted(pairs, key=dirt)[0]       # least-polluted fallback
    return {
        "metric": f"scaling efficiency ({n} -> {4*n} CPUs, fresh ray.init each)",
        "n": n,
        **best,
        "all_pairs": pairs,
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
