"""MVT corpus sinks/sources with resumable, partitioned layout.

Output layout (SURVEY.md §4 checkpoint/resume):

    out/
      z=<z>/part-<block>.parquet     (columns z,x,y,mvt,n_features)
      _manifest/part-*.parquet       (per-partition lineage + metrics)

Tiles are stored as parquet with an ``mvt:binary`` column (one row per
tile) rather than millions of tiny z/x/y.mvt files — the scale-correct
layout; ``export_zxy`` materializes individual .mvt files for
interop/debugging. Resume = anti-join completed z-partitions recorded in
the manifest (``completed_partitions``).
"""

from __future__ import annotations

import os

import pyarrow as pa


class _BlockWriter:
    """Distributed write stage: each worker writes its OWN batch's per-z
    slices into ``.tmp-z=<z>/`` staging dirs and emits one tiny stats row
    per (z, file) — tile BYTES never pass through the driver. The driver
    only consumes the stats rows (one per block) to build the manifest.
    """

    SCHEMA = pa.schema(
        [("z", pa.int32()), ("x", pa.int32()), ("y", pa.int32()),
         ("mvt", pa.binary()), ("n_features", pa.int64())]
    )

    def __init__(self, out_dir: str, done: frozenset) -> None:
        self.out_dir = out_dir
        self.done = done

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        zs, paths, tiles, feats, nbytes, invalid = [], [], [], [], [], []
        has_check = "check_code" in batch.column_names
        for z in pc.unique(batch.column("z")).to_pylist():
            if z in self.done:
                continue
            part = batch.filter(pc.equal(batch.column("z"), z))
            tmp_dir = os.path.join(self.out_dir, f".tmp-z={z}")
            os.makedirs(tmp_dir, exist_ok=True)
            fname = f"part-{uuid.uuid4().hex}.parquet"
            schema = self.SCHEMA
            if "hkey" in part.column_names:
                # Hilbert-sorted stores carry their layout key into the
                # files (file_hilbert_ranges prunes range reads on it)
                schema = schema.append(pa.field("hkey", pa.int64()))
            pq.write_table(
                part.select([c for c in schema.names]).cast(schema),
                os.path.join(tmp_dir, fname),
            )
            zs.append(z)
            paths.append(os.path.join(f"z={z}", fname))
            tiles.append(len(part))
            feats.append(int(pc.sum(part.column("n_features")).as_py() or 0))
            nbytes.append(int(pc.sum(pc.binary_length(
                part.column("mvt"))).as_py() or 0))
            invalid.append(
                int(pc.sum(pc.cast(pc.greater(part.column("check_code"), 1),
                                   "int64")).as_py() or 0) if has_check else 0)
        return pa.table({
            "z": pa.array(zs, pa.int32()),
            "path": pa.array(paths, pa.string()),
            "tiles": pa.array(tiles, pa.int64()),
            "features": pa.array(feats, pa.int64()),
            "bytes": pa.array(nbytes, pa.int64()),
            "invalid_tiles": pa.array(invalid, pa.int64()),
        })


def write_tiles(tiles_ds, out_dir: str) -> dict:
    """Write a tiles Dataset partitioned by z + a lineage manifest.

    DISTRIBUTED: workers write their blocks straight to the staging dirs
    (one file per block per z — resumable, never one giant file); only
    per-file stats rows reach the driver. Skips z-partitions already
    marked complete (resumability); partitions become visible atomically
    (staging dir + rename) and the manifest records lineage + metrics +
    the vtzero-check invalid count per partition.
    """
    import shutil
    import time

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    # clear stale staging dirs from a previously failed run
    for d in os.listdir(out_dir):
        if d.startswith(".tmp-z="):
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    done = completed_partitions(out_dir)
    summary = {"tiles": 0, "features": 0, "bytes": 0, "invalid_tiles": 0,
               "skipped_partitions": sorted(done)}

    stats = tiles_ds.map_batches(
        _BlockWriter(out_dir, frozenset(done)),
        batch_format="pyarrow", batch_size=None,
    ).take_all()  # tiny: one row per (block, z)

    counts: dict[int, dict] = {}
    for row in stats:
        z = int(row["z"])
        c = counts.setdefault(z, {"tiles": 0, "features": 0, "bytes": 0,
                                  "invalid_tiles": 0, "files": 0})
        c["tiles"] += int(row["tiles"])
        c["features"] += int(row["features"])
        c["bytes"] += int(row["bytes"])
        c["invalid_tiles"] += int(row["invalid_tiles"])
        c["files"] += 1

    manifest_rows = []
    for z, c in sorted(counts.items()):
        tmp_dir = os.path.join(out_dir, f".tmp-z={z}")
        final = os.path.join(out_dir, f"z={z}")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp_dir, final)
        manifest_rows.append({
            "partition": f"z={z}", "tiles": c["tiles"],
            "features": c["features"], "bytes": c["bytes"],
            "invalid_tiles": c["invalid_tiles"], "files": c["files"],
            "status": "complete",
            # lineage + metrics for resumable audit (north rule)
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "engine_version": _engine_version(),
        })
        for k in ("tiles", "features", "bytes", "invalid_tiles"):
            summary[k] += c[k]
    if manifest_rows:
        mdir = os.path.join(out_dir, "_manifest")
        os.makedirs(mdir, exist_ok=True)
        idx = len(os.listdir(mdir))
        pq.write_table(pa.Table.from_pylist(manifest_rows),
                       os.path.join(mdir, f"part-{idx}.parquet"))
    return summary


def _engine_version() -> str:
    from .. import __version__

    return __version__


def completed_partitions(out_dir: str) -> set:
    """z values recorded complete in the manifest (resume anti-join)."""
    import pyarrow.parquet as pq

    mdir = os.path.join(out_dir, "_manifest")
    done = set()
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            t = pq.read_table(os.path.join(mdir, f))
            for row in t.to_pylist():
                if row.get("status") == "complete":
                    done.add(int(row["partition"].split("=")[1]))
    return done


def read_tiles(out_dir: str):
    """Read a tiles corpus back as a Dataset (S1/S3 read path)."""
    import glob

    import ray.data as rd

    paths = sorted(glob.glob(os.path.join(out_dir, "z=*", "*.parquet")))
    return rd.read_parquet(paths)


def read_zxy(root_dir: str):
    """Read a z/x/y.mvt file tree back as a tiles Dataset (S1:
    read_binary_files + path-derived tile keys)."""
    import ray.data as rd

    ds = rd.read_binary_files(root_dir, include_paths=True)

    def parse(batch):
        import pyarrow as pa

        zs, xs, ys, mvts = [], [], [], []
        for path, data in zip(batch["path"], batch["bytes"]):
            parts = str(path).rstrip("/").split("/")
            y = int(parts[-1].rsplit(".", 1)[0])
            x = int(parts[-2])
            z = int(parts[-3])
            zs.append(z)
            xs.append(x)
            ys.append(y)
            mvts.append(data)
        return pa.table({
            "z": pa.array(zs, pa.int32()), "x": pa.array(xs, pa.int32()),
            "y": pa.array(ys, pa.int32()), "mvt": pa.array(mvts, pa.binary()),
        })

    return ds.map_batches(parse, batch_format="numpy")


def export_zxy(tiles_ds, out_dir: str) -> int:
    """Materialize individual z/x/y.mvt files (interop/debug; small corpora)."""
    n = 0
    for batch in tiles_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        zs = batch.column("z").to_pylist()
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        ms = batch.column("mvt").to_pylist()
        for z, x, y, m in zip(zs, xs, ys, ms):
            d = os.path.join(out_dir, str(z), str(x))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{y}.mvt"), "wb") as fh:
                fh.write(m)
            n += 1
    return n


def sort_tiles_hilbert(tiles_ds):
    """Storage-locality ordering for a tile level: append the Hilbert
    index of each (z, x, y) and GLOBALLY sort on it — Ray's sort
    range-partitions the output blocks, so the write_tiles sink (one
    file per block) emits files whose Hilbert key ranges are DISJOINT
    and ordered. A bbox/range read then touches O(contiguous files)
    instead of every file of the level (the classic Hilbert-layout
    argument: consecutive d values are 4-adjacent tiles, which
    Morton/geohash interleaving does not guarantee). Mixed-zoom input
    sorts by (z, d), keeping levels contiguous.

    This is the one deliberate GLOBAL SORT in the tile path — a layout
    investment paid once at write time, amortized over every later
    range read."""
    import numpy as np
    import pyarrow as pa

    from ..functions.geo import hilbert_d

    def add_key(t: pa.Table) -> pa.Table:
        z = t.column("z").to_numpy().astype(np.int64)
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        d = np.empty(len(t), np.int64)
        for zv in np.unique(z):
            m = z == zv
            d[m] = hilbert_d(x[m], y[m], int(zv))
        return t.append_column("hkey", pa.array((z << np.int64(52)) | d))

    return tiles_ds.map_batches(add_key, batch_format="pyarrow",
                                batch_size=None).sort("hkey")


def file_hkey_range(path: str):
    """(hkey_min, hkey_max) of one store file from parquet FOOTER
    statistics alone — no data pages read; None when the file has no
    hkey column or its stats are absent (then the caller must keep the
    file — pruning is only ever a safe superset)."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(path).metadata
    except Exception:
        return None
    try:
        ci = md.schema.to_arrow_schema().names.index("hkey")
    except ValueError:
        return None
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return int(lo), int(hi)


def file_hilbert_ranges(out_dir: str) -> list:
    """(path, hkey_min, hkey_max, rows) per data file of a store written
    from a Hilbert-sorted Dataset — the pruning index a range reader
    consults (ranges are disjoint by construction; asserted in tests)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(os.path.join(out_dir, "z=*", "*.parquet")):
        t = pq.read_table(f, columns=["hkey"])
        h = t.column("hkey").to_numpy()
        if h.size:
            out.append((f, int(h.min()), int(h.max()), int(h.size)))
    # file NAMES are uuids — key order is the index order
    return sorted(out, key=lambda r: r[1])
