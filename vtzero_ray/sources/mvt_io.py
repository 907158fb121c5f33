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


def write_tiles(tiles_ds, out_dir: str) -> dict:
    """Write a tiles Dataset partitioned by z + a lineage manifest.

    Returns summary metrics. Skips z-partitions already marked complete
    (resumability); writes are atomic per partition (tmp dir + rename).
    """
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    summary = {"tiles": 0, "features": 0, "bytes": 0, "skipped_partitions": sorted(done)}

    # partition on the driver by consuming streamed batches per z
    # (z cardinality is tiny — the data per z is what's big)
    writers: dict[int, pq.ParquetWriter] = {}
    tmp = {}
    counts: dict[int, dict] = {}
    schema = pa.schema(
        [("z", pa.int32()), ("x", pa.int32()), ("y", pa.int32()),
         ("mvt", pa.binary()), ("n_features", pa.int64())]
    )
    for batch in tiles_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        batch = batch.select([c for c in ("z", "x", "y", "mvt", "n_features") if c in batch.column_names])
        import pyarrow.compute as pc

        for z in pc.unique(batch.column("z")).to_pylist():
            if z in done:
                continue
            part = batch.filter(pc.equal(batch.column("z"), z))
            if z not in writers:
                tmp[z] = os.path.join(out_dir, f".tmp-z={z}")
                os.makedirs(tmp[z], exist_ok=True)
                writers[z] = pq.ParquetWriter(os.path.join(tmp[z], "part-0.parquet"), schema)
                counts[z] = {"tiles": 0, "features": 0, "bytes": 0}
            writers[z].write_table(part.cast(schema))
            counts[z]["tiles"] += len(part)
            counts[z]["features"] += int(pc.sum(part.column("n_features")).as_py() or 0)
            counts[z]["bytes"] += sum(len(m.as_py() or b"") for m in part.column("mvt"))
    import time

    manifest_rows = []
    for z, w in writers.items():
        w.close()
        final = os.path.join(out_dir, f"z={z}")
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp[z], final)
        manifest_rows.append({
            "partition": f"z={z}", **counts[z], "status": "complete",
            # lineage + metrics for resumable audit (north rule)
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "engine_version": _engine_version(),
        })
        summary["tiles"] += counts[z]["tiles"]
        summary["features"] += counts[z]["features"]
        summary["bytes"] += counts[z]["bytes"]
    if manifest_rows:
        mdir = os.path.join(out_dir, "_manifest")
        os.makedirs(mdir, exist_ok=True)
        idx = len(os.listdir(mdir))
        pq.write_table(pa.Table.from_pylist(manifest_rows), os.path.join(mdir, f"part-{idx}.parquet"))
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
