"""Generic resumable partitioned parquet sink — checkpoint/resume for the
corpus/dedup pipelines, complementing the tile sink (mvt_io.write_tiles):

    out/
      part=<p>/data.parquet          (all rows of bucket p)
      _manifest/part-<p>.parquet     (that partition's lineage + metrics)

Design (stronger resume than the block-staged tile sink):
- rows are localized per partition with ONE keyed shuffle
  (groupby(part)), so each partition is written by exactly one task;
- that task publishes its partition ATOMICALLY (write into a private
  staging dir → os.rename → write the manifest shard LAST), so a
  partition is durable the moment its task finishes — a killed job
  resumes with every finished partition intact, not just fully-finished
  jobs (kill-mid-job asserted in tests);
- on resume, completed partitions are filtered out BEFORE the shuffle
  (manifest anti-join), so their rows never move again;
- the manifest is per-partition shard files — no driver-side manifest
  write, no single-writer bottleneck.

The partition key is any small-cardinality int64 column; ``hash_part``
derives one from an arbitrary key column (crc32 % n_parts), which is how
clean_corpus checkpoints by md5 bucket. Size n_parts so one partition
fits a worker (at 100 TB: thousands of buckets, not 16).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_part(key_col: str, n_parts: int = 16, out_col: str = "part"):
    """map_batches fn: add ``out_col`` = crc32(key) % n_parts (int64),
    deterministic across runs."""
    import zlib

    def add(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        vals = [zlib.crc32(k if isinstance(k, bytes) else str(k).encode())
                % n_parts for k in keys.to_pylist()]
        return batch.append_column(out_col,
                                   pa.array(np.asarray(vals, np.int64)))

    return add


class _PartWriter:
    """map_groups fn: write one whole partition atomically, return its
    stats row. Crash-safe publish order: data staging dir → rename →
    manifest shard last (manifest presence implies complete data)."""

    def __init__(self, out_dir: str, part_col: str,
                 fail_parts: frozenset = frozenset()) -> None:
        self.out_dir = out_dir
        self.part_col = part_col
        # test hook: simulate a mid-job crash on specific partitions
        self.fail_parts = fail_parts

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import shutil
        import time
        import uuid

        import pyarrow.parquet as pq

        p = int(df[self.part_col].iloc[0])
        if p in self.fail_parts:
            raise RuntimeError(f"injected crash on partition {p}")
        tmp = os.path.join(self.out_dir, f".tmp-part={p}-{uuid.uuid4().hex}")
        os.makedirs(tmp)
        table = pa.Table.from_pandas(df, preserve_index=False)
        pq.write_table(table, os.path.join(tmp, "data.parquet"))
        final = os.path.join(self.out_dir, f"part={p}")
        if os.path.exists(final):  # unrecorded leftover from a kill
            shutil.rmtree(final)
        os.rename(tmp, final)
        row = {
            "partition": f"part={p}", "rows": len(df),
            "bytes": int(table.nbytes), "files": 1, "status": "complete",
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "engine_version": _engine_version(),
        }
        mdir = os.path.join(self.out_dir, "_manifest")
        os.makedirs(mdir, exist_ok=True)
        mtmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(pa.Table.from_pylist([row]), mtmp)
        os.replace(mtmp, os.path.join(mdir, f"part-{p}.parquet"))
        return pd.DataFrame({"part": [p], "rows": [len(df)],
                             "bytes": [row["bytes"]]})


def write_partitioned(ds, out_dir: str, part_col: str = "part",
                      _fail_parts: frozenset = frozenset()) -> dict:
    """Write ``ds`` partitioned by the int column ``part_col``; skip
    partitions already complete in the manifest (resume anti-join,
    applied BEFORE the shuffle). Returns a summary of this run."""
    import shutil

    import pyarrow.compute as pc
    import ray

    os.makedirs(out_dir, exist_ok=True)
    for d in os.listdir(out_dir):
        if d.startswith(".tmp-part="):
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    done = completed_parts(out_dir)
    summary = {"rows": 0, "bytes": 0, "partitions": 0,
               "skipped_partitions": sorted(done)}

    if done:
        done_ref = ray.put(frozenset(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            d = ray.get(done_ref)
            parts = batch.column(part_col).to_numpy()
            mask = ~np.isin(parts, np.fromiter(d, np.int64, len(d)))
            return batch.filter(pa.array(mask))

        ds = ds.map_batches(drop_done, batch_format="pyarrow",
                            batch_size=None)

    writer = _PartWriter(out_dir, part_col, _fail_parts)

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    stats = ds.groupby(part_col).map_groups(
        write_group, batch_format="pandas",
    ).take_all()  # tiny: one row per partition

    for row in stats:
        summary["rows"] += int(row["rows"])
        summary["bytes"] += int(row["bytes"])
        summary["partitions"] += 1
    return summary


def completed_parts(out_dir: str) -> set:
    """Partition ids recorded complete in the manifest (resume anti-join)."""
    import pyarrow.parquet as pq

    mdir = os.path.join(out_dir, "_manifest")
    done = set()
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.startswith("."):
                continue
            for row in pq.read_table(os.path.join(mdir, f)).to_pylist():
                if row.get("status") == "complete":
                    done.add(int(row["partition"].split("=")[1]))
    return done


def read_partitioned(out_dir: str):
    """Read a checkpointed corpus back as a Dataset."""
    import glob

    import ray.data as rd

    paths = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    return rd.read_parquet(paths)


def _engine_version() -> str:
    from .. import __version__

    return __version__
