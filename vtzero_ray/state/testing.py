"""Fault-injection helpers for resilience tests (importable in workers)."""

from __future__ import annotations

import os

import pyarrow as pa


class FlakyOnce:
    """map_batches fn that fails the FIRST time each distinct block is
    seen (file-flag based, so the Ray retry — possibly in a different
    worker process — succeeds)."""

    def __init__(self, flag_dir: str) -> None:
        self.flag_dir = flag_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = str(batch.column("doc_id")[0].as_py())
        flag = os.path.join(self.flag_dir, f"seen-{key}")
        if not os.path.exists(flag):
            open(flag, "w").close()
            raise RuntimeError("injected transient failure")
        return batch
