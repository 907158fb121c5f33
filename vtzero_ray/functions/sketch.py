"""Mergeable sketches for distributed aggregates (ray_guide: emit one
serialized sketch per batch, merge in a tiny second stage).

HyperLogLog (p-bit register array, standard bias-corrected estimator):
deterministic (blake2b hashes), exact merge = elementwise max — the shape
every distributed sketch follows, so partial sketches stream through a
small groupby instead of shuffling raw values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> None:
        """Add 64-bit hashes (vectorized)."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of rest + 1, capped
        lz = np.zeros(h.shape[0], dtype=np.uint8)
        cur = rest.copy()
        mask_top = np.uint64(1) << np.uint64(63)
        alive = np.ones(h.shape[0], dtype=bool)
        for _ in range(64 - self.p + 1):
            top = (cur & mask_top) == 0
            inc = alive & top
            if not inc.any():
                break
            lz[inc] += 1
            alive &= top
            cur <<= np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, values) -> None:
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(
                (v if isinstance(v, bytes) else str(v).encode()),
                digest_size=8).digest(), "little") for v in values),
            dtype=np.uint64, count=len(values),
        )
        self.add_hashes(hs)

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        return cls(b[0], np.frombuffer(b[1:], dtype=np.uint8).copy())


def approx_distinct(ds, column: str, p: int = 12):
    """Distributed approximate distinct count: per-batch partial HLL
    sketches → driver-side merge of ~#blocks tiny blobs (no value shuffle).

    Returns a 1-row pandas DataFrame: (column, approx_distinct).
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_strings(batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = HLL(p)
    for row in parts.take_all():
        merged = merged.merge(HLL.from_bytes(row["sketch"]))
    return pd.DataFrame({"column": [column],
                         "approx_distinct": [int(round(merged.estimate()))]})
