"""Douglas-Peucker polyline simplification over site paths.

The overview-zoom prep step (tippecanoe-style) the tiling engine needs
before encoding low-zoom tiles: keep both endpoints of every path; for
a span (lo, hi) find the interior point with the LARGEST perpendicular
metric (ties -> smallest index) and split there iff the metric exceeds
the tolerance.  The kept set is the union of all span endpoints, which
is what the recursive-CTE oracle (`dp_oracle_sql`) computes — DuckDB
re-runs the exact recursion, so the driver hash-checks a recursive
geometry algorithm end to end.

Exactness: all arithmetic is int64.  The non-degenerate comparison is
cross^2 > tol2 * len2 (equivalent to d^2 > tol2 with d^2 =
cross^2/len2, but division-free); coincident span endpoints degrade to
point-distance^2 > tol2.  Within one span len2 is constant, so argmax
over cross^2 is argmax over d^2.  When cross^2 or tol2*len2 could
overflow int64 (world coords at high zooms), the affected span falls
back to exact Python-int arithmetic — same results, any magnitude.

Scale shape: DP needs the whole path, so points shuffle ONCE on a
site-bucket key (site cardinality bounded — the pipelines/paths.py
partitioning assumption); per-span metrics are vectorized NumPy; the
output is kept points only (paths only ever shrink).

The reference has no simplification (vtzero encodes what it is given,
builder.hpp geometry builders); this is brief-driven overview-tile
support layered on the same world-coordinate path derivation as
pipelines/clip_paths.py (consecutive-dup drop mirrored from
_site_segments / the oracle's `e` CTE).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# coordinate spans below this keep every vectorized intermediate inside
# int64 (|cross| <= 2*span^2 < 2^63; degenerate d2 <= 2*span^2 likewise)
_SAFE_SPAN = 1 << 30


def _metric_num_scalar(xa: int, ya: int, xb: int, yb: int,
                       px: int, py: int) -> tuple[int, int]:
    """(metric numerator, threshold multiplier) for one point — exact
    Python ints.  Non-degenerate: (cross^2, len2); degenerate: (d2, 1)."""
    dx, dy = xb - xa, yb - ya
    if dx == 0 and dy == 0:
        return (px - xa) ** 2 + (py - ya) ** 2, 1
    cross = dx * (py - ya) - dy * (px - xa)
    return cross * cross, dx * dx + dy * dy


def dp_keep_mask_scalar(wx, wy, tol2: int) -> np.ndarray:
    """Recursive pure-Python reference (exact int arithmetic) — the
    byte-identity twin for the vectorized mask."""
    wx = [int(v) for v in wx]
    wy = [int(v) for v in wy]
    n = len(wx)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    tol2 = int(tol2)

    def rec(lo: int, hi: int) -> None:
        if hi <= lo + 1:
            return
        best_i, best_num, best_len2 = -1, -1, 1
        for i in range(lo + 1, hi):
            num, len2 = _metric_num_scalar(wx[lo], wy[lo], wx[hi], wy[hi],
                                           wx[i], wy[i])
            # same-span len2 is constant, so comparing numerators is
            # comparing distances; first-max keeps the smallest index
            if num > best_num:
                best_i, best_num, best_len2 = i, num, len2
        if best_num > tol2 * best_len2:
            keep[best_i] = True
            rec(lo, best_i)
            rec(best_i, hi)

    rec(0, n - 1)
    return keep


def dp_keep_mask(wx: np.ndarray, wy: np.ndarray, tol2: int) -> np.ndarray:
    """Iterative stack DP over one path — vectorized int64 metrics with
    an exact Python-int fallback for overflow-risk spans."""
    wx = np.asarray(wx, dtype=np.int64)
    wy = np.asarray(wy, dtype=np.int64)
    n = wx.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    tol2 = int(tol2)
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi <= lo + 1:
            continue
        xa, ya = int(wx[lo]), int(wy[lo])
        xb, yb = int(wx[hi]), int(wy[hi])
        px = wx[lo + 1:hi]
        py = wy[lo + 1:hi]
        dx, dy = xb - xa, yb - ya
        # span guard BEFORE any arithmetic that could wrap: full
        # coordinate range of the span (endpoints included)
        span = max(max(int(px.max()), xa, xb) - min(int(px.min()), xa, xb),
                   max(int(py.max()), ya, yb) - min(int(py.min()), ya, yb))
        if span >= _SAFE_SPAN:  # exact big-int fallback, span-local
            best_i, best_num, len2 = -1, -1, 1
            for i in range(lo + 1, hi):
                v, len2b = _metric_num_scalar(xa, ya, xb, yb,
                                              int(wx[i]), int(wy[i]))
                if v > best_num:
                    best_i, best_num, len2 = i, v, len2b
            m, split = best_i, best_num > tol2 * len2
        elif dx == 0 and dy == 0:
            num = (px - xa) ** 2 + (py - ya) ** 2  # <= 2*span^2, int64-safe
            j = int(np.argmax(num))
            m = lo + 1 + j
            split = int(num[j]) > tol2  # exact Python ints
        else:
            # rank by |cross| (monotone with cross^2, same first-max);
            # the single threshold compare squares in Python ints
            cross = dx * (py - ya) - dy * (px - xa)
            absc = np.abs(cross)
            j = int(np.argmax(absc))
            m = lo + 1 + j
            c = int(absc[j])
            split = c * c > tol2 * (dx * dx + dy * dy)
        if split:
            keep[m] = True
            stack.append((m, hi))
            stack.append((lo, m))
    return keep


def _simplify_bucket(df: pd.DataFrame, tol2: int) -> pd.DataFrame:
    """One site bucket -> kept points (site, pt_idx, wx, wy): sort by
    doc_id, drop consecutive dups (the `e` CTE), then DP per site."""
    out = []
    for site, g in df.groupby("site", sort=False):
        g = g.sort_values("doc_id", kind="stable")
        wx = g["wx"].to_numpy(np.int64)
        wy = g["wy"].to_numpy(np.int64)
        dedup = np.ones(len(g), dtype=bool)
        dedup[1:] = (wx[1:] != wx[:-1]) | (wy[1:] != wy[:-1])
        wx, wy = wx[dedup], wy[dedup]
        if wx.shape[0] == 0:
            continue
        mask = dp_keep_mask(wx, wy, tol2)
        idx = np.flatnonzero(mask).astype(np.int64)
        out.append(pd.DataFrame({
            "site": np.full(idx.shape[0], site, np.int64),
            "pt_idx": idx,
            "wx": wx[mask], "wy": wy[mask],
        }))
    if not out:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                             ("site", "pt_idx", "wx", "wy")})
    return pd.concat(out, ignore_index=True)


def simplify_paths(pts_ds, tol2: int, n_buckets: int = 16):
    """(site, doc_id, wx, wy) points -> DP-kept (site, pt_idx, wx, wy).

    ONE site-bucket shuffle co-locates each path; per-bucket work is
    vectorized; only kept points come back (output <= input)."""
    def bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column("site").to_numpy() % n_buckets).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    pts = pts_ds.map_batches(bucket, batch_format="pyarrow", batch_size=None)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return _simplify_bucket(df.drop(columns=["bucket"]), tol2)

    out = pts.groupby("bucket").map_groups(run, batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow",
                           batch_size=None)


def dp_oracle_sql(e_ctes: str, tol2: int) -> str:
    """Recursive-CTE oracle: ``e_ctes`` must define CTE bodies ending in
    ``e(site, doc_id, wx, wy, pt_idx)`` (the consecutive-dup-dropped
    site paths — the clip oracle's prefix).  The recursion re-runs DP
    exactly: spans start whole, each level splits at the max-metric
    interior point (ties -> smallest pt_idx); kept = distinct span
    endpoints."""
    tol2 = int(tol2)
    metric = ("(CASE WHEN a.wx = b.wx AND a.wy = b.wy "
              "THEN (p.wx-a.wx)*(p.wx-a.wx)+(p.wy-a.wy)*(p.wy-a.wy) "
              "ELSE ((b.wx-a.wx)*(p.wy-a.wy)-(b.wy-a.wy)*(p.wx-a.wx))"
              "*((b.wx-a.wx)*(p.wy-a.wy)-(b.wy-a.wy)*(p.wx-a.wx)) END)")
    thresh = (f"(CASE WHEN a.wx = b.wx AND a.wy = b.wy THEN {tol2} "
              f"ELSE {tol2}*((b.wx-a.wx)*(b.wx-a.wx)"
              f"+(b.wy-a.wy)*(b.wy-a.wy)) END)")
    return (
        f"WITH RECURSIVE {e_ctes}, "
        "spans(site, lo, hi) AS ("
        "SELECT site, MIN(pt_idx), MAX(pt_idx) FROM e GROUP BY site "
        "UNION ALL "
        "SELECT s.site, CASE WHEN sides.side = 0 THEN s.lo ELSE s.m END, "
        "CASE WHEN sides.side = 0 THEN s.m ELSE s.hi END FROM ("
        "SELECT sp.site, sp.lo, sp.hi, "
        "(SELECT p.pt_idx FROM e p "
        "JOIN e a ON a.site = sp.site AND a.pt_idx = sp.lo "
        "JOIN e b ON b.site = sp.site AND b.pt_idx = sp.hi "
        "WHERE p.site = sp.site AND p.pt_idx > sp.lo AND p.pt_idx < sp.hi "
        f"AND {metric} > {thresh} "
        f"ORDER BY {metric} DESC, p.pt_idx ASC LIMIT 1) AS m "
        "FROM spans sp WHERE sp.hi > sp.lo + 1) s "
        "JOIN (VALUES (0), (1)) sides(side) ON TRUE "
        "WHERE s.m IS NOT NULL) "
        "SELECT site, pt_idx, wx, wy FROM e WHERE (site, pt_idx) IN ("
        "SELECT (site, lo) FROM spans UNION SELECT (site, hi) FROM spans) "
        "ORDER BY site, pt_idx"
    )
