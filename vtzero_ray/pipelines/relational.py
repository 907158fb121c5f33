"""General relational operators over the TPC-H-ish tables — demonstrates
the engine's query surface beyond tiling: pruned reads, vectorized filters,
partial pre-aggregation before the groupby shuffle, broadcast hash joins,
sort/top-k, and windowed (streaming-shaped) aggregates.

Float aggregates are rounded (6dp) AFTER aggregation so results hash-match
the DuckDB oracle despite summation-order differences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _round_cols(ds, cols: dict[str, int]):
    def f(batch: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            if c in batch.column_names:
                i = batch.column_names.index(c)
                batch = batch.set_column(
                    i, c, pc.round(batch.column(c), ndigits=nd)
                )
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan → PARTIAL per-batch pre-aggregate →
    tiny groupby merge (ray_guide 'Aggregation at scale')."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00.000000"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff))
        df = batch.to_pandas()
        # exact integer arithmetic: prices have 2 decimals, discounts 2 →
        # sums in cents / basis-point-cents are ORDER-INDEPENDENT (float
        # summation order differs between engines and exceeds rounding
        # tolerance at sf>=0.1)
        qty_c = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        price_c = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_bp = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        disc_price = price_c * (100 - disc_bp)  # cents x 100
        df = df.assign(qty_c=qty_c, price_c=price_c, disc_price_c2=disc_price)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_cents=("qty_c", "sum"),
            sum_base_price_cents=("price_c", "sum"),
            sum_disc_price_c2=("disc_price_c2", "sum"),
            count_order=("qty_c", "count"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    from ray.data.aggregate import Sum

    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents"), Sum("sum_base_price_cents"),
        Sum("sum_disc_price_c2"), Sum("count_order")
    )
    return agg.rename_columns({
        "sum(sum_qty_cents)": "sum_qty_cents",
        "sum(sum_base_price_cents)": "sum_base_price_cents",
        "sum(sum_disc_price_c2)": "sum_disc_price_c2",
        "sum(count_order)": "count_order",
    })


def orders_by_segment(sf_dir: str):
    """Broadcast hash join: orders (big) × customer (small, ray.put once)
    → orders count + total price per market segment."""
    import ray
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]).to_pandas()
    # broadcast as (sorted keys, dictionary codes, categories): the
    # per-batch lookup is a vectorized searchsorted + take, not a
    # per-row Python dict probe (VERDICT r4 #6)
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    order = np.argsort(ck, kind="stable")
    cats, codes = np.unique(cust["c_mktsegment"].to_numpy()[order],
                            return_inverse=True)
    seg_map = ray.put((ck[order], codes.astype(np.int64), cats))

    class JoinSeg:
        def __init__(self) -> None:
            self.keys, self.codes, self.cats = ray.get(seg_map)
            self.cat_arr = pa.array(self.cats, pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch.column("o_custkey").to_numpy().astype(np.int64)
            pos = np.searchsorted(self.keys, k)
            if (pos >= self.keys.shape[0]).any() or \
                    (self.keys[np.minimum(pos, self.keys.shape[0] - 1)]
                     != k).any():
                raise ValueError("orders_by_segment: o_custkey missing "
                                 "from customer")
            seg = pa.compute.take(self.cat_arr,
                                  pa.array(self.codes[pos], pa.int64()))
            return batch.append_column("c_mktsegment", seg)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(JoinSeg, batch_format="pyarrow", concurrency=(1, 4))

    def to_cents(batch: pa.Table) -> pa.Table:
        c = np.round(batch.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        return batch.append_column("price_cents", pa.array(c))

    joined = joined.map_batches(to_cents, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    agg = joined.groupby("c_mktsegment").aggregate(Count(), Sum("price_cents"))
    return agg.rename_columns({"count()": "n_orders",
                               "sum(price_cents)": "total_price_cents"})


def top_orders(sf_dir: str, k: int = 10):
    """Global sort / top-k (A8): k highest-value orders."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def revenue_by_priority(sf_dir: str, num_partitions: int = 16):
    """Large x large hash join: lineitem ⋈ orders on orderkey
    (Dataset.join, hash-partitioned) → exact integer-cent revenue per
    order priority. The one genuinely shuffling join in the suite (both
    sides too big to broadcast at scale)."""
    import ray.data as rd

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_cents(batch: pa.Table) -> pa.Table:
        price_c = np.round(batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_bp = np.round(batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "revenue_c2": pa.array(price_c * (100 - disc_bp)),
        })

    li = li.map_batches(li_cents, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    from ray.data.aggregate import Count, Sum

    agg = joined.groupby("o_orderpriority").aggregate(Count(), Sum("revenue_c2"))
    return agg.rename_columns({"count()": "n_items", "sum(revenue_c2)": "revenue_c2"})


def top_unshipped_orders(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", k: int = 10,
                         num_partitions: int = 16):
    """TPC-H Q3 shape — the three-table composition: broadcast semi-join
    (customer keys of one segment, tiny side via ray.put) prunes orders,
    the pruned orders shuffle-join lineitem (Dataset.join, hash
    partitioned), then groupby-sum in exact integer cents and global
    top-k. Every filter is pushed below the shuffle so only
    (l_orderkey, revenue_c2) and the pruned orders move."""
    import ray
    import ray.data as rd

    cut = np.datetime64(f"{cutoff}T00:00:00.000000")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys_ref = ray.put(np.sort(
        cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy()))

    class SemiJoinCust:
        def __init__(self) -> None:
            self.keys = pa.array(ray.get(keys_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column("o_custkey"), value_set=self.keys)
            return batch.filter(mask).select(["o_orderkey", "o_orderdate"])

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cut_scalar = pa.scalar(cut, pa.timestamp("us"))
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t.column("o_orderdate"), cut_scalar)),
        batch_format="pyarrow",
    ).map_batches(SemiJoinCust, batch_format="pyarrow", concurrency=(1, 4))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def li_revenue(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch.column("l_shipdate"), cut_scalar))
        price_c = np.round(batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_bp = np.round(batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "revenue_c2": pa.array(price_c * (100 - disc_bp)),
        })

    li = li.map_batches(li_revenue, batch_format="pyarrow")
    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    from ray.data.aggregate import Sum

    agg = joined.groupby(["l_orderkey", "o_orderdate"]).aggregate(Sum("revenue_c2"))
    agg = agg.rename_columns({"sum(revenue_c2)": "revenue_c2"})
    return agg.sort(["revenue_c2", "l_orderkey"], descending=[True, False]).limit(k)


def events_tumbling_window(sf_dir: str, window_s: int = 3600):
    """Streaming-shaped tumbling window: per (event_type, hour) count +
    rounded value sum. Window key computed vectorized per batch; the only
    shuffle is the small grouped merge."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[s]").astype(np.int64)
        w = (ts // window_s) * window_s
        return batch.append_column(
            "window_start",
            pa.array(w.astype("datetime64[s]").astype("datetime64[us]")),
        )

    ds = ds.map_batches(add_window, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    agg = ds.groupby(["event_type", "window_start"]).aggregate(Count(), Sum("value"))
    agg = agg.rename_columns({"count()": "n_events", "sum(value)": "sum_value"})
    return _round_cols(agg, {"sum_value": 6})


def events_hopping_window(sf_dir: str, window_s: int = 3600, hop_s: int = 900):
    """Hopping (sliding) window: each event contributes to window_s/hop_s
    overlapping windows — the window-explode is vectorized per batch and
    the only shuffle is the grouped merge over (event_type, window_start)
    (bounded cardinality: types x time-range/hop)."""
    import ray.data as rd

    k = window_s // hop_s
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[s]").astype(np.int64)
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        val = batch.column("value").to_numpy()
        base = (ts // hop_s) * hop_s
        starts = (base[:, None] - hop_s * np.arange(k, dtype=np.int64)[None, :]).reshape(-1)
        idx = np.repeat(np.arange(len(ts)), k)
        return pa.table({
            "event_type": et.take(pa.array(idx)),
            "window_start": pa.array(
                starts.astype("datetime64[s]").astype("datetime64[us]")),
            "value": pa.array(val[idx]),
        })

    ds = ds.map_batches(explode, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    agg = ds.groupby(["event_type", "window_start"]).aggregate(Count(), Sum("value"))
    agg = agg.rename_columns({"count()": "n_events", "sum(value)": "sum_value"})
    return _round_cols(agg, {"sum_value": 6})


def events_asof_last_order(sf_dir: str, n_buckets: int = 32):
    """As-of join (streaming-shaped): each event joined to the LATEST order
    of the matching customer with orderdate <= event time.

    Ray shape (ray_guide as-of pattern): BOTH sides bucketed by the key
    (user_id % K), unioned, and each bucket resolved with one VECTORIZED
    ``pd.merge_asof`` over time-sorted frames — no driver materialization
    of either table, no per-row Python. Events' user_id maps onto
    o_custkey for the synthetic schema.
    """
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id"])

    # common schema for the union: (bucket, kind, id, ts_us, user_id)
    def prep_orders(t: pa.Table) -> pa.Table:
        uid = t.column("o_custkey").cast(pa.int64())
        ts = t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "bucket": pa.compute.cast(
                pa.compute.subtract(uid, pa.compute.multiply(
                    pa.compute.divide(uid, n_buckets), n_buckets)), pa.int32()),
            "kind": pa.array(np.ones(len(t), np.int8)),
            "id": t.column("o_orderkey").cast(pa.int64()),
            "ts_us": ts,
            "user_id": uid,
        })

    def prep_events(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").cast(pa.int64())
        ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "bucket": pa.compute.cast(
                pa.compute.subtract(uid, pa.compute.multiply(
                    pa.compute.divide(uid, n_buckets), n_buckets)), pa.int32()),
            "kind": pa.array(np.zeros(len(t), np.int8)),
            "id": t.column("event_id").cast(pa.int64()),
            "ts_us": ts,
            "user_id": uid,
        })

    both = events.map_batches(prep_events, batch_format="pyarrow").union(
        orders.map_batches(prep_orders, batch_format="pyarrow"))

    def asof_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["kind"] == 0]
        od = df[df["kind"] == 1]
        # sort orders by (ts, orderkey): merge_asof backward takes the LAST
        # row at an equal timestamp → ties resolve to the max o_orderkey
        ev = ev.sort_values("ts_us", kind="stable")
        od = od.sort_values(["ts_us", "id"], kind="stable")
        merged = pd.merge_asof(
            ev[["id", "ts_us", "user_id"]],
            od[["id", "ts_us", "user_id"]].rename(columns={"id": "o_orderkey"}),
            on="ts_us", by="user_id", direction="backward",
        )
        return pd.DataFrame({
            "event_id": merged["id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "o_orderkey": merged["o_orderkey"].fillna(-1).astype("int64"),
        })

    out = both.groupby("bucket").map_groups(asof_bucket, batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow")


def orders_shipped_in_range(sf_dir: str, window_days: int = 7):
    """Range (band/interval) join: for every order, the count and total
    quantity of lineitem shipments — ANY order's items — whose
    ``l_shipdate`` falls in ``[o_orderdate, o_orderdate + window]``
    (both ends inclusive). This is the brief's "range join" operator:
    neither an equi-join key nor an as-of point lookup, but a time-band
    predicate between two large tables.

    Ray shape — ONE bucketed shuffle, NO pair materialization:
    time is bucketed at exactly the window width W, so every probe
    interval ``[t0, t0+W]`` touches at most two adjacent buckets. Probes
    (orders) land in their single home bucket ``t0 // W``; build points
    (shipments) are replicated into their own bucket and the previous
    one, which co-locates every candidate with its probes. Per bucket the
    band lookup is two vectorized ``np.searchsorted`` calls over the
    sorted shipment times plus a prefix-sum for the quantity total —
    counts and sums come out WITHOUT materializing the pair explosion
    (O((n+m) log m) per bucket; at 100 TB the pair count can be 1000x the
    input and never exists here). Each build point lives in exactly one
    home bucket, so per-probe results are exact in one group — no second
    combine shuffle. Bucket count is time-range / window (bounded, ~350
    here), satisfying the fixed-group-count shuffle invariant.

    Quantities are summed in integer cents (order-independent; matches
    the DuckDB oracle bit-exactly). Orders with zero shipments in range
    are emitted with n_shipped = 0 (LEFT-join semantics).
    """
    import ray.data as rd

    w_s = window_days * 86400

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_quantity"])

    def prep_orders(t: pa.Table) -> pa.Table:
        t0 = t.column("o_orderdate").cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy() // 1_000_000
        return pa.table({
            "bucket": pa.array(t0 // w_s),
            "kind": pa.array(np.zeros(len(t), np.int8)),
            "key": t.column("o_orderkey").cast(pa.int64()),
            "t_s": pa.array(t0),
            "qty_c": pa.array(np.zeros(len(t), np.int64)),
        })

    def prep_shipments(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy() // 1_000_000
        qty_c = np.round(t.column("l_quantity").to_numpy() * 100).astype(np.int64)
        b = ship // w_s
        n = len(ship)
        # replicate each point into (its bucket, its bucket - 1): probes in
        # bucket b see candidates from [b*W, (b+2)*W) ⊇ [t0, t0+W] ∀ t0∈b
        return pa.table({
            "bucket": pa.array(np.concatenate([b, b - 1])),
            "kind": pa.array(np.ones(2 * n, np.int8)),
            "key": pa.array(np.zeros(2 * n, np.int64)),
            "t_s": pa.array(np.concatenate([ship, ship])),
            "qty_c": pa.array(np.concatenate([qty_c, qty_c])),
        })

    both = orders.map_batches(prep_orders, batch_format="pyarrow").union(
        li.map_batches(prep_shipments, batch_format="pyarrow"))

    def resolve_bucket(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        ts = t.column("t_s").to_numpy()
        probe = kind == 0
        pt = ts[probe]
        if len(pt) == 0:  # build-only bucket (e.g. the b-1 replicas' edge)
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "n_shipped": pa.array([], pa.int64()),
                             "qty_cents": pa.array([], pa.int64())})
        keys = t.column("key").to_numpy()[probe]
        bt = ts[~probe]
        bq = t.column("qty_c").to_numpy()[~probe]
        order = np.argsort(bt, kind="stable")
        bt = bt[order]
        pref = np.concatenate([np.zeros(1, np.int64), np.cumsum(bq[order])])
        lo = np.searchsorted(bt, pt, "left")
        hi = np.searchsorted(bt, pt + w_s, "right")
        return pa.table({
            "o_orderkey": pa.array(keys),
            "n_shipped": pa.array((hi - lo).astype(np.int64)),
            "qty_cents": pa.array(pref[hi] - pref[lo]),
        })

    return both.groupby("bucket").map_groups(
        resolve_bucket, batch_format="pyarrow")


def events_sessionize(sf_dir: str, gap_s: int = 1800, n_buckets: int = 64):
    """Session windows per user: BUCKETED sessionization — user_id is the
    highest-cardinality key in the schema, so the shuffle groups by
    user_id % K (fixed group count) and each bucket sessionizes EVERY user
    in one vectorized pass (sort by (user, ts), session break = user change
    or gap > threshold, cumsum ids). Returns per-session aggregates."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").cast(pa.int64())
        b = pa.compute.subtract(uid, pa.compute.multiply(
            pa.compute.divide(uid, n_buckets), n_buckets))
        return t.append_column("bucket", pa.compute.cast(b, pa.int32()))

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="stable")
        gap = df["ts"].diff().dt.total_seconds().fillna(np.inf)
        new_user = df["user_id"].ne(df["user_id"].shift())
        sid = (new_user | (gap > gap_s)).cumsum()
        g = df.groupby(sid)
        out = pd.DataFrame({
            "user_id": g["user_id"].first(),
            "session_start": g["ts"].min(),
            "session_end": g["ts"].max(),
            "n_events": g.size(),
            "sum_value": g["value"].sum().round(6),
        })
        return out.reset_index(drop=True)

    out = ds.groupby("bucket").map_groups(sessions, batch_format="pandas")
    return out.map_batches(lambda t: t.drop_columns(["bucket"]) if "bucket" in t.column_names else t,
                           batch_format="pyarrow")


def events_funnel(sf_dir: str, steps=("view", "click", "purchase"),
                  n_buckets: int = 64):
    """Ordered funnel completion — how many users performed step 1, then
    step 2 AFTER it, then step 3 after that (the product-analytics
    funnel; strict "first occurrence after the previous step" semantics)
    → Dataset (step, event_type, n_users), n_users non-increasing.

    Shape: the read prunes to the funnel's event types (order among a
    user's KEPT events is what the semantics need, so filtering first is
    free); ONE user-bucket shuffle co-locates each user's events, every
    bucket resolves all of its users' step positions vectorized (per-step
    masked group-min over the (ts, event_id) sequence order), and the
    per-bucket step counts merge in one output-sized task."""
    import ray.data as rd

    steps = list(steps)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "event_type",
                                  "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pa.compute.is_in(et, value_set=pa.array(steps))
        t = t.filter(keep)
        u = t.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column("bucket", pa.array((u % n_buckets)
                                                  .astype(np.int32)))

    def funnel_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="stable").reset_index(drop=True)
        df["seq"] = df.groupby("user_id", sort=False).cumcount()
        prev = None  # Series: user_id -> position of the previous step
        counts = []
        for s in steps:
            m = df[df["event_type"] == s]
            if prev is not None:
                p = m["user_id"].map(prev)
                m = m[p.notna().to_numpy()
                      & (m["seq"].to_numpy() > p.fillna(-1).to_numpy())]
            cur = m.groupby("user_id", sort=False)["seq"].min()
            counts.append(len(cur))
            prev = cur
        return pd.DataFrame({
            "step": np.arange(len(steps), dtype=np.int64),
            "event_type": steps,
            "n_users": np.array(counts, np.int64)})

    parts = ds.map_batches(prep, batch_format="pyarrow", batch_size=None) \
        .groupby("bucket").map_groups(funnel_bucket, batch_format="pandas")

    def merge(t: pa.Table) -> pa.Table:
        k = len(steps)
        tot = np.zeros(k, np.int64)
        np.add.at(tot, t.column("step").to_numpy(), 
                  t.column("n_users").to_numpy())
        return pa.table({
            "step": pa.array(np.arange(k, dtype=np.int64)),
            "event_type": pa.array(steps),
            "n_users": pa.array(tot)})

    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


def events_funnel_sql(steps=("view", "click", "purchase")) -> str:
    """Exact twin: same event-type prefilter (order among KEPT events is
    what funnel semantics use), same (ts, event_id) sequence order, same
    strict first-occurrence-after chain."""
    steps = list(steps)
    vals = ", ".join(f"'{s}'" for s in steps)
    parts = [
        f"WITH pos AS (SELECT user_id, event_type, "
        f"row_number() OVER (PARTITION BY user_id "
        f"ORDER BY ts, event_id) - 1 AS seq "
        f"FROM events WHERE event_type IN ({vals}))"]
    prev = None
    for i, s in enumerate(steps):
        if prev is None:
            parts.append(
                f", s{i} AS (SELECT user_id, MIN(seq) AS p FROM pos "
                f"WHERE event_type = '{s}' GROUP BY 1)")
        else:
            parts.append(
                f", s{i} AS (SELECT pos.user_id, MIN(seq) AS p FROM pos "
                f"JOIN s{prev} ON pos.user_id = s{prev}.user_id "
                f"WHERE event_type = '{s}' AND seq > s{prev}.p "
                f"GROUP BY 1)")
        prev = i
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS step, '{s}' AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i}"
        for i, s in enumerate(steps)]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


def crosstab_counts(ds, row_key: str, col_key: str):
    """Contingency table (pivot on counts): → one row per row_key value
    with one count column per col_key value (sorted, prefixed
    ``n_<value>``) plus ``total``. Both key cardinalities must be
    category-bounded (the pivot contract) — the per-batch partial is a
    dictionary-coded 2-D bincount, so only (r, c, n) triples leave each
    task and the merge is ONE output-sized task with NO shuffle at all.
    """

    def partial(t: pa.Table) -> pa.Table:
        rk = pa.compute.dictionary_encode(_as_string(t.column(row_key)))
        ck = pa.compute.dictionary_encode(_as_string(t.column(col_key)))
        if isinstance(rk, pa.ChunkedArray):
            rk = rk.combine_chunks()
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        ri = rk.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ci = ck.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nr = len(rk.dictionary)
        nc = len(ck.dictionary)
        if nr == 0 or nc == 0:
            return pa.table({"r": pa.array([], pa.string()),
                             "c": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cnt = np.bincount(ri * nc + ci, minlength=nr * nc) \
            .reshape(nr, nc)
        rr, cc = np.nonzero(cnt)
        return pa.table({
            "r": rk.dictionary.take(pa.array(rr)),
            "c": ck.dictionary.take(pa.array(cc)),
            "n": pa.array(cnt[rr, cc].astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        tot = df.groupby(["r", "c"], sort=True)["n"].sum().reset_index()
        wide = tot.pivot(index="r", columns="c", values="n") \
            .fillna(0).astype(np.int64)
        wide = wide[sorted(wide.columns)]
        out = pd.DataFrame({row_key: wide.index.to_numpy()})
        for c in wide.columns:
            out[f"n_{c}"] = wide[c].to_numpy()
        out["total"] = wide.sum(axis=1).to_numpy()
        return pa.Table.from_pandas(out.sort_values(row_key)
                                    .reset_index(drop=True),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)


def _as_string(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.compute.cast(arr, pa.string())


def crosstab_sql(table: str, row_key: str, col_key: str,
                 col_values) -> str:
    """Exact twin — one conditional sum per (sorted) column value; the
    caller supplies the column domain (the driver query pins it so the
    output schema is stable)."""
    cols = ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE CAST({col_key} AS VARCHAR) = '{v}') "
        f"AS BIGINT) AS n_{v}"
        for v in sorted(col_values))
    return (f"SELECT CAST({row_key} AS VARCHAR) AS {row_key}, {cols}, "
            f"CAST(COUNT(*) AS BIGINT) AS total "
            f"FROM {table} GROUP BY 1")
