"""Skew-aware tile assembly: cold tiles via the bucketed kernel, hot tiles
via the salted shard encoder (stages/shard_encode.py).

FUSED plan (one data-sized shuffle for the hot side; NO full-input
materialize):
1. per-batch partial tile counts → tiny groupby(z,x,y) sum → hot set
   (collected to the driver: #hot tiles is small by definition; broadcast
   via ray.put). Streaming — the upstream re-executes from lineage for
   pass 2 (recomputation over a pruned read beats materializing the full
   feature table into the object store at 100 TB).
2. cold features → add_tile_bucket → groupby(bucket) → vectorized kernel.
3. hot features → ONE groupby(z,x,y,salt) that PACKS each shard's sorted
   arrays AND its interning stats (per-lang first ranks) into a single
   row; only the packed HOT shards materialize (bounded by the hot
   fraction, not the input).
4. tiny stat columns → driver builds the interning PLAN (ranks/bases/
   lang indexes) → broadcast; encode is then a plain map_batches over the
   packed shards — no second shuffle — then groupby(z,x,y) merge_shards
   (byte concat over a few rows per tile).
5. union(cold, hot).

The only data-sized shuffles are keyed on (bucket) and (z,x,y,salt) — the
salt bounds any single group at ~hot_tile/n_salt rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.encode import PointTileAssembler, add_tile_bucket
from ..stages.shard_encode import encode_shard, merge_shards


def _tile_counts(ds):
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["z", "x", "y"]).aggregate([("doc_id", "count")])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    from ray.data.aggregate import Sum

    agg = partials.groupby(["z", "x", "y"]).aggregate(Sum("doc_id_count"))
    return agg.rename_columns({"sum(doc_id_count)": "n"})


def sharded_tiles(ds, hot_threshold: int, n_salt: int = 16, extent: int = 4096):
    import ray

    # pass 1: STREAMING narrow counts (no materialize; lineage recompute).
    # Filter to the hot SET before to_pandas — the driver holds O(hot
    # tiles), never the full 4^z per-tile count frame (VERDICT r3 #5).
    import pyarrow.compute as pc

    hot = _tile_counts(ds).map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), hot_threshold)),
        batch_format="pyarrow", batch_size=None).to_pandas()
    hot_keys = set(zip(hot.z, hot.x, hot.y))
    if not hot_keys:
        cold = ds.map_batches(add_tile_bucket, batch_format="pyarrow")
        return cold.groupby("bucket").map_groups(
            PointTileAssembler(extent=extent), batch_format="pyarrow"
        )
    hot_ref = ray.put(hot_keys)

    def split(batch: pa.Table, want_hot: bool) -> pa.Table:
        keys = ray.get(hot_ref)
        z = batch.column("z").to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        mask = np.fromiter(((int(a), int(b), int(c)) in keys
                            for a, b, c in zip(z, x, y)),
                           count=len(batch), dtype=bool)
        return batch.filter(pa.array(mask if want_hot else ~mask))

    cold = ds.map_batches(split, batch_format="pyarrow", batch_size=None,
                          fn_kwargs={"want_hot": False})
    cold = cold.map_batches(add_tile_bucket, batch_format="pyarrow")
    cold_tiles = cold.groupby("bucket").map_groups(
        PointTileAssembler(extent=extent), batch_format="pyarrow"
    )

    hot_ds = ds.map_batches(split, batch_format="pyarrow", batch_size=None,
                            fn_kwargs={"want_hot": True})

    def add_salt(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        return batch.append_column("salt", pa.array((d % n_salt).astype(np.int32)))

    hot_ds = hot_ds.map_batches(add_salt, batch_format="pyarrow")

    # --- FUSED shuffle: ONE groupby(z,x,y,salt) packs the shard's sorted
    # arrays AND its interning stats into a single row. Only these packed
    # hot shards materialize (bounded by the hot fraction of the input).
    def pack_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="stable")
        langs = df["lang"].to_numpy()
        stat_langs = pd.unique(langs)
        first_ranks = [int(np.argmax(langs == lang)) for lang in stat_langs]
        return pd.DataFrame({
            "z": [int(df.z.iloc[0])], "x": [int(df.x.iloc[0])],
            "y": [int(df.y.iloc[0])], "salt": [int(df.salt.iloc[0])],
            "n": [len(df)],
            "doc_ids": [df["doc_id"].to_numpy().astype(np.uint64)],
            "pxs": [df["px"].to_numpy().astype(np.int32)],
            "pys": [df["py"].to_numpy().astype(np.int32)],
            "urls": [df["url"].tolist()],
            "langs": [langs.tolist()],
            "stat_langs": [list(stat_langs)],
            "stat_first_ranks": [first_ranks],
        })

    shards_packed = hot_ds.groupby(["z", "x", "y", "salt"]).map_groups(
        pack_shard, batch_format="pandas"
    ).materialize()

    # tiny stat columns → driver plan (rows = shards, not features)
    stats = shards_packed.select_columns(
        ["z", "x", "y", "salt", "n", "stat_langs", "stat_first_ranks"]
    ).to_pandas()

    plans = {}
    for key, g in stats.groupby(["z", "x", "y"]):
        n_per_salt = g.set_index("salt")["n"]
        salt_ids = sorted(n_per_salt.index)
        bases = {}
        acc = 0
        for s in salt_ids:
            bases[s] = acc
            acc += int(n_per_salt[s])
        lang_first: dict[str, int] = {}
        for r in g.itertuples():
            for lang, lr in zip(r.stat_langs, r.stat_first_ranks):
                rank = bases[r.salt] + int(lr)
                if lang not in lang_first or rank < lang_first[lang]:
                    lang_first[lang] = rank
        firsts = sorted(lang_first.items(), key=lambda kv: kv[1])
        lang_index = {lang: int(f + 1 + i) for i, (lang, f) in enumerate(firsts)}
        plans[key] = {
            "bases": bases,
            "total": acc,
            "lang_ranks_sorted": np.array([f for _, f in firsts], dtype=np.int64),
            "lang_index": lang_index,
        }
    plans_ref = ray.put(plans)

    # encode: plain map over the packed shards — NO second shuffle
    def encode_packed(batch: pa.Table) -> pa.Table:
        all_plans = ray.get(plans_ref)
        zs, xs, ys, salts, feats_col, useg_col, ns = [], [], [], [], [], [], []
        d = batch.to_pydict()
        for i in range(len(batch)):
            z, x, y, s = (int(d["z"][i]), int(d["x"][i]),
                          int(d["y"][i]), int(d["salt"][i]))
            plan = all_plans[(z, x, y)]
            feats, useg = encode_shard(
                np.asarray(d["doc_ids"][i], dtype=np.uint64),
                np.asarray(d["pxs"][i]), np.asarray(d["pys"][i]),
                list(d["urls"][i]), list(d["langs"][i]),
                plan["bases"][s], plan["lang_ranks_sorted"],
                plan["lang_index"],
            )
            zs.append(z)
            xs.append(x)
            ys.append(y)
            salts.append(s)
            feats_col.append(feats)
            useg_col.append(useg)
            ns.append(int(d["n"][i]))
        return pa.table({
            "z": pa.array(zs, pa.int32()), "x": pa.array(xs, pa.int32()),
            "y": pa.array(ys, pa.int32()), "salt": pa.array(salts, pa.int32()),
            "feat_bytes": pa.array(feats_col, pa.binary()),
            "url_seg": pa.array(useg_col, pa.binary()),
            "n": pa.array(ns, pa.int64()),
        })

    shards = shards_packed.drop_columns(
        ["stat_langs", "stat_first_ranks"]
    ).map_batches(encode_packed, batch_format="pyarrow", batch_size=None)

    def merge_one(df: pd.DataFrame) -> pd.DataFrame:
        key = (int(df.z.iloc[0]), int(df.x.iloc[0]), int(df.y.iloc[0]))
        plan = ray.get(plans_ref)[key]
        rows = df.to_dict("records")
        mvt = merge_shards(rows, plan, extent=extent)
        return pd.DataFrame({
            "z": [key[0]], "x": [key[1]], "y": [key[2]],
            "mvt": [mvt], "n_features": [int(df["n"].sum())],
        })

    hot_tiles = shards.groupby(["z", "x", "y"]).map_groups(
        merge_one, batch_format="pandas"
    )
    hot_tiles = hot_tiles.map_batches(lambda t: t, batch_format="pyarrow")
    cold_tiles = cold_tiles.map_batches(lambda t: t, batch_format="pyarrow")
    return cold_tiles.union(hot_tiles)
