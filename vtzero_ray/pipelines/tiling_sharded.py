"""Skew-aware tile assembly: cold tiles via the bucketed kernel, hot tiles
via the salted shard encoder (stages/shard_encode.py).

Stages:
1. per-batch partial tile counts → tiny groupby(z,x,y) sum → hot set
   (collected to the driver: #hot tiles is small by definition; broadcast
   via ray.put).
2. cold features → add_tile_bucket → groupby(bucket) → vectorized kernel.
3. hot features → per-batch (tile, salt, lang) partial stats →
   groupby sum/min → driver builds the interning PLAN (ranks/bases/lang
   indexes — tiny) → broadcast.
4. hot features → groupby(z,x,y,salt) → encode_shard (parallel) →
   groupby(z,x,y) merge_shards (byte concat).
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
    import pyarrow.compute as pc

    ds = ds.materialize()  # consumed by 3 passes (counts, stats, encode)
    counts = _tile_counts(ds).to_pandas()
    hot = counts[counts.n > hot_threshold]
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

    hot_ds = hot_ds.map_batches(add_salt, batch_format="pyarrow").materialize()

    # --- plan: per (tile, salt): count; per (tile, salt, lang): min_doc +
    # local rank of that min among the salt's docs (needed for exact global
    # first-occurrence ranks)
    def shard_stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="stable")
        rows = []
        z, x, y, s = (int(df.z.iloc[0]), int(df.x.iloc[0]),
                      int(df.y.iloc[0]), int(df.salt.iloc[0]))
        langs = df["lang"].to_numpy()
        for lang in pd.unique(langs):
            local_rank = int(np.argmax(langs == lang))
            rows.append({"z": z, "x": x, "y": y, "salt": s, "lang": lang,
                         "n": len(df), "first_rank_local": local_rank})
        return pd.DataFrame(rows)

    stats = hot_ds.groupby(["z", "x", "y", "salt"]).map_groups(
        shard_stats, batch_format="pandas"
    ).to_pandas()

    plans = {}
    for key, g in stats.groupby(["z", "x", "y"]):
        n_per_salt = g.groupby("salt")["n"].first()
        salt_ids = sorted(n_per_salt.index)
        bases = {}
        acc = 0
        for s in salt_ids:
            bases[s] = acc
            acc += int(n_per_salt[s])
        lang_first: dict[str, int] = {}
        for r in g.itertuples():
            rank = bases[r.salt] + r.first_rank_local
            if r.lang not in lang_first or rank < lang_first[r.lang]:
                lang_first[r.lang] = rank
        firsts = sorted(lang_first.items(), key=lambda kv: kv[1])
        lang_index = {lang: int(f + 1 + i) for i, (lang, f) in enumerate(firsts)}
        plans[key] = {
            "bases": bases,
            "total": acc,
            "lang_ranks_sorted": np.array([f for _, f in firsts], dtype=np.int64),
            "lang_index": lang_index,
        }
    plans_ref = ray.put(plans)

    def encode_one_shard(df: pd.DataFrame) -> pd.DataFrame:
        plan = ray.get(plans_ref)[(int(df.z.iloc[0]), int(df.x.iloc[0]), int(df.y.iloc[0]))]
        df = df.sort_values("doc_id", kind="stable")
        s = int(df.salt.iloc[0])
        feats, useg = encode_shard(
            df["doc_id"].to_numpy().astype(np.uint64),
            df["px"].to_numpy(), df["py"].to_numpy(),
            df["url"].tolist(), df["lang"].tolist(),
            plan["bases"][s], plan["lang_ranks_sorted"], plan["lang_index"],
        )
        return pd.DataFrame({
            "z": [int(df.z.iloc[0])], "x": [int(df.x.iloc[0])], "y": [int(df.y.iloc[0])],
            "salt": [s], "feat_bytes": [feats], "url_seg": [useg],
            "n": [len(df)],
        })

    shards = hot_ds.groupby(["z", "x", "y", "salt"]).map_groups(
        encode_one_shard, batch_format="pandas"
    )

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
