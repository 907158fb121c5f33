"""Composed training-data corpus pipelines over the ``documents`` table.

``clean_corpus`` is the flagship composition of the text-analysis and
dedup operators: quality scoring (C4/Gopher-style rule filter,
textstats.QualityScore) + language-ID consistency (textstats.LangId) in
ONE streaming pass, then exact content dedup (md5 groupby, first-id
wins) — the standard LLM-corpus cleaning recipe expressed Ray-Data-first
(no driver materialization, one aggregate shuffle over (md5, doc_id)).

``stratified_sample`` is exact deterministic N-per-group sampling by
hash rank: each batch keeps only its local top-N per group (partial
top-k — the same pattern the ANN operators use), so the groupby merge
shuffles at most N * num_blocks tiny rows regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vtzero_ray.functions.dedup import add_md5, hash_u64
from vtzero_ray.functions.textstats import LangId, QualityScore


def clean_corpus(sf_dir: str, min_quality: float = 0.7):
    """documents → quality score → lang-consistency filter → exact dedup.

    Returns (md5, keep_id, n_dups) for every surviving content group —
    the keep-list a downstream training job would semi-join against.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=16,
    )
    score = QualityScore()
    langid = LangId()

    def gate(batch: pa.Table) -> pa.Table:
        batch = langid(score(batch))
        keep = pa.compute.and_(
            pa.compute.greater_equal(batch.column("quality_score"),
                                     pa.scalar(min_quality)),
            pa.compute.equal(batch.column("lang_pred"), batch.column("lang")),
        )
        return batch.filter(keep).select(["doc_id", "text"])

    ds = ds.map_batches(gate, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(add_md5, batch_format="pyarrow", batch_size=None)
    agg = ds.select_columns(["md5", "doc_id"]).groupby("md5").aggregate(
        Min("doc_id"), Count())
    return agg.rename_columns({"min(doc_id)": "keep_id", "count()": "n_dups"})


def clean_corpus_checkpointed(sf_dir: str, out_dir: str,
                              min_quality: float = 0.7,
                              n_parts: int = 16,
                              _fail_parts: frozenset = frozenset()) -> dict:
    """clean_corpus with checkpoint/resume (SURVEY §4, VERDICT r3 #7):
    the keep-list is bucketed by crc32(md5) % n_parts and written through
    the per-partition-atomic sink (sources/checkpoint.py) — each bucket
    is durable the moment its task finishes, and a resumed run
    anti-joins completed buckets out BEFORE the shuffle. Returns the
    write summary; read the result back with checkpoint.read_partitioned.
    """
    from vtzero_ray.sources.checkpoint import hash_part, write_partitioned

    ds = clean_corpus(sf_dir, min_quality=min_quality)
    ds = ds.map_batches(hash_part("md5", n_parts), batch_format="pyarrow",
                        batch_size=None)
    return write_partitioned(ds, out_dir, part_col="part",
                             _fail_parts=_fail_parts)


def stratified_sample(sf_dir: str, n_per_group: int = 20,
                      group_col: str = "lang", salt: str = "samp"):
    """Deterministic N docs per group, ranked by md5-derived hash.

    Scale shape: per-batch partial top-N per group (np.lexsort over the
    batch's group cohorts), THEN a groupby merge over <= N rows per
    (group, block) — the full corpus never shuffles. Rank is 1-based by
    (hash, doc_id), reproducible in SQL via row_number() OVER
    (PARTITION BY group ORDER BY md5_number_lower(...), doc_id).
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", group_col],
                         override_num_blocks=16)

    def partial_topn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        grp = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        h = np.fromiter((hash_u64(f"{salt}:{int(i)}") for i in ids),
                        dtype=np.uint64, count=ids.shape[0])
        keep = np.zeros(ids.shape[0], dtype=bool)
        for g in pd.unique(grp):
            idx = np.nonzero(grp == g)[0]
            order = np.lexsort((ids[idx], h[idx]))[:n_per_group]
            keep[idx[order]] = True
        return pa.table({
            group_col: pa.array(grp[keep], pa.string()),
            "doc_id": pa.array(ids[keep]),
            "h": pa.array(h[keep]),
        })

    parts = ds.map_batches(partial_topn, batch_format="pyarrow",
                           batch_size=None)

    def merge_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="stable").head(n_per_group)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[group_col, "doc_id", "rank"]]

    return parts.groupby(group_col).map_groups(merge_topn,
                                               batch_format="pandas")
