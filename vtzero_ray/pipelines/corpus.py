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


def prep_training_data(sf_dir: str, n_gram: int = 5, bench_mod: int = 50,
                       seq_len: int = 2048, range_width: int = 64):
    """The full LLM training-data prep recipe as ONE streaming
    composition — every stage is an operator this engine already ships,
    chained without materialization:

    1. C4 line cleaning (webclean.clean_lines over the synthesized
       multiline corpus) — boilerplate/short/unterminated lines out;
    2. exact content dedup, keep-first: surviving rows shuffle ONCE by
       int(md5[:8],16) % 64 (the dedup_index bucket key), each bucket
       keeps min doc_id per md5 locally;
    3. benchmark decontamination (decontam shape: the eval split
       doc_id % bench_mod == 0 builds its distinct-gram set driver-side
       and broadcasts; eval docs leave the corpus; one vectorized flag
       scan drops docs sharing any n-gram with the benchmark);
    4. sequence packing (pack.pack_sequences): global token offsets +
       greedy context-window assignment over the survivors.

    → Dataset (doc_id, n_tokens, t_offset, seq_id, seq_pos), pure ints.
    The SQL twin splices each stage's proven oracle as CTEs (the
    c4_pipeline precedent).
    """
    import ray
    import ray.data as rd

    from vtzero_ray.functions.decontam import (_doc_grams, benchmark_grams)
    from vtzero_ray.functions.pack import pack_sequences
    from vtzero_ray.functions.webclean import clean_lines, synth_multiline

    import pyarrow.compute as pc

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).repartition(16)
    cleaned = clean_lines(synth_multiline(docs)) \
        .select_columns(["doc_id", "clean_text"])

    # ---- stage 2: exact dedup, keep-first --------------------------------
    def bucketize(t: pa.Table) -> pa.Table:
        t = add_md5(t, column="clean_text")
        md5s = t.column("md5").to_pylist()
        b = np.fromiter((int(m[:8], 16) % 64 for m in md5s), np.int32,
                        count=len(md5s))
        return t.append_column("bucket", pa.array(b))

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["md5", "doc_id"], kind="stable")
        return df.drop_duplicates("md5", keep="first") \
            [["doc_id", "clean_text"]]

    deduped = cleaned.map_batches(bucketize, batch_format="pyarrow",
                                  batch_size=None) \
        .groupby("bucket").map_groups(keep_first, batch_format="pandas")

    # ---- stage 3: decontamination ----------------------------------------
    import pyarrow.parquet as pq

    bt = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"])
    idc = bt.column("doc_id")
    mask = pc.equal(pc.subtract(
        idc, pc.multiply(pc.divide(idc, bench_mod), bench_mod)), 0)
    bench_ref = ray.put(benchmark_grams(
        bt.filter(mask).column("text").to_pylist(), n_gram))

    def decontam_filter(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = t.column("doc_id")
        m = pc.subtract(ids, pc.multiply(pc.divide(ids, bench_mod),
                                         bench_mod))
        t = t.filter(pc.not_equal(m, 0))        # eval docs leave the corpus
        doc_of, grams, n_docs = _doc_grams(t, n_gram, "clean_text")
        hits = np.zeros(n_docs, np.int64)
        if len(grams) and len(bench):
            hit = pc.is_in(grams, value_set=bench).to_numpy(
                zero_copy_only=False)
            hit = np.nan_to_num(hit.astype(np.float64)).astype(bool)
            hits = np.bincount(doc_of[hit], minlength=n_docs) \
                .astype(np.int64)
        return t.filter(pa.array(hits == 0))

    survivors = deduped.map_batches(decontam_filter, batch_format="pyarrow",
                                    batch_size=None)

    # ---- stage 4: sequence packing ---------------------------------------
    return pack_sequences(survivors, seq_len=seq_len,
                          range_width=range_width, column="clean_text")


def prep_training_data_sql(n_gram: int = 5, bench_mod: int = 50,
                           seq_len: int = 2048,
                           table: str = "documents") -> str:
    """DuckDB twin of prep_training_data: the clean_lines oracle →
    md5 row_number dedup → lead()-gram decontamination (the
    dup_span_stats tokenizer/gram contract) → the pack_sequences window
    cumsum, spliced as CTEs."""
    from vtzero_ray.functions.pack import pack_sequences_sql
    from vtzero_ray.functions.webclean import clean_lines_sql

    cleaned = clean_lines_sql(table=table, synth=True)
    leads = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {j}) OVER wd" for j in range(1, n_gram)])
    pack = pack_sequences_sql(seq_len=seq_len, column="clean_text",
                              table="surv")
    assert pack.startswith("WITH ")
    return (
        f"WITH cleaned AS ({cleaned}), "
        "dd AS (SELECT doc_id, clean_text FROM "
        "(SELECT doc_id, clean_text, row_number() OVER "
        "(PARTITION BY md5(clean_text) ORDER BY doc_id) AS rn "
        "FROM cleaned) WHERE rn = 1), "
        # tokenizer: kept (non-empty) tokens, positions re-ranked — the
        # dup_span_stats contract
        f"bsrc AS (SELECT doc_id, text FROM {table} "
        f"WHERE doc_id % {bench_mod} = 0), "
        "bt AS (SELECT doc_id, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY idx) AS idx, tok FROM "
        "(SELECT doc_id, unnest(range(1, len(arr) + 1)) AS idx, "
        "unnest(arr) AS tok FROM (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS arr FROM bsrc)) "
        "WHERE tok <> ''), "
        f"bg0 AS (SELECT doc_id, {leads} AS gram, "
        f"lead(tok, {n_gram - 1}) OVER wd IS NOT NULL AS ok FROM bt "
        "WINDOW wd AS (PARTITION BY doc_id ORDER BY idx)), "
        "benchg AS (SELECT DISTINCT gram FROM bg0 WHERE ok), "
        f"csrc AS (SELECT doc_id, clean_text AS text FROM dd "
        f"WHERE doc_id % {bench_mod} <> 0), "
        "ct AS (SELECT doc_id, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY idx) AS idx, tok FROM "
        "(SELECT doc_id, unnest(range(1, len(arr) + 1)) AS idx, "
        "unnest(arr) AS tok FROM (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS arr FROM csrc)) "
        "WHERE tok <> ''), "
        f"cg0 AS (SELECT doc_id, {leads} AS gram, "
        f"lead(tok, {n_gram - 1}) OVER wd IS NOT NULL AS ok FROM ct "
        "WINDOW wd AS (PARTITION BY doc_id ORDER BY idx)), "
        "contaminated AS (SELECT DISTINCT c.doc_id FROM cg0 c "
        "JOIN benchg b ON b.gram = c.gram WHERE c.ok), "
        "surv AS (SELECT doc_id, text AS clean_text FROM csrc "
        "WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)), "
        + pack[len("WITH "):]
    )
