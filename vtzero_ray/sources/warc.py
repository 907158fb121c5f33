"""WARC (Web ARChive, ISO 28500) reader — the format web crawls
actually arrive in (Common Crawl ships WARC/WET). A training-data
engine that starts from crawl data needs this source the same way the
reference needs its tile reader (SURVEY §2.1 S1).

Layout facts this reader implements (WARC/1.0-1.1):
- a WARC file is a concatenation of records;
- a record = version line, CRLF header lines (``Name: value``), one
  blank line, exactly ``Content-Length`` payload bytes, then CRLF CRLF;
- header names are case-insensitive; Content-Length is mandatory;
- .warc.gz files are a concatenation of GZIP MEMBERS, one record per
  member (the Common Crawl layout) — implemented here with stdlib
  zlib (wbits=31 speaks the gzip framing), sniffed per file by the
  1f 8b magic, member boundaries recovered from
  ``decompressobj.unused_data``.

Distribution shape: ONE FILE = ONE TASK (``read_binary_files`` +
flat-parse) — exactly how crawls shard WARC in practice (files are
~1 GB by convention; parallelism is the file count). Malformed records
raise loud ValueErrors with byte offsets; nothing resyncs silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def build_record(headers: dict, payload: bytes,
                 version: str = "WARC/1.0") -> bytes:
    """One WARC record (Content-Length computed here)."""
    lines = [version.encode()]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return (_CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF)


def parse_warc(data: bytes):
    """WARC bytes → list of (headers dict with lower-cased keys,
    payload bytes). Loud ValueError (with offset) on malformed input."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        end_hdr = data.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            raise ValueError(f"WARC: unterminated header block at {pos}")
        block = data[pos:end_hdr].split(_CRLF)
        if not block[0].startswith(b"WARC/"):
            raise ValueError(f"WARC: bad version line at {pos}: "
                             f"{block[0][:20]!r}")
        headers = {}
        for line in block[1:]:
            k, sep, v = line.partition(b": ")
            if not sep:
                raise ValueError(f"WARC: bad header line at {pos}: "
                                 f"{line[:40]!r}")
            headers[k.decode().lower()] = v.decode()
        if "content-length" not in headers:
            raise ValueError(f"WARC: record at {pos} has no Content-Length")
        clen = int(headers["content-length"])
        body_start = end_hdr + 4
        body_end = body_start + clen
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError(f"WARC: record at {pos} not terminated by "
                             "CRLF CRLF after its declared length")
        out.append((headers, data[body_start:body_end]))
        pos = body_end + 4
    return out


def gzip_member(data: bytes) -> bytes:
    """One gzip member (deterministic: fixed level, zeroed mtime — the
    gzip header zlib emits via wbits=31 carries no timestamp)."""
    import zlib

    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def split_gzip_members(data: bytes):
    """Concatenated gzip members → list of decompressed payloads;
    loud ValueError on trailing garbage or a truncated member."""
    import zlib

    out = []
    rest = data
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError(
                f"WARC: expected gzip member, got {rest[:2]!r}")
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(rest))
        except zlib.error as e:
            raise ValueError(f"WARC: bad gzip member: {e}") from e
        if not d.eof:
            raise ValueError("WARC: truncated gzip member")
        rest = d.unused_data
    return out


def synth_warc(sf_dir: str, out_dir: str, n_shards: int = 8,
               gzip: bool = True) -> str:
    """documents.parquet → deterministic WARC response records, sharded
    doc_id % n_shards (the crawl convention: many independent files).
    URI = https://site{doc_id % 97}.example/p/{doc_id}; payload = the
    raw text UTF-8. ``gzip=True`` (default) writes .warc.gz — one gzip
    member per record, the Common Crawl convention. Atomic publish
    (temp dir + os.rename — the build_ivf_index contract)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    tmp = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    order = np.argsort(ids, kind="stable")
    shards: list[list[bytes]] = [[] for _ in range(n_shards)]
    for i in order:
        d = int(ids[i])
        rec = build_record(
            {"WARC-Type": "response",
             "WARC-Record-ID": f"<urn:doc:{d}>",
             "WARC-Target-URI": f"https://site{d % 97}.example/p/{d}"},
            texts[i].encode("utf-8"))
        shards[d % n_shards].append(rec)
    ext = "warc.gz" if gzip else "warc"
    for s, recs in enumerate(shards):
        if gzip:
            recs = [gzip_member(r) for r in recs]
        with open(f"{tmp}/shard-{s:04d}.{ext}", "wb") as f:
            f.write(b"".join(recs))
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the publish race
    return out_dir


def read_warc(path: str):
    """WARC dir → Dataset (doc_id, url, text): one task per file
    (read_binary_files), flat parse, response records only. doc_id
    comes from the <urn:doc:N> record id (-1 if absent)."""
    import ray.data as rd

    files = rd.read_binary_files(path)

    def parse(t: pa.Table) -> pa.Table:
        ids, urls, texts = [], [], []
        for payload in t.column("bytes"):
            raw = payload.as_py()
            if raw[:2] == b"\x1f\x8b":      # .warc.gz: one record/member
                records = [r for m in split_gzip_members(raw)
                           for r in parse_warc(m)]
            else:
                records = parse_warc(raw)
            for headers, body in records:
                if headers.get("warc-type") != "response":
                    continue
                rid = headers.get("warc-record-id", "")
                did = int(rid[9:-1]) if rid.startswith("<urn:doc:") else -1
                ids.append(did)
                urls.append(headers.get("warc-target-uri", ""))
                texts.append(body.decode("utf-8"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "text": pa.array(texts, pa.string())})

    return files.map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_warc(ds, out_dir: str, n_shards: int = 8, gzip: bool = True,
               id_column: str = "doc_id", url_column: str = "url",
               text_column: str = "text",
               _fail_shards: frozenset = frozenset()):
    """Distributed WARC sink — the scale shape ``synth_warc`` (a
    driver-side test helper) is not: ONE keyed shuffle localizes each
    shard (id % n_shards) to exactly one task; the task builds its
    records in id order and publishes ``shard-<s>.warc[.gz]``
    ATOMICALLY (private tmp file → os.rename), so a killed job resumes
    with every finished shard intact — shard-file presence implies a
    complete shard (the checkpoint.py sink contract). On resume,
    completed shards are filtered out BEFORE the shuffle.

    Returns a pandas DataFrame (shard, n_records, n_bytes, skipped) —
    bounded by n_shards. ``_fail_shards`` is the crash-injection test
    hook (the _PartWriter precedent)."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.gz" if gzip else "warc"
    done = {int(f.split("-")[1].split(".")[0])
            for f in os.listdir(out_dir)
            if f.startswith("shard-") and f.endswith(ext)}

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        shard = (ids % n_shards).astype(np.int64)
        t = t.append_column("shard", pa.array(shard))
        if done:
            keep = ~np.isin(shard, np.fromiter(done, np.int64))
            t = t.filter(pa.array(keep))
        return t

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        import uuid

        s = int(df["shard"].iloc[0])
        if s in _fail_shards:
            raise RuntimeError(f"injected crash on shard {s}")
        df = df.sort_values(id_column, kind="stable")
        recs = []
        for r in df.itertuples():
            rec = build_record(
                {"WARC-Type": "response",
                 "WARC-Record-ID": f"<urn:doc:{getattr(r, id_column)}>",
                 "WARC-Target-URI": getattr(r, url_column)},
                getattr(r, text_column).encode("utf-8"))
            recs.append(gzip_member(rec) if gzip else rec)
        blob = b"".join(recs)
        tmp = os.path.join(out_dir, f".tmp-{s}-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, os.path.join(out_dir, f"shard-{s:04d}.{ext}"))
        return pd.DataFrame({"shard": [s],
                             "n_records": [len(df)],
                             "n_bytes": [len(blob)],
                             "skipped": [False]})

    stats = (ds.map_batches(add_shard, batch_format="pyarrow",
                            batch_size=None)
             .groupby("shard").map_groups(write_shard,
                                          batch_format="pandas")
             .to_pandas())
    skipped = pd.DataFrame({"shard": sorted(done),
                            "n_records": -1, "n_bytes": -1,
                            "skipped": True}) if done else \
        pd.DataFrame(columns=stats.columns)
    out = pd.concat([stats, skipped], ignore_index=True) \
        .sort_values("shard").reset_index(drop=True)
    return out
