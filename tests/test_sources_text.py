"""JSONL/CSV round-trips (sources/text_io.py) and the WARC reader
(sources/warc.py): lossless round trips, schema enforcement, record
framing, adversarial inputs."""

import numpy as np
import pyarrow as pa
import pytest


class TestJsonlCsv:
    def _docs(self):
        import pyarrow.parquet as pq

        return pq.read_table("/root/testdata/sf0.001/documents.parquet")

    def test_jsonl_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.sources.text_io import read_jsonl, write_jsonl

        tab = self._docs()
        write_jsonl(rd.from_arrow(tab).repartition(4), str(tmp_path / "j"))
        back = (read_jsonl(str(tmp_path / "j")).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        want = (tab.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
        assert back.equals(want[back.columns])

    def test_csv_roundtrip_with_pruning(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.sources.text_io import read_csv, write_csv

        tab = self._docs()
        write_csv(rd.from_arrow(tab).repartition(3), str(tmp_path / "c"))
        back = (read_csv(str(tmp_path / "c"),
                         columns=["doc_id", "lang", "n_chars"])
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(back.columns) == ["doc_id", "lang", "n_chars"]
        want = (tab.to_pandas()[["doc_id", "lang", "n_chars"]]
                .sort_values("doc_id").reset_index(drop=True))
        assert back.equals(want)

    def test_missing_column_is_loud(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.sources.text_io import read_jsonl, write_jsonl

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a", "b"])})
        write_jsonl(rd.from_arrow(t), str(tmp_path / "m"))
        with pytest.raises(Exception, match="missing columns"):
            read_jsonl(str(tmp_path / "m")).to_pandas()


class TestWARC:
    def test_record_roundtrip(self):
        from vtzero_ray.sources.warc import build_record, parse_warc

        payloads = [b"", b"hello world", "unicode é中".encode(),
                    b"\r\n\r\n tricky body with record-like bytes WARC/1.0"]
        data = b"".join(
            build_record({"WARC-Type": "response",
                          "WARC-Record-ID": f"<urn:doc:{i}>",
                          "WARC-Target-URI": f"https://x/{i}"}, p)
            for i, p in enumerate(payloads))
        recs = parse_warc(data)
        assert len(recs) == len(payloads)
        for i, (h, body) in enumerate(recs):
            assert body == payloads[i]
            assert h["warc-record-id"] == f"<urn:doc:{i}>"
            assert h["content-length"] == str(len(payloads[i]))

    def test_adversarial(self):
        from vtzero_ray.sources.warc import build_record, parse_warc

        good = build_record({"WARC-Type": "response"}, b"abc")
        for bad in (b"HTTP/1.1 200 OK\r\n\r\n",          # not WARC
                    good[:-2],                            # lost terminator
                    good[:20],                            # truncated header
                    good.replace(b"Content-Length: 3",
                                 b"Content-Length: 9"),   # wrong length
                    b"WARC/1.0\r\nbadheader\r\n\r\n"):
            with pytest.raises(ValueError):
                parse_warc(bad)
        # no Content-Length
        nolen = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
                 b"xx\r\n\r\n")
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc(nolen)

    def test_synth_and_distributed_read(self, ray_session, tmp_path):
        """Shards partition the corpus; the distributed read recovers
        every doc's text and formula URI."""
        import pyarrow.parquet as pq

        from vtzero_ray.sources.warc import read_warc, synth_warc

        sf = "/root/testdata/sf0.001"
        out = synth_warc(sf, str(tmp_path / "w"), n_shards=5)
        import os

        assert len(os.listdir(out)) == 5
        got = (read_warc(out).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = (pq.read_table(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"]).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert (got.doc_id.to_numpy() == want.doc_id.to_numpy()).all()
        assert (got.text == want.text).all()
        assert (got.url == "https://site" + (got.doc_id % 97).astype(str)
                + ".example/p/" + got.doc_id.astype(str)).all()


class TestWARCGzip:
    def test_member_split_roundtrip(self):
        from vtzero_ray.sources.warc import gzip_member, split_gzip_members

        payloads = [b"", b"abc", b"x" * 10000, "é中".encode()]
        blob = b"".join(gzip_member(p) for p in payloads)
        assert split_gzip_members(blob) == payloads

    def test_member_split_adversarial(self):
        from vtzero_ray.sources.warc import gzip_member, split_gzip_members

        good = gzip_member(b"hello")
        for bad in (b"nogzip", good[:-3], good + b"trailing-garbage"):
            with pytest.raises(ValueError):
                split_gzip_members(bad)

    def test_gzip_and_plain_reads_agree(self, ray_session, tmp_path):
        from vtzero_ray.sources.warc import read_warc, synth_warc

        sf = "/root/testdata/sf0.001"
        gz = synth_warc(sf, str(tmp_path / "gz"), n_shards=3, gzip=True)
        pl = synth_warc(sf, str(tmp_path / "pl"), n_shards=3, gzip=False)
        import os

        assert all(f.endswith(".warc.gz") for f in os.listdir(gz))
        a = (read_warc(gz).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (read_warc(pl).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)
        assert len(a) == 500


class TestWriteWarc:
    def _corpus(self, n=60):
        import pyarrow as pa

        return pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "url": pa.array([f"https://h{i % 7}.x/p/{i}" for i in range(n)]),
            "text": pa.array([f"doc {i} body é" for i in range(n)])})

    def test_roundtrip_and_stats(self, ray_session, tmp_path):
        import ray.data as rd

        from vtzero_ray.sources.warc import read_warc, write_warc

        t = self._corpus()
        out = str(tmp_path / "sink")
        stats = write_warc(rd.from_arrow(t).repartition(5), out,
                           n_shards=4)
        assert len(stats) == 4
        assert stats.n_records.sum() == 60
        assert not stats.skipped.any()
        back = (read_warc(out).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        want = t.to_pandas()
        assert back.equals(want)

    def test_crash_and_resume(self, ray_session, tmp_path):
        """A crash on one shard leaves the finished shards durable; the
        resumed run rewrites only the missing shard and the union equals
        a clean one-shot run."""
        import pytest as _pytest
        import ray.data as rd

        from vtzero_ray.sources.warc import read_warc, write_warc

        t = self._corpus()
        out = str(tmp_path / "sink2")
        with _pytest.raises(Exception):
            write_warc(rd.from_arrow(t).repartition(5), out, n_shards=4,
                       _fail_shards=frozenset({2}))
        import os

        done_before = sorted(os.listdir(out))
        assert 0 < len(done_before) < 4
        stats = write_warc(rd.from_arrow(t).repartition(5), out,
                           n_shards=4)
        assert stats.skipped.sum() == len(done_before)
        assert (stats[~stats.skipped].shard.tolist()
                == sorted(set(range(4))
                          - {int(f.split("-")[1].split(".")[0])
                             for f in done_before}))
        back = (read_warc(out).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert back.equals(t.to_pandas())
