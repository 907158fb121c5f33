"""Web-corpus cleaning (functions/webclean.py): C4 line filter and URL
canonicalization dedup — hand-checked semantics, DuckDB-twin equality
on adversarial shapes and on the sf corpus, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _tab(cols):
    return pa.table(cols)


HAND_DOCS = [
    # doc 0: two good lines + unterminated tail -> kept (n_kept=2)
    "this line has enough words here.\nanother line with plenty of words!\ntail with no punct",
    # doc 1: one good line only -> dropped (min_kept=2)
    "this line has enough words here.\nshort one.",
    # doc 2: blocklist phrase kills line 2 -> dropped
    "this line has enough words here.\nplease click here for more info now.",
    # doc 3: curly brace kills the whole doc
    "this line has enough words here.\nanother line with plenty of words!\nvar x = {",
    # doc 4: no newlines at all, one good sentence -> dropped (1 < 2)
    "a single line with plenty of words in it.",
    # doc 5: question + exclamation terminals both count
    "is this a line with enough words?\nyes it is a line with words!",
    # doc 6: empty text
    "",
    # doc 7: javascript boilerplate
    "enable javascript to view this site now.\nanother line with plenty of words!\nand a third good line of words here.",
]


def naive_clean(texts, min_words=5, min_kept=2,
                blocklist=("click here", "javascript", "cookie policy")):
    import re
    out = []
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [l for l in lines
                if re.search(r"[.!?]$", l)
                and len(re.findall("[^ ]+", l)) >= min_words
                and not any(p in l for p in blocklist)]
        if len(kept) >= min_kept and "{" not in t:
            out.append((i, len(lines), len(kept), "\n".join(kept)))
    return pd.DataFrame(out, columns=["doc_id", "n_lines", "n_kept",
                                      "clean_text"])


class TestCleanLines:
    def test_hand_checked(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import clean_lines

        t = _tab({"doc_id": pa.array(range(len(HAND_DOCS)), pa.int64()),
                  "text": pa.array(HAND_DOCS)})
        got = (clean_lines(rd.from_arrow(t)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = naive_clean(HAND_DOCS)
        assert got["doc_id"].to_list() == [0, 5, 7]
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # int64 outputs (the driver hash is dtype-sensitive)
        assert got["n_lines"].dtype == np.int64
        assert got["n_kept"].dtype == np.int64

    def test_duckdb_twin_hand_corpus(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import clean_lines, clean_lines_sql

        t = _tab({"doc_id": pa.array(range(len(HAND_DOCS)), pa.int64()),
                  "text": pa.array(HAND_DOCS)})
        got = (clean_lines(rd.from_arrow(t)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        want = (con.execute(clean_lines_sql(synth=False)).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)

    def test_synth_twin_on_sf(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (clean_lines,
                                                   clean_lines_sql,
                                                   synth_multiline)

        ds = rd.read_parquet(sf_dir + "/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        got = (clean_lines(synth_multiline(ds)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = (con.execute(clean_lines_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        assert len(got) > 0
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import clean_lines

        t = _tab({"doc_id": pa.array(range(len(HAND_DOCS)), pa.int64()),
                  "text": pa.array(HAND_DOCS)})
        a = (clean_lines(rd.from_arrow(t).repartition(1)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (clean_lines(rd.from_arrow(t).repartition(5)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


DUP_LINE_DOCS = [
    "shared header line\nunique body of doc zero\nshared footer line",
    "shared header line\nunique body of doc one",
    "unique body of doc two\nshared footer line\nshared header line",
    "shared header line",          # every line a later copy -> doc drops
    "",                            # empty line: first occurrence is here
    "x\n",                         # trailing newline -> ('x', '')
]


def naive_dedup_lines(texts):
    seen = set()
    rows = []
    for i, t in enumerate(texts):
        kept = []
        for ln in t.split("\n"):
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        if kept:
            rows.append((i, len(kept), "\n".join(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "n_kept", "clean_text"])


class TestDedupLines:
    def test_hand_checked(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import dedup_lines

        t = _tab({"doc_id": pa.array(range(len(DUP_LINE_DOCS)), pa.int64()),
                  "text": pa.array(DUP_LINE_DOCS)})
        got = (dedup_lines(rd.from_arrow(t).repartition(3)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = naive_dedup_lines(DUP_LINE_DOCS)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # doc 3's only line is a dup of doc 0's first line -> dropped,
        # but doc 4 survives: its sole (empty) line first occurs there
        assert 3 not in set(got["doc_id"])
        assert 4 in set(got["doc_id"])

    def test_duckdb_twin_hand_corpus(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (dedup_lines,
                                                   dedup_lines_sql)

        t = _tab({"doc_id": pa.array(range(len(DUP_LINE_DOCS)), pa.int64()),
                  "text": pa.array(DUP_LINE_DOCS)})
        got = (dedup_lines(rd.from_arrow(t)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        want = (con.execute(dedup_lines_sql(synth=False)).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)

    def test_synth_twin_on_sf(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (dedup_lines,
                                                   dedup_lines_sql,
                                                   synth_multiline)

        ds = rd.read_parquet(sf_dir + "/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        got = (dedup_lines(synth_multiline(ds)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = (con.execute(dedup_lines_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        assert len(got) > 0
        # the synthesized boilerplate line must have deduplicated
        assert (want["n_kept"] < 3).any()
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import dedup_lines

        t = _tab({"doc_id": pa.array(range(len(DUP_LINE_DOCS)), pa.int64()),
                  "text": pa.array(DUP_LINE_DOCS)})
        a = (dedup_lines(rd.from_arrow(t).repartition(1)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (dedup_lines(rd.from_arrow(t).repartition(5)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestC4Pipeline:
    def test_composition_matches_stagewise(self, ray_session):
        """c4_pipeline == clean_lines materialized then dedup_lines."""
        import ray.data as rd

        from vtzero_ray.functions.webclean import (c4_pipeline,
                                                   clean_lines,
                                                   dedup_lines)

        texts = [
            "good line with plenty of words here.\nshared dup line with words too!",
            "good line with plenty of words here.\nshared dup line with words too!",
            "another fine line with enough words.\nshared dup line with words too!\nno punct tail",
        ]
        t = _tab({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
        got = (c4_pipeline(rd.from_arrow(t)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        cleaned = clean_lines(rd.from_arrow(t)).materialize()
        want = (dedup_lines(cleaned.select_columns(["doc_id", "clean_text"]),
                            column="clean_text").to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
        # doc 1 is an exact dup of doc 0 -> loses both lines -> dropped
        assert set(got["doc_id"]) == {0, 2}

    def test_duckdb_twin_on_sf(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (c4_pipeline,
                                                   c4_pipeline_sql,
                                                   synth_multiline)

        ds = rd.read_parquet(sf_dir + "/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        got = (c4_pipeline(synth_multiline(ds)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = (con.execute(c4_pipeline_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        assert 0 < len(got) <= 500
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)


HAND_URLS = [
    (0, "https://Site7.Example/p/1?utm_source=x"),
    (1, "https://site7.example/p/1#frag"),
    (2, "https://site7.example/p/1/"),
    (3, "https://site7.example/p/1"),
    (4, "https://other.example/p/2"),
    (5, "HTTPS://OTHER.EXAMPLE/p/2"),
    (6, "https://other.example/P/2"),   # path case preserved -> distinct
]


def naive_url_dedup(rows):
    import re
    groups = {}
    for did, url in rows:
        s = re.sub(r"[?#].*$", "", url)
        m = re.match(r"(^[^/]*//[^/]*)(.*)$", s)
        canon = m.group(1).lower() + re.sub(r"/$", "", m.group(2))
        g = groups.setdefault(canon, [0, None])
        g[0] += 1
        g[1] = did if g[1] is None else min(g[1], did)
    return pd.DataFrame(
        [(k, v[1], v[0]) for k, v in groups.items()],
        columns=["canon_url", "keep_id", "n_dups"]
    ).sort_values("canon_url").reset_index(drop=True)


class TestCanonicalUrlDedup:
    def test_hand_checked(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import canonical_url_dedup

        t = _tab({"doc_id": pa.array([r[0] for r in HAND_URLS], pa.int64()),
                  "url": pa.array([r[1] for r in HAND_URLS])})
        got = (canonical_url_dedup(rd.from_arrow(t)).to_pandas()
               .sort_values("canon_url").reset_index(drop=True))
        want = naive_url_dedup(HAND_URLS)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        row = got.set_index("canon_url").loc["https://site7.example/p/1"]
        assert row["keep_id"] == 0 and row["n_dups"] == 4
        # path case is NOT normalized
        assert "https://other.example/P/2" in set(got["canon_url"])

    def test_duckdb_twin_hand_corpus(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (canonical_url_dedup,
                                                   canonical_url_dedup_sql)

        t = _tab({"doc_id": pa.array([r[0] for r in HAND_URLS], pa.int64()),
                  "url": pa.array([r[1] for r in HAND_URLS])})
        got = (canonical_url_dedup(rd.from_arrow(t)).to_pandas()
               .sort_values("canon_url").reset_index(drop=True))
        con = duckdb.connect()
        con.register("urls", t)
        want = (con.execute(canonical_url_dedup_sql(table="urls",
                                                    url_expr="url")).df()
                .sort_values("canon_url").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)

    def test_synth_twin_on_sf(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (canonical_url_dedup,
                                                   canonical_url_dedup_sql,
                                                   synth_url_variants)

        ds = rd.read_parquet(sf_dir + "/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
        got = (canonical_url_dedup(synth_url_variants(ds)).to_pandas()
               .sort_values("canon_url").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = (con.execute(canonical_url_dedup_sql()).df()
                .sort_values("canon_url").reset_index(drop=True))
        assert len(got) > 0
        # every full page triple collapses to one row with n_dups == 3
        assert (want["n_dups"] <= 3).all()
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=True)

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import canonical_url_dedup

        t = _tab({"doc_id": pa.array([r[0] for r in HAND_URLS], pa.int64()),
                  "url": pa.array([r[1] for r in HAND_URLS])})
        a = (canonical_url_dedup(rd.from_arrow(t).repartition(1)).to_pandas()
             .sort_values("canon_url").reset_index(drop=True))
        b = (canonical_url_dedup(rd.from_arrow(t).repartition(4)).to_pandas()
             .sort_values("canon_url").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


SPAN_DOCS = [
    # doc 0 and doc 1 share the 5-token run "one two three four five"
    "one two three four five alpha beta",
    "zz one two three four five yy",
    # doc 2 repeats its own 5-gram (within-doc dup counts too): windows
    # at 1 and 6 are both "a b c d e"
    "a b c d e a b c d e",
    "totally unique words in this doc here",
    "short doc",                       # < w tokens -> 0 windows
    "",                                # empty -> 0 tokens
]


class TestDupSpanStats:
    def _run(self, ray_session, texts, w=5, parts=3):
        import ray.data as rd

        from vtzero_ray.functions.webclean import dup_span_stats

        t = _tab({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
        return (dup_span_stats(rd.from_arrow(t).repartition(parts), w=w)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def test_hand_semantics(self, ray_session):
        out = self._run(ray_session, SPAN_DOCS).set_index("doc_id")
        # doc 0: 7 tokens -> 3 windows; one dup window (start 1), mass 5
        assert out.loc[0].tolist() == [3, 1, 5]
        # doc 1: dup window starts at 2, mass 5
        assert out.loc[1].tolist() == [3, 1, 5]
        # doc 2: 10 tokens -> 6 windows; windows 1 and 6 dup ->
        # coverage [1,5] + [6,10] = 10
        assert out.loc[2].tolist() == [6, 2, 10]
        assert out.loc[3].tolist() == [3, 0, 0]
        assert out.loc[4].tolist() == [0, 0, 0]
        assert out.loc[5].tolist() == [0, 0, 0]

    def test_overlapping_coverage_union(self, ray_session):
        # "x x x x x x" (6 tokens): both windows (1, 2) are "x x x x x"
        # -> duplicated; union coverage = 6, not 10
        out = self._run(ray_session, ["x x x x x x", "pad words only"]) \
            .set_index("doc_id")
        assert out.loc[0].tolist() == [2, 2, 6]

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (dup_span_stats,
                                                   dup_span_stats_sql)

        t = _tab({"doc_id": pa.array(range(len(SPAN_DOCS)), pa.int64()),
                  "text": pa.array(SPAN_DOCS)})
        got = (dup_span_stats(rd.from_arrow(t).repartition(3), w=5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        want = (con.execute(dup_span_stats_sql(w=5, synth=False)).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=True)

    def test_partition_invariance(self, ray_session):
        a = self._run(ray_session, SPAN_DOCS, parts=1)
        b = self._run(ray_session, SPAN_DOCS, parts=5)
        pd.testing.assert_frame_equal(a, b)


class TestStripHtml:
    def test_hand_semantics(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import strip_html

        docs = [
            "<p>hello <b>world</b></p>",
            "<script>drop me < entirely</script>visible",
            "<style a=b>.x{}</style>kept",
            "a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
            "no tags at all",
            "spaces   <i>between</i>\ttags",
            # double-escape must NOT re-expand: &amp;lt; -> &lt; literal
            "x &amp;lt; y",
        ]
        t = _tab({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "html": pa.array(docs)})
        out = (strip_html(rd.from_arrow(t).repartition(2)).to_pandas()
               .sort_values("doc_id").set_index("doc_id"))
        assert out.loc[0, "text"] == "hello world"
        assert out.loc[0, "n_tags"] == 4
        assert out.loc[1, "text"] == "visible"
        assert out.loc[2, "text"] == "kept"
        assert out.loc[3, "text"] == "a & b <c> \"d\" 'e' f"
        assert out.loc[4, "text"] == "no tags at all"
        assert out.loc[4, "n_tags"] == 0
        assert out.loc[5, "text"] == "spaces between tags"
        assert out.loc[6, "text"] == "x &lt; y"

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (strip_html,
                                                   strip_html_sql,
                                                   synth_html)

        sf = "/root/testdata/sf0.001"
        ds = synth_html(rd.read_parquet(
            f"{sf}/documents.parquet",
            columns=["doc_id", "text"]).repartition(4))
        got = (strip_html(ds).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want = (con.execute(strip_html_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=True)
        # the script branch fires for id%4 docs and never leaks content;
        # no angle brackets survive except decoded entities (id%6 docs)
        assert not got.text.str.contains("var x").any()
        leaked = got[got.text.str.contains("<")]
        assert (leaked.doc_id % 6 == 0).all()


class TestDedupSpans:
    def _run(self, ray_session, texts, w=5, parts=3):
        import ray.data as rd

        from vtzero_ray.functions.webclean import dedup_spans

        def mk():
            t = _tab({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
            return rd.from_arrow(t).repartition(parts)

        return (dedup_spans(mk(), mk(), w=w).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    def test_hand_semantics(self, ray_session):
        out = self._run(ray_session, SPAN_DOCS).set_index("doc_id")
        # doc 0 holds the first occurrence of "one two three four five"
        # -> keeps everything; doc 1's copy is cut
        assert out.loc[0, "clean_text"] == SPAN_DOCS[0]
        assert out.loc[1, "clean_text"] == "zz yy"
        assert out.loc[1].tolist()[:2] == [7, 2]
        # doc 2: second within-doc occurrence of "a b c d e" is cut
        assert out.loc[2, "clean_text"] == "a b c d e"
        # untouched docs reconstruct verbatim (single-space corpora)
        assert out.loc[3, "clean_text"] == SPAN_DOCS[3]
        assert out.loc[4, "clean_text"] == SPAN_DOCS[4]
        # empty doc stays present with empty text
        assert out.loc[5].tolist() == [0, 0, ""]

    def test_overlapping_runs_cut_once(self, ray_session):
        # doc 1 repeats doc 0's 6-token run: both its windows are later
        # occurrences -> the union [1..6] is cut, not double-counted
        out = self._run(ray_session, ["p q r s t u tail here",
                                      "p q r s t u other words"]) \
            .set_index("doc_id")
        assert out.loc[0, "clean_text"] == "p q r s t u tail here"
        assert out.loc[1, "clean_text"] == "other words"

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data as rd

        from vtzero_ray.functions.webclean import (dedup_spans,
                                                   dedup_spans_sql)

        t = _tab({"doc_id": pa.array(range(len(SPAN_DOCS)), pa.int64()),
                  "text": pa.array(SPAN_DOCS)})
        got = (dedup_spans(rd.from_arrow(t).repartition(3),
                           rd.from_arrow(t).repartition(2), w=5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        want = (con.execute(dedup_spans_sql(w=5, synth=False)).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=True)

    def test_partition_invariance(self, ray_session):
        a = self._run(ray_session, SPAN_DOCS, parts=1)
        b = self._run(ray_session, SPAN_DOCS, parts=5)
        pd.testing.assert_frame_equal(a, b)


class TestFixMojibake:
    def test_repairs_and_preserves(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import fix_mojibake

        clean = ["caf\u00e9 au lait", "plain ascii text",
                 "na\u00efve r\u00e9sum\u00e9",
                 "\u4e2d\u6587 \u0442\u0435\u043a\u0441\u0442"]
        single = [s.encode("utf-8").decode("latin-1") for s in clean]
        double = [s.encode("utf-8").decode("latin-1")
                  .encode("utf-8").decode("latin-1") for s in clean]
        # lookalikes that are NOT valid double-encoded UTF-8 must
        # survive untouched
        keepers = ["\u00c3 but no continuation",
                   "\u00d5htu on ilus"]
        texts = single + double + keepers + ["ascii only"]
        t = _tab({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
        out = (fix_mojibake(rd.from_arrow(t).repartition(3)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        n = len(clean)
        for i in range(n):
            assert out.loc[i, "text"] == clean[i]
        for i in range(n):
            assert out.loc[n + i, "text"] == clean[i]
        # single-encoded non-ascii docs took 1 round, double took 2
        assert out.loc[0, "fixed_rounds"] == 1
        assert out.loc[n, "fixed_rounds"] == 2
        assert out.loc[1, "fixed_rounds"] == 0      # ascii: no hint
        for j, k in enumerate(keepers):
            assert out.loc[2 * n + j, "text"] == k
            assert out.loc[2 * n + j, "fixed_rounds"] == 0
        assert out.loc[2 * n + 2, "text"] == "ascii only"

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from vtzero_ray.functions.webclean import fix_mojibake

        texts = [("caf\u00e9 " * (1 + i % 5)).encode("utf-8")
                 .decode("latin-1") if i % 3 == 0 else f"plain {i}"
                 for i in range(30)]
        t = _tab({"doc_id": pa.array(range(30), pa.int64()),
                  "text": pa.array(texts)})
        a = (fix_mojibake(rd.from_arrow(t).repartition(1)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (fix_mojibake(rd.from_arrow(t).repartition(6)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)


class TestStripBoilerplate:
    def test_host_df_rule(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.webclean import strip_boilerplate

        rows = []
        # host 0: "nav bar" on 3 pages (boilerplate at min_df=3);
        # host 1: the SAME line on only 2 pages (content there)
        for d in range(3):
            rows.append((d, 0, f"nav bar\nbody {d}"))
        for d in range(3, 5):
            rows.append((d, 1, f"nav bar\nbody {d}"))
        # host 2: a line repeated TWICE within one page — distinct-doc
        # df is 1, so within-page repetition is not furniture
        rows.append((5, 2, "echo\necho\nbody 5"))
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "host": pa.array([r[1] for r in rows], pa.int64()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
        out = strip_boilerplate(rd.from_arrow(t).repartition(3),
                                min_df=3).to_pandas() \
            .set_index("doc_id").sort_index()
        for d in range(3):      # host 0 loses the nav bar
            assert out.loc[d, "clean_text"] == f"body {d}"
        for d in range(3, 5):   # host 1 keeps it
            assert out.loc[d, "clean_text"] == f"nav bar\nbody {d}"
        assert out.loc[5, "clean_text"] == "echo\necho\nbody 5"

    def test_fully_boilerplate_doc_drops(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vtzero_ray.functions.webclean import strip_boilerplate

        t = pa.table({
            "doc_id": pa.array(list(range(4)), pa.int64()),
            "host": pa.array([0] * 4, pa.int64()),
            "text": pa.array(["same"] * 4, pa.string()),
        })
        out = strip_boilerplate(rd.from_arrow(t), min_df=3).to_pandas()
        assert len(out) == 0
