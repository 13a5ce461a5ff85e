"""Round-5 batch-3 operators: asymmetric shingle containment, crawler-trap
URL flags, magic-byte MIME sniffing, full sitemap <url> entry parsing."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestContainmentPairs:
    def test_wrapper_page_caught_one_direction_only(self, spark):
        """The case Jaccard misses: a short doc quoted whole inside a much
        larger page — containment fires inner->outer, never outer->inner."""
        from webcrawler_woc_spark.operators.dedup import containment_pairs

        inner = "abcdefghijklmnop"
        outer = inner + " plus a long unrelated tail that dilutes jaccard badly"
        docs = spark.createDataFrame(
            [(1, inner), (2, outer), (3, "completely different body")],
            "doc_id bigint, text string",
        )
        rows = containment_pairs(docs, n=4, threshold=0.9).collect()
        got = {(r.inner_doc, r.outer_doc) for r in rows}
        assert got == {(1, 2)}
        (r,) = rows
        assert r.n_common == r.size_inner  # full containment
        assert r.size_outer > r.size_inner

    def test_identical_docs_emit_both_directions(self, spark):
        from webcrawler_woc_spark.operators.dedup import containment_pairs

        docs = spark.createDataFrame(
            [(1, "same text body here"), (2, "same text body here")],
            "doc_id bigint, text string",
        )
        got = {
            (r.inner_doc, r.outer_doc)
            for r in containment_pairs(docs, n=4, threshold=0.9).collect()
        }
        assert got == {(1, 2), (2, 1)}

    def test_jaccard_blind_spot_is_real(self, spark):
        """Pin WHY this operator exists: on the wrapper pair above, Jaccard
        at the same 0.9 bar finds nothing."""
        from webcrawler_woc_spark.operators.dedup import ngram_jaccard_pairs

        inner = "abcdefghijklmnop"
        outer = inner + " plus a long unrelated tail that dilutes jaccard badly"
        docs = spark.createDataFrame(
            [(1, inner), (2, outer)], "doc_id bigint, text string"
        )
        assert ngram_jaccard_pairs(docs, n=4, threshold=0.9).count() == 0


class TestUrlTrapFlags:
    CASES = {
        "http://h.example/a/a/a/x": dict(max_seg_repeat=3, is_trap=1),
        "http://h.example/2023/05/17/9/item": dict(n_date_segs=4, is_trap=1),
        "http://h.example/p?phpsessid=abc&x=1": dict(
            has_session_param=1, n_params=2, is_trap=1
        ),
        "http://h.example/s1/s2/s3/s4/s5/s6/s7/s8/s9/p0": dict(
            path_depth=10, is_trap=1
        ),
        "http://h.example/p?a1=1&a2=1&a3=1&a4=1&a5=1&a6=1&a7=1&a8=1&a9=1&b=2": dict(
            n_params=10, is_trap=1
        ),
        "http://h.example/about/team": dict(
            path_depth=2, max_seg_repeat=1, n_date_segs=0, n_params=0,
            has_session_param=0, is_trap=0,
        ),
        "http://h.example": dict(path_depth=0, max_seg_repeat=0, is_trap=0),
    }

    def test_each_signal_fires_on_its_family(self, spark):
        from webcrawler_woc_spark.operators.traps import url_trap_flags

        df = spark.createDataFrame([(u,) for u in self.CASES], "url string")
        got = {r.url: r.asDict() for r in url_trap_flags(df).collect()}
        for url, want in self.CASES.items():
            for k, v in want.items():
                assert got[url][k] == v, (url, k, got[url])

    def test_session_param_name_is_anchored(self, spark):
        """'sid' must match as the WHOLE param name: 'classid=' or
        'sidebar=' must not fire."""
        from webcrawler_woc_spark.operators.traps import url_trap_flags

        df = spark.createDataFrame(
            [("http://h.example/p?classid=7&sidebar=1",),
             ("http://h.example/p?SID=7",)],
            "url string",
        )
        got = {r.url: r.has_session_param for r in url_trap_flags(df).collect()}
        assert got["http://h.example/p?classid=7&sidebar=1"] == 0
        assert got["http://h.example/p?SID=7"] == 1  # case-insensitive

    def test_scan_only_no_exchange(self, spark):
        from webcrawler_woc_spark.operators.traps import url_trap_flags

        df = spark.createDataFrame([("http://h.example/a",)], "url string")
        plan = url_trap_flags(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan

    def test_host_rollup(self, spark):
        from webcrawler_woc_spark.operators.traps import host_trap_stats

        df = spark.createDataFrame(
            [("http://a.example/x/x/x/y",), ("http://a.example/ok",),
             ("http://b.example/clean",)],
            "url string",
        )
        got = {r.host: r for r in host_trap_stats(df).collect()}
        assert got["a.example"].n_urls == 2 and got["a.example"].n_traps == 1
        assert got["a.example"].trap_ratio_ppm == 500_000
        assert got["b.example"].trap_ratio_ppm == 0


class TestSniffContentType:
    def test_magic_bytes_beat_the_claim(self, spark):
        from webcrawler_woc_spark.operators.extract import sniff_content_type

        rows = [
            (1, bytes.fromhex("89504E470D0A1A0A") + b"xxxx", "text/html"),
            (2, b"%PDF-1.4 payload", "application/pdf"),
            (3, b"  <!DOCTYPE html><html>", "text/html; charset=utf-8"),
            (4, b"GIF89a....", "image/png"),
            (5, b"\xff\xd8\xff\xe0JFIF", "text/html"),
            (6, b"PK\x03\x04zipdata", "application/zip"),
            (7, b"plain text, no magic, no tag", "text/plain"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, html binary, content_type string")
        got = {r.doc_id: (r.sniffed_type, r.type_mismatch)
               for r in sniff_content_type(df).collect()}
        assert got[1] == ("image/png", 1)  # server lied
        assert got[2] == ("application/pdf", 0)
        assert got[3] == ("text/html", 0)  # leading whitespace + DOCTYPE ok
        assert got[4] == ("image/gif", 1)
        assert got[5] == ("image/jpeg", 1)
        assert got[6] == ("application/zip", 0)
        assert got[7] == ("application/octet-stream", 1)  # honest fallback

    def test_scan_only(self, spark):
        from webcrawler_woc_spark.operators.extract import sniff_content_type

        df = spark.createDataFrame(
            [(1, b"<html>", "text/html")], "doc_id bigint, html binary, content_type string"
        )
        plan = sniff_content_type(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestParseSitemapEntries:
    BODY = (
        '<?xml version="1.0" encoding="UTF-8"?><urlset>'
        "<url><loc>  http://a.example/p?x=1&amp;y=2  </loc>"
        "<lastmod>2024-03-15</lastmod><priority>0.8</priority></url>"
        "<url><loc>http://a.example/q</loc><changefreq>daily</changefreq></url>"
        "</urlset>"
    )

    def test_fields_order_nulls_and_unescape(self, spark):
        from webcrawler_woc_spark.operators.sitemaps import parse_sitemap_entries

        sm = spark.createDataFrame([("sm://a", self.BODY)], "sitemap_url string, body string")
        rows = sorted(parse_sitemap_entries(sm).collect(), key=lambda r: r.idx)
        assert len(rows) == 2
        r0, r1 = rows
        assert r0.url == "http://a.example/p?x=1&y=2"  # trimmed + unescaped
        assert (r0.lastmod, r0.changefreq, r0.priority_ppm) == ("2024-03-15", None, 800000)
        assert r1.url == "http://a.example/q"
        assert (r1.lastmod, r1.changefreq, r1.priority_ppm) == (None, "daily", None)

    def test_empty_and_locless_bodies_emit_nothing(self, spark):
        from webcrawler_woc_spark.operators.sitemaps import parse_sitemap_entries

        sm = spark.createDataFrame(
            [("sm://a", "<urlset></urlset>"), ("sm://b", "not xml at all")],
            "sitemap_url string, body string",
        )
        assert parse_sitemap_entries(sm).count() == 0


class TestTermDrift:
    def test_counts_missing_terms_and_cut(self, spark):
        from webcrawler_woc_spark.operators.textstats import term_drift

        old = spark.createDataFrame(
            [("a a a b",), ("a c",)], "text string"
        )  # a:4 b:1 c:1
        new = spark.createDataFrame(
            [("a a b b z",), ("z z",)], "text string"
        )  # a:2 b:2 z:3
        rows = {r.term: r for r in term_drift(old, new, top_k=3).collect()}
        # combined counts: a=6, z=3, b=3 -> top-3 by (sum DESC, term ASC): a, b, z
        assert set(rows) == {"a", "b", "z"}
        assert (rows["a"].n_old, rows["a"].n_new) == (4, 2)
        assert rows["z"].n_old == 0  # absent from old = strongest signal
        assert rows["z"].drift_ppm == (3 * 3 * 1_000_000) // 3
        assert rows["a"].drift_ppm == (2 * 2 * 1_000_000) // 6

    def test_full_tiebreak_cut_is_deterministic(self, spark):
        from webcrawler_woc_spark.operators.textstats import term_drift

        old = spark.createDataFrame([("x y",)], "text string")
        new = spark.createDataFrame([("y x",)], "text string")
        got = [r.term for r in term_drift(old, new, top_k=1).collect()]
        assert got == ["x"]  # 2-2 tie -> term ASC
